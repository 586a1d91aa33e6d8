package graft.pipeline

import java.nio.file.{Files, Paths}

/** Deterministic reference-shaped raw JSON fixtures (FIXTURES.md §B).
  *
  * One Scala value is the single source of truth for BOTH the JSON files the
  * pipeline ingests and the DuckDB VALUES clauses the oracle SQL recomputes
  * from — so the medallion pipeline gets a true cross-engine differential
  * check end-to-end.
  *
  * Shapes mirror the reference exactly:
  *  - videos: YouTube-API item shape consumed at
  *    /root/reference/src/youtube_collector.py:148-171 — nested snippet/
  *    statistics, STRING-typed counts (the reference casts with int()),
  *    optional description/tags/viewCount.
  *  - channels: the collector's flattened channel record
  *    (/root/reference/src/youtube_collector.py:186-192).
  *  - layout: raw/YYYY/MM/DD/{videos|channels}_{ts}.json, one top-level
  *    JSON ARRAY per file (:204-233) — needs multiLine=true.
  *
  * Edge cases baked in (FIXTURES.md §B "edge-case rows"): zero views,
  * missing description/tags/country/viewCount, every category class,
  * keyword tie, "failure"⊃"fail" substring trap, repeated word counted
  * once, null video_id/channel_id rows, a same-id video in two files with
  * different counts (first-write-wins), a channel in two files (latest-
  * file-wins), an exact duplicate row (DISTINCT), and one malformed file
  * (PERMISSIVE corrupt-record path).
  */
object Fixtures {

  final case class RawVideo(
      file: String, day: String, videoId: Option[String],
      channelId: Option[String], categoryId: String, title: String,
      description: Option[String], tags: Option[Seq[String]],
      viewCount: Option[String], likeCount: Option[String],
      commentCount: Option[String])

  final case class RawChannel(
      file: String, day: String, channelId: Option[String], title: String,
      country: Option[String], subscriberCount: Long, videoCount: Long)

  private val f1 = "videos_20240101_060000.json"
  private val f2 = "videos_20240102_060000.json"
  private val c1 = "channels_20240101_060000.json"
  private val c2 = "channels_20240102_060000.json"

  val videos: Seq[RawVideo] = Seq(
    // day 1 --------------------------------------------------------------
    RawVideo(f1, "2024/01/01", Some("V1"), Some("C1"), "19", "morning show",
      Some("sunrise"), Some(Seq("tv")), Some("1000"), Some("50"), Some("25")),
    RawVideo(f1, "2024/01/01", Some("V2"), Some("C2"), "10",
      "a complete failure", None, None, Some("0"), Some("10"), Some("5")),
    RawVideo(f1, "2024/01/01", Some("V3"), Some("C1"), "10", "fast fail",
      Some("neutral words only"), Some(Seq()), Some("3200"), Some("25"), Some("0")),
    RawVideo(f1, "2024/01/01", Some("V4"), Some("C3"), "99",
      "uncategorized thing", Some("nothing"), Some(Seq("misc")),
      Some("10"), Some("1"), Some("1")),
    // exact duplicate row of V4 (removed by DISTINCT pre-merge)
    RawVideo(f1, "2024/01/01", Some("V4"), Some("C3"), "99",
      "uncategorized thing", Some("nothing"), Some(Seq("misc")),
      Some("10"), Some("1"), Some("1")),
    // null video_id (rejected by the P3 data-quality gate)
    RawVideo(f1, "2024/01/01", None, Some("C1"), "1", "ghost",
      None, None, Some("5"), Some("0"), Some("0")),
    RawVideo(f1, "2024/01/01", Some("V6"), Some("C3"), "15", "daily vlog",
      None, Some(Seq("fast", "fast", "growth")), Some("200"), Some("20"), Some("0")),
    // day 2 --------------------------------------------------------------
    // V1 re-collected with different counts: FIRST write wins, this row drops
    RawVideo(f2, "2024/01/02", Some("V1"), Some("C1"), "19", "morning show",
      Some("sunrise"), Some(Seq("tv")), Some("9999"), Some("1"), Some("1")),
    RawVideo(f2, "2024/01/02", Some("V7"), Some("C2"), "20", "anything",
      Some("words"), Some(Seq()), Some("100"), Some("10"), Some("0")),
    // missing viewCount -> defaults to 0 -> engagement 0.0
    RawVideo(f2, "2024/01/02", Some("V8"), Some("C5"), "26", "cooking",
      Some("recipes"), Some(Seq("food")), None, Some("3"), Some("2")),
    RawVideo(f2, "2024/01/02", Some("V9"), Some("C4"), "25",
      "with a warning word", Some("slow crash"), None,
      Some("50"), Some("5"), Some("5")),
    RawVideo(f2, "2024/01/02", Some("V11"), Some("C2"), "23", "late night",
      Some("talk"), Some(Seq("tv")), Some("400"), Some("2"), Some("6")))

  val channels: Seq[RawChannel] = Seq(
    RawChannel(c1, "2024/01/01", Some("C1"), "Alpha", Some("US"), 1000L, 10L),
    RawChannel(c1, "2024/01/01", Some("C2"), "Beta", None, 2000L, 20L),
    RawChannel(c1, "2024/01/01", Some("C3"), "Gamma", Some("GB"), 3000L, 30L),
    // later file: C2 re-collected — LATEST file wins for the dimension
    RawChannel(c2, "2024/01/02", Some("C2"), "Beta v2", Some("IN"), 2500L, 25L),
    RawChannel(c2, "2024/01/02", Some("C4"), "Delta", Some("PK"), 4000L, 40L),
    RawChannel(c2, "2024/01/02", Some("C5"), "Epsilon", None, 5000L, 50L),
    // null channel_id (rejected by the P3 gate)
    RawChannel(c2, "2024/01/02", None, "NoId", Some("US"), 1L, 1L))

  // ---- JSON writing ----------------------------------------------------

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def videoJson(v: RawVideo): String = {
    val snippet = Seq(
      v.channelId.map(c => s""""channelId": ${jstr(c)}"""),
      Some(s""""categoryId": ${jstr(v.categoryId)}"""),
      Some(s""""title": ${jstr(v.title)}"""),
      v.description.map(d => s""""description": ${jstr(d)}"""),
      v.tags.map(t => s""""tags": [${t.map(jstr).mkString(", ")}]"""),
      Some(s""""publishedAt": "${v.day.replace('/', '-')}T00:00:00Z""""))
      .flatten.mkString(", ")
    val stats = Seq(
      v.viewCount.map(x => s""""viewCount": ${jstr(x)}"""),
      v.likeCount.map(x => s""""likeCount": ${jstr(x)}"""),
      v.commentCount.map(x => s""""commentCount": ${jstr(x)}"""))
      .flatten.mkString(", ")
    val id = v.videoId.map(jstr).getOrElse("null")
    s"""{"id": $id, "snippet": {$snippet}, "statistics": {$stats}}"""
  }

  private def channelJson(c: RawChannel): String = {
    val id = c.channelId.map(jstr).getOrElse("null")
    val country = c.country.map(jstr).getOrElse("null")
    s"""{"channel_id": $id, "channel_title": ${jstr(c.title)}, """ +
      s""""channel_country": $country, "subscriber_count": ${c.subscriberCount}, """ +
      s""""video_count": ${c.videoCount}}"""
  }

  /** Writes the raw layer (JSON array files under `base`/raw/YYYY/MM/DD/)
    * and returns the raw dir. Includes one malformed videos file
    * (corrupt-record path). */
  def writeRaw(base: String): String = {
    val raw = s"$base/raw"
    def writeFile(day: String, name: String, body: String): Unit = {
      val dir = Paths.get(s"$raw/$day")
      Files.createDirectories(dir)
      Files.writeString(dir.resolve(name), body)
    }
    (videos.groupBy(v => (v.day, v.file)) foreach { case ((day, file), vs) =>
      writeFile(day, file, vs.map(videoJson).mkString("[\n", ",\n", "\n]"))
    })
    (channels.groupBy(c => (c.day, c.file)) foreach { case ((day, file), cs) =>
      writeFile(day, file, cs.map(channelJson).mkString("[\n", ",\n", "\n]"))
    })
    writeFile("2024/01/03", "videos_20240103_060000.json",
      "{ this file is not valid json")
    raw
  }

  // ---- DuckDB VALUES twins --------------------------------------------

  private def sqlStr(o: Option[String]): String =
    o.map(s => "'" + s.replace("'", "''") + "'").getOrElse("NULL")

  /** (file_name, collected_date, video_id, channel_id, category_id, title,
    * description, tags, views_s, likes_s, comments_s) */
  def videosValues: String =
    videos.map { v =>
      val tags = v.tags
        .map(t => "[" + t.map(x => "'" + x + "'").mkString(", ") + "]")
        .getOrElse("CAST(NULL AS VARCHAR[])")
      s"(${sqlStr(Some(v.file))}, DATE '${v.day.replace('/', '-')}', " +
        s"${sqlStr(v.videoId)}, ${sqlStr(v.channelId)}, " +
        s"CAST('${v.categoryId}' AS INT), ${sqlStr(Some(v.title))}, " +
        s"${sqlStr(v.description)}, $tags, ${sqlStr(v.viewCount)}, " +
        s"${sqlStr(v.likeCount)}, ${sqlStr(v.commentCount)})"
    }.mkString(",\n    ")

  /** (file_name, channel_id, channel_title, channel_country, subs, vids) */
  def channelsValues: String =
    channels.map { c =>
      s"(${sqlStr(Some(c.file))}, ${sqlStr(c.channelId)}, " +
        s"${sqlStr(Some(c.title))}, ${sqlStr(c.country)}, " +
        s"${c.subscriberCount}, ${c.videoCount})"
    }.mkString(",\n    ")
}
