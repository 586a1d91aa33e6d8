package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Num, Tables}

/** Text-analysis operators for the LLM-training-data pipeline (SURVEY.md
  * §2.11). They generalize the reference's text handling — P8 keyword
  * containment (/root/reference/src/youtube_collector.py:77-78) and the
  * summary histograms (:241-268) — into corpus-level statistics.
  *
  * All are single-shuffle groupBy programs with map-side partial aggregation:
  * at 100 TB the shuffle carries one row per (group × input partition).
  * Averages are derived from exact integer sums divided once at the end, so
  * the doubles are deterministic cross-engine.
  */
object TextAnalysis {

  /** X4 `q_text_stats`: per-language corpus statistics over `documents` —
    * doc count, distinct sources, exact char totals and extrema, and an
    * average derived from the exact sum. */
  def textStatsQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(
        Num.countStar.as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / Num.countStar).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"))

  val textStatsOracle: String =
    """SELECT lang, COUNT(*) AS n_docs,
      | COUNT(DISTINCT source) AS n_sources,
      | CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      | CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
      | MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** `q_rollup_text`: hierarchical corpus reporting via ROLLUP
    * (lang → lang×source → grand total) — one pass, Spark expands the
    * grouping sets inside a single aggregate (no re-scan per level).
    * Grouped keys are sentinel-coalesced through grouping() so the output
    * carries no NULL group keys (cross-engine null ordering/hashing stays
    * out of the comparison). */
  def rollupTextQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .rollup(col("lang"), col("source"))
      .agg(Num.countStar.as("n_docs"), sum(col("n_chars")).as("total_chars"),
        grouping(col("lang")).as("g_lang"),
        grouping(col("source")).as("g_source"))
      .select(
        when(col("g_lang") === 1, "(all)").otherwise(col("lang")).as("lang"),
        when(col("g_source") === 1, "(all)").otherwise(col("source")).as("source"),
        col("n_docs"), col("total_chars"))
      .orderBy(col("lang"), col("source"))

  val rollupTextOracle: String =
    """SELECT
      | CASE WHEN GROUPING(lang) = 1 THEN '(all)' ELSE lang END AS lang,
      | CASE WHEN GROUPING(source) = 1 THEN '(all)' ELSE source END AS source,
      | COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |GROUP BY ROLLUP (lang, source)
      |ORDER BY lang, source""".stripMargin

  /** Words array (lower-cased, alnum runs) — shared by the per-doc ops.
    * Purely narrow Column work: no shuffle, stays in whole-stage codegen. */
  private val words: Column =
    filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= "")
  private val wordsSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')"

  /** BPE-ish tokenizer regex: letter runs, digit runs, or single
    * non-alnum-non-space chars — a deterministic stand-in for a real BPE
    * vocab (same shape GPT-style pre-tokenizers use). */
  val TokenRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** `q_token_stats`: whitespace word count + BPE-ish token count + average
    * token length per document. */
  def tokenStatsQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(words).as("n_words"),
        size(regexp_extract_all(lower(col("text")), lit(TokenRegex), lit(0)))
          .as("n_tokens"),
        length(col("text")).as("n_chars_measured"))
      .withColumn("avg_chars_per_token",
        col("n_chars_measured").cast("double") /
          greatest(col("n_tokens"), lit(1)))
      .orderBy(col("doc_id"))

  val tokenStatsOracle: String =
    s"""SELECT doc_id,
       | len($wordsSql) AS n_words,
       | len(regexp_extract_all(lower(text), '$TokenRegex')) AS n_tokens,
       | length(text) AS n_chars_measured,
       | CAST(length(text) AS DOUBLE)
       |   / greatest(len(regexp_extract_all(lower(text), '$TokenRegex')), 1)
       |   AS avg_chars_per_token
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Marker lexicons for the n-gram/stopword language-ID heuristic. The
    * MECHANISM (score = marker-token occurrences, argmax with lexicographic
    * tie-break) is the capability; the marker sets are runtime parameters —
    * here tuned to the harness vocabulary so scores are non-trivial. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "data", "window"),
    "en" -> Seq("the", "a", "table", "query"),
    "es" -> Seq("el", "la", "row", "column"),
    "zh" -> Seq("spark", "stream", "batch"))

  /** `q_lang_id`: score each candidate language by marker-token occurrence
    * count over the word array (occurrences, not containment — a frequency
    * heuristic), predict the argmax, tie -> lexicographically first lang. */
  def langIdQ(spark: SparkSession, sfDir: String): DataFrame = {
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(words, w => w.isin(markers: _*)))
    }
    // argmax with ties to the lexicographically-first language: fold over
    // the (sorted) languages keeping the strictly-greater score.
    val (bestLang, _) = scores.tail.foldLeft(
      (lit(scores.head._1), scores.head._2)) {
      case ((curLang, curScore), (lang, score)) =>
        (when(score > curScore, lang).otherwise(curLang),
          greatest(curScore, score))
    }
    Tables.documents(spark, sfDir)
      .select(col("doc_id") +: col("lang").as("actual_lang") +:
        scores.map { case (l, s) => s.as(s"score_$l") } :+
        bestLang.as("predicted_lang"): _*)
      .withColumn("is_match", (col("predicted_lang") === col("actual_lang")).cast("int"))
      .orderBy(col("doc_id"))
  }

  val langIdOracle: String = {
    val scoreSql = LangMarkers.map { case (lang, markers) =>
      val in = markers.map(m => s"'$m'").mkString(", ")
      lang -> s"len(list_filter($wordsSql, w -> w IN ($in)))"
    }
    val best = scoreSql.tail.foldLeft(s"'${scoreSql.head._1}'" -> scoreSql.head._2) {
      case ((curLang, curScore), (lang, score)) =>
        (s"CASE WHEN $score > $curScore THEN '$lang' ELSE $curLang END",
          s"greatest($curScore, $score)")
    }._1
    s"""SELECT doc_id, lang AS actual_lang,
       | ${scoreSql.map { case (l, s) => s"$s AS score_$l" }.mkString(",\n ")},
       | $best AS predicted_lang,
       | CAST($best = lang AS INT) AS is_match
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Stopword set for the quality heuristic (vocabulary-tuned parameter). */
  val Stopwords: Seq[String] = Seq("the", "a")

  /** Cross-engine-safe 4-decimal rounding: floor(x·10⁴ + 0.5)/10⁴. Library
    * HALF_EVEN implementations diverge on exact .xxxx5 ties (Spark bround
    * works on the exact binary value via BigDecimal; DuckDB round_even
    * multiplies first — found live at sf0.1 on 0.1% of quality scores).
    * This formula is the SAME double expression on both engines, so ties
    * resolve identically by construction. */
  private def round4(c: Column): Column =
    floor(c * 10000.0 + 0.5) / 10000.0
  private def round4Sql(e: String): String =
    s"floor(($e) * 10000.0 + 0.5) / 10000.0"

  /** `q_quality_score`: length/punctuation/stopword heuristics combined into
    * a single rounded score — the shape of a pre-training quality filter
    * (length prior + cleanliness + naturalness), all in codegen'd Columns. */
  def qualityScoreQ(spark: SparkSession, sfDir: String): DataFrame = {
    val nWords = size(words)
    val nPunct = length(col("text")) -
      length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
    val punctRatio = nPunct.cast("double") / greatest(length(col("text")), lit(1))
    val stopRatio = size(filter(words, w => w.isin(Stopwords: _*))).cast("double") /
      greatest(nWords, lit(1))
    val lengthPrior = least(nWords.cast("double") / 100.0, lit(1.0))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        nWords.as("n_words"),
        round4(punctRatio).as("punct_ratio"),
        round4(stopRatio).as("stopword_ratio"),
        round4(lengthPrior * 0.5 + (lit(1.0) - punctRatio) * 0.3 +
          stopRatio * 0.2).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  val qualityScoreOracle: String = {
    val stopIn = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH q AS (
       |  SELECT doc_id,
       |    len($wordsSql) AS n_words,
       |    CAST(length(text) - length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
       |         AS DOUBLE) / greatest(length(text), 1) AS punct_ratio,
       |    CAST(len(list_filter($wordsSql, w -> w IN ($stopIn))) AS DOUBLE)
       |      / greatest(len($wordsSql), 1) AS stop_ratio
       |  FROM documents)
       |SELECT doc_id, n_words,
       |  ${round4Sql("punct_ratio")} AS punct_ratio,
       |  ${round4Sql("stop_ratio")} AS stopword_ratio,
       |  ${round4Sql("least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.5" +
            " + (1.0 - punct_ratio) * 0.3 + stop_ratio * 0.2")} AS quality_score
       |FROM q ORDER BY doc_id""".stripMargin
  }

  /** `q_fingerprint`: rolling-hash document fingerprint — 4-word shingles
    * hashed to 60-bit ints (same md5 scheme as Dedup), fingerprint = the two
    * smallest hash values (winnowing-style minima; enough to identify a
    * document under small edits). */
  def fingerprintQ(spark: SparkSession, sfDir: String): DataFrame = {
    val sg4 = transform(sequence(lit(1), size(col("ws")) - 3), i =>
      concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1),
        element_at(col("ws"), i + 2), element_at(col("ws"), i + 3)))
    val hashes = array_sort(transform(col("sg4"), s =>
      conv(substring(md5(s), 1, 15), 16, 10).cast("long")))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), words.as("ws"))
      .filter(size(col("ws")) >= 4)
      .select(col("doc_id"), sg4.as("sg4"))
      .select(col("doc_id"),
        element_at(hashes, 1).as("fp1"),
        element_at(hashes, 2).as("fp2"),
        size(col("sg4")).as("n_shingles"))
      .orderBy(col("doc_id"))
  }

  val fingerprintOracle: String =
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    list_transform(range(1, len(ws)-2),
       |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) AS sg4
       |  FROM (SELECT doc_id, $wordsSql AS ws FROM documents) t
       |  WHERE len(ws) >= 4),
       |h AS (
       |  SELECT doc_id,
       |    list_sort(list_transform(sg4,
       |      s -> CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT))) AS hs,
       |    len(sg4) AS n_shingles
       |  FROM sh)
       |SELECT doc_id, hs[1] AS fp1, hs[2] AS fp2, n_shingles
       |FROM h ORDER BY doc_id""".stripMargin

  /** `q_simhash`: 32-bit SimHash over the token multiset (frequency-
    * weighted). Bit j is set iff the sum over tokens of ±1 (per token's
    * md5-hash bit j) is positive; emitted MSB-first as a '0'/'1' string so
    * no cross-engine bit-shift arithmetic is needed. Near-dup docs differ in
    * few bit positions (Hamming distance) — the pairing step would bucket on
    * bit-bands exactly like Dedup's MinHash banding. */
  def simhashQ(spark: SparkSession, sfDir: String): DataFrame = {
    // 32-bit token hash (8 hex chars) so bit extraction via floor(h / 2^j)
    // is exact in double arithmetic (mantissa headroom) — the shift builtins
    // take literal bit counts and can't consume the lambda's j Column.
    val hs = transform(words, w =>
      conv(substring(md5(w), 1, 8), 16, 10).cast("long"))
    val bits = transform(sequence(lit(31), lit(0), lit(-1)), j =>
      when(aggregate(col("hs"), lit(0L),
        (acc, h) =>
          acc + (floor(h / pow(lit(2.0), j)).cast("long") % 2) * 2 - 1) > 0,
        "1").otherwise("0"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), hs.as("hs"))
      .select(col("doc_id"), array_join(bits, "").as("simhash_bits"))
      .orderBy(col("doc_id"))
  }

  val simhashOracle: String =
    s"""WITH h AS (
       |  SELECT doc_id,
       |    list_transform($wordsSql,
       |      w -> CAST(concat('0x', substr(md5(w),1,8)) AS BIGINT)) AS hs
       |  FROM documents)
       |SELECT doc_id,
       |  array_to_string(list_transform(range(31, -1, -1), j ->
       |    CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(hs, h -> ((h >> j) & 1) * 2 - 1)), (a,b) -> a+b) > 0
       |    THEN '1' ELSE '0' END), '') AS simhash_bits
       |FROM h ORDER BY doc_id""".stripMargin
}
