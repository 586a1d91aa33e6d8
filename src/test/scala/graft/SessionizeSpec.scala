package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sessionize

/** X5 gap-based sessionization edges: boundary gap (exactly the limit stays
  * in-session, strictly greater splits), per-user independence, tie-breaking
  * by event_id. */
class SessionizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private val Gap = 60L * 1000000 // 60s in micros

  private def run(rows: Seq[(Long, Timestamp, Long)]) =
    Sessionize.sessionize(rows.toDF("user_id", "ts", "event_id"), Gap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))) // user, session, n

  test("gap exactly at the limit does NOT split; gap beyond it does") {
    val out = run(Seq(
      (1L, ts(0), 1L),
      (1L, ts(60), 2L),   // gap == 60s -> same session
      (1L, ts(121), 3L))) // gap 61s -> new session
    assert(out.toSeq === Seq((1L, 1L, 2L), (1L, 2L, 1L)))
  }

  test("sessions are independent per user") {
    val out = run(Seq(
      (1L, ts(0), 1L), (2L, ts(1), 2L),
      (1L, ts(30), 3L), (2L, ts(500), 4L)))
    assert(out.toSet === Set((1L, 1L, 2L), (2L, 1L, 1L), (2L, 2L, 1L)))
  }

  test("single event forms a single session") {
    assert(run(Seq((5L, ts(42), 1L))).toSeq === Seq((5L, 1L, 1L)))
  }

  test("session boundaries carry correct start/end") {
    val rows = Seq((1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(1000), 3L))
    val out = Sessionize.sessionize(rows.toDF("user_id", "ts", "event_id"), Gap)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    assert(out(0) === ((1L, "1970-01-01 00:00:00.000000", "1970-01-01 00:00:10.000000")))
    assert(out(1) === ((2L, "1970-01-01 00:16:40.000000", "1970-01-01 00:16:40.000000")))
  }

  test("distributed prefix-sum peaks match a sequential sweep at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val got = Sessionize.peakConcurrencyQ(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sequential reference: same sessions, one in-memory scan
    val sessions = Sessionize
      .withSessionIds(graft.engine.Tables.events(spark, sfDir),
        Sessionize.GapMicros)
      .groupBy($"user_id", $"session_id")
      .agg(org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.unix_micros($"ts")).as("s"),
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.unix_micros($"ts")).as("e"))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    val deltas = (sessions.map(x => (x._1, 1L)) ++
      sessions.map(x => (x._2 + 1, -1L))).sortBy(d => (d._1, d._2))
    var run = 0L
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .withZone(java.time.ZoneOffset.UTC)
    val expected = scala.collection.mutable.Map.empty[String, Long]
    deltas.foreach { case (t, d) =>
      run += d
      val day = fmt.format(java.time.Instant.ofEpochSecond(
        Math.floorDiv(t, 1000000L)))
      expected(day) = math.max(expected.getOrElse(day, Long.MinValue), run)
    }
    assert(got === expected.toMap)
    assert(got.values.forall(_ >= 0))
  }

  test("gap-fill: per-user calendar is hole-free and LOCF never null") {
    val rows = Sessionize.gapFillQ(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getInt(2) == 0), "harness data should have gap days")
    rows.groupBy(_.getLong(0)).foreach { case (_, days) =>
      val ds = days.map(r => java.time.LocalDate.parse(r.getString(1))).sorted
      // consecutive calendar days from first to last observation
      assert(ds.last.toEpochDay - ds.head.toEpochDay + 1 === ds.length)
      assert(ds.distinct.length === ds.length)
    }
    rows.foreach(r => assert(!r.isNullAt(3), s"LOCF null in $r"))
    // first row per user is always an observed day (span starts there)
    rows.groupBy(_.getLong(0)).foreach { case (_, days) =>
      assert(days.minBy(_.getString(1)).getInt(2) === 1)
    }
  }
}
