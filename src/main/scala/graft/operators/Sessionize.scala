package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Num, Tables}

/** X5 `q_sessionize`: gap-based sessionization over the `events` stream table
  * (SURVEY.md §2.11) — the classic two-window idiom: lag() marks session
  * starts, a cumulative sum numbers them, then one groupBy rolls sessions up.
  *
  * The whole program is ONE shuffle on user_id: both windows and the final
  * aggregate share the same partitioning, so Catalyst reuses the exchange
  * (EnsureRequirements sees compatible distributions). At 100 TB the
  * per-user event history sorts within its partition; a hot user (skew)
  * would be handled by AQE skew-split plus a coarse pre-bucketing of ts —
  * noted, not needed at harness scale.
  *
  * Determinism: ordering ties broken by event_id; timestamps compared in
  * exact epoch microseconds; boundary timestamps exported as formatted
  * strings (cross-engine timestamp dtype hashing is not stable — same
  * convention as `q_extract_cast`).
  */
object Sessionize {

  /** Session gap: a new session starts after >24h of user inactivity
    * (matched to the harness data's inter-event gap distribution; the
    * threshold is a runtime parameter in spirit). */
  val GapMicros: Long = 24L * 3600 * 1000000

  /** Core: sessionize any (user_id, ts, event_id) frame with a given gap. */
  def sessionize(events: DataFrame, gapMicros: Long): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    val isNew = when(
      lag(us, 1).over(byTime).isNull ||
        (us - lag(us, 1).over(byTime)) > gapMicros, 1L).otherwise(0L)
    events
      .withColumn("session_id", sum(isNew).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        Num.countStar.as("n_events"))
      .orderBy(col("user_id"), col("session_id"))
  }

  def sessionizeQ(spark: SparkSession, sfDir: String): DataFrame =
    sessionize(Tables.events(spark, sfDir), GapMicros)

  val sessionizeOracle: String =
    s"""WITH marked AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${GapMicros}
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), numbered AS (
       |  SELECT user_id, ts,
       |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                      ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM marked)
       |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       |  COUNT(*) AS n_events
       |FROM numbered
       |GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin
}
