package graft.engine

import org.apache.spark.sql.SparkSession

/** Scoped session-conf overrides. */
object Conf {
  /** Runs `body` with `spark.sql.shuffle.partitions` = `n`, restoring the
    * session default after. For operators whose working set is orders of
    * magnitude below the session's CPU-sized default — fixture-scale
    * pipeline stages, state-store-bounded streaming drains — where each
    * shuffle partition costs a task launch plus a sink file and the data
    * would fit in one. Production gets this from AQE partition coalescing;
    * a fixed local[32] session does not, so the operator states its own
    * volume. The body must FORCE its work (write/count) before returning:
    * the conf is read at execution, not plan, time.
    *
    * SINGLE-THREADED assumption: the override mutates the session-global
    * conf, so concurrent queries on the same session (or nested scopes
    * with different `n`) would race on the value. The harness executes
    * queries sequentially; introduce a lock here before ever driving the
    * session from multiple threads. */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T =
    scoped(spark, "spark.sql.shuffle.partitions" -> n.toString)(body)

  /** Runs `body` with the given session-conf overrides, restoring (or
    * unsetting) each after. Same execution-time and single-threaded
    * caveats as [[withShufflePartitions]]: the body must force its work
    * inside the scope, and the session must not run concurrent queries. */
  def scoped[T](spark: SparkSession, kv: (String, String)*)(body: => T): T = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => try spark.conf.unset(k) catch { case _: Throwable => () }
    }
  }
}
