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
    * The override mutates the session-global conf, so [[scoped]] holds a
    * per-session lock for the scope's whole duration — two scopes on the
    * same session serialize instead of racing on the value. */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T =
    scoped(spark, "spark.sql.shuffle.partitions" -> n.toString)(body)

  /** One lock object per SparkSession (weak keys: a stopped session's
    * entry is collectable). Scoping on SESSION identity, not a global
    * lock, keeps independent sessions (tests build several) from
    * serializing against each other. */
  private val locks =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Object]())
  private def lockFor(spark: SparkSession): Object =
    locks.computeIfAbsent(spark, _ => new Object)

  /** Runs `body` with the given session-conf overrides, restoring (or
    * unsetting) each after. The body must force its work (write/count)
    * inside the scope — the conf is read at execution, not plan, time.
    *
    * Mutate-and-restore on a session-global conf is only safe when scopes
    * on that session cannot overlap, so the whole set-run-restore sequence
    * runs under the session's lock: concurrent callers SERIALIZE (correct,
    * if slower) rather than reading each other's overrides or restoring a
    * clobbered "previous" value. Nested scopes on the same session from
    * the SAME thread would self-deadlock under a plain lock — synchronized
    * is reentrant, and nesting restores inside-out correctly. */
  def scoped[T](spark: SparkSession, kv: (String, String)*)(body: => T): T =
    lockFor(spark).synchronized {
      val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => try spark.conf.unset(k) catch { case _: Throwable => () }
      }
    }
}
