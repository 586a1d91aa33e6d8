package graft.engine

import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD

/** Distributed exclusive prefix-fold — the Blelloch scan's carry step,
  * shared by every operator that needs "a running accumulator over one
  * global order" WITHOUT the textbook trap of funneling the data through a
  * single-partition window:
  *
  *   pass 1: fold each partition to one accumulator (P scalars to the
  *           driver — partition count, never data);
  *   driver: exclusive-scan the P partials into per-partition carries;
  *   pass 2: re-walk each partition threading its carried accumulator.
  *
  * Wall-clock is two narrow passes regardless of cluster width. The monoid
  * is the parameter: (+, 0) gives running sums (peak-concurrency sweep),
  * (min, +∞) gives running minima (skyline dominance), etc.
  *
  * CONTRACT: `rdd` must already be globally range-ordered (range-partitioned
  * + sorted within partitions) AND deterministic across the two passes —
  * callers persist the sorted frame first so both passes read identical
  * blocks rather than trusting two shuffles to sample identical bounds.
  * `comb` must be associative with identity `zero`.
  */
object Scan {
  /** Pairs every element with the EXCLUSIVE prefix accumulator (the fold of
    * all elements strictly before it in the global order). */
  def exclusivePrefix[T: ClassTag, A: ClassTag](rdd: RDD[T], zero: A,
      lift: T => A, comb: (A, A) => A): RDD[(A, T)] = {
    val partials = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var a = zero
        it.foreach(t => a = comb(a, lift(t)))
        Iterator((pid, a))
      }
      .collect().sortBy(_._1).map(_._2)
    // scanLeft: carries(pid) = fold of partitions < pid (zero for the first)
    val carries = partials.scanLeft(zero)(comb)
    val b = rdd.sparkContext.broadcast(carries)
    rdd.mapPartitionsWithIndex { (pid, it) =>
      var a = b.value(pid)
      it.map { t =>
        val pre = a
        a = comb(a, lift(t))
        (pre, t)
      }
    }
  }
}
