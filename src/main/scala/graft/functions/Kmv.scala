package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** K-Minimum-Values distinct-count sketch as a typed Spark `Aggregator`.
  *
  * State = the k smallest DISTINCT 60-bit hash values seen. That is a
  * set-union semilattice, so the result is independent of row order and of
  * how Spark splits partial aggregation across partitions — which is what
  * makes a deterministic cross-engine oracle possible for a sketch: DuckDB
  * recomputes the same k minima from the same hashes and lands on the same
  * estimate, bit for bit.
  *
  * Estimator (final step done in Column space by the caller so both engines
  * share one expression): fewer than k distinct hashes -> exact count; else
  * (k-1) * 2^60 / h_k, the classic KMV unbiased estimate over the [0, 2^60)
  * hash space.
  *
  * Scale: the buffer is O(k) per group regardless of input size and merges
  * associatively — partial aggregation ships k longs per (group, partition),
  * exactly like a datasketches HLL union but exactly reproducible. The
  * per-row guard keeps the common case (hash above current kth minimum) a
  * single comparison.
  */
class KmvSketch(val k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  def zero: Seq[Long] = Vector.empty

  private def insert(b: Seq[Long], x: Long): Seq[Long] =
    if (b.size >= k && x >= b.last) b // above the kth minimum: no-op
    else {
      // The buffer is kept sorted, so position + membership come from one
      // O(log k) binary search and the insert is a single O(k) patch —
      // round 3 re-sorted the whole buffer per accepted element.
      var lo = 0
      var hi = b.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (b(mid) < x) lo = mid + 1 else hi = mid
      }
      if (lo < b.size && b(lo) == x) b // already present
      else {
        val nb = b.patch(lo, x :: Nil, 0)
        if (nb.size > k) nb.take(k) else nb
      }
    }

  def reduce(b: Seq[Long], x: Long): Seq[Long] = insert(b, x)

  /** Two-pointer merge of two sorted distinct buffers, keeping the k
    * smallest — O(k) per partial-aggregate merge (the foldLeft-of-inserts
    * form was O(k²)). */
  def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    var j = 0
    while (out.size < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (out.isEmpty || out.last != v) out += v // drop cross-buffer dups
    }
    out.toVector
  }
  def finish(r: Seq[Long]): Seq[Long] = r

  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
