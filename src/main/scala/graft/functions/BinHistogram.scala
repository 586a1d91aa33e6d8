package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Fixed-boundary bin histogram as a typed Spark `Aggregator` — the
  * approx-quantile sketch companion to [[KmvSketch]].
  *
  * State = `bins` counters over a fixed value domain (the caller maps value →
  * bin index; out-of-domain values clamp into the end bins). Counter addition
  * is commutative and associative, so the sketch is order- and
  * partition-independent — like KMV, that determinism is what lets a DuckDB
  * oracle reproduce the "approximate" answer bit for bit (the bins are fixed
  * up front, so both engines count the same cells exactly).
  *
  * Scale: O(bins) state per group regardless of input size, merged
  * elementwise — partial aggregation ships one small long array per (group,
  * partition), and a quantile query over the finished sketch touches `bins`
  * rows, not the data. Error bound: a quantile read off the sketch is the
  * lower boundary of the bin holding the true rank, so it sits within one
  * bin width of the exact discrete quantile (StatsSpec asserts this against
  * the exact path).
  */
class BinHistogram(val bins: Int) extends Aggregator[Int, Array[Long], Seq[Long]] {
  def zero: Array[Long] = new Array[Long](bins)

  def reduce(b: Array[Long], bin: Int): Array[Long] = {
    b(bin) += 1L
    b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { a(i) += b(i); i += 1 }
    a
  }

  def finish(r: Array[Long]): Seq[Long] = r.toVector

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
