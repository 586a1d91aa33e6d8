package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorExprs

/** The native codegen expressions must be BIT-identical to the HOF fold
  * they replaced (same left-to-right double accumulation) and survive both
  * codegen and interpreted evaluation. */
class VectorExprsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (2L, Seq(0.1f, -0.2f, 0.3f), Seq(-0.4f, 0.5f, -0.6f)),
    (3L, Seq(1e-7f, 1e7f, -1e-7f), Seq(1e7f, 1e-7f, 1e7f)))

  test("graft_dot / graft_normsq match the HOF formulation bit-for-bit") {
    VectorExprs.ensureRegistered(spark)
    val df = vecs.toDF("id", "a", "b")
      .withColumn("ad", transform(col("a"), x => x.cast("double")))
      .withColumn("bd", transform(col("b"), x => x.cast("double")))
    val rows = df.select(
      VectorExprs.dot(col("ad"), col("bd")).as("native_dot"),
      aggregate(zip_with(col("ad"), col("bd"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof_dot"),
      VectorExprs.normSq(col("ad")).as("native_nsq"),
      aggregate(transform(col("ad"), x => x * x),
        lit(0.0), (acc, v) => acc + v).as("hof_nsq")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        === java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2))
        === java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("float arrays are accepted via implicit element cast (exact widening)") {
    VectorExprs.ensureRegistered(spark)
    val r = vecs.toDF("id", "a", "b")
      .select(VectorExprs.dot(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0))
    assert(r(0) === (1.0 * 4 + 2.0 * 5 + 3.0 * 6))
  }

  test("session extension registers the functions for plain SQL users") {
    // TestSpark sets spark.sql.extensions=graft.plans.GraftExtensions, so
    // the functions exist without any ensureRegistered call.
    val out = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(out.getDouble(0) === 11.0)
  }

  test("null handling: null array -> null, null elements skipped") {
    VectorExprs.ensureRegistered(spark)
    val df = Seq((Some(Seq(Some(1.0), None, Some(3.0))), Option.empty[Seq[Option[Double]]]))
      .toDF("a", "b")
    assert(df.select(VectorExprs.dot(col("a"), col("b"))).head().isNullAt(0))
    assert(df.select(VectorExprs.dot(col("a"), col("a"))).head().getDouble(0) === 10.0)
  }

  test("graft_winnow resolves via the session extension; bad args fail at build") {
    // wiring: available to plain spark.sql users without ensureRegistered
    // (the GraftExtensions injection the README documents)
    val out = spark.sql("SELECT graft_winnow('abab', 2, 2) AS p").head()
    // grams ab,ba,ab: 'ab'<'ba' selects pos 1; pos2 'ba' loses to window
    // {ab,ba}; pos3 'ab' == min of trailing {ba,ab} → selected
    assert(out.getSeq[Int](0) === Seq(1, 3))
    // validation: arity / non-literal / non-positive all fail with the
    // build-time message, not a late ClassCastException
    for (bad <- Seq(
        "SELECT graft_winnow('abc')",
        "SELECT graft_winnow('abc', 3L, 4)",
        "SELECT graft_winnow('abc', 3, 0)")) {
      val e = intercept[Exception](spark.sql(bad).head())
      assert(e.getMessage.contains("graft_winnow"), s"$bad: ${e.getMessage}")
    }
  }
}
