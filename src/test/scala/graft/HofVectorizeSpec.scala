package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HofVectorize optimizer rule must (1) rewrite the canonical HOF
  * dot/normsq spellings into the native codegen expressions, (2) leave
  * near-miss shapes untouched, and (3) never change a bit of the result. */
class HofVectorizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._ // (toDS helpers elsewhere)

  // containsNull=false double arrays over a Range relation (a local Seq
  // would constant-fold into a LocalRelation before the plan is visible)
  private def vecs = spark.range(3).select(col("id"),
    array((col("id") + 1).cast("double"), (col("id") * 2).cast("double"),
      lit(3.25), lit(1e-7)).as("a"),
    array(lit(0.5), (col("id") + 4).cast("double"), lit(-1.0),
      lit(1e7)).as("b"))

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y),
    lit(0.0), (acc, v) => acc + v)

  private def hofNormSq = aggregate(
    transform(col("a"), x => x * x),
    lit(0.0), (acc, v) => acc + v)

  test("HOF dot and normsq rewrite to the native expressions") {
    val opt = vecs.select(hofDot.as("d"), hofNormSq.as("n"))
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_dot"), s"dot not vectorized:\n$opt")
    assert(opt.contains("graft_normsq"), s"normsq not vectorized:\n$opt")
    assert(!opt.contains("aggregate("), s"HOF survived the rewrite:\n$opt")
  }

  test("rewrite is bit-identical to the interpreted HOF") {
    // interpreted reference computed WITHOUT the rule: sum via explode,
    // same left-to-right fold order enforced by a posexplode sort is not
    // needed — compare against the native call directly instead
    val rows = vecs.select(
      hofDot.as("d"),
      graft.functions.VectorExprs.dot(col("a"), col("b")).as("nd"),
      hofNormSq.as("nsq"),
      graft.functions.VectorExprs.normSq(col("a")).as("nnsq")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("L2-distance HOF rewrites to graft_l2sq, bit-identical") {
    val hofL2 = aggregate(
      zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
    val opt = vecs.select(hofL2.as("d"))
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_l2sq"), s"l2sq not vectorized:\n$opt")
    val rows = vecs.select(hofL2.as("hof"),
      graft.functions.VectorExprs.l2DistSq(col("a"), col("b")).as("native"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("jagged (unequal-length) arrays: native matches the HOF's NULL") {
    // zip_with null-pads the shorter array, so the HOF fold returns NULL;
    // DotProduct must return NULL too — not a truncated partial sum.
    val jagged = spark.range(3).select(col("id"),
      array((col("id") + 1).cast("double"), lit(2.0), lit(3.0)).as("a"),
      array(lit(0.5), (col("id") + 4).cast("double")).as("b"))
    val rows = jagged.select(
      hofDot.as("hof"),
      graft.functions.VectorExprs.dot(col("a"), col("b")).as("native")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0), "HOF over jagged arrays should be NULL")
      assert(r.isNullAt(1), "native dot over jagged arrays should be NULL")
    }
  }

  test("near-miss shapes are left alone") {
    // wrong seed (1.0), subtraction merge, and a sum-of-elements (no
    // product) must all stay HOFs
    val opt = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(1.0), (acc, v) => acc + v).as("wrong_seed"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc - v).as("wrong_merge"),
      aggregate(col("a"), lit(0.0), (acc, v) => acc + v).as("plain_sum"))
      .queryExecution.optimizedPlan.toString
    assert(!opt.contains("graft_dot"), s"near-miss was rewritten:\n$opt")
  }
}
