package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Aggregates, TextAnalysis}

/** Algebraic identities for the set-op / pivot / cube reports. */
class AggOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("grouping sets: exactly the declared levels, and subtotals re-add") {
    val rows = Aggregates.groupingSetsQ(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // no (day)-only marginal: a '(all)' type row must be the grand total
    assert(rows.filter(_._1 == "(all)").forall(_._2 == "(all)"))
    val grand = rows.filter(r => r._1 == "(all)" && r._2 == "(all)")
    assert(grand.length == 1)
    val detail = rows.filter(r => r._1 != "(all)" && r._2 != "(all)")
    val perType = rows.filter(r => r._1 != "(all)" && r._2 == "(all)")
    // detail rows re-aggregate to the per-type level, per-type to grand
    assert(detail.map(_._3).sum == grand.head._3)
    assert(perType.map(_._3).sum == grand.head._3)
    assert(detail.map(_._4).sum == grand.head._4)
    detail.groupBy(_._1).foreach { case (t, rs) =>
      val pt = perType.find(_._1 == t).get
      assert(rs.map(_._3).sum == pt._3 && rs.map(_._4).sum == pt._4)
    }
  }

  test("inclusion-exclusion: |A union B| = |A| + |B| - |A intersect B|") {
    val o = graft.engine.Tables.orders(spark, sfDir)
    val a = o.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .select("o_custkey").distinct().count()
    val b = o.filter(col("o_orderstatus") === "F")
      .select("o_custkey").distinct().count()
    val m = Aggregates.setOpsQ(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("union") === a + b - m("intersect"))
    assert(m("except") === a - m("intersect"))
  }

  test("pivot row sums equal the per-priority order counts") {
    val o = graft.engine.Tables.orders(spark, sfDir)
    val direct = o.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Aggregates.pivotQ(spark, sfDir).collect().foreach { r =>
      val rowSum = (1 to 3).map(r.getLong).sum
      assert(rowSum === direct(r.getString(0)), s"row ${r.getString(0)}")
    }
  }

  test("cube contains the rollup sets plus the source-only slice") {
    val cube = TextAnalysis.cubeTextQ(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val rollup = TextAnalysis.rollupTextQ(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // every rollup cell appears identically in the cube
    rollup.foreach { case (k, v) => assert(cube.get(k).contains(v), s"cell $k") }
    // the cube's extra cells are exactly the (all, source) slice
    val extra = cube.keySet -- rollup.keySet
    assert(extra.nonEmpty && extra.forall { case (l, s) => l == "(all)" && s != "(all)" })
    // grand total consistent
    val total = cube(("(all)", "(all)"))._1
    assert(total === graft.engine.Tables.documents(spark, sfDir).count())
  }
  test("itemsets3: Apriori property holds — every reported triple's sub-pairs are frequent") {
    val sfDir = "/root/testdata/sf0.001"
    val spark2 = TestSpark.spark
    val tri = Aggregates.itemsets3Q(spark2, sfDir).collect()
    assert(tri.nonEmpty, "no frequent triples at sf0.001")
    // recompute L2 support directly and check every sub-pair clears the gate
    val ob = graft.engine.Tables.lineitem(spark2, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p_partkey"))
      .join(graft.engine.Tables.part(spark2, sfDir)
        .select(col("p_partkey"), col("p_brand")), Seq("p_partkey"))
      .select(col("ok"), col("p_brand").as("b")).distinct()
    val baskets = ob.collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }
    val nOrders = baskets.size
    def support(items: Set[String]): Long =
      baskets.count { case (_, bs) => items.subsetOf(bs) }.toLong
    tri.foreach { r =>
      val (a, b, c) = (r.getString(0), r.getString(1), r.getString(2))
      // ordering canonical
      assert(a < b && b < c, s"triple not canonical: ($a,$b,$c)")
      // reported support is the true triple support
      assert(r.getLong(3) === support(Set(a, b, c)), s"support of ($a,$b,$c)")
      // Apriori: each sub-pair at least as frequent as the triple, and frequent
      Seq(Set(a, b), Set(a, c), Set(b, c)).foreach { pair =>
        assert(support(pair) >= r.getLong(3))
        assert(support(pair) * 1000 >= nOrders * Aggregates.Itemset3MinPermille)
      }
    }
  }

  test("q_itemcf: neighbor lists are top-k, self-free, and cooc-symmetric") {
    val rows = Aggregates.itemcfQ(spark, sfDir).collect()
    val byBrand = rows.groupBy(_.getString(0))
    byBrand.foreach { case (brand, rs) =>
      assert(rs.length <= Aggregates.ItemCfTopK, s"$brand over k")
      assert(rs.map(_.getLong(1)).sorted.toSeq ===
        (1L to rs.length).toSeq, s"$brand ranks not dense")
      // ranked by (jaccard desc, neighbor asc), never self, valid jaccard
      val ord = rs.sortBy(_.getLong(1))
        .map(r => (-r.getLong(4), r.getString(2)))
      assert(ord.sameElements(ord.sorted), s"$brand rank order broken")
      rs.foreach { r =>
        assert(r.getString(2) !== brand, s"$brand lists itself")
        assert(r.getLong(4) > 0 && r.getLong(4) <= 1000000L)
      }
    }
    // co-occurrence is symmetric wherever both directions survived top-k
    val cooc = rows.map(r => (r.getString(0), r.getString(2)) -> r.getLong(3))
      .toMap
    cooc.foreach { case ((a, b), n) =>
      cooc.get((b, a)).foreach(m => assert(m === n, s"cooc($a,$b) asym"))
    }
  }

  test("q_assoc_rules: confidence is a probability, support nests, lift is direction-free") {
    val rules = Aggregates.assocRulesQ(spark, sfDir).collect()
    assert(rules.length === Aggregates.RulesTopK)
    rules.foreach { r =>
      val (ab, a, conf) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ab <= a, "supp(AB) > supp(A)")
      assert(conf === ab * 1000 / a && conf <= 1000)
      assert(r.getString(0) !== r.getString(1))
    }
    // where both directions survived the top-k: same joint support,
    // same lift (lift is symmetric; confidence is the directional part)
    val byPair = rules.map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(5)))
      .toMap
    byPair.foreach { case ((a, b), (ab, lift)) =>
      byPair.get((b, a)).foreach { case (ab2, lift2) =>
        assert(ab === ab2 && lift === lift2, s"($a,$b) direction leak")
      }
    }
  }
}
