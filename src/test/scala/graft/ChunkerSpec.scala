package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Chunker

/** The rolling-hash chunker must equal an INDEPENDENT per-window recompute
  * (the O(n·W) definition the DuckDB oracle uses) on arbitrary unicode
  * input — the rolling eviction term is the part a bug would hide in. */
class ChunkerSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: recompute each window's Horner fold from scratch. */
  private def reference(s: String): Seq[Int] = {
    val cps = s.codePoints().toArray
    (Chunker.Window - 1 until cps.length).filter { i =>
      var h = 0L
      var j = i - Chunker.Window + 1
      while (j <= i) { h = (h * Chunker.Base + cps(j)) % Chunker.Prime; j += 1 }
      h % Chunker.BoundaryMod == 0L
    }
  }

  private val samples = Seq(
    "", "short", "exactly sixteen!",
    "the quick brown fox jumps over the lazy dog " * 20,
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // constant content
    "中文内容也必须正确分块，窗口按码点计数而不是字节。" * 8, // BMP multibyte
    "emoji 😀 mixes surrogate pairs 🚀 into the stream " * 6,
    (0 until 500).map(i => ('a' + i % 26).toChar).mkString)

  test("rolling boundaries == independent per-window recompute (unicode-safe)") {
    Chunker.ensureRegistered(spark)
    val got = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
      .select(col("id"), Chunker.chunkBoundaries(col("text")).as("bs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) === reference(s), s"sample $i")
    }
  }

  test("property: rolling == recompute on random unicode strings") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val cpGen = Gen.frequency(
      (8, Gen.choose(32, 126)), // ASCII
      (2, Gen.choose(0x4e00, 0x4fff)), // CJK (BMP multibyte)
      (1, Gen.const(0x1f600)), // emoji (surrogate pair)
      (1, Gen.choose(0, 0x10)), // control chars
    )
    val strGen = Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, cpGen).map(cps =>
        new String(cps.toArray, 0, cps.length)))
    val prop = Prop.forAll(strGen) { s =>
      val got = Chunker.boundaries(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (0 until got.numElements()).map(got.getInt) == reference(s)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("boundary density is ~1/BoundaryMod on long mixed text") {
    val long = (0 until 20000)
      .map(i => ('a' + math.floorMod(scala.util.hashing.byteswap32(i), 26)).toChar)
      .mkString
    val bs = reference(long)
    val positions = 20000 - Chunker.Window + 1
    val expected = positions.toDouble / Chunker.BoundaryMod
    assert(bs.size > expected / 3 && bs.size < expected * 3,
      s"${bs.size} boundaries vs ~$expected expected")
  }
}
