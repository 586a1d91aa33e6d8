package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Winnow

/** The monotonic-deque winnow must equal an INDEPENDENT naive reference
  * (per-position trailing-window min over code points — the definition the
  * DuckDB oracle runs) on arbitrary input. Random small alphabets make
  * equal-gram ties routine (the rule a deque bug would break), and
  * supplementary-plane characters pin the code-point contract. */
class WinnowSpec extends AnyFunSuite {

  /** Naive O(n·w·n) reference: position i (1-based) is selected iff its
    * n-gram equals the min gram of the trailing w-position window,
    * compared lexicographically over code points. */
  private def reference(s: String, n: Int, w: Int): Seq[Int] = {
    val cps = s.codePoints().toArray
    val grams = cps.length - n + 1
    def cmp(a: Int, b: Int): Int = {
      var k = 0
      while (k < n) {
        val d = Integer.compare(cps(a + k), cps(b + k))
        if (d != 0) return d
        k += 1
      }
      0
    }
    (0 until grams).filter { g =>
      val lo = math.max(0, g - w + 1)
      (lo to g).forall(j => cmp(g, j) <= 0)
    }.map(_ + 1)
  }

  private def native(s: String, n: Int, w: Int): Seq[Int] =
    Winnow.selected(UTF8String.fromString(s), n, w)
      .toIntArray().toSeq

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("deque selection == naive reference on tie-heavy random text") {
    val gen = for {
      alphabet <- Gen.oneOf("ab", "abcd", "a😀b", "xyz01")
      len <- Gen.choose(0, 160)
      cs <- Gen.listOfN(len, Gen.oneOf(alphabet.codePoints().toArray.toSeq))
      n <- Gen.choose(1, 4)
      w <- Gen.choose(1, 6)
    } yield (new String(cs.toArray, 0, cs.length), n, w)
    check(Prop.forAll(gen) { case (s, n, w) =>
      native(s, n, w) == reference(s, n, w)
    })
  }

  test("edges: empty, shorter than n, constant text, w = 1") {
    assert(native("", 3, 4) === Seq.empty)
    assert(native("ab", 3, 4) === Seq.empty)
    // constant text: every gram equal → every position selected
    assert(native("aaaaaa", 2, 3) === (1 to 5))
    // w = 1: window is the gram itself → every position selected
    assert(native("zyxw", 2, 1) === (1 to 3))
  }
}
