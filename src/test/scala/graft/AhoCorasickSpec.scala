package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.AhoCorasick
import graft.functions.Sentiment

/** The Aho-Corasick count must equal Σ contains(text, wᵢ) (each entry ≤ 1) —
  * fuzzed over a small alphabet (maximizes overlapping/nested patterns, the
  * cases failure links exist for), plus the Column-level equivalence with the
  * unrolled-contains form on real documents. */
class AhoCorasickSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def naive(text: String, lex: Seq[String]): Int =
    lex.count(text.contains(_))

  test("automaton count equals naive contains-count on fuzzed inputs") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    def randStr(n: Int): String =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 300).foreach { _ =>
      val lex = (0 until 1 + rnd.nextInt(8)).map(_ => randStr(1 + rnd.nextInt(4)))
      val text = randStr(rnd.nextInt(40))
      val ac = new AhoCorasick(lex.map(_.getBytes("UTF-8")).toArray)
      assert(ac.countContained(text.getBytes("UTF-8")) === naive(text, lex),
        s"text='$text' lex=$lex")
    }
  }

  test("duplicate entries, empty patterns, and non-ASCII are handled") {
    val lex = Seq("ab", "ab", "", "é", "naïve")
    val ac = new AhoCorasick(lex.map(_.getBytes("UTF-8")).toArray)
    // "" always matches; duplicates count once each (two entries)
    assert(ac.countContained("xaby".getBytes("UTF-8")) === 3)
    assert(ac.countContained("".getBytes("UTF-8")) === 1)
    assert(ac.countContained("a naïve résumé".getBytes("UTF-8")) === 3) // "", naïve, é (in résumé)
    assert(ac.countContained("café".getBytes("UTF-8")) === 2) // "", é
  }

  test("q_keyword_count_ac equals the unrolled-contains q_keyword_count") {
    val sfDir = "/root/testdata/sf0.001"
    val ac = SparkEntry.queries("q_keyword_count_ac")(spark, sfDir).collect()
    val unrolled = SparkEntry.queries("q_keyword_count")(spark, sfDir).collect()
    assert(ac.nonEmpty && ac.toSeq == unrolled.toSeq)
    // sanity: the harness lexicon actually fires on the corpus
    assert(ac.exists(r => r.getInt(1) > 0 || r.getInt(2) > 0))
  }

  test("nested/overlapping patterns resolve through failure links") {
    val lex = Seq("she", "he", "hers", "his", "h")
    val ac = new AhoCorasick(lex.map(_.getBytes("UTF-8")).toArray)
    assert(ac.countContained("ushers".getBytes("UTF-8")) ===
      naive("ushers", lex)) // she, he, hers, h = 4
    assert(naive("ushers", lex) === 4)
  }

  test("lexicon words are the Sentiment defaults' scale twin") {
    val lex = Sentiment.Default.positive ++ Sentiment.Default.negative
    val ac = new AhoCorasick(lex.map(_.getBytes("UTF-8")).toArray)
    val t = "a fast merge beats a slow crash"
    assert(ac.countContained(t.getBytes("UTF-8")) === naive(t, lex))
  }
}
