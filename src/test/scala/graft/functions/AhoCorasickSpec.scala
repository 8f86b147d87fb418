package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MultiPatternCounts: hand-worked overlap semantics, randomized parity
  * against a brute-force position scan, and the DataFrame (codegen)
  * path agreeing with direct automaton calls.
  */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def brute(text: String, pat: String): Long =
    (0 to text.length - pat.length).count(i => text.startsWith(pat, i)).toLong

  test("overlapping occurrences all count ('aaa' x 'aa' = 2)") {
    val ac = MultiPatternCounts.automatonFor(Seq("aa", "a", "aaa"))
    val counts = new Array[Long](3)
    ac.countInto("aaa".getBytes("UTF-8"), counts)
    assert(counts.toSeq == Seq(2L, 3L, 1L))
  }

  test("patterns sharing prefixes and suffixes resolve via fail links") {
    val pats = Seq("he", "she", "his", "hers")
    val ac = MultiPatternCounts.automatonFor(pats)
    val counts = new Array[Long](4)
    ac.countInto("ushers".getBytes("UTF-8"), counts)   // the classic AC example
    assert(counts.toSeq == Seq(1L, 1L, 0L, 1L))        // he, she, hers
  }

  test("randomized parity with brute-force position counting") {
    val rnd = new scala.util.Random(42)
    val pats = Seq("ab", "ba", "aab", "bbb", "abab")
    val ac = MultiPatternCounts.automatonFor(pats)
    (1 to 50).foreach { _ =>
      val s = Array.fill(rnd.nextInt(80) + 1)(if (rnd.nextBoolean()) 'a' else 'b').mkString
      val counts = new Array[Long](pats.length)
      ac.countInto(s.getBytes("UTF-8"), counts)
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(counts(i) == brute(s, p), s"text=$s pat=$p")
      }
    }
  }

  test("DataFrame codegen path matches direct automaton evaluation") {
    val pats = Seq("spark", "par", "ark k")
    val docs = Seq("spark spark kernel", "no match here", "parka park kit")
      .toDF("text")
    val viaDf = docs.select(
        MultiPatternCounts.counts(col("text"), pats).as("c"))
      .as[Seq[Long]].collect().toSeq
    val direct = Seq("spark spark kernel", "no match here", "parka park kit").map { t =>
      val counts = new Array[Long](pats.length)
      MultiPatternCounts.automatonFor(pats).countInto(t.getBytes("UTF-8"), counts)
      counts.toSeq
    }
    assert(viaDf == direct)
    assert(viaDf.head == Seq(2L, 2L, 1L)) // "ark k" spans the word boundary
  }
}
