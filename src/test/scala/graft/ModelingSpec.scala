package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ModelingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))

  test("qualityOls recovers an exact linear relationship (r2 = 1)") {
    // Construct docs whose n_chars is EXACTLY 1 + 2*x1 + 3*x2 by
    // overriding n_chars; x1 = token count, x2 = distinct tokens.
    val base = Seq(
      (1L, "s", "a b"),        // x1=2 x2=2
      (2L, "s", "a a b"),      // x1=3 x2=2
      (3L, "s", "a b c d"),    // x1=4 x2=4
      (4L, "s", "a a a b c"),  // x1=5 x2=3
      (5L, "s", "x y z"))      // x1=3 x2=3
    val d = base.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("x1", size(split(col("text"), " ")).cast("long"))
      .withColumn("x2", size(array_distinct(split(col("text"), " "))).cast("long"))
      .withColumn("n_chars", lit(1L) + lit(2L) * col("x1") + lit(3L) * col("x2"))
      .drop("x1", "x2")
    val r = operators.Modeling.qualityOls(d).collect()
    assert(r.length == 1)
    val Row(n: Long, b0: Double, b1: Double, b2: Double, r2: Double) = r(0)
    assert(n == 5L)
    assert(b0 == 1.0 && b1 == 2.0 && b2 == 3.0, s"got ($b0, $b1, $b2)")
    assert(r2 == 1.0)
  }

  test("bigramSurprisal matches hand-computed add-one smoothed LM") {
    // corpus: s1 has "a b" twice, s2 has "a c" once.
    // c(a,b)=2 c(a,c)=1 c(a.)=3 V=|{b,c}|=2
    // s1: -ln((2+1)/(3+2)) = -ln(0.6) = 0.510825...  -> floor micro 510825
    // s2: -ln((1+1)/(3+2)) = -ln(0.4) = 0.916290...  -> floor micro 916290 -> 0.9163
    val d = docs((1L, "s1", "a b"), (2L, "s1", "a b"), (3L, "s2", "a c"))
    val rows = operators.Modeling.bigramSurprisal(d).collect()
    val bySrc = rows.map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(bySrc("s1") == ((2L, 0.5108)), s"got ${bySrc("s1")}")
    assert(bySrc("s2") == ((1L, 0.9163)), s"got ${bySrc("s2")}")
  }

  test("bpeMerges replays the classic hand-worked BPE example") {
    // Sennrich-style fixture: low x5, lower x2, newest x6, widest x3.
    // Pair counts round 1: (e,s)=9, (s,t)=9, (w,e)=8 ... argmax tie
    // (e,s) vs (s,t) breaks lexicographically -> (e,s) merged first,
    // then (es,t)=9, then (est's precursors)...
    val freqs = Seq(("low", 5), ("lower", 2), ("newest", 6), ("widest", 3))
    val d = docs(freqs.zipWithIndex.flatMap { case ((w, f), wi) =>
      (1 to f).map(k => ((wi * 10 + k).toLong, "s", w))
    }: _*)
    val merges = operators.Modeling.bpeMerges(d, rounds = 3)
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getLong(4)))
    assert(merges(0) == ((1, "e", "s", 9L)), s"got ${merges(0)}")
    assert(merges(1) == ((2, "es", "t", 9L)), s"got ${merges(1)}")
    // round 3: (l,o) appears in low+lower = 7; (w,est)=6? no: newest has
    // (w,est) 6 + widest (d,est) 3; (l,o)=7 wins
    assert(merges(2) == ((3, "l", "o", 7L)), s"got ${merges(2)}")
  }

  test("bpeMerges: merged tokens keep merging greedily (aaaa learns aa then aaaa)") {
    val d = docs((1L, "s", Seq.fill(10)("aaaa").mkString(" ")))
    val merges = operators.Modeling.bpeMerges(d, rounds = 2)
      .collect().map(x => (x.getString(1), x.getString(2), x.getString(3)))
    assert(merges(0) == (("a", "a", "aa")))
    assert(merges(1) == (("aa", "aa", "aaaa")),
      s"greedy left-to-right pairing after merge: ${merges.toSeq}")
  }

  test("bigramSurprisal: repeated corpus is less surprising than novel text") {
    val boiler = (1L to 20L).map(i => (i, "common", "the quick brown fox jumps"))
    val novel = Seq((21L, "rare", "zebra quantum flux harmonics glows"))
    val d = docs((boiler ++ novel): _*)
    val bySrc = operators.Modeling.bigramSurprisal(d)
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(bySrc("common") < bySrc("rare"),
      s"boilerplate should score lower surprisal: $bySrc")
  }
}
