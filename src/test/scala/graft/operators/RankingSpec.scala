package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "cat dog cat", "en", "s0", 11L),
    (1L, "dog fish", "en", "s0", 8L),
    (2L, "cat cat cat fish", "en", "s0", 15L),
    (3L, "bird", "en", "s0", 4L),
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("tfidf: rare terms outscore common ones, ranks are per-doc and capped") {
    val got = Ranking.tfidfTopTerms(docs, k = 2)
      .select("doc_id", "term", "tf", "df", "score", "rank")
      .as[(Long, String, Long, Long, Double, Long)].collect()
    // doc 0: cat tf=2 df=2 -> 2*ln(4/2)=1.3863; dog tf=1 df=2 -> ln(2)=0.6931
    val d0 = got.filter(_._1 == 0L).sortBy(_._6).map(r => (r._2, r._5)).toSeq
    assert(d0 == Seq(("cat", 1.3863), ("dog", 0.6931)))
    // bird: unique to doc 3 -> tf=1, df=1 -> ln(4) top-ranked
    assert(got.filter(_._1 == 3L).head._5 == 1.3863)
    assert(got.groupBy(_._1).forall(_._2.length <= 2))
  }

  test("bm25: more matched query terms and higher tf raise the score") {
    val scored = Ranking.bm25Scores(docs, Seq("cat", "fish"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc 3 has no query term at all -> absent
    assert(!scored.contains(3L))
    // doc 2 (cat tf=3 + fish) beats doc 0 (cat tf=2) and doc 1 (fish only)
    assert(scored(2L)._1 == 2L)
    assert(scored(2L)._2 > scored(0L)._2)
    assert(scored(2L)._2 > scored(1L)._2)
  }

  test("invertedIndex: df/total_tf exact, posting head sorted and capped") {
    val idx = Ranking.invertedIndex(docs, headK = 2)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(idx("cat") == ((2L, 5L, "0,2")))
    assert(idx("fish") == ((2L, 2L, "1,2")))
    assert(idx("bird") == ((1L, 1L, "3")))
    // head capped at 2 even when df exceeds it
    val many = (0L until 5L).map(i => (i, "x", "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val head = Ranking.invertedIndex(many, headK = 2)
      .select("postings_head").as[String].head()
    assert(head == "0,1")
  }
  test("pmiBigrams: collocated pairs score positive, independent pairs negative") {
    // "x y" always adjacent (perfect collocation); "a"/"b" mixed freely
    val docs = Seq(
      (1L, "x y a b a b x y", "en", "s0", 0L),
      (2L, "b a x y b a a b", "en", "s0", 0L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Ranking.pmiBigrams(docs, k = 30)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // x always precedes y: p(x,y) >> p(x)p(y)
    assert(got(("x", "y"))._2 > 1.0)
    // y never precedes x
    assert(!got.contains(("y", "x")))
    // top-k ordering is by count desc then lexical
    val ordered = Ranking.pmiBigrams(docs, k = 3)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(ordered.map(_._3).sorted.reverse == ordered.map(_._3))
  }
  test("unigramCrossEntropy: rare-token docs score higher than common-token docs") {
    val docs = Seq(
      (1L, "a a a a", "en", "s0", 0L),
      (2L, "a a a rare", "en", "s0", 0L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Ranking.unigramCrossEntropy(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // corpus: a x7, rare x1, N=8 -> -ln(7/8) vs mean with -ln(1/8)
    val a = -math.log(7.0 / 8)
    assert(got(1L)._3 == math.rint(a * 10000) / 10000)
    assert(got(2L)._3 > got(1L)._3)
    assert(got(1L)._2 == 4L && got(2L)._2 == 4L)
  }

  test("dsirWeights: docs written in the target distribution outscore off-target docs") {
    // target slice (lang=en) speaks 'ml data training'; the off-target
    // slice speaks 'cat dog bird' — a doc made of target-heavy tokens
    // must get a higher log-ratio than one made of off-target tokens
    val docs = Seq(
      (1L, "ml data training ml data", "en", "s0", 0L),
      (2L, "ml training data data ml", "en", "s0", 0L),
      (3L, "cat dog bird cat dog", "xx", "s0", 0L),
      (4L, "cat bird dog dog cat", "xx", "s0", 0L),
      (5L, "ml data cat", "xx", "s0", 0L) // mixed, written off-target
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val w = Ranking.dsirWeights(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w(1L) > w(3L) && w(2L) > w(4L))
    assert(w(5L) > w(3L) && w(5L) < w(1L)) // mixed doc lands between
  }

  test("vocabularyStats: ttr and hapax fraction match a hand computation") {
    val docs = Seq(
      (1L, "a b a c", "en", "s1", 0L),   // s1 tokens: a,b,a,c + d,d
      (2L, "d d", "en", "s1", 0L),
      (3L, "x y z", "en", "s2", 0L)      // s2: all hapax
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Ranking.vocabularyStats(docs)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // s1: 6 tokens, vocab {a,b,c,d}=4, hapax {b,c}=2
    assert(got("s1") == (("s1", 6L, 4L, 2L, 0.6667, 0.5)))
    assert(got("s2") == (("s2", 3L, 3L, 3L, 1.0, 1.0)))
  }

  test("tokenBurstiness: bursty vs uniform vs partial-presence VMR, topK cut pinned") {
    val docs = Seq(
      (0L, "the cat cat cat cat", "en", "s0", 0L),
      (1L, "the dog", "en", "s0", 0L),
      (2L, "the dog", "en", "s0", 0L),
      (3L, "the dog", "en", "s0", 0L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Ranking.tokenBurstiness(docs)
      .as[(String, Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    // cat: counts (4,0,0,0) -> mean 1, E[c^2] 4, var 3 -> VMR 3
    assert(got("cat") == (("cat", 1L, 4L, 1.0, 3.0)))
    // the: count 1 in every doc -> zero variance -> VMR 0 (uniform, NOT Poisson)
    assert(got("the") == (("the", 4L, 4L, 1.0, 0.0)))
    // dog: counts (0,1,1,1) -> mean .75, var .1875 -> VMR .25
    assert(got("dog") == (("dog", 3L, 3L, 0.75, 0.25)))
    // topK=2 keeps cat,the (total_tf 4 each; ties broken by term asc) and drops dog
    val capped = Ranking.tokenBurstiness(docs, topK = 2).select("term")
      .as[String].collect().toSet
    assert(capped == Set("cat", "the"))
  }

  test("textRank: symmetric pair is an exact fixed point; hubs outrank leaves") {
    // a↔b only: s = r_neighbor, so r' = 150000 + 85·10⁶/100 = 10⁶ exactly
    val sym = Seq((1L, "a b a b a b", "en", "s0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rs = Ranking.textRank(sym).select("term", "rank_scaled")
      .as[(String, Long)].collect().toMap
    assert(rs == Map("a" -> 1000000L, "b" -> 1000000L))
    // star graph: the hub receives both leaves' full rank, leaves split the hub's
    val star = Seq((1L, "a b", "en", "s0", 3L), (2L, "a c", "en", "s0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val st = Ranking.textRank(star).select("term", "rank_scaled")
      .as[(String, Long)].collect().toMap
    assert(st("a") > st("b") && st("b") == st("c"))
    // self-adjacency ("a a") never forms an edge; topK caps the node set
    val self = Seq((1L, "a a a b", "en", "s0", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Ranking.textRank(self, topK = 1).count() == 1)
  }

  test("vocabChurn: hand-computed smoothed log-ratios; top movers pinned by |drift|") {
    val docs = Seq(
      (0L, "x x y", "en", "s0", 5L),  // snapshot A (even ids)
      (1L, "x z z", "en", "s0", 5L),  // snapshot B
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Ranking.vocabChurn(docs, topK = 2)
      .as[(String, Long, Long, Double, String)].collect().map(r => r._1 -> r).toMap
    // z: ln((2+1)(3+1) / (0+1)(3+1)) = ln 3; y: ln((0+1)·4 / (1+1)·4) = −ln 2
    assert(got("z") == (("z", 0L, 2L, 1.0986, "rising")))
    assert(got("y") == (("y", 1L, 0L, -0.6931, "falling")))
    // x (|ln 2/3| = 0.4055) is the smallest mover and falls off the top-2
    assert(!got.contains("x"))
  }

  test("rrfFusion: hand-computed reciprocal-rank fusion of two rankings") {
    // part 1: qty-rank 1, rev-rank 3; part 2: qty 2, rev 1; part 3: qty 3, rev 2
    val li = Seq(
      (1L, 10.0, 0.01), (2L, 5.0, 0.03), (3L, 1.0, 0.02),
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    val got = Ranking.rrfFusion(li).as[(Long, Long, Long, Long)].collect().toSeq
    def rrf(a: Long, b: Long) = 1000000000L / (60 + a) + 1000000000L / (60 + b)
    // fused order: part 2 (1+2) > part 1 (1+3) > part 3 (3+2)
    assert(got == Seq(
      (2L, 2L, 1L, rrf(2, 1)),
      (1L, 1L, 3L, rrf(1, 3)),
      (3L, 3L, 2L, rrf(3, 2))))
  }

  test("wilsonSourceRanking: a 96/100 source outranks a perfect 3/3 source") {
    val docs = ((1 to 3).map(i => (i.toLong, "t", "en", "tiny", 400L)) ++
      (1 to 100).map(i => (100L + i, "t", "en", "big",
        if (i <= 96) 400L else 100L))).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Ranking.wilsonSourceRanking(docs).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Double]("wilson_lb"), x.getAs[Long]("rk"))).toMap
    // hand-computed: big → 0.901627, tiny → 0.438494 (z = 1.96)
    assert(math.abs(r("big")._1 - 0.901627) < 1e-4, s"big lb=${r("big")._1}")
    assert(math.abs(r("tiny")._1 - 0.438494) < 1e-4, s"tiny lb=${r("tiny")._1}")
    assert(r("big")._2 == 1L && r("tiny")._2 == 2L)
  }
}
