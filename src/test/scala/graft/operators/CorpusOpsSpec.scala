package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("two-phase shard packing equals the naive single-window running sum") {
    // SPARSE ids (i*1000+7): block assignment must not depend on id
    // magnitude, only on range order
    val docs = (0L until 137L).map(i => (i * 1000 + 7, Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val twoPhase = CorpusOps.shardPacking(docs, budgetTokens = 40L, blocks = 5)
      .as[(Long, Long, Long)].collect().toSeq
    val naive = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("toks"))
      .withColumn("cum", sum(col("toks")).over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("shard", expr("(cum - toks) div 40"))
      .groupBy("shard").agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("total_tokens"))
      .orderBy("shard").as[(Long, Long, Long)].collect().toSeq
    assert(twoPhase == naive)
  }

  test("sourceOverlapMatrix: identical sources hit jaccard 1, disjoint pairs are absent") {
    val docs = Seq(
      (1L, "a b c d e", "s1", "en", 9L),
      (2L, "a b c d e", "s2", "en", 9L), // exact copy of s1's shingles
      (3L, "x y z w v", "s3", "en", 9L)) // disjoint
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val got = CorpusOps.sourceOverlapMatrix(docs)
      .select("source_a", "source_b", "jaccard")
      .as[(String, String, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("s1", "s2")) == 1.0)
    assert(!got.contains(("s1", "s3")) && !got.contains(("s2", "s3")))
  }

  test("quasiIdentifierAudit flags exactly the sub-k buckets") {
    val docs = Seq(
      // (lang en, s1, band 1) has 2 docs -> safe at k=2
      (1L, "t", "en", "s1", 150L), (2L, "t", "en", "s1", 199L),
      // (en, s1, band 3) and (en, s2, band 1) are singletons -> risky
      (3L, "t", "en", "s1", 350L), (4L, "t", "en", "s2", 150L),
      // fr: one bucket of 3 -> nothing risky
      (5L, "t", "fr", "s1", 10L), (6L, "t", "fr", "s1", 20L), (7L, "t", "fr", "s1", 99L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusOps.quasiIdentifierAudit(docs)
      .select("lang", "n_docs", "n_buckets", "n_risky_docs", "n_risky_buckets", "risky_frac")
      .as[(String, Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("en") == (("en", 4L, 3L, 2L, 2L, 0.5)))
    assert(got("fr") == (("fr", 3L, 1L, 0L, 0L, 0.0)))
  }

  test("stratifiedSample takes exactly ceil(n*frac) per stratum, deterministically") {
    val docs = graft.Tables(spark, sf("")).documents
    val perGroup = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val got = CorpusOps.stratifiedSample(docs, frac = 0.25)
      .select("lang", "doc_id").as[(String, Long)].collect()
    val sampledBy = got.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    perGroup.foreach { case (lang, n) =>
      assert(sampledBy.getOrElse(lang, 0L) == math.ceil(n * 0.25).toLong, s"lang $lang")
    }
    // repartitioning the input cannot change the selected set
    val again = CorpusOps.stratifiedSample(docs.repartition(17), frac = 0.25)
      .select("lang", "doc_id").as[(String, Long)].collect()
    assert(got.toSet == again.toSet)
  }

  test("hash sampling is deterministic and respects BOTH mixture branches") {
    // src0 is length 4 (~50% branch); src10 is length 5 (~25% branch)
    val docs = (0L until 2000L).map(i => (i, if (i % 2 == 0) "src0" else "src10", "text"))
      .toDF("doc_id", "source", "n/a").withColumnRenamed("n/a", "text")
    val a = CorpusOps.hashSampled(docs).select("doc_id").as[Long].collect().toSet
    val b = CorpusOps.hashSampled(docs.repartition(13)).select("doc_id").as[Long].collect().toSet
    assert(a == b) // partitioning-independent membership
    val bySource = CorpusOps.sampleReport(docs)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._3.toDouble / r._2)).toMap
    assert(bySource("src0") > 0.4 && bySource("src0") < 0.6)
    assert(bySource("src10") > 0.15 && bySource("src10") < 0.35)
  }
  test("mixtureWeights: alpha<1 upweights small sources, weights sum to 1") {
    val docs = ((0L until 900L).map(i => (i, "w w w w", "en", "big")) ++
                (900L until 1000L).map(i => (i, "w w w w", "en", "small")))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.mixtureWeights(docs)
      .select("source", "n_tokens", "weight").as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("big")._1 == 3600L && got("small")._1 == 400L)
    // proportional sampling would give small 0.1; temperature 0.5 gives sqrt(400)/80 = 0.25
    assert(got("small")._2 == 0.25)
    assert(math.abs(got("big")._2 + got("small")._2 - 1.0) < 1e-4)
    // alpha=1 recovers exact proportionality
    val prop = CorpusOps.mixtureWeights(docs, alpha = 1.0)
      .select("source", "weight").as[(String, Double)].collect().toMap
    assert(prop("small") == 0.1)
  }
  test("chunkWithOverlap covers every token with clamped tails") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" "), "en", "s0"), // 10 words
      (2L, "a b c", "en", "s0"),                                  // n <= window
    ).toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.chunkWithOverlap(docs, window = 4, stride = 3)
      .as[(Long, Long, String, Long)].collect()
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq == Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(d1.map(_._4).toSeq == Seq(4L, 4L, 4L))
    val d2 = got.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._3 == "a b c" && d2.head._4 == 3L)
    // every source token appears in some chunk (coverage, no gaps)
    val covered = d1.flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"w$i").toSet)
  }

  test("epochPlan: hand-computed assignments, epoch ratios, and the repetition cap") {
    // s1: 4 tokens, s2: 16 -> weights 2/6 and 4/6 (rounded 6dp)
    val docs = Seq(
      (1L, "a b c d", "en", "s1"),
      (2L, (1 to 16).map(_ => "w").mkString(" "), "en", "s2"),
    ).toDF("doc_id", "text", "lang", "source")
    val got = CorpusOps.epochPlan(docs, budget = 90L, maxEpochs = 4.0)
      .as[(String, Long, Long, Double, Long, Double, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    // s1: floor(90·0.333333 + ½) = 30 -> 7.5 epochs, capped at 4·4 = 16
    assert(got("s1") == (("s1", 1L, 4L, 0.333333, 30L, 7.5, true, 16L)))
    // s2: floor(90·0.666667 + ½) = 60 -> 3.75 epochs, under the cap
    assert(got("s2") == (("s2", 1L, 16L, 0.666667, 60L, 3.75, false, 60L)))
  }

  test("lengthDriftKs: hand-computed two-sample KS against the corpus ECDF") {
    val docs = Seq(
      (1L, "t", "en", "a", 1L), (2L, "t", "en", "a", 2L), // a: values {1,2}
      (3L, "t", "en", "b", 100L),                          // b: far right
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusOps.lengthDriftKs(docs)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // a: max at v=2 -> |1·3 − 2·2| = 2 over 2·3 -> D = 1/3
    assert(got("a") == (("a", 2L, 2L, 0.3333)))
    // b: max at v=2 -> |0·3 − 2·1| = 2 over 1·3 -> D = 2/3
    assert(got("b") == (("b", 1L, 2L, 0.6667)))
    // a single source IS the corpus -> D = 0 exactly
    val mono = docs.filter(col("source") === "a")
    assert(CorpusOps.lengthDriftKs(mono)
      .select("ks_d").as[Double].collect().toSeq == Seq(0.0))
  }
  test("sourceConcentration: hand-computed HHI/Gini on known counts") {
    // counts a:1 b:3 -> N=4. HHI = (1+9)/16 = .625. Ascending (1,3):
    // gini = 2*(1*1+2*3)/(2*4) - 3/2 = 14/8 - 1.5 = 0.25. top1 = .75
    val docs = (Seq.fill(1)("a") ++ Seq.fill(3)("b")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val got = CorpusOps.sourceConcentration(docs)
      .as[(Long, Long, Double, Double, Double)].head()
    assert(got == ((2L, 4L, 0.625, 0.25, 0.75)))
  }

  test("sourceConcentration: uniform sources -> gini 0, hhi 1/n") {
    val docs = (0L until 40L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val got = CorpusOps.sourceConcentration(docs)
      .as[(Long, Long, Double, Double, Double)].head()
    assert(got == ((4L, 40L, 0.25, 0.0, 0.25)))
  }

  test("bootstrapMeanCI: deterministic, ordered, and centered") {
    val docs = (1L to 400L).map(i => (i, 100L + (i % 50))).toDF("doc_id", "n_chars")
    val a = CorpusOps.bootstrapMeanCI(docs).as[(Long, Double, Double, Double)].head()
    val b = CorpusOps.bootstrapMeanCI(docs).as[(Long, Double, Double, Double)].head()
    assert(a == b)                       // hash replicates: no RNG anywhere
    assert(a._1 == 400L)
    assert(a._3 <= a._2 && a._2 <= a._4) // lo <= point <= hi on a benign fixture
    assert(a._4 - a._3 < 10)             // half-samples of n=400: tight interval
  }

  test("lDiversityAudit: single-user bucket fails l, diverse bucket passes") {
    import org.apache.spark.sql.functions.{col, lit, timestamp_micros}
    // bucket A (view, band 0, dow 0): 3 events, all user 1 -> n_users 1, fails l=3
    // bucket B (click, band 1, dow 0): 3 events, users 1/2/3 -> passes
    val ev = Seq(
      (1L, 1L, 10.0, "view"), (2L, 1L, 11.0, "view"), (3L, 1L, 12.0, "view"),
      (4L, 1L, 60.0, "click"), (5L, 2L, 61.0, "click"), (6L, 3L, 62.0, "click"))
      .toDF("event_id", "user_id", "value", "event_type")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(lit(0L)).as("ts"), col("value"), col("event_type"),
        lit("{}").as("props"))
    val r = CorpusOps.lDiversityAudit(ev)
      .collect().map(x => (x.getString(0), x.getInt(1)) ->
        (x.getLong(3), x.getLong(4), x.getBoolean(5))).toMap
    assert(r(("view", 0)) == ((3L, 1L, false)))
    assert(r(("click", 1)) == ((3L, 3L, true)))
  }

  test("weightedSample: exact per-source k, weight-tilted selection, partition-stable") {
    import org.apache.spark.sql.functions.col
    // one source, 200 docs: ids 0-99 weight 10, ids 100-199 weight 10000.
    // A-ES with such a weight gap must pick (almost surely all) heavy ids.
    val docs = (0L until 200L).map(i =>
      (i, "t", "en", "s", if (i < 100) 10L else 10000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val picked = CorpusOps.weightedSample(docs, k = 5)
      .select("doc_id").as[Long].collect().toSeq
    assert(picked.length == 5)
    assert(picked.forall(_ >= 100L), s"light docs won against 1000x weights: $picked")
    val again = CorpusOps.weightedSample(docs.repartition(7), k = 5)
      .select("doc_id").as[Long].collect().toSeq
    assert(picked == again)
  }

  test("weightedSample: equal weights reduce to plain hash-order sampling per source") {
    val docs = (0L until 50L).map(i => (i, "t", "en", if (i % 2 == 0) "a" else "b", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = CorpusOps.weightedSample(docs, k = 3).collect()
    assert(r.count(_.getString(0) == "a") == 3)
    assert(r.count(_.getString(0) == "b") == 3)
    assert(r.map(_.getLong(3)).toSet == Set(1L, 2L, 3L)) // rn runs 1..k
  }

  test("tokenBudgetAllocation: hand-solved water level; budget exactly consumed") {
    // 10-token docs; suffix scaling → t = 20, 30, 40, 100 (T=190, B=114)
    // k=1: c=114/4=28, not <20 → invalid. k=2: c=94/3=31, not <30 → invalid.
    // k=3: pexc=50, c=64/2=32 <40, tprev 30≤32 → cap=32.
    // alloc = 20+30+32+32 = 114 = B exactly.
    def doc(id: Long, src: String, n: Int) = (id, src, Seq.fill(n)("w").mkString(" "))
    val docs = Seq(doc(1, "s1", 10), doc(2, "s2", 10), doc(3, "s3", 10), doc(4, "s9", 10))
      .toDF("doc_id", "source", "text")
    val got = CorpusOps.tokenBudgetAllocation(docs)
      .as[(String, Long, Long, Boolean, Long)].collect().toSeq
    assert(got == Seq(
      ("s1", 20L, 20L, true, 32L), ("s2", 30L, 30L, true, 32L),
      ("s3", 40L, 32L, false, 32L), ("s9", 100L, 32L, false, 32L)))
    // maximality: cap+1 would overshoot the budget
    val t = Seq(20L, 30L, 40L, 100L)
    assert(t.map(math.min(_, 32L)).sum <= 114L && t.map(math.min(_, 33L)).sum > 114L)
  }

  test("fimSplitPlan: spans partition every doc and match an independent md5 derivation") {
    import spark.implicits._
    val docs = Seq(
      (7L, "alpha beta gamma delta epsilon", "en", "s1", 30L),
      (8L, "one two three", "en", "s1", 13L),
      (9L, "solo", "en", "s2", 4L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // independent JVM-side derivation of the same md5-mod split
    def h60(salt: String, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$salt|$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    def split(id: Long, n: Long): (Long, Long, Long) = {
      val i = h60("fimA", id) % (n + 1)
      val j = i + h60("fimB", id) % (n - i + 1)
      (i, j - i, n - j)
    }
    val exp = Map(
      "s1" -> Seq(split(7L, 5), split(8L, 3)),
      "s2" -> Seq(split(9L, 1)))
    val r = CorpusOps.fimSplitPlan(docs).collect()
      .map(x => x.getString(0) -> x).toMap
    exp.foreach { case (src, splits) =>
      val row = r(src)
      assert(row.getAs[Long]("prefix_tokens") == splits.map(_._1).sum, src)
      assert(row.getAs[Long]("middle_tokens") == splits.map(_._2).sum, src)
      assert(row.getAs[Long]("suffix_tokens") == splits.map(_._3).sum, src)
      // spans partition the token count exactly
      assert(row.getAs[Long]("prefix_tokens") + row.getAs[Long]("middle_tokens") +
        row.getAs[Long]("suffix_tokens") == row.getAs[Long]("total_tokens"), src)
    }
  }
}
