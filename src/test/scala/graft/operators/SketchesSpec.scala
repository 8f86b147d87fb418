package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables(spark, sf("")).documents

  test("HLL estimate lands within the m=64 error envelope on every source") {
    val rows = Sketches.hllDistinct(docs)
      .select("source", "vocab_exact", "hll_est", "rel_err")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, exact, est, rel) =>
      // 1.04/sqrt(64) = 13% standard error; 4 sigma as the spec bound
      assert(math.abs(rel) < 0.52, s"source $src: est $est vs exact $exact (rel $rel)")
      assert(math.abs((est - exact) / exact - rel) < 1e-3)
    }
  }

  test("HLL registers merge by pointwise max (incremental-batch contract)") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    // registers on the union == pointwise max of per-half registers
    def regs(df: org.apache.spark.sql.DataFrame) = {
      val t = df.select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
        .select(col("source"),
          conv(substring(md5(concat(lit("hll|"), col("w"))), 1, 15), 16, 10).cast("long").as("v"))
        .select(col("source"), (col("v") % 64).as("bucket"), expr("v div 64").as("rest"))
      t.select(col("source"), col("bucket"),
          when(col("rest") === 0, lit(55)).otherwise(lit(55) - length(bin(col("rest")))).cast("int").as("r"))
        .groupBy("source", "bucket").agg(max("r").as("r"))
        .as[(String, Long, Int)].collect().map(x => (x._1, x._2) -> x._3).toMap
    }
    val whole = regs(docs)
    val ra = regs(a)
    val rb = regs(b)
    val merged = (ra.keySet ++ rb.keySet).map { k =>
      k -> math.max(ra.getOrElse(k, 0), rb.getOrElse(k, 0))
    }.toMap
    assert(whole == merged)
  }

  test("CMS never undercounts and is exact on a collision-free fixture") {
    val est = Sketches.cmsFrequencies(docs)
      .as[(String, Long, Long, Long)].collect()
    assert(est.length == 10)
    est.foreach { case (w, exact, cm, over) =>
      assert(cm >= exact, s"token $w undercounted: $cm < $exact")
      assert(over == cm - exact)
    }
    // 3 distinct tokens in 256 cells: overwhelmingly collision-free,
    // and exactness here pins that the counter/probe hashes agree
    val tiny = Seq((1L, "alpha alpha beta", "en", "s", 16L),
                   (2L, "beta gamma", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val t = Sketches.cmsFrequencies(tiny, probeK = 3)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(t("alpha") == ((2L, 2L)) && t("beta") == ((2L, 2L)) && t("gamma") == ((1L, 1L)))
  }

  test("bloom filter has no false negatives and only overclaims") {
    val rows = Sketches.bloomCalibration(docs)
      .select("source", "n_probe", "n_member", "n_claimed", "false_pos")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nProbe, nMember, nClaimed, fp) =>
      // claimed ⊇ member (bloom's one-sided error), and both ≤ probe
      assert(nClaimed >= nMember, s"$src lost a true member")
      assert(nClaimed <= nProbe && nMember <= nProbe)
      assert(fp == nClaimed - nMember)
    }
    // sources whose docs all sit in the reference batch (doc_id % 10 = 0
    // covers the % 20 = 0 and % 20 = 10 sources entirely) must claim
    // every shingle — the exact-membership degenerate case
    val full = rows.filter(r => r._1 == "src0" || r._1 == "src10")
    full.foreach { case (_, nProbe, nMember, _, _) => assert(nMember == nProbe) }
  }

  test("CMS cells merge by addition (incremental-batch contract)") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    def cells(df: org.apache.spark.sql.DataFrame) = {
      val t = df.select(explode(split(lower(col("text")), " ")).as("w"))
      t.select(explode(array((0 until 4).map(j => struct(lit(j).as("j"),
          (conv(substring(md5(concat(lit(s"cm$j|"), col("w"))), 1, 15), 16, 10).cast("long") % 64).as("b"))): _*)).as("c"))
        .groupBy(col("c.j"), col("c.b")).agg(count(lit(1)).as("cnt"))
        .as[(Int, Long, Long)].collect().map(x => (x._1, x._2) -> x._3).toMap
    }
    val whole = cells(docs)
    val ca = cells(a)
    val cb = cells(b)
    val merged = (ca.keySet ++ cb.keySet).map { k =>
      k -> (ca.getOrElse(k, 0L) + cb.getOrElse(k, 0L))
    }.toMap
    assert(whole == merged)
  }

  test("quantileSketchCalibration: hand-computed histogram interpolation vs exact") {
    // one value per width-10 bin: sketch and exact land on different,
    // hand-derivable numbers
    val d = Seq((1L, "t", "en", "s", 5L), (2L, "t", "en", "s", 15L),
      (3L, "t", "en", "s", 25L), (4L, "t", "en", "s", 35L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Sketches.quantileSketchCalibration(d, binWidth = 10)
      .as[(String, Double, Long, Double, Double, Double)].collect()
      .map(r => r._2 -> r).toMap
    // p50: r = 2 -> bin 1 -> 10 + 10·(2−1)/1 = 20; exact h=1.5 -> 15+0.5·10 = 20
    assert(got(0.5) == (("s", 0.5, 4L, 20.0, 20.0, 0.0)))
    // p90: r = 3.6 -> bin 3 -> 30 + 10·0.6 = 36; exact h=2.7 -> 25+0.7·10 = 32
    assert(got(0.9) == (("s", 0.9, 4L, 36.0, 32.0, 4.0)))
    // histogram bins MERGE BY ADDITION (the incremental maintenance contract)
    val whole = Sketches.quantileSketchCalibration(d, binWidth = 10)
      .as[(String, Double, Long, Double, Double, Double)].collect().toSet
    val viaUnion = Sketches.quantileSketchCalibration(
      d.filter(col("doc_id") <= 2).union(d.filter(col("doc_id") > 2)), binWidth = 10)
      .as[(String, Double, Long, Double, Double, Double)].collect().toSet
    assert(whole == viaUnion)
  }

  test("thetaOverlap: identical sources estimate 1, disjoint estimate 0, partial in between") {
    val docs = ((0 until 200).flatMap(i =>
        Seq((i.toLong, "A", s"text $i"), (1000L + i, "B", s"text $i"))) ++   // A ≡ B
      (0 until 200).map(i => (2000L + i, "C", s"other $i")) ++                // C disjoint
      (0 until 200).map(i =>                                                  // D: half of A
        (3000L + i, "D", if (i < 100) s"text $i" else s"dtext $i")))
      .toDF("doc_id", "source", "text")
    val r = Sketches.thetaOverlap(docs).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getAs[Double]("est_jaccard"), x.getAs[Double]("exact_jaccard"))).toMap
    assert(r(("A", "B")) == ((1.0, 1.0)))   // same hash sets → identical sketches
    assert(r(("A", "C")) == ((0.0, 0.0)))
    val (estAD, exactAD) = r(("A", "D")) // |∩|=100, |∪|=300 → 1/3
    assert(exactAD == 0.3333)
    assert(math.abs(estAD - exactAD) < 0.25, s"KMV estimate too far off: $estAD")
  }
}
