package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("tClosenessAudit: hand-computed EMD on a 2-band, 2-group corpus") {
    // bands (width 100): group (en,a): lengths 50,150 → bands {0:1, 1:1}
    //                    group (de,b): lengths 50,60  → bands {0:2, 1:0}
    // global: band0=3, band1=1, gtot=4, m=2
    // (en,a): cum gaps |1·4−3·2| = 2 → emd = 2/(2·4·1) = 0.25
    // (de,b): |2·4−3·2| = 2        → emd = 2/(2·4·1) = 0.25
    val docs = Seq(
      (1L, "x", "en", "a", 50L), (2L, "x", "en", "a", 150L),
      (3L, "x", "de", "b", 50L), (4L, "x", "de", "b", 60L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = RobustStats.tClosenessAudit(docs).collect()
      .map(x => (x.getString(0), x.getString(1)) -> (x.getDouble(3), x.getBoolean(4))).toMap
    assert(r(("en", "a")) == (0.25, true))
    assert(r(("de", "b")) == (0.25, true))
  }

  private def ev(id: Long, day: Int, typ: String) =
    (id, Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00"), 1L, typ, 0.0, "{}")

  test("theilSenTrend: median slope of a clean linear ramp is the ramp slope") {
    // days 1..5 with counts 2,4,6,8,10 → every pairwise slope is exactly 2
    val rows = (1 to 5).flatMap(d => (1 to 2 * d).map(i => ev(d * 100L + i, d, "view")))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RobustStats.theilSenTrend(df).collect()(0)
    assert(r.getAs[Long]("n_days") == 5)
    assert(r.getAs[Long]("n_pairs") == 10)
    assert(r.getAs[Double]("slope") == 2.0)
    // intercept: median of x_i − 2·day_i, identical for all i
    val day1 = df.selectExpr("min(unix_micros(ts) div 86400000000)").as[Long].head()
    assert(r.getAs[Double]("intercept") == 2.0 - 2.0 * day1)
  }

  test("theilSenTrend resists an outlier day that would wreck OLS") {
    // ramp of slope 1 plus one huge spike day: median slope stays ~1
    val rows = (1 to 9).flatMap(d => (1 to d).map(i => ev(d * 100L + i, d, "view"))) ++
      (1 to 500).map(i => ev(10000L + i, 10, "view"))
    val r = RobustStats.theilSenTrend(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")).collect()(0)
    assert(r.getAs[Double]("slope") <= 1.5, s"slope ${r.getAs[Double]("slope")} not robust")
  }

  test("cusumChangepoint finds a level shift at the right day") {
    // errors/day: 2,2,2,2,10,10,10,10 → |S| peaks at day 4 (end of low level)
    val rows = (1 to 8).flatMap { d =>
      val k = if (d <= 4) 2 else 10
      (1 to k).map(i => ev(d * 1000L + i, d, "error"))
    }
    val r = RobustStats.cusumChangepoint(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")).collect()(0)
    val day1 = 19723L // 2024-01-01 epoch day
    assert(r.getAs[Long]("n_days") == 8)
    assert(r.getAs[Long]("total_errors") == 48)
    assert(r.getAs[Long]("cp_day") == day1 + 3) // 2024-01-04
    assert(r.getAs[Double]("mean_before") == 2.0)
    assert(r.getAs[Double]("mean_after") == 10.0)
  }

  test("timeWeightedAverage: hand-computed holding-time weights") {
    // user 1: value 10 held for 3s, value 20 held for 1s, final reading
    // open-ended (dropped) → twap = (10·3 + 20·1) / 4 = 12.5
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "view", 10.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 00:00:03"), 1L, "view", 20.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 00:00:04"), 1L, "view", 999.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RobustStats.timeWeightedAverage(rows).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_intervals") == 2L)
    assert(r(0).getAs[Long]("span_us") == 4000000L)
    assert(r(0).getAs[Double]("twap") == 12.5)
  }

  test("timeWeightedAverage: single-event users produce no row (no holding time)") {
    val rows = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "view", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(RobustStats.timeWeightedAverage(rows).count() == 0)
  }

  test("mannKendall: clean ramp is increasing, hand-computed S") {
    // counts 1..8 over 8 days: every pair concordant → S = 28, no ties
    val rows = (1 to 8).flatMap(d => (1 to d).map(i => ev(d * 100L + i, d, "view")))
    val r = RobustStats.mannKendall(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")).collect()(0)
    assert(r.getAs[Long]("n_days") == 8)
    assert(r.getAs[Long]("s_stat") == 28L)
    // var18 = 8·7·21 = 1176 (no ties); z = 27/sqrt(1176/18) ≈ 3.3410
    assert(r.getAs[Long]("var18") == 1176L)
    assert(r.getAs[Double]("z") == 3.3404)
    assert(r.getAs[String]("trend") == "increasing")
  }

  test("mannKendall: flat series has S = 0, z = 0, no_trend") {
    val rows = (1 to 6).flatMap(d => (1 to 3).map(i => ev(d * 100L + i, d, "view")))
    val r = RobustStats.mannKendall(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")).collect()(0)
    assert(r.getAs[Long]("s_stat") == 0L)
    assert(r.getAs[Double]("z") == 0.0)
    assert(r.getAs[String]("trend") == "no_trend")
  }

  test("lag1Autocorrelation: alternating series is strongly negative, ramp positive") {
    // alternating 1,9,1,9,... → r1 ≈ -1; ramp 1..8 → r1 > 0
    val alt = (1 to 8).flatMap { d =>
      val k = if (d % 2 == 0) 9 else 1
      (1 to k).map(i => ev(d * 100L + i, d, "view"))
    }
    val rAlt = RobustStats.lag1Autocorrelation(
      alt.toDF("event_id", "ts", "user_id", "event_type", "value", "props")).collect()(0)
    assert(rAlt.getAs[Long]("n_pairs") == 7L)
    assert(rAlt.getAs[Double]("r1") < -0.8, s"got ${rAlt.getAs[Double]("r1")}")
    val ramp = (1 to 8).flatMap(d => (1 to d).map(i => ev(d * 100L + i, d, "view")))
    val rRamp = RobustStats.lag1Autocorrelation(
      ramp.toDF("event_id", "ts", "user_id", "event_type", "value", "props")).collect()(0)
    assert(rRamp.getAs[Double]("r1") > 0.5, s"got ${rRamp.getAs[Double]("r1")}")
  }

  test("lag1Autocorrelation: constant series has zero denominator → NULL r1") {
    val rows = (1 to 4).flatMap(d => (1 to 3).map(i => ev(d * 100L + i, d, "view")))
    val r = RobustStats.lag1Autocorrelation(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("r1")))
  }

  test("weightedMedianLength: hand-computed byte-weighted pick") {
    // source s: lengths 1, 2, 7 → total 10, cumulative 1, 3, 10;
    // first 2·cum ≥ 10 is the length-7 doc (unweighted median is 2)
    val docs = Seq(
      (1L, "x", "en", "s", 1L), (2L, "x", "en", "s", 2L), (3L, "x", "en", "s", 7L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = RobustStats.weightedMedianLength(docs).collect()(0)
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("total_chars") == 10L)
    assert(r.getAs[Long]("wmedian_chars") == 7L)
  }

  test("weightedMedianLength: even split ties to the lower boundary row") {
    // lengths 5, 5 → cum 5, 10; first 2·cum ≥ 10 is the FIRST doc (id order)
    val docs = Seq(
      (1L, "x", "en", "s", 5L), (2L, "x", "en", "s", 5L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(RobustStats.weightedMedianLength(docs).collect()(0)
      .getAs[Long]("wmedian_chars") == 5L)
  }

  test("cusumChangepoint on a flat series: stat 0, tie broken to first day") {
    val rows = (1 to 4).flatMap(d => (1 to 3).map(i => ev(d * 1000L + i, d, "error")))
    val r = RobustStats.cusumChangepoint(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")).collect()(0)
    assert(r.getAs[Long]("cusum_scaled") == 0L)
    assert(r.getAs[Long]("cp_day") == 19723L)
  }

  test("spearmanCorrelation: monotone ±1, tied-axis null, hand-computed ties") {
    val part = Seq((1L, "A"), (2L, "B"), (3L, "C"), (4L, "D"))
      .toDF("p_partkey", "p_brand")
    val li = Seq(
      // A: perfectly increasing → rho 1
      (1L, 1.0, 10.0), (1L, 2.0, 20.0), (1L, 3.0, 30.0),
      // B: perfectly decreasing → rho −1
      (2L, 1.0, 30.0), (2L, 2.0, 20.0), (2L, 3.0, 10.0),
      // C: all-tied quantity axis → null
      (3L, 1.0, 5.0), (3L, 1.0, 7.0),
      // D: tie on q axis: ranks₂ q=(3,3,6), p=(2,4,6) → rho = 18/√(18·24)
      (4L, 1.0, 10.0), (4L, 1.0, 20.0), (4L, 2.0, 30.0),
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    val r = RobustStats.spearmanCorrelation(li, part).collect()
      .map(x => x.getString(0) -> Option(x.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(r("A").contains(1.0))
    assert(r("B").contains(-1.0))
    assert(r("C").isEmpty)
    assert(r("D").contains(math.rint(18.0 / math.sqrt(18.0 * 24.0) * 1e4) / 1e4))
  }

  test("crossCorrelationScan: a 2-day lead between view and click peaks at lag 2") {
    // a non-monotone daily profile (a linear ramp would correlate
    // perfectly at EVERY lag); click repeats it shifted 2 days later —
    // at lag_d=+2 the aligned pairs are y=x exactly → r=1
    val profile = Seq(1, 5, 2, 4, 3, 6)
    val rows =
      profile.zipWithIndex.flatMap { case (c, d0) =>
        (1 to c).map(i => ev((d0 + 1) * 100L + i, d0 + 1, "view")) } ++
      profile.zipWithIndex.flatMap { case (c, d0) =>
        (1 to c).map(i => ev(9000L + (d0 + 1) * 100L + i, d0 + 3, "click")) }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RobustStats.crossCorrelationScan(df).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), Option(x.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(r(2L)._2.contains(1.0))
    assert(r(2L)._1 == 6L)
    // at the wrong alignment the correlation is strictly below 1
    assert(r(0L)._2.forall(_ < 1.0))
  }

  private def evv(id: Long, day: Int, hr: Int, user: Long, v: Double) =
    (id, Timestamp.valueOf(f"2024-01-${day}%02d ${hr}%02d:30:00"), user, "view", v, "{}")

  test("resampleLocf: gaps inherit the previous bucket's LAST value") {
    // user 1, 6h buckets: day1 04:30 (b0, v=2), day1 05:30 (b0, v=4 — later,
    // wins the bucket), day2 16:30 (b6, v=10) → 7 buckets, 2 observed,
    // 5 filled with 4.0, mean = (4·6 + 10)/7
    val rows = Seq(evv(1, 1, 4, 1, 2.0), evv(2, 1, 5, 1, 4.0), evv(3, 2, 16, 1, 10.0))
    val r = RobustStats.resampleLocf(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")).collect()(0)
    assert(r.getAs[Long]("n_buckets") == 7)
    assert(r.getAs[Long]("n_observed") == 2)
    assert(r.getAs[Long]("n_filled") == 5)
    assert(r.getAs[Double]("locf_mean") == math.rint((4.0 * 6 + 10.0) / 7 * 1e4) / 1e4)
  }

  test("resampleLocf: in-bucket last is picked by (ts, event_id), not input order") {
    // same timestamp → higher event_id wins; single bucket, no fill
    val rows = Seq(evv(9, 1, 4, 2, 5.0), evv(7, 1, 4, 2, 3.0))
    val r = RobustStats.resampleLocf(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")).collect()(0)
    assert(r.getAs[Long]("n_buckets") == 1)
    assert(r.getAs[Double]("locf_mean") == 5.0)
  }

  test("pettittChangepoint localizes a clean level shift and flags it") {
    // daily value sums: 10 days at 1.0, 10 days at 9.0 (one event/day)
    // → U_t peaks at t = 10 (last low day); shift is overwhelming → significant
    val rows = (1 to 20).map(d => evv(d.toLong, d, 12, 1, if (d <= 10) 1.0 else 9.0))
    val r = RobustStats.pettittChangepoint(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")).collect()(0)
    assert(r.getAs[Long]("n_days") == 20)
    assert(r.getAs[Long]("cp_day") == 19723L + 9) // day 10 of Jan 2024
    // U_10 = Σ_{i≤10}Σ_{j>10} sgn(low − high) = −100
    assert(r.getAs[Long]("u_at_cp") == -100L)
    assert(r.getAs[Long]("k_stat") == 100L)
    // 6·100²·10⁶ = 6e10 ≥ (8000+400)·3688879 ≈ 3.1e10 → significant
    assert(r.getAs[Boolean]("significant"))
  }

  private def doc(id: Long, lang: String, source: String, len: Long) =
    (id, "t", lang, source, len)

  test("mannWhitney: complete separation gives delta 1.0 and hand-computed z") {
    // en lengths {3,4} dominate de lengths {1,2}: U₂ = 8, ties 0,
    // var = 2·2·5/12 → z = 2/√(5/3) = 1.5492, δ = 1
    val docs = Seq(doc(1, "en", "s", 3), doc(2, "en", "s", 4),
      doc(3, "de", "s", 1), doc(4, "de", "s", 2))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = RobustStats.mannWhitney(docs).collect()(0)
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Long]("u2") == 8L)
    assert(r.getAs[Double]("z") == 1.5492)
    assert(r.getAs[Double]("cliffs_delta") == 1.0)
  }

  test("mannWhitney: identical distributions give U₂ = n1·n2 and z = 0") {
    // both groups share the same two lengths → midranks cancel exactly
    val docs = Seq(doc(1, "en", "s", 5), doc(2, "en", "s", 9),
      doc(3, "de", "s", 5), doc(4, "de", "s", 9))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = RobustStats.mannWhitney(docs).collect()(0)
    assert(r.getAs[Long]("u2") == 4L)      // 2·U₁ = n1·n2 → U₁ = mean
    assert(r.getAs[Double]("z") == 0.0)
    assert(r.getAs[Double]("cliffs_delta") == 0.0)
  }

  test("chiSquaredIndependence: proportional table is 0, diagonal table is n·min(R,C)-scaled") {
    val indep = Seq(doc(1, "en", "a", 1), doc(2, "en", "b", 1),
      doc(3, "de", "a", 1), doc(4, "de", "b", 1))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r1 = RobustStats.chiSquaredIndependence(indep).collect()(0)
    assert(r1.getAs[Double]("chi2") == 0.0 && r1.getAs[Double]("cramers_v") == 0.0)
    // perfect diagonal association: chi2 = n = 4 (2 observed cells at 1.0
    // each + 2 structural zeros at e = 1.0 each), V = 1
    val dep = Seq(doc(1, "en", "a", 1), doc(2, "en", "a", 1),
      doc(3, "de", "b", 1), doc(4, "de", "b", 1))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r2 = RobustStats.chiSquaredIndependence(dep).collect()(0)
    assert(r2.getAs[Long]("n_cells") == 4L)
    assert(r2.getAs[Double]("chi2") == 4.0)
    assert(r2.getAs[Double]("cramers_v") == 1.0)
  }

  test("pettittChangepoint: an exchangeable (constant) series is not significant") {
    val rows = (1 to 12).map(d => evv(d.toLong, d, 12, 1, 5.0))
    val r = RobustStats.pettittChangepoint(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")).collect()(0)
    // all values tie → every dr = n+1 → U_t = 0 for all t
    assert(r.getAs[Long]("k_stat") == 0L)
    assert(!r.getAs[Boolean]("significant"))
  }
}
