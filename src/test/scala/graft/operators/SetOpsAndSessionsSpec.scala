package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SetOpsAndSessionsSpec extends SparkSpec {
  import spark.implicits._

  test("psiDrift: hand-worked smoothed PSI over a two-band shift") {
    val day = 86400000000L
    val base = 1700000000000000L
    // window [base, base+2d], midpoint base+1d. Ref half: 3x band0
    // (value 10) + 1x band1 (value 60); cur half mirrored. Smoothed
    // p_band0 = (3+1)/(4+2) = 2/3 vs (1+1)/6 = 1/3 ->
    // psi = (1/3)*ln(2) = 0.231049 for both bands.
    val ev = Seq(
      (1L, base, 10.0), (2L, base + day / 4, 10.0), (3L, base + day / 2, 10.0),
      (4L, base + day / 3, 60.0),
      (5L, base + day, 10.0),
      (6L, base + day + day / 4, 60.0), (7L, base + day / 2 + day, 60.0),
      (8L, base + 2 * day, 60.0))
      .toDF("event_id", "us", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"), col("value"),
        lit(1L).as("user_id"), lit("t").as("event_type"))
    val got = SetOpsAndSessions.psiDrift(ev).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0, 3L, 1L, 0.231049), (1, 1L, 3L, 0.231049)),
      s"got ${got.toSeq}")
  }

  test("kaplanMeier: hand-worked curve with a right-censored non-converter") {
    val day = 86400000000L
    val base = 1700000000000000L
    // u1, u2 purchase on day 0; u3 purchases on day 1; u4 never
    // purchases across a 3-day span (censored at 3). Risk sets:
    // t=0: n=4, d=2 -> S=0.5; t=1: n=2, d=1 -> S=0.25. The censored
    // user leaves the risk set only after day 3 (no output row: d=0).
    val ev = Seq(
      (1L, 1L, base, "view"), (2L, 1L, base + day / 2, "purchase"),
      (3L, 2L, base, "purchase"),
      (4L, 3L, base, "view"), (5L, 3L, base + day, "purchase"),
      (6L, 4L, base, "view"), (7L, 4L, base + 3 * day, "view"))
      .toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"), col("event_type"))
    val got = SetOpsAndSessions.kaplanMeier(ev).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(got.toSeq == Seq((0L, 4L, 2L, 0.5), (1L, 2L, 1L, 0.25)), s"got ${got.toSeq}")
  }

  test("kaplanMeier survival never increases and respects scaled-integer floor") {
    val ev = graft.Tables(spark, sf("")).events
    val got = SetOpsAndSessions.kaplanMeier(ev).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(got.nonEmpty)
    got.sliding(2).foreach {
      case Array((_, a), (t, b)) => assert(b <= a, s"survival rose at t=$t")
      case _ =>
    }
  }

  test("decayedEngagement halves each event's value per elapsed day, hand-checked") {
    val day = 86400000000L // µs
    val base = 1700000000000000L
    val rows = Seq(
      // user 1: newest event value 10 (age 0), one 1-day-old value 8,
      // one 2-day-old value 4 -> 10/1 + 8/2 + 4/4 = 15.0
      (101L, 1L, base + 2 * day, 10.0),
      (102L, 1L, base + day, 8.0),
      (103L, 1L, base, 4.0),
      // user 2: single event 2.5 days before the GLOBAL max -> age
      // floors to 2 -> 6.0 / 4 = 1.5
      (201L, 2L, base - day / 2, 6.0))
      .toDF("event_id", "user_id", "us", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"), col("value"),
        lit("t").as("event_type"), lit("{}").as("props"))
    val got = SetOpsAndSessions.decayedEngagement(rows)
      .select("user_id", "n_events", "last_seen_days", "total_value", "decayed_value")
      .as[(Long, Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 0L, 22.0, 15.0)))
    assert(got(2L) == ((2L, 1L, 2L, 6.0, 1.5)))
  }

  test("decayedEngagement is partitioning-independent (fold order pinned)") {
    val ev = graft.Tables(spark, sf("")).events
    val a = SetOpsAndSessions.decayedEngagement(ev).collect().toSeq
    val b = SetOpsAndSessions.decayedEngagement(ev.repartition(13)).collect().toSeq
    assert(a == b)
  }

  test("funnelConversion: hand-checked ordered funnel with out-of-order exclusion") {
    val day = 86400000000L
    val base = 1700000000000000L
    // u1 completes in order; u2 clicks BEFORE viewing (excluded from
    // stage 2 on); u3 views+clicks but never purchases
    val rows = Seq(
      (1L, 1L, base, "view"), (2L, 1L, base + day, "click"), (3L, 1L, base + 2 * day, "purchase"),
      (4L, 2L, base + day, "view"), (5L, 2L, base, "click"),
      (6L, 3L, base, "view"), (7L, 3L, base + day, "click"))
      .toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"), col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
    val got = SetOpsAndSessions.funnelConversion(rows)
      .select("stage", "n_users", "conv_from_prev", "conv_from_first")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 1.0, 1.0)))
    assert(got(2L) == ((2L, 2L, 0.6667, 0.6667)))
    assert(got(3L) == ((3L, 1L, 0.5, 0.3333)))
  }

  test("winsorizedStats clips a planted outlier: winsor mean < raw mean, cuts bracket it") {
    val base = 1700000000000000L
    val vals = (1 to 99).map(_.toDouble) :+ 100000.0 // one outlier
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, 1L + i % 7, base + i * 1000000L, v)
    }.toDF("event_id", "user_id", "us", "value")
      .select(col("event_id"), col("user_id"), timestamp_micros(col("us")).as("ts"),
        lit("click").as("event_type"), col("value"), lit("{}").as("props"))
    val r = SetOpsAndSessions.winsorizedStats(rows)
      .select("event_type", "n_events", "raw_mean", "p05", "p95", "winsor_mean")
      .as[(String, Long, Double, Double, Double, Double)].head()
    assert(r._2 == 100)
    // h = 99*0.05 = 4.95 -> p05 = 5 + (6-5)*0.95 = 5.95; p95 = 95 + 0.05 = 95.05
    assert(math.abs(r._4 - 5.95) < 1e-9 && math.abs(r._5 - 95.05) < 1e-9)
    assert(r._6 < r._3, "outlier must be clipped out of the winsorized mean")
    assert(r._6 >= r._4 && r._6 <= r._5)
  }

  test("topSessionPaths caps the head and counts every session exactly once") {
    val ev = graft.Tables(spark, sf("")).events
    val got = SetOpsAndSessions.topSessionPaths(ev, k = 1000000)
      .as[(String, Long)].collect()
    got.foreach { case (path, _) => assert(path.split(">").length <= 5) }
    val totalSessions = SetOpsAndSessions.sessionDurations(ev)
      .agg(sum("n_sessions")).as[Long].head()
    assert(got.map(_._2).sum == totalSessions)
  }

  test("eventTransitions: each user contributes n-1 transitions and rows are a distribution") {
    val ev = graft.Tables(spark, sf("")).events
    val m = SetOpsAndSessions.eventTransitions(ev)
      .as[(String, String, Long, Long, Double)].collect()
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(m.map(_._3).sum == nEvents - nUsers)
    // per from_type: counts sum to n_from and p sums to ~1
    m.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sum == rows.head._4)
      assert(math.abs(rows.map(_._5).sum - 1.0) < 0.01)
    }
  }

  test("rateSpikes: z from integer trailing moments; constant-window deviation still flags") {
    val day = 86400000000L // µs
    // type A: 1,2,3 then a 10-count day -> z = (3·10 − 6)/√(3·14 − 36) = 24/√6
    // type B: 2,2,2 then 8 -> σ=0 window, deviation -> NULL z but spiked
    val rows = (Seq(1, 2, 3, 10).zipWithIndex.flatMap { case (n, d) =>
      Seq.fill(n)(("A", d)) } ++ Seq.fill(2)(("B", 0)) ++ Seq.fill(2)(("B", 1)) ++
      Seq.fill(2)(("B", 2)) ++ Seq.fill(8)(("B", 3)))
    val ev = rows.zipWithIndex
      .map { case ((t, d), i) => (i.toLong, t, d.toLong * day + i) }
      .toDF("event_id", "event_type", "us")
      .select(col("event_id"), col("event_type"), timestamp_micros(col("us")).as("ts"))
    val got = SetOpsAndSessions.rateSpikes(ev, window = 7, zThresh = 2.0)
      .select("event_type", "n", "n_prev", "mean_prev", "z", "is_spike")
      .as[(String, Long, Long, Double, Option[Double], Boolean)].collect()
    // only the 4th day of each type has >= 3 prior days
    assert(got.length == 2)
    val a = got.find(_._1 == "A").get
    assert(a._2 == 10L && a._3 == 3L && a._4 == 2.0)
    assert(a._5.contains(math.rint(24.0 / math.sqrt(6.0) * 10000) / 10000) && a._6)
    val b = got.find(_._1 == "B").get
    assert(b._4 == 2.0 && b._5.isEmpty && b._6)
  }

  test("associationRules: hand-computed support/confidence/lift over known baskets") {
    // u1{A,B} u2{A,B} u3{A,C} u4{B}: duplicates within a user must not inflate counts
    val ev = Seq(
      (1L, "A"), (1L, "B"), (1L, "A"),
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"),
      (4L, "B"),
    ).toDF("user_id", "event_type")
    val got = SetOpsAndSessions.associationRules(ev, minUsers = 1L)
      .as[(String, String, Long, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // (A,B): n_both 2 of N=4; n_A=3, n_B=3 -> lift 2·4/9
    assert(got(("A", "B")) == (("A", "B", 2L, 3L, 3L, 0.5, 0.6667, 0.6667, 0.8889)))
    // (A,C): asymmetric confidences; lift > 1
    assert(got(("A", "C")) == (("A", "C", 1L, 3L, 1L, 0.25, 0.3333, 1.0, 1.3333)))
    // B and C never co-occur -> no row
    assert(!got.contains(("B", "C")))
  }

  test("cohortRetention: hand-built cohorts; multiple same-week events count once") {
    val day = 86400000000L
    val ev = Seq(
      (1L, 0L), (1L, 8L),             // user 1: cohort 0, active offsets 0 and 1
      (2L, 0L),                        // user 2: cohort 0, offset 0 only
      (3L, 14L), (3L, 16L),            // user 3: cohort 2; two events, SAME offset 0
    ).zipWithIndex.map { case ((u, d), i) => (i.toLong, u, d * day + i) }
      .toDF("event_id", "user_id", "us")
      .select(col("event_id"), col("user_id"), timestamp_micros(col("us")).as("ts"))
    val got = SetOpsAndSessions.cohortRetention(ev)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      (0L, 0L, 2L, 2L, 1.0),
      (0L, 1L, 1L, 2L, 0.5),
      (2L, 0L, 1L, 1L, 1.0)))
  }

  test("madOutliers: hand-computed median/MAD; MAD=0 flags any deviation") {
    val ev = (Seq(1.0, 2.0, 3.0, 100.0).map(("tail", _)) ++
      Seq(5.0, 5.0, 5.0, 6.0).map(("flat", _)))
      .zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
      .toDF("event_id", "event_type", "value")
    val got = SetOpsAndSessions.madOutliers(ev)
      .as[(String, Long, Double, Double, Long, Double)].collect().map(r => r._1 -> r).toMap
    // tail: median 2.5, adevs (.5,.5,1.5,97.5) -> MAD 1.0; only 97.5 > 3
    assert(got("tail") == (("tail", 4L, 2.5, 1.0, 1L, 0.25)))
    // flat: MAD 0 -> the single deviating value flags
    assert(got("flat") == (("flat", 4L, 5.0, 0.0, 1L, 0.25)))
  }

  test("abTestReport: share-threshold conversion, arm split, pooled z hand-checked") {
    def arm(uid: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab|$uid".getBytes("UTF-8"))
      if (d.map("%02x".format(_)).mkString < "8") "A" else "B"
    }
    // 8 users; conversion = purchases make up >= 1/4 of the user's events.
    // converted users emit (purchase, view) [2*4 >= ... share 1/2]; the
    // rest emit (purchase, view, view, view, view) [share 1/5 < 1/4].
    val users = (1L to 8L)
    val converted = users.filter(_ % 2 == 0).toSet
    val rows = users.flatMap { u =>
      if (converted(u)) Seq((u, "purchase"), (u, "view"))
      else Seq((u, "purchase"), (u, "view"), (u, "view"), (u, "view"), (u, "view"))
    }.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "event_type")
    val r = SetOpsAndSessions.abTestReport(rows)
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])].head()
    val (nA, nB) = (users.count(arm(_) == "A").toLong, users.count(arm(_) == "B").toLong)
    val (cA, cB) = (converted.count(arm(_) == "A").toLong, converted.count(arm(_) == "B").toLong)
    assert((r._1, r._2, r._3, r._4) == ((nA, cA, nB, cB)))
    assert(r._5 == math.round(cA.toDouble / nA * 1e4) / 1e4)
    val p = (cA + cB).toDouble / (nA + nB)
    val z = (cA.toDouble / nA - cB.toDouble / nB) /
      math.sqrt(p * (1 - p) * (1.0 / nA + 1.0 / nB))
    assert(r._7.isDefined && math.abs(r._7.get - z) < 1e-3)
  }

  test("abTestReport: degenerate 100%-conversion pool yields NULL z, not a fault") {
    val rows = (1L to 6L).map(u => (u, u, "purchase"))
      .toDF("event_id", "user_id", "event_type")
    val r = SetOpsAndSessions.abTestReport(rows)
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])].head()
    assert(r._2 == r._1 && r._4 == r._3) // everyone converts (share 1.0)
    assert(r._7.isEmpty)                 // p=1 -> sqrt(0) denominator -> null z
  }
  test("cupedAbTest: theta and adjusted delta equal a driver-side exact reference") {
    def arm(uid: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab|$uid".getBytes("UTF-8"))
      if (d.map("%02x".format(_)).mkString < "8") "A" else "B"
    }
    val base = java.sql.Timestamp.valueOf("2024-03-01 12:00:00").getTime
    val day = 86400000L
    // 10 users, 20 observed days (mid = day index 10): user u gets
    // u%3+1 events on each of days 0,2,4 (pre) and u%4 events on day 15 (post)
    val rows = (1L to 10L).flatMap { u =>
      val pre = Seq(0, 2, 4).flatMap(d => Seq.fill((u % 3).toInt + 1)(d))
      val post = Seq.fill((u % 4).toInt)(15)
      (pre ++ post).map(d => (u, new java.sql.Timestamp(base + d * day), "click"))
    } ++ Seq((99L, new java.sql.Timestamp(base + 19 * day), "click")) // pins d1
    val ev = rows.zipWithIndex
      .map { case ((u, ts, t), i) => (i.toLong, u, ts, t) }
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = SetOpsAndSessions.cupedAbTest(ev)
      .as[(Long, Long, Option[Double], Double, Option[Double])].head()
    // driver-side exact reference over the same integer counts
    val users = (1L to 10L).map(u => (u, 3 * ((u % 3) + 1), u % 4)) :+ ((99L, 0L, 1L))
    val n = users.size
    val (sx, sy) = (users.map(_._2).sum, users.map(_._3).sum)
    val sxy = users.map(t => t._2 * t._3).sum
    val sxx = users.map(t => t._2 * t._2).sum
    val theta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
    val as = users.filter(t => arm(t._1) == "A"); val bs = users.filter(t => arm(t._1) == "B")
    def mean(v: Seq[Long]) = v.sum.toDouble / v.size
    val dY = mean(bs.map(_._3)) - mean(as.map(_._3))
    val dX = mean(bs.map(_._2)) - mean(as.map(_._2))
    assert(got._1 == as.size && got._2 == bs.size)
    assert(got._3.isDefined && math.abs(got._3.get - theta) < 1e-3)
    assert(math.abs(got._4 - dY) < 1e-3)
    assert(got._5.isDefined && math.abs(got._5.get - (dY - theta * dX)) < 1e-3)
  }

  test("markovStationary converges to the exact chain solution") {
    // 2-state chain: A->A 3, A->B 1, B->A 2, B->B 2
    // P = [[.75,.25],[.5,.5]] -> stationary (2/3, 1/3)
    // encode counts directly via many 2-event users
    val pairs =
      Seq.fill(3)(("A", "A")) ++ Seq.fill(1)(("A", "B")) ++
      Seq.fill(2)(("B", "A")) ++ Seq.fill(2)(("B", "B"))
    val ev = pairs.zipWithIndex.flatMap { case ((a, b), u) =>
      Seq((u * 2L, u.toLong, u * 1000000L, a), (u * 2L + 1, u.toLong, u * 1000000L + 1L, b))
    }.toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"), col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
    val r = SetOpsAndSessions.markovStationary(ev)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(math.abs(r("A")._2 - 2.0 / 3.0) < 1e-3, s"got ${r("A")}")
    assert(math.abs(r("B")._2 - 1.0 / 3.0) < 1e-3, s"got ${r("B")}")
    assert(math.abs(r("A")._2 + r("B")._2 - 1.0) < 1e-5)
    assert(r("A")._1 + r("B")._1 <= 1000000000000L, "integer mass never inflates")
  }

  test("benfordAudit: exact digit counts, zero-cent rows excluded, digits densified") {
    // values: 1.00 -> d1, 19.99 -> d1, 250.00 -> d2, 0.50 -> d5, 0.001 -> cents 0 (dropped)
    val ev = Seq(
      (1L, 1L, 0L, 1.00), (2L, 1L, 0L, 19.99), (3L, 1L, 0L, 250.00),
      (4L, 1L, 0L, 0.50), (5L, 1L, 0L, 0.001))
      .toDF("event_id", "user_id", "us", "value")
      .select(col("event_id"), col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("value"), lit("view").as("event_type"), lit("{}").as("props"))
    val r = SetOpsAndSessions.benfordAudit(ev).collect()
    assert(r.length == 9, "all 9 digits must report")
    val n = r.map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(n(1) == 2L && n(2) == 1L && n(5) == 1L && n(9) == 0L)
    assert(n.values.sum == 4L, "the sub-cent row must be excluded")
    // benford mass for digit 1 = log10(2) = 0.3010
    val d1 = r.find(_.getInt(0) == 1).get
    assert(d1.getDouble(3) == 0.301)
  }

  test("seasonalDecomposition: flat series has zero seasonal/resid; gap day flagged") {
    // 14 days x 5 events/day, except day 7 missing entirely
    val ev = (for {
      day <- 0 until 14 if day != 7
      k <- 0 until 5
    } yield (day * 5L + k, 1L, day * 86400000000L + k * 1000000L, 1.0))
      .toDF("event_id", "user_id", "us", "value")
      .select(col("event_id"), col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("value"), lit("view").as("event_type"), lit("{}").as("props"))
    val r = SetOpsAndSessions.seasonalDecomposition(ev).collect()
    assert(r.length == 14, "gap day must be densified into the spine")
    val gap = r.find(_.getInt(0) == 7).get
    assert(gap.getLong(2) == 0L)
    assert(gap.getBoolean(6), "a fully missing day is an anomaly")
    // a day far from the gap in both window and dow terms is clean
    val clean = r.find(_.getInt(0) == 2).get
    assert(clean.getLong(2) == 5L && !clean.getBoolean(6))
  }

  test("sequenceMatch: hand-built histories with counted non-overlapping matches") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // u1: s v c p   → vc*p: 1.  u2: s e e → se: 1, e{2,}: 1 ('ee').
    // u3: v p v c p → vc*p: 2 ('vp' with zero clicks, then 'vcp').
    val rows = Seq(
      (1L, 1L, "signup", 0), (2L, 1L, "view", 1), (3L, 1L, "click", 2), (4L, 1L, "purchase", 3),
      (5L, 2L, "signup", 0), (6L, 2L, "error", 1), (7L, 2L, "error", 2),
      (8L, 3L, "view", 0), (9L, 3L, "purchase", 1), (10L, 3L, "view", 2),
      (11L, 3L, "click", 3), (12L, 3L, "purchase", 4))
      .map { case (e, u, t, m) => (e, u, t, ts(m)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = SetOpsAndSessions.sequenceMatch(rows)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("e{2,}", 1L, 1L), ("se", 1L, 1L), ("vc*p", 2L, 3L)))
  }

  test("regularityBands: clockwork user is regular, erratic user bursty, 2-event user excluded") {
    val m = 1000000L
    def ev(id: Long, uid: Long, usec: Long) = (id, uid, usec)
    val rows =
      // user 1: exact 60s clock x6 → cv = 0 → regular
      (1L to 6L).map(i => ev(i, 1L, i * 60L * m)) ++
      // user 2: gaps 1s, 1s, 100s, 1s, 200s → wildly varying → bursty
      Seq(0L, 1L, 2L, 102L, 103L, 303L).zipWithIndex.map {
        case (s, i) => ev(10L + i, 2L, s * m) } ++
      // user 3: only two events (one gap) → excluded from banding
      Seq(ev(20L, 3L, 0L), ev(21L, 3L, 5L * m)) ++
      // user 4: gaps 60s, 61s, 59s, 60s → cv ≈ 0.012 → regular
      Seq(0L, 60L, 121L, 180L, 240L).zipWithIndex.map {
        case (s, i) => ev(30L + i, 4L, s * m) }
    val df = rows.toDF("event_id", "user_id", "us")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"),
        lit(1.0).as("value"), lit("t").as("event_type"))
    val got = SetOpsAndSessions.regularityBands(df).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("bursty", 1L), ("regular", 2L)), s"got $got")
  }

  test("peakConcurrency: midnight-crossing session counts on both days; ends don't double-count") {
    val m = 1000000L
    val day = 86400L * m
    // user 1: one session 23:50 day0 → 00:10 day1 (crosses midnight)
    // users 2,3: sessions on day1 00:00-00:05 → with user1 still open,
    // day1 peak = 3. user 4: session starting the µs AFTER user2 ends —
    // no overlap with it.
    val rows = Seq(
      (1L, 1L, day - 10L * 60 * m), (2L, 1L, day + 10L * 60 * m),
      (3L, 2L, day), (4L, 2L, day + 5L * 60 * m),
      (5L, 3L, day + 60 * m), (6L, 3L, day + 4L * 60 * m),
      (7L, 4L, day + 5L * 60 * m + 1L), (8L, 4L, day + 6L * 60 * m))
    val df = rows.toDF("event_id", "user_id", "us")
      .select(col("event_id"), col("user_id"), timestamp_micros(col("us")).as("ts"),
        lit(1.0).as("value"), lit("t").as("event_type"))
    val got = SetOpsAndSessions.peakConcurrency(df).collect().head
    assert(got.getLong(0) == 4L, s"n_sessions: $got")           // 4 sessions
    assert(got.getLong(1) == 3L, s"peak: $got")                 // user1+2+3 on day1
    assert(got.getDate(2).toString == "1970-01-02", s"day: $got")
  }

  test("propensityMatch: nearest control by score, caliper drops the far match") {
    // controls: u1 score 10 (outcome 100), u2 score 20 (outcome 200)
    // treated: u3 score 12 (outcome 500) → matches u1 (distance 2 ≤ 3)
    //          u4 score 16 → nearest is u2 at distance 4 > caliper → unmatched
    // ATT = (500−100)/1 = 400; naive gap = (250 − 150) = 100
    def user(id: Long, nEvents: Int, nPurchase: Int, totalValue: Double) =
      (0 until nEvents).map { i =>
        (id * 1000 + i, id, 1700000000000000L + i,
          if (i < nPurchase) "purchase" else "view",
          if (i == 0) totalValue else 0.0, "{}")
      }
    val ev = (user(1, 10, 1, 100.0) ++ user(2, 20, 2, 200.0) ++
      user(3, 12, 3, 500.0) ++ user(4, 16, 4, 0.0))
      .toDF("event_id", "user_id", "us", "event_type", "value", "props")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"), col("event_type"),
        col("value"), col("props"))
    val r = SetOpsAndSessions.propensityMatch(ev).collect()(0)
    assert(r.getAs[Long]("n_treated") == 2L)
    assert(r.getAs[Long]("n_control") == 2L)
    assert(r.getAs[Long]("n_matched") == 1L)
    assert(r.getAs[Double]("naive_gap") == 100.0)
    assert(r.getAs[Double]("att") == 400.0)
  }

  test("propensityMatch: band-edge matches equal the global-window answer") {
    // The match windows run per score band (band = score div 64); this
    // fixture forces BOTH carry directions across band boundaries:
    //   u5 control score 10  (band 0, outcome 999)  — never matched
    //   u1 control score 63  (band 0, outcome 150)
    //   u2 treated score 64  (band 1, outcome 500) — floor control u1 is
    //      in band 0, reachable only via the carry-prev stitch; dist 1
    //   u3 treated score 127 (band 1, outcome 900) — ceiling control u4
    //      is in band 2, reachable only via carry-next; dist 2 beats the
    //      carry-prev dist 64
    //   u4 control score 129 (band 2, outcome 300)
    // Global-window semantics: u2→u1 (d=350), u3→u4 (d=600) → ATT 475;
    // naive gap = 700 − (150+300+999)/3 = 217.
    def user(id: Long, nEvents: Int, nPurchase: Int, totalValue: Double) =
      (0 until nEvents).map { i =>
        (id * 1000 + i, id, 1700000000000000L + i,
          if (i < nPurchase) "purchase" else "view",
          if (i == 0) totalValue else 0.0, "{}")
      }
    val ev = (user(1, 63, 1, 150.0) ++ user(2, 64, 13, 500.0) ++
      user(3, 127, 26, 900.0) ++ user(4, 129, 1, 300.0) ++
      user(5, 10, 0, 999.0))
      .toDF("event_id", "user_id", "us", "event_type", "value", "props")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"), col("event_type"),
        col("value"), col("props"))
    val r = SetOpsAndSessions.propensityMatch(ev).collect()(0)
    assert(r.getAs[Long]("n_treated") == 2L)
    assert(r.getAs[Long]("n_control") == 3L)
    assert(r.getAs[Long]("n_matched") == 2L)
    assert(r.getAs[Double]("naive_gap") == 217.0)
    assert(r.getAs[Double]("att") == 475.0)
  }
}
