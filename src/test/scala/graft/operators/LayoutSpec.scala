package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("mortonExpr interleaves bits exactly (x even positions, y odd)") {
    // bx=3 (011), by=5 (101): bits 0,2 from x; bits 1,5 from y → 39
    val got = Seq((3, 5)).toDF("bx", "by")
      .select(expr(Layout.mortonExpr("bx", "by", 8)).cast("long")).as[Long].head()
    assert(got == 39L)
    // exhaustive 4-bit check against a driver-side reference
    val all = Seq.tabulate(16, 16)((x, y) => (x, y)).flatten.toDF("bx", "by")
      .select(col("bx"), col("by"),
        expr(Layout.mortonExpr("bx", "by", 4)).cast("long").as("z"))
      .as[(Int, Int, Long)].collect()
    all.foreach { case (x, y, z) =>
      val ref = (0 until 4).map(i =>
        (((x >> i) & 1).toLong << (2 * i)) | (((y >> i) & 1).toLong << (2 * i + 1))).sum
      assert(z == ref, s"($x,$y)")
    }
  }

  test("zorderLayoutReport: every file is narrow in BOTH dimensions on a full grid") {
    // 16×16 full grid: a part-sorted layout would give supp_span 1.0 per
    // file; z-ordering must bound both spans by the 32×32 block ≈ 2 key
    // values per dim = 2/16.
    val li = Seq.tabulate(16, 16)((p, s) => (p.toLong, s.toLong)).flatten
      .toDF("l_partkey", "l_suppkey")
    val rep = Layout.zorderLayoutReport(li).collect()
    assert(rep.map(_.getAs[Long]("n_rows")).sum == 256L)
    rep.foreach { r =>
      assert(r.getAs[Double]("part_span") <= 0.125 + 1e-9, r.toString)
      assert(r.getAs[Double]("supp_span") <= 0.125 + 1e-9, r.toString)
    }
  }

  test("compactionPlan: hand-computed bins, pass-through larges, fill ppm") {
    import spark.implicits._
    // source a: smalls 100,200,399 → exclusive cums 0,100,300 → one bin;
    //           larges 400,1000 pass through
    // source b: five smalls of 399 → cums 0,399,798,1197,1596 → bins {0,1}
    val docs = (Seq((1L, 100L), (2L, 200L), (3L, 399L), (4L, 400L), (5L, 1000L))
        .map { case (id, n) => (id, "t", "en", "a", n) } ++
      (10 to 14).map(i => (i.toLong, "t", "en", "b", 399L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Layout.compactionPlan(docs).collect()
      .map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getAs[Long]("n_small") == 3 && a.getAs[Long]("n_large") == 2)
    assert(a.getAs[Long]("n_bins") == 1)
    assert(a.getAs[Long]("files_before") == 5 && a.getAs[Long]("files_after") == 3)
    assert(a.getAs[Long]("fill_ppm") == 699L * 1000000 / 1200)
    val b = r("b")
    assert(b.getAs[Long]("n_bins") == 2 && b.getAs[Long]("n_large") == 0)
    assert(b.getAs[Long]("files_after") == 2)
  }

  test("rangePartitionPlan: heavy key collapses cuts into a pid gap, exact shares") {
    import spark.implicits._
    // key 1 carries half the rows: quartile cuts land [1, 1, 3] → pid 2
    // is empty (the honest range-partition behavior for a hot key)
    val li = (Seq.fill(4)(1L) ++ Seq(2L, 3L, 4L, 5L)).map(Tuple1(_))
      .toDF("l_orderkey")
    val got = Layout.rangePartitionPlan(li, parts = 4).collect()
      .map(r => r.getAs[Long]("pid") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
         r.getAs[Long]("min_key"), r.getAs[Long]("max_key"),
         r.getAs[Long]("dev_ppm"))).toMap
    assert(got.keySet == Set(1L, 3L, 4L))
    assert(got(1L) == ((4L, 1L, 1L, 1L, 1000000L))) // 4 rows vs ideal 2 → +100%
    assert(got(3L) == ((2L, 2L, 2L, 3L, 0L)))
    assert(got(4L) == ((2L, 2L, 4L, 5L, 0L)))
  }

  test("withHilbertIndex matches the classic xy2d recursion on a sampled grid") {
    import spark.implicits._
    // JVM reference: the textbook reflect+swap walk
    def xy2d(n: Int, x0: Int, y0: Int): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1 else 0
        val ry = if ((y & s) > 0) 1 else 0
        d += s.toLong * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val pts = for (x <- 0 until 256 by 7; y <- 0 until 256 by 11) yield (x, y)
    val df = pts.toDF("bx", "by")
    val got = Layout.withHilbertIndex(df, 256)
      .select($"bx", $"by", $"hd").as[(Int, Int, Long)].collect()
    got.foreach { case (x, y, hd) =>
      assert(hd == xy2d(256, x, y), s"($x,$y)")
    }
    // a space-filling curve visits each cell once: indices in a full
    // 4x4 subgrid walk (n=4) are a permutation of 0..15
    val small = (for (x <- 0 until 4; y <- 0 until 4) yield (x, y)).toDF("bx", "by")
    val ds = Layout.withHilbertIndex(small, 4).select($"hd").as[Long].collect().sorted
    assert(ds.toSeq == (0L until 16L))
  }

  test("hilbert layout has no worse mean span than morton on the same data") {
    val li = spark.read.parquet(sf("") + "/lineitem.parquet")
    def meanSpan(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = df.collect()
      rows.map(r => r.getAs[Double]("part_span") + r.getAs[Double]("supp_span")).sum / rows.length
    }
    val h = meanSpan(Layout.hilbertLayoutReport(li))
    val m = meanSpan(Layout.zorderLayoutReport(li))
    assert(h <= m + 1e-9, s"hilbert $h vs morton $m")
  }
}
