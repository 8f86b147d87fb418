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
}
