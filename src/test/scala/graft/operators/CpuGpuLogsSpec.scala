package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CpuGpuLogsSpec extends SparkSpec {
  import spark.implicits._

  test("golden session.log: thread continuation, gpu flagging, multi-session jobs") {
    val lines = CpuGpuLogs.readLogs(spark, "src/test/resources/fixture_logs/session.log")
    val got = CpuGpuLogs.usage(lines)
      .select("job", "cpu_seconds", "gpu_seconds")
      .as[(String, Long, Long)].collect()
      .map { case (j, c, g) => j -> ((c, g)) }.toMap

    // align session 1: 600s × 8 threads (continuation line) = 4800
    // align session 2: 60s × 1 (no --threads → default)      =   60
    // segment: 300s × 1, gpu-flagged                          →  300/300
    assert(got.keySet == Set("align", "segment"))
    assert(got("align") == ((4860L, 0L)))
    assert(got("segment") == ((300L, 300L)))
  }

  test("S17: gzipped logs parse identically through the same reader") {
    // the reference's usage reports read gunzipped transfer logs
    // (generate_usage_report.py:64-151); Spark's text source decompresses
    // .gz transparently, so the SAME readLogs drives both — proven here
    // end-to-end against the plain-file golden results
    val fromGz = CpuGpuLogs.usage(
        CpuGpuLogs.readLogs(spark, "src/test/resources/fixture_logs_gz/session.log.gz"))
      .select("job", "cpu_seconds", "gpu_seconds")
      .as[(String, Long, Long)].collect().toSet
    val fromPlain = CpuGpuLogs.usage(
        CpuGpuLogs.readLogs(spark, "src/test/resources/fixture_logs/session.log"))
      .select("job", "cpu_seconds", "gpu_seconds")
      .as[(String, Long, Long)].collect().toSet
    assert(fromGz == fromPlain && fromGz.nonEmpty)
  }

  test("unpaired starts (still running) charge nothing") {
    val lines = Seq(
      ("f", 1, "[job x] start 2024-01-01 00:00:00 docker run tool"),
      ("f", 2, "[job x] still going")).toDF("file", "line_no", "line")
    assert(CpuGpuLogs.usage(lines).count() == 0)
  }
}
