package graft.sinks

import graft.SparkSpec

class ObservedSinkSpec extends SparkSpec {
  import spark.implicits._

  test("observedParquetWrite: gate metrics ride the write's own scan") {
    val docs = Seq(
      (1L, "x" * 300), (2L, "short"), (3L, null.asInstanceOf[String]), (4L, "y" * 250))
      .toDF("doc_id", "text")
    val dest = java.nio.file.Files.createTempDirectory("obs_sink").toString + "/out"
    val m = ObservedSink.observedParquetWrite(docs, dest)
    assert(m == Map("n_rows" -> 4L, "n_null_text" -> 1L, "n_short" -> 1L))
    // the data actually landed, in full
    assert(spark.read.parquet(dest).count() == 4L)
  }
}
