package graft.operators

import graft.SparkSpec
import graft.Tables

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf("")).embeddings

  test("assignCells puts every vector in exactly one of k cells") {
    val centroids = Ann.trainCentroids(emb, k = 4, iters = 2)
    val cells = Ann.assignCells(emb, centroids)
      .select("cell").as[Int].collect()
    assert(cells.length == emb.count())
    assert(cells.forall(c => c >= 0 && c < 4))
    assert(cells.distinct.length > 1) // not degenerate
  }

  test("ivfTopK with all cells probed equals brute-force top-k") {
    val centroids = Ann.trainCentroids(emb, k = 4, iters = 2)
    val query = emb.filter($"vec_id" === 0L).select("embedding")
      .head().getSeq[Float](0).toArray
    val ivf = Ann.ivfTopK(emb.filter($"vec_id" =!= 0L), centroids, query, k = 5, nprobe = 4)
      .select("vec_id").as[Long].collect().toSeq
    val brute = Similarity.cosineTopK(emb, 0L, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf == brute)
  }

  test("ivfTopK with nprobe=1 returns results from the probed cell only") {
    val centroids = Ann.trainCentroids(emb, k = 4, iters = 2)
    val query = emb.filter($"vec_id" === 0L).select("embedding")
      .head().getSeq[Float](0).toArray
    val got = Ann.ivfTopK(emb, centroids, query, k = 5, nprobe = 1)
    assert(got.select("cell").distinct().count() == 1)
    assert(got.count() == 5)
  }
  test("persisted index probes prune partitions and match the in-memory probe") {
    val centroids = Ann.trainCentroids(emb, k = 4, iters = 2)
    val query = emb.filter($"vec_id" === 0L).select("embedding")
      .head().getSeq[Float](0).toArray
    val dir = java.nio.file.Files.createTempDirectory("ivf").toFile.getAbsolutePath
    Ann.writeIndex(emb, centroids, dir)
    val probed = Ann.probeIndex(spark, dir, centroids, query, k = 5, nprobe = 2)
    probed.collect()
    val scanText = probed.queryExecution.executedPlan.toString
    // the cell filter must reach the scan as a partition filter, not a
    // post-scan row filter: that's the nprobe/k read-volume claim
    assert(scanText.contains("PartitionFilters: [cell#") ||
           scanText.contains("PartitionFilters: [isnotnull(cell") ||
           scanText.contains("PartitionFilters: [cell"),
      s"expected partition pruning on cell:\n$scanText")
    val inMemory = Ann.ivfTopK(emb, centroids, query, k = 5, nprobe = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(probed.select("vec_id").as[Long].collect().toSeq == inMemory)
  }
}