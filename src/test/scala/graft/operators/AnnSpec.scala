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

  test("assignCells matches a driver-side argmin oracle at k=64") {
    val centroids = Ann.trainCentroids(emb, k = 64, iters = 1)
    val got = Ann.assignCells(emb, centroids)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val vecs = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    vecs.foreach { case (id, v) =>
      val scores = centroids.map { c =>
        val dot = c.indices.map(j => v(j).toDouble * c(j).toDouble).sum
        c.map(x => x.toDouble * x.toDouble).sum - 2.0 * dot
      }
      val expect = scores.indices.minBy(i => (scores(i), i))
      assert(got(id) == expect, s"vec $id")
    }
  }

  test("assignCells plan size is independent of k (referenced matrix, not literals)") {
    val small = Ann.assignCells(emb, Ann.trainCentroids(emb, k = 2, iters = 1))
      .queryExecution.optimizedPlan.treeString.length
    val large = Ann.assignCells(emb, Ann.trainCentroids(emb, k = 256, iters = 1))
      .queryExecution.optimizedPlan.treeString.length
    // the literal-nest formulation grew the plan ~linearly in k×dim;
    // the referenced-object kernel must not
    assert(math.abs(large - small) < 200,
      s"plan grew with k: k=2 → $small chars, k=256 → $large chars")
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