package graft.sinks

import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec

object BatchCollector {
  val batches = new ConcurrentLinkedQueue[Int]()
}

class BatchedSinkSpec extends SparkSpec {
  import spark.implicits._

  test("delivers every record in blocks of at most blockSize") {
    BatchCollector.batches.clear()
    val ds = spark.range(0, 250).map(_.toInt).repartition(3)
    BatchedSink.foreachBatched(ds, blockSize = 100) { block =>
      BatchCollector.batches.add(block.size); ()
    }
    val sizes = BatchCollector.batches.toArray(Array.empty[Integer]).map(_.toInt)
    assert(sizes.sum == 250)
    assert(sizes.forall(_ <= 100))
    assert(sizes.count(_ == 100) >= 1 || sizes.length >= 3)
  }
}
