package graft.sinks

import org.apache.spark.sql.Dataset

/** K7/A8 (SURVEY.md §2.2, §2.5; launch_checksums.py:34 RECS_PER_BLOCK=100,
  * split_and_create.py:509-521 chunks of 10 + pacing): batched external
  * sink — partition-parallel delivery in fixed-size blocks with optional
  * pacing, the `foreachPartition` + `grouped(n)` pattern. Rate limiting
  * is sink policy, not an operator: the DataFrame side stays pure.
  */
object BatchedSink {

  /** Deliver `ds` in blocks of `blockSize` per partition. `send` runs on
    * executors — it must be serializable and idempotent (at-least-once
    * on task retry, like the reference's re-POST semantics).
    */
  def foreachBatched[T](ds: Dataset[T], blockSize: Int, paceMillis: Long = 0L)
                       (send: Seq[T] => Unit): Unit =
    ds.foreachPartition { (it: Iterator[T]) =>
      it.grouped(blockSize).foreach { block =>
        send(block)
        if (paceMillis > 0) Thread.sleep(paceMillis)
      }
    }
}
