package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Single-pass QA metrics DURING a write via `Dataset.observe` — the
  * observability primitive a 100 TB materialization step needs: the
  * quality counters (row count, null payloads, short docs) ride the
  * write's own scan as accumulator-style observed metrics, so the
  * validation that would otherwise be a SECOND full pass over the
  * output costs nothing. This is the declarative replacement for the
  * reference's post-hoc QA re-reads (ingest-validation checks run as
  * separate passes over written datasets).
  *
  * `observe` metrics are delivered to [[QueryExecutionListener]]s
  * asynchronously after the action; [[observedParquetWrite]] polls
  * briefly for arrival (bounded, no busy spin) and unregisters the
  * listener either way.
  */
object ObservedSink {

  /** Write `df` to parquet at `dest` while collecting gate metrics in
    * the same pass. Returns (n_rows, n_null_text, n_short).
    */
  def observedParquetWrite(df: DataFrame, dest: String,
                           minChars: Int = 200): Map[String, Long] = {
    val spark = df.sparkSession
    @volatile var got: Option[Map[String, Long]] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        qe.observedMetrics.get("graft_gate").foreach { row =>
          got = Some(row.schema.fieldNames.map(n =>
            n -> row.getAs[Any](n).asInstanceOf[Number].longValue()).toMap)
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      df.observe("graft_gate",
          count(lit(1)).as("n_rows"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_null_text"),
          sum(when(length(col("text")) < minChars, 1L).otherwise(0L)).as("n_short"))
        .write.mode("overwrite").parquet(dest)
      // listener delivery is async; bounded wait
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (got.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      got.getOrElse(sys.error("observed metrics were not delivered within 10 s"))
    } finally spark.listenerManager.unregister(listener)
  }
}
