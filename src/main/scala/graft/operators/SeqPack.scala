package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Doc-level record for the packing fold. */
final case class PackDoc(shard: Long, doc_id: Long, toks: Long)

/** Context-window SEQUENCE PACKING — the training-batch assembly step a
  * shard-level pipeline runs after curation: stream each shard's
  * documents in doc_id order and pack them whole into fixed-capacity
  * context windows by the NEXT-FIT rule (open a new window when the next
  * doc doesn't fit; docs longer than the window are truncated to it).
  * q67's shard packing splits the token stream at arbitrary offsets;
  * this packs at document granularity, which is what sequence-packed
  * pretraining actually does, and reports the padding waste the packer
  * pays for never splitting a document.
  *
  * Window assignment is inherently SEQUENTIAL in each shard (the bin
  * state is a chain through the docs), so no window function expresses
  * it. The Spark shape is `groupByKey(shard).flatMapSortedGroups(doc_id)`
  * — the one legitimate per-partition-imperative niche SURVEY §2 carves
  * out: Spark's sort-based group iterator streams each shard with O(1)
  * fold state (current fill, bin count), never materializing the group,
  * and shards are the parallelism unit (a 100 TB corpus packs thousands
  * of shards concurrently; one shuffle total). The DuckDB oracle walks
  * the same chain as a recursive CTE — an engine-independent statement
  * of the next-fit recurrence, not a re-implementation detail.
  */
object SeqPack extends QueryModule {

  /** q231: per shard (doc_id mod `shards`): docs, windows opened, token
    * total, and padding waste at capacity `cap`.
    */
  def sequencePacking(documents: DataFrame, cap: Long = 512L, shards: Int = 8): DataFrame = {
    val ss = documents.sparkSession
    import ss.implicits._
    val base = documents.select(
        (col("doc_id") % shards).as("shard"), col("doc_id"),
        least(size(split(col("text"), " ")).cast("long"), lit(cap)).as("toks"))
      .as[PackDoc]
    base.groupByKey(_.shard)
      .flatMapSortedGroups($"doc_id") { (shard: Long, it: Iterator[PackDoc]) =>
        var bins = 0L; var cur = 0L; var n = 0L; var tot = 0L
        it.foreach { d =>
          n += 1; tot += d.toks
          if (bins == 0L || cur + d.toks > cap) { bins += 1; cur = d.toks }
          else cur += d.toks
        }
        if (n == 0L) Iterator.empty
        else Iterator((shard, n, bins, tot, bins * cap - tot))
      }
      .toDF("shard", "n_docs", "n_windows", "total_tokens", "padding_tokens")
      .orderBy("shard")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q231_seq_packing" -> ((s, d) => sequencePacking(Tables(s, d).documents)),
  )

  /** The recursive walk is per-shard single-row state; `n` is referenced
    * from every recursion step, so it is pinned MATERIALIZED (the q223
    * oracle doctrine).
    */
  override def oracles: Map[String, String] = Map(
    "q231_seq_packing" ->
      """WITH RECURSIVE d AS MATERIALIZED (
        |  SELECT doc_id % 8 AS shard, doc_id,
        |         least(len(string_split(text, ' ')), 512)::BIGINT AS toks
        |  FROM documents),
        |n AS MATERIALIZED (
        |  SELECT shard, doc_id, toks,
        |         row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        |  FROM d),
        |walk AS (
        |  SELECT shard, rn, toks AS cur, 1::BIGINT AS bins, toks AS tot
        |  FROM n WHERE rn = 1
        |  UNION ALL
        |  SELECT n.shard, n.rn,
        |         CASE WHEN w.cur + n.toks > 512 THEN n.toks ELSE w.cur + n.toks END,
        |         w.bins + CASE WHEN w.cur + n.toks > 512 THEN 1 ELSE 0 END,
        |         w.tot + n.toks
        |  FROM walk w JOIN n ON n.shard = w.shard AND n.rn = w.rn + 1)
        |SELECT shard, max(rn)::BIGINT AS n_docs,
        |       arg_max(bins, rn)::BIGINT AS n_windows,
        |       arg_max(tot, rn)::BIGINT AS total_tokens,
        |       (arg_max(bins, rn) * 512 - arg_max(tot, rn))::BIGINT AS padding_tokens
        |FROM walk GROUP BY shard ORDER BY shard""".stripMargin,
  )
}
