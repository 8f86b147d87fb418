package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S14 (SURVEY.md §2.1; metadata_extract.py:24-47): collection-type
  * dispatch — ordered by `match_priority` descending, first matcher
  * whose structural test passes wins. The reference probes the
  * filesystem with globs per candidate class; here a matcher is a set of
  * `exists` aggregations over the (already-distributed) file-listing
  * DataFrame, so dispatch is one pass over the catalog, not N directory
  * walks.
  */
object CollectionDispatch {

  /** A collection-type matcher: requires ≥1 file matching each regex in
    * `requiredPatterns`, and (optionally) ≥`minMatches` files matching
    * `countPattern`.
    */
  final case class CollectionMatcher(
      name: String,
      priority: Double,
      requiredPatterns: Seq[String],
      countPattern: Option[(String, Long)] = None)

  /** The reference's own priority ladder (multiassay 2.1 > generic 2.0 >
    * AKOYA 1.0 — multiassay_metadatatsv_data_collection.py:22,
    * generic_metadatatsv_data_collection.py:17,
    * akoya_codex_data_collection.py:67-81).
    */
  val defaultMatchers: Seq[CollectionMatcher] = Seq(
    CollectionMatcher("multiassay_metadatatsv", 2.1,
      requiredPatterns = Seq.empty,
      countPattern = Some(("(?i)^[^/]*-metadata\\.tsv$", 2L))),
    CollectionMatcher("generic_metadatatsv", 2.0,
      requiredPatterns = Seq("(?i)^[^/]*metadata\\.tsv$")),
    CollectionMatcher("akoya_codex", 1.0,
      requiredPatterns = Seq("(?i)-metadata\\.tsv$", "(?i)(^|/)(src_[^/]+/)?experiment\\.json$")),
    CollectionMatcher("devtest", 0.5,
      requiredPatterns = Seq("^test\\.yml$")),
  )

  /** Dispatch one dataset's file listing (column `rel_path`) to the
    * highest-priority matching collection type; "unrecognized" if none
    * match. One aggregation pass evaluates every matcher's globs.
    */
  def dispatch(listing: DataFrame,
               matchers: Seq[CollectionMatcher] = defaultMatchers): String = {
    // one distributed pass: count matches per pattern
    val patterns = matchers.flatMap(m =>
      m.requiredPatterns ++ m.countPattern.map(_._1).toSeq).distinct
    val aggs = patterns.zipWithIndex.map { case (p, i) =>
      sum(when(col("rel_path").rlike(p), 1L).otherwise(0L)).as(s"p$i")
    }
    val row = listing.agg(aggs.head, aggs.tail: _*).collect()(0)
    // sum() over zero rows is null — an empty listing matches nothing
    val counts = patterns.zipWithIndex.map { case (p, i) =>
      p -> (if (row.isNullAt(i)) 0L else row.getLong(i))
    }.toMap
    matchers.sortBy(-_.priority).find { m =>
      m.requiredPatterns.forall(p => counts(p) > 0) &&
        m.countPattern.forall { case (p, n) => counts(p) >= n }
    }.map(_.name).getOrElse("unrecognized")
  }

  /** Batch variant: dispatch many datasets at once — listing has
    * (dataset_id, rel_path); returns (dataset_id, collection_type).
    * This is the 100 TB path: one shuffle by dataset_id instead of a
    * driver loop over datasets.
    */
  def dispatchAll(listing: DataFrame,
                  matchers: Seq[CollectionMatcher] = defaultMatchers): DataFrame = {
    val patterns = matchers.flatMap(m =>
      m.requiredPatterns ++ m.countPattern.map(_._1).toSeq).distinct
    val aggs = patterns.zipWithIndex.map { case (p, i) =>
      sum(when(col("rel_path").rlike(p), 1L).otherwise(0L)).as(s"p$i")
    }
    val counted = listing.groupBy("dataset_id").agg(aggs.head, aggs.tail: _*)
    val idx = patterns.zipWithIndex.toMap
    // first-match over priority-sorted matchers as a when-chain
    val chain = matchers.sortBy(-_.priority).foldLeft(lit(null).cast("string")) { (acc, m) =>
      val cond = (m.requiredPatterns.map(p => col(s"p${idx(p)}") > 0) ++
        m.countPattern.map { case (p, n) => col(s"p${idx(p)}") >= n }.toSeq)
        .reduceOption(_ && _).getOrElse(lit(true))
      when(acc.isNotNull, acc).otherwise(when(cond, m.name))
    }
    counted.select(col("dataset_id"),
      coalesce(chain, lit("unrecognized")).as("collection_type"))
  }
}
