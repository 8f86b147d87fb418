package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A4/W6 faithful form (SURVEY.md §2.5; extra_utils.py:184-257): per-job
  * CPU/GPU seconds from pipeline session logs. The reference walks each
  * log with an imperative line-machine; here the same semantics are
  * window functions over (file, line_no)-ordered lines:
  *
  *  - a job START line carries a timestamp and the job name;
  *  - a `--threads \` option is continued on the NEXT line (the
  *    `lead()` pairing the survey calls out);
  *  - a GPU marker anywhere in the job's span flags it;
  *  - a job END line closes the most recent open start of that job
  *    (`last(_, ignoreNulls)` carry-forward);
  *  - cpu_seconds = duration × thread count (1 if absent);
  *    gpu_seconds = duration when GPU-flagged.
  */
object CpuGpuLogs {

  private val TsPattern = "(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2})"

  /** Read raw log lines with provenance: (file, line_no, line). */
  def readLogs(spark: SparkSession, path: String): DataFrame = {
    val w = Window.partitionBy("file").orderBy("offset")
    spark.read.text(path)
      .select(input_file_name().as("file"), col("value").as("line"))
      .withColumn("offset", monotonically_increasing_id())
      .withColumn("line_no", row_number().over(w))
      .drop("offset")
  }

  /** Sessionize start/end pairs per (file, job) and charge seconds.
    *
    * Every line is attributed to the most recent `[job ...]` tag in its
    * file (context fill-down — continuation lines like the `--threads`
    * count carry no tag of their own); sessions are numbered by
    * cumulative start count per (file, job); attributes aggregate per
    * session, so a thread count never leaks across jobs or sessions.
    */
  def usage(lines: DataFrame): DataFrame = {
    val byLine = Window.partitionBy("file").orderBy("line_no")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leadLine = Window.partitionBy("file").orderBy("line_no")
    val parsed = lines
      .withColumn("job_tag", regexp_extract(col("line"), "^\\[job ([^\\]]+)\\]", 1))
      .withColumn("start_ts",
        when(col("line").rlike("\\[job [^\\]]+\\] start"),
          to_timestamp(regexp_extract(col("line"), TsPattern, 1))))
      .withColumn("end_ts",
        when(col("line").rlike("\\[job [^\\]]+\\] completed success"),
          to_timestamp(regexp_extract(col("line"), TsPattern, 1))))
      // `--threads \` puts the count on the NEXT line → lead() pairing
      .withColumn("threads_next",
        when(col("line").rlike("--threads \\\\$"),
          lead(trim(col("line")), 1).over(leadLine).cast("int")))
      .withColumn("gpu_marker", col("line").rlike("(?i)gpu"))
      .withColumn("ctx_job",
        last(when(col("job_tag") =!= "", col("job_tag")), ignoreNulls = true).over(byLine))
      .filter(col("ctx_job").isNotNull)
    val bySession = Window.partitionBy("file", "ctx_job").orderBy("line_no")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parsed
      .withColumn("session_id",
        sum(when(col("start_ts").isNotNull, 1).otherwise(0)).over(bySession))
      .groupBy("file", "ctx_job", "session_id")
      .agg(min(col("start_ts")).as("start_ts"),
           max(col("end_ts")).as("end_ts"),
           max(col("threads_next")).as("threads"),
           max(when(col("gpu_marker"), 1).otherwise(0)).as("gpu"))
      .filter(col("start_ts").isNotNull && col("end_ts").isNotNull)
      .select(col("file"), col("ctx_job").as("job"),
        (unix_timestamp(col("end_ts")) - unix_timestamp(col("start_ts"))).as("dur_s"),
        coalesce(col("threads"), lit(1)).as("threads"),
        (col("gpu") === 1).as("gpu"))
      .groupBy("file", "job")
      .agg(sum(col("dur_s") * col("threads")).as("cpu_seconds"),
           sum(when(col("gpu"), col("dur_s")).otherwise(0L)).as("gpu_seconds"))
      .orderBy("file", "job")
  }
}
