package graft.tools

import org.apache.spark.sql.SparkSession

/** In-run contamination probe (optimization r14, VERDICT item 1): the
  * graph heavies (q142/q276/q288) measure ~2x slower late in a full
  * bench run than isolated even after the r13 ContextCleaner fix.
  * This tool bisects WHAT accumulates in the driver process:
  *
  *   1. builds the exact Bench session (same confs, same warm-up),
  *      plus any extra confs from SPARK_GRAFT_PROBE_CONF ("k=v,k=v") so
  *      candidate fixes can be A/B'd without editing Bench;
  *   2. times each target query FRESH (min-of-2, bench hygiene:
  *      Checkpoints.release + System.gc between attempts);
  *   3. replays the bench-order prefix (every query sorted before the
  *      first target, or PROBE_PREFIX_N names) with the same hygiene,
  *      sampling post-GC heap / Metaspace / CodeHeap every 25 queries —
  *      the trajectory that says WHICH pool grows;
  *   4. re-times the targets and prints fresh vs in-run ratios.
  *
  * Usage: runMain graft.tools.InRunProbe <sfDir> <q1,q2,...> [prefixN]
  */
object InRunProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val targets = args(1).split(",").toSeq
    val prefixN = args.drop(2).flatMap(_.toIntOption).headOption
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "2min")
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      b.config(k.trim, v.trim)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def memLine(tag: String): Unit = {
      import scala.jdk.CollectionConverters._
      val mm = java.lang.management.ManagementFactory.getMemoryMXBean
      val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      def mb(n: Long) = n / (1024 * 1024)
      val byName = pools.map(p => p.getName -> mb(p.getUsage.getUsed)).toMap
      val code = byName.filter(_._1.startsWith("CodeHeap")).values.sum
      println(f"[probe-mem] $tag heapMB=${mb(mm.getHeapMemoryUsage.getUsed)} " +
        f"metaspaceMB=${byName.getOrElse("Metaspace", -1L)} codeMB=$code")
    }

    def hygiene(): Unit = { graft.plans.Checkpoints.release(spark); System.gc() }
    def timeOne(name: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      graft.Bench.runFullPlan(fn(spark, sfDir))
      val t = (System.nanoTime() - t0) / 1e9
      hygiene()
      t
    }
    def minOf2(name: String): Double = math.min(timeOne(name), timeOne(name))

    // bench warm-up, verbatim
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      try {
        val p = new java.io.File(s"$sfDir/$t.parquet")
        if (p.exists()) spark.read.parquet(p.getPath).count()
      } catch { case _: Throwable => () }
    }
    try graft.SparkEntry.queries.headOption
      .foreach(q => graft.Bench.runFullPlan(q._2(spark, sfDir)))
    catch { case _: Throwable => () }
    hygiene()

    memLine("start")
    val fresh = targets.map(n => n -> minOf2(n)).toMap
    fresh.foreach { case (n, t) => println(f"[probe] FRESH $n $t%.2f s") }
    memLine("after-fresh")

    val allSorted = graft.SparkEntry.queries.keys.toSeq.sorted
    val prefix = prefixN match {
      case Some(k) => allSorted.take(k)
      case None    => allSorted.takeWhile(n => !targets.contains(n))
    }
    println(s"[probe] replaying ${prefix.size}-query bench prefix")
    prefix.zipWithIndex.foreach { case (n, i) =>
      try timeOne(n)
      catch { case e: Throwable =>
        System.err.println(s"[probe] prefix $n failed: ${e.getMessage}") }
      if ((i + 1) % 25 == 0) memLine(s"prefix-${i + 1}")
    }
    memLine("after-prefix")
    val inRun = targets.map(n => n -> minOf2(n)).toMap
    targets.foreach { n =>
      println(f"[probe] $n fresh=${fresh(n)}%.2f inrun=${inRun(n)}%.2f " +
        f"ratio=${inRun(n) / fresh(n)}%.2f")
    }
    memLine("end")
    spark.stop()
  }
}
