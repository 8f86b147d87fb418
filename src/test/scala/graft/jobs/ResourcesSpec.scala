package graft.jobs

import graft.SparkSpec
import graft.jobs.Resources._

class ResourcesSpec extends SparkSpec {

  private val rmap = ResourceMap(Seq(
    DagRule("codex.*", queue = "general", lanes = 2, preserveScratch = true,
      threads = Some(6),
      tasks = Seq(
        TaskRule("heavy_.*", coreuse = Some(200)),
        TaskRule("quarter", coreuse = Some(-1)),
        TaskRule("sub_hundred", coreuse = Some(25)),
        TaskRule("pinned", threads = Some(3), queue = Some("gpu000_q")),
        TaskRule("__default__"))),
    DagRule(".*", queue = "general", lanes = 4, threads = Some(1),
      tasks = Seq(TaskRule(".*")))))

  test("first-match rule order on both levels; task overlays dag values") {
    assert(rmap.queue("codex_v1", Some("pinned")) == "gpu000_q")
    assert(rmap.queue("codex_v1", Some("heavy_step")) == "general")
    assert(rmap.queue("anything_else") == "general")
    assert(rmap.lanes("codex_v1") == 2 && rmap.lanes("other") == 4)
    assert(rmap.preserveScratch("codex_v1") && !rmap.preserveScratch("other"))
  }

  test("threads arithmetic is pinned to the reference, integer division included") {
    // coreuse=200 on 16 cpus: ceil(16 * (200 // 100)) = 32
    assert(rmap.threads("codex_v1", Some("heavy_step"), cpuCount = 16) == 32)
    // non-positive coreuse falls to ceil(cpu/4): ceil(16/4)=4, ceil(18/4)=5
    assert(rmap.threads("codex_v1", Some("quarter"), cpuCount = 16) == 4)
    assert(rmap.threads("codex_v1", Some("quarter"), cpuCount = 18) == 5)
    // the reference's `coreuse // 100` INTEGER division: coreuse=25
    // floors to 0 threads (utils.py:1915) — a latent quirk reproduced
    // faithfully; real maps use coreuse in 100-multiples
    assert(rmap.threads("codex_v1", Some("sub_hundred"), cpuCount = 16) == 0)
    // explicit threads wins when coreuse is absent; None task id → __default__
    assert(rmap.threads("codex_v1", Some("pinned"), cpuCount = 16) == 3)
    assert(rmap.threads("codex_v1", None, cpuCount = 16) == 6)
  }

  test("unmatched dag or task errors like the reference") {
    val narrow = ResourceMap(Seq(DagRule("only_this", queue = "q", lanes = 1,
      tasks = Seq(TaskRule("only_task", threads = Some(1))))))
    intercept[IllegalArgumentException](narrow.lookup("no_match", None))
    intercept[IllegalArgumentException](narrow.lookup("only_this", Some("other_task")))
  }

  test("queue template mapping and scheduler-pool routing") {
    assert(mapQueueName("general", Some("'site_{}'")) == "site_general")
    assert(mapQueueName("general", None) == "general")
    val pool = rmap.applyPool(spark, "codex_v1", Some("pinned"), template = Some("p_{}"))
    assert(pool == "p_gpu000_q")
    assert(spark.sparkContext.getLocalProperty("spark.scheduler.pool") == "p_gpu000_q")
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
  }
}
