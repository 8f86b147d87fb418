#!/bin/bash
# Builder-side scale-evidence matrix (round 11). Plain `java` (same opts
# as build.sbt's forked run) so sbt's build lock stays free for
# foreground work. All builder sweeps run the PRODUCTION config
# (SPARK_GRAFT_AUTOSIZE=true); the driver's own per-round bench sets
# nothing and so stays on the oracle-pinned defaults.
#
# Stages (skippable via BENCH_STAGES="1 3 5"-style allowlist):
#   1  sf0.1 x2 back-to-back          -> /tmp/bench_full_run{1,2}.json
#   2  sf1 uniform (slope numerator)  -> target/bench_sf1.json
#   3  sf1 SKEWED (hot key/bucket/hub)-> target/bench_skew.json
#   3b sf1 SKEWED, oracle defaults    -> target/bench_skew_default.json
#   4  sf1 uniform at -Xmx8g          -> target/bench_sf1_8g.json
#   5  30x structural subset          -> target/bench_sf3_subset.json
#   6  100x structural subset         -> target/bench_sf10_subset.json
#   R  IVF recall probes (10x/30x)    -> target/recall_sf{1,3}.json
#
# Prereqs (MakeScale writes these):
#   /tmp/graft_sf1       = MakeScale sf0.1 -> 10x uniform
#   /tmp/graft_sf1_skew  = MakeScale sf0.1 -> 10x skew
#   /tmp/graft_sf3       = MakeScale sf0.1 -> 30x uniform
#   /tmp/graft_sf10      = MakeScale sf0.1 -> 100x uniform (stage 6)
set -u
cd /root/repo
STAGES="${BENCH_STAGES:-1 2 3 3b 4 5 6 R}"
has_stage() { case " $STAGES " in *" $1 "*) return 0;; *) return 1;; esac; }

# snapshot the compiled classes: foreground sbt recompiles must not swap
# class files under a running bench JVM
rm -rf /tmp/graft_bench_classes
cp -r target/scala-2.13/classes /tmp/graft_bench_classes
CP="/tmp/graft_bench_classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# own warehouse per script run: the shared bucketed graph artifacts must
# not race foreground test JVMs using ./spark-warehouse
JAVA="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.sql.warehouse.dir=/tmp/graft_bench_wh -Dderby.system.home=/tmp/graft_bench_wh -cp $CP"
rm -rf /tmp/graft_bench_wh
export SPARK_GRAFT_AUTOSIZE=true

# the ~30 structurally interesting queries (graph, dedup/LSH, similarity,
# clustering, recursion, heavy text, sessions) for the standing 30x point
STRUCT30="q100_vocab_stats q117_source_overlap q126_density_outliers q142_triangles q143_pagerank q146_activity_islands q155_ngram_novelty q176_kmeans q177_semdedup q19_text_normalize q205_indexed_dedup q20_dedup_exact q212_hits q216_ppjoin_exact q219_hierarchy_rollup q224_cheapest_paths q232_label_propagation q267_ivf_recall q276_clustering_coef q295_ivfpq_recall q296_dbscan q305_margin_mining q316_hyperball q326_blocking_quality q33_minhash_signatures q35_lsh_candidates q36_blocked_pairs q52_simhash_buckets q58_neardup_clusters q59_ann_ivf q65_multiband_lsh q70_knn_join q76_srp_neardup q84_srp_clusters q92_neardup_canonical q98_simhash_pairs"

if has_stage 1; then
  # own history file: these sf0.1 runs are PRODUCTION config (autosize),
  # so they must not overwrite target/bench_full.json — the oracle-default
  # history the driver's full runs read for the 3x noise guard (r11 advice)
  echo "=== stage 1: sf0.1 run 1 ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=target/bench_sf01_prod.json \
  $JAVA -Xmx8g graft.Bench \
    > /tmp/bench_run1.out 2>/tmp/bench_run1.err
  cp target/bench_sf01_prod.json /tmp/bench_full_run1.json
  cp target/bench_sf01_prod_detail.json /tmp/bench_detail_run1.json 2>/dev/null || true
  echo "=== stage 1: sf0.1 run 2 ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=target/bench_sf01_prod.json \
  $JAVA -Xmx8g graft.Bench \
    > /tmp/bench_run2.out 2>/tmp/bench_run2.err
  cp target/bench_sf01_prod.json /tmp/bench_full_run2.json
  cp target/bench_sf01_prod_detail.json /tmp/bench_detail_run2.json 2>/dev/null || true
fi

if has_stage 2; then
  echo "=== stage 2: sf1 uniform ==="
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
  SPARK_GRAFT_BENCH_OUT=target/bench_sf1.json \
  SPARK_GRAFT_RETIME_SEC=10 SPARK_GRAFT_TIMEOUT_SEC=600 \
  $JAVA -Xmx24g graft.Bench \
    > /tmp/bench_sf1.out 2>/tmp/bench_sf1.err
fi

if has_stage 3; then
  echo "=== stage 3: sf1 skewed (hot join key / stream key / LSH clique / graph hub) ==="
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf1_skew \
  SPARK_GRAFT_BENCH_OUT=target/bench_skew.json \
  SPARK_GRAFT_RETIME_SEC=10 SPARK_GRAFT_TIMEOUT_SEC=600 \
  $JAVA -Xmx24g graft.Bench \
    > /tmp/bench_skew.out 2>/tmp/bench_skew.err
fi

if has_stage 3b; then
  # ORACLE-DEFAULT config on the skew corpus (r11 verdict item 4): the
  # default-config clique risk recorded next to the production number,
  # not inferred. Subset = the five skew-sensitive shapes; 900 s timeout
  # so a degenerate default is a recorded sentinel, not a hung sweep.
  echo "=== stage 3b: sf1 skewed, oracle defaults (no autosize) ==="
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf1_skew \
  SPARK_GRAFT_BENCH_OUT=target/bench_skew_default.json \
  SPARK_GRAFT_RETIME_SEC=10 SPARK_GRAFT_TIMEOUT_SEC=900 \
  env -u SPARK_GRAFT_AUTOSIZE \
  $JAVA -Xmx24g graft.Bench \
    q84_srp_clusters q132_error_attribution q177_semdedup q288_adamic_adar q76_srp_neardup \
    > /tmp/bench_skew_default.out 2>/tmp/bench_skew_default.err
fi

if has_stage 4; then
  echo "=== stage 4: sf1 uniform, constrained heap (-Xmx8g) ==="
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
  SPARK_GRAFT_BENCH_OUT=target/bench_sf1_8g.json \
  SPARK_GRAFT_RETIME_SEC=10 SPARK_GRAFT_TIMEOUT_SEC=600 \
  $JAVA -Xmx8g graft.Bench \
    > /tmp/bench_sf1_8g.out 2>/tmp/bench_sf1_8g.err
fi

if has_stage 5; then
  echo "=== stage 5: 30x structural subset ==="
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf3 \
  SPARK_GRAFT_BENCH_OUT=target/bench_sf3_subset.json \
  SPARK_GRAFT_RETIME_SEC=30 SPARK_GRAFT_TIMEOUT_SEC=600 \
  $JAVA -Xmx24g graft.Bench $STRUCT30 \
    > /tmp/bench_sf3.out 2>/tmp/bench_sf3.err
fi

if has_stage 6; then
  # the 100x point (r12 verdict item 1): the next decade past the 30x
  # stage that caught the q326 int64 wrap and the q296 under-merge.
  # Cap sized to the adjudicated super-linear classes (q36 contract-
  # quadratic ~(10/3)^2 x its 90 s sf3 reading; q142 wedge growth):
  # a clean run has zero sentinels, a degenerate one records WHICH
  # query and WHY (timeout -1 vs failure -2) instead of wedging.
  echo "=== stage 6: 100x structural subset ==="
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 \
  SPARK_GRAFT_BENCH_OUT=target/bench_sf10_subset.json \
  SPARK_GRAFT_RETIME_SEC=120 SPARK_GRAFT_TIMEOUT_SEC=2400 \
  $JAVA -Xmx48g graft.Bench $STRUCT30 \
    > /tmp/bench_sf10.out 2>/tmp/bench_sf10.err
fi

if has_stage R; then
  # IVF recall at the autosized kc on the ORGANIC scale corpora (r12
  # verdict item 2): the planted spec proves the mechanism; this
  # records the law's recall trade per round on real data, with an
  # nprobe curve at the derived kc for SCALE.md.
  echo "=== stage R: IVF recall probes (production config) ==="
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
  SPARK_GRAFT_RECALL_OUT=target/recall_sf1.json \
  $JAVA -Xmx24g graft.tools.RecallProbe \
    > /tmp/recall_sf1.out 2>/tmp/recall_sf1.err
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf3 \
  SPARK_GRAFT_RECALL_OUT=target/recall_sf3.json \
  $JAVA -Xmx24g graft.tools.RecallProbe \
    > /tmp/recall_sf3.out 2>/tmp/recall_sf3.err
fi
echo "=== done ==="
