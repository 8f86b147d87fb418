#!/bin/bash
# Builder-side: two back-to-back full sf0.1 benches (noise-band evidence)
# followed by the sf1 scale-slope bench. Plain `java` (same opts as
# build.sbt's forked run) so sbt's build lock stays free for foreground
# work. Artifacts:
#   /tmp/bench_full_run{1,2}.json + *_detail  (sf0.1 back-to-back)
#   target/bench_sf1.json + _detail           (sf1 slope numerator)
set -u
cd /root/repo
# snapshot the compiled classes: foreground sbt recompiles must not swap
# class files under a running bench JVM
rm -rf /tmp/graft_bench_classes
cp -r target/scala-2.13/classes /tmp/graft_bench_classes
CP="/tmp/graft_bench_classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# own warehouse per script run: the shared bucketed graph artifacts must
# not race foreground test JVMs using ./spark-warehouse
JAVA="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.sql.warehouse.dir=/tmp/graft_bench_wh -Dderby.system.home=/tmp/graft_bench_wh -Xmx8g -cp $CP"
rm -rf /tmp/graft_bench_wh

echo "=== sf0.1 run 1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $JAVA graft.Bench \
  > /tmp/bench_run1.out 2>/tmp/bench_run1.err
cp target/bench_full.json /tmp/bench_full_run1.json
cp target/bench_full_detail.json /tmp/bench_detail_run1.json

echo "=== sf0.1 run 2 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 $JAVA graft.Bench \
  > /tmp/bench_run2.out 2>/tmp/bench_run2.err
cp target/bench_full.json /tmp/bench_full_run2.json
cp target/bench_full_detail.json /tmp/bench_detail_run2.json

echo "=== sf1 scale run ==="
SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
SPARK_GRAFT_BENCH_OUT=target/bench_sf1.json \
SPARK_GRAFT_RETIME_SEC=10 \
$JAVA -Xmx24g graft.Bench \
  > /tmp/bench_sf1.out 2>/tmp/bench_sf1.err
echo "=== done ==="
