#!/bin/bash
# A/B: does -XX:ActiveProcessorCount=N change local[N] build wall time?
# (Both arms: fresh JVM via spark-submit, same corpus, local[4].)
set -u
JAR=target/scala-2.13/tantivyspark_2.13-0.1.0.jar
CORPUS=/dev/shm/graft-bench/corpus-1200000.parquet
run() { # $1 = extra driver java opts, $2 = label
  local dir; dir=$(mktemp -d /dev/shm/graft-bench/apc-XXXX)
  /opt/spark/bin/spark-submit \
    --master "local[4]" --driver-memory 28g \
    --driver-java-options "$1" \
    --conf spark.sql.shuffle.partitions=16 \
    --conf spark.scheduler.mode=FAIR \
    --conf spark.local.dir=/dev/shm/graft-spark-local \
    --conf spark.ui.enabled=false \
    --class graft.BuildIndex "$JAR" \
    --input-path "$CORPUS" --index "$dir/idx" \
    --segments 32 --no-positions true 2>/dev/null | grep committed | sed "s/^/[$2] /"
  rm -rf "$dir"
}
for i in 1 2; do
  run ""                             "default-$i"
  run "-XX:ActiveProcessorCount=4"   "apc4-$i"
done
