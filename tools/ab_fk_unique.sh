#!/bin/bash
# Interleaved fresh-JVM A/B protocol (VERDICT r14 next #2): alternate the r13
# verdict commit (279e602, worktree /root/r13wt) against HEAD on the two
# suites whose r14 driver regressions exceeded the documented ambient band
# (foreach_foreign_key 0.50x, foreach_is_unique 0.53x). Same JVM flags, same
# heap (8g protocol), fresh JVM per cell, sides alternate within one session
# so host drift lands on both sides equally.
set -u
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
HEAD_CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
R13_CP="/root/r13wt/target/scala-2.13/classes:/opt/spark/jars/*"

cell() { # $1=side-label $2=classpath $3=suite $4=cell-index
  echo "=== cell side=$1 suite=$3 i=$4 $(date -u +%H:%M:%S) ==="
  SPARK_GRAFT_BENCH_SUITES="$3" SPARK_GRAFT_BENCH_ROWS=10000000 \
  SPARK_GRAFT_BENCH_ROUNDS=1 SPARK_GRAFT_BENCH_NO_ARTIFACTS=1 \
  SPARK_GRAFT_CPUS=32 \
  java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$2" graft.BenchRefMain 2>/dev/null \
    | grep '"metric"'
}

for i in 1 2 3; do
  for suite in foreach_foreign_key foreach_is_unique; do
    cell r13 "$R13_CP" "$suite" "$i"
    cell head "$HEAD_CP" "$suite" "$i"
  done
done
