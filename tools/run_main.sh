#!/bin/bash
# Run a graft main class directly against the compiled classes — same JVM
# flags as build.sbt's forked run, without sbt's project lock (lets a
# Verify/Bench run coexist with an sbt test session). Usage:
#   tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/out
# Env: SPARK_DRIVER_MEM (default 32g), SPARK_GRAFT_* as usual.
set -e
cd "$(dirname "$0")/.."
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-32g}" ${SPARK_GRAFT_JVM_OPTS:-} \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
