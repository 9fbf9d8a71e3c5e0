#!/bin/bash
# Run a graft main directly against compiled classes + /opt/spark/jars,
# bypassing sbt (so long sweeps can run while sbt holds the project
# lock). Usage: tools/run_main.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g), SPARK_GRAFT_CPUS
set -e
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  ${SPARK_GRAFT_GC:--XX:+UseParallelGC} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
