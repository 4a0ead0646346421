#!/bin/bash
# Direct-JVM runner for graft mains: same flags as build.sbt's forked run,
# without sbt's project lock or startup. Usage: tools/run.sh graft.Bench [args...]
# Env passthrough: SPARK_GRAFT_* as usual; SPARK_DRIVER_MEM for -Xmx.
cd "$(dirname "$0")/.." || exit 1
CP="target/scala-2.13/classes:fixtures:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
