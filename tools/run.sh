#!/bin/bash
# Fast runner for graft mains without sbt startup overhead.
# Usage: tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
set -e
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
# Own warehouse dir: session artifacts (bucketed tables, IVF cells) are
# rebuilt-if-stale by stamp, but a run.sh JVM rebuilding them under
# ./spark-warehouse while an sbt-test JVM holds cached file listings of
# the same tables throws FILE_NOT_EXIST in the tests. Separate roots
# make the two JVM populations collision-free; artifacts still reuse
# across run.sh invocations.
# GRAFT_JAVA_OPTS: extra JVM flags (diagnostics like -Xlog:codecache,
# experiments like -XX:ReservedCodeCacheSize=...) without editing here.
exec java $OPENS $GRAFT_JAVA_OPTS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.sql.warehouse.dir="${SPARK_GRAFT_WAREHOUSE:-/tmp/graft_run_warehouse}" \
  -cp "$CP" "$@"
