#!/bin/bash
# One Bench sitting: record_bench.sh <sfDir> <out.json> [classpathDir]
# Runs graft.Bench at local[32] against <sfDir>, writes the single
# JSON line to <out.json> (stderr to <out.json>.err). Dev tooling.
set -e
SF=${1:?usage: record_bench.sh <sfDir> <out.json> [classesDir]}
OUT=${2:?usage: record_bench.sh <sfDir> <out.json> [classesDir]}
CLASSES=${3:-/root/repo/target/scala-2.13/classes}
AO="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED --add-opens=jdk.httpserver/sun.net.httpserver=ALL-UNNAMED"
SPARK_GRAFT_SF_DIR="$SF" java $AO -Xmx28g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" graft.Bench 2>"$OUT.err" \
  | grep -o '{"metric".*' > "$OUT"
