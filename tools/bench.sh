#!/usr/bin/env bash
# Bench launcher without sbt stdout decoration: the driver parses the
# LAST JSON line out of a ~2 KB tail of this process's output, and sbt's
# "[info] " prefixes / trailing "[success]" banner have defeated that
# parse three rounds running. This runs the JVM directly, so stdout's
# final line is the bare JSON emitted by graft.Bench.
#
# Usage: tools/bench.sh [sfDir]   (default /root/testdata/sf0.1)
# Compiles via sbt first if the classes directory is missing/stale.
#
# The isolation pass (top-10 queries re-timed one fresh JVM each,
# min-of-2, reported under "isolated") lives INSIDE graft.Bench now, so
# it runs no matter which launcher started the bench — sbt included.
# Skip it with SPARK_GRAFT_NO_ISOLATE=1.
set -euo pipefail
cd "$(dirname "$0")/.."

CLASSES=target/scala-2.13/classes
if [ ! -d "$CLASSES" ] || [ -n "$(find src/main/scala -newer "$CLASSES" -name '*.scala' -print -quit 2>/dev/null)" ]; then
  sbt -batch compile 1>&2
fi

export SPARK_GRAFT_SF_DIR="${1:-${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}}"

ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke
  java.base/java.lang.reflect java.base/java.io
  java.base/java.net java.base/java.nio
  java.base/java.util java.base/java.util.concurrent
  java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs
  java.base/sun.security.action java.base/sun.util.calendar
)
OPENS_FLAGS=()
for p in "${ADD_OPENS[@]}"; do OPENS_FLAGS+=(--add-opens "$p=ALL-UNNAMED"); done

# Spark log noise goes to stderr; stdout carries ONLY the JSON line.
java "${OPENS_FLAGS[@]}" \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" \
  graft.Bench | tail -n 1
