#!/usr/bin/env bash
# One ScaleBench/ScaleBenchC kernel per JVM via plain `java -cp` — the
# r14/r18 protocol (multi-minute 150k kernels share no JVM: SURVEY
# §4.13 GCLocker note) without sbt's ~20 s spin-up per kernel. Keep the
# JVM flags in sync with build.sbt's javaOptions.
#
#   tools/scale_run.sh <main> <kernel[,kernel]> <heap> [extra jvm flags]
#   e.g. tools/scale_run.sh graft.ScaleBench sssp 8g
#        tools/scale_run.sh graft.ScaleBenchC ALL 8g   # no kernel filter
#
# Env passthrough: SPARK_GRAFT_SCALE_NODES / _SCALE_FACTOR / _JIT_AUDIT
# / _CPUS / _HASH etc. are read by the mains themselves. The JVM-level
# knobs build.sbt's javaOptions honors (SPARK_GRAFT_GC, SPARK_GRAFT_GC_LOG,
# SPARK_GRAFT_JVM_EXTRA) are derived here too, so an A/B launched through
# either path takes the same flags (ADVICE r19: silently ignoring them
# here made a script-side A/B read as a null result).
set -uo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; KERNELS="$2"; HEAP="$3"; shift 3
CP="target/scala-2.13/classes:/opt/spark/jars/*"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
ENV_FLAGS=""
[ -n "${SPARK_GRAFT_GC:-}" ]     && ENV_FLAGS="$ENV_FLAGS -XX:+Use${SPARK_GRAFT_GC}GC"
[ -n "${SPARK_GRAFT_GC_LOG:-}" ] && ENV_FLAGS="$ENV_FLAGS -Xlog:gc:${SPARK_GRAFT_GC_LOG}"
ENV_FLAGS="$ENV_FLAGS ${SPARK_GRAFT_JVM_EXTRA:-}"
if [ "$KERNELS" != "ALL" ]; then
  export SPARK_GRAFT_SCALE_KERNELS="$KERNELS"
fi
echo "=== $MAIN kernels=$KERNELS heap=$HEAP extra=$* env_flags=$ENV_FLAGS $(date -u +%H:%M:%S) ===" >&2
# GCLocker retry bound: keep in sync with build.sbt javaOptions (same
# measured §4.13 rationale).
# shellcheck disable=SC2086
java $AO -Xmx"$HEAP" -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  $ENV_FLAGS "$@" -cp "$CP" "$MAIN"
rc=$?
echo "=== EXIT=$rc kernels=$KERNELS $(date -u +%H:%M:%S) ===" >&2
exit $rc
