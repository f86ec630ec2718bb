#!/usr/bin/env bash
# Run a graft main through spark-submit — the production launch path
# (north rule: jobs run via spark-submit on a multi-executor cluster).
# In this sandbox the master is local[N]; on a real cluster swap
# --master for your YARN/K8s endpoint and the same jar + class works
# unchanged (the library only depends on the Spark runtime).
#
# Usage:
#   tools/submit.sh <class> [args...]
# Examples:
#   sbt -batch package
#   tools/submit.sh graft.tools.EntrySmoke
#   tools/submit.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/submit.sh graft.Bench
#   tools/submit.sh graft.PipelineJob /tmp/store --images 3000 --buckets 16
#   tools/submit.sh graft.PipelineJob /tmp/store --rewrite --zorder w,h --verify
set -euo pipefail
CLASS="${1:?usage: tools/submit.sh <main-class> [args...]}"
shift
JAR="$(dirname "$0")/../target/scala-2.13/tubularspark_2.13-0.1.0.jar"
[ -f "$JAR" ] || { echo "jar not found — run: sbt -batch package" >&2; exit 1; }
CORES="${SPARK_GRAFT_CPUS:-8}"
exec /opt/spark/bin/spark-submit \
  --master "local[$CORES]" \
  --conf "spark.sql.shuffle.partitions=$CORES" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.extensions=graft.GraftExtensions \
  --conf spark.ui.enabled=false \
  --class "$CLASS" "$JAR" "$@"
