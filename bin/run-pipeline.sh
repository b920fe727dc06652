#!/usr/bin/env bash
# Cluster-submission launcher for the graft pipeline — the Spark-native
# counterpart of the reference's convenience runner (run.preprocess.sh:
# 40-62), which splits the same way into a `cloud` (Dataflow) branch and
# a `local` branch around one shared module invocation. Here both
# branches are spark-submit over the same application jar; only the
# master and the scale knobs change.
#
#   bin/run-pipeline.sh local   <input_dir> <output_dir> [mode] [-- extra...]
#   bin/run-pipeline.sh cluster <input_dir> <output_dir> [mode] [-- extra...]
#
# mode: single_frame (default) | full_video | crop_video — the
# reference's --mode values, forwarded to graft.Main untouched.
# Everything after `--` is passed to spark-submit verbatim (e.g.
# --master k8s://..., --conf spark.executor.instances=1000).
#
# The cluster branch encodes the 100 TB deployment shape the repo's plan
# audits assume (PLAN_AUDIT.md "100 TB operating notes"):
#   - AQE on: runtime coalescing, skew-join splitting, and plan re-opt
#     replace hand-tuned partition counts at scale.
#   - shuffle.partitions sized ~2-3x total executor cores (overridable);
#     files.maxPartitionBytes 256m keeps scan tasks seconds-long on
#     columnar inputs.
#   - spark.graft.checkpointDir MUST point at a cluster-visible path
#     (HDFS/object store): every lineage-truncation point routes through
#     Materialize.materialize(), which upgrades from localCheckpoint to
#     reliable checkpoint exactly when this is set — the single-config
#     fault-tolerance switch for executor loss.
#   - the GraftExtensions session extension ships the native kernels and
#     plan rules to every executor; it is plain --conf, nothing bespoke.
set -euo pipefail
cd "$(dirname "$0")/.."

deploy="${1:?usage: run-pipeline.sh local|cluster <input> <output> [mode]}"
input="${2:?missing input dir}"
output="${3:?missing output dir}"
# mode is optional even when extra args follow: a literal -- in the
# mode position means "default mode, extras start here"
if [ "${4:-}" = "--" ] || [ -z "${4:-}" ]; then mode=single_frame; else mode="$4"; fi
shift $(( $# > 4 ? 4 : $# ))
[ "${1:-}" = "--" ] && shift

SPARK_HOME="${SPARK_HOME:-/opt/spark}"
JAR="target/scala-2.13/videostotfrecordsspark_2.13-0.1.0.jar"
[ -f "$JAR" ] || sbt -batch package

COMMON=(
  --class graft.Main
  --conf spark.sql.extensions=graft.functions.GraftExtensions
  --conf spark.sql.adaptive.enabled=true
  --conf spark.sql.adaptive.skewJoin.enabled=true
  --conf spark.serializer=org.apache.spark.serializer.KryoSerializer
)

case "$deploy" in
  local)
    exec "$SPARK_HOME/bin/spark-submit" \
      --master "local[${GRAFT_LOCAL_CORES:-*}]" \
      --conf spark.sql.shuffle.partitions="${GRAFT_SHUFFLE_PARTITIONS:-32}" \
      "${COMMON[@]}" "$@" \
      "$JAR" --input_dir "$input" --output_dir "$output" --mode "$mode"
    ;;
  cluster)
    # master/deploy-mode come from the caller's extra args or their
    # cluster's spark-defaults (yarn, k8s://, spark://...); the knobs
    # below are the 100 TB shape and stay overridable by later --conf
    exec "$SPARK_HOME/bin/spark-submit" \
      --deploy-mode cluster \
      --conf spark.sql.shuffle.partitions="${GRAFT_SHUFFLE_PARTITIONS:-4000}" \
      --conf spark.sql.files.maxPartitionBytes=256m \
      --conf spark.dynamicAllocation.enabled=true \
      --conf spark.dynamicAllocation.shuffleTracking.enabled=true \
      --conf spark.graft.checkpointDir="${GRAFT_CHECKPOINT_DIR:?cluster runs need a cluster-visible GRAFT_CHECKPOINT_DIR}" \
      "${COMMON[@]}" "$@" \
      "$JAR" --input_dir "$input" --output_dir "$output" --mode "$mode"
    ;;
  *)
    echo "unknown deploy type '$deploy' (want local|cluster)" >&2
    exit 2
    ;;
esac
