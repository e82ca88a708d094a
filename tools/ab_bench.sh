#!/bin/bash
# Interleaved full-bench A/B driver for optimization rounds: alternates two
# configurations (env overrides) across N rounds so box-epoch noise hits
# both sides equally. Usage: ab_bench.sh <rounds> <tagA> <envA> <tagB> <envB>
# where envX is a KEY=VAL[,KEY=VAL...] list applied to that side's run.
set -u
cd /root/repo
rounds="$1"; tagA="$2"; envA="$3"; tagB="$4"; envB="$5"
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
run_one() {
  local tag="$1" envs="$2" i="$3"
  ( IFS=','; for kv in $envs; do [ -n "$kv" ] && export "$kv"; done
    SPARK_GRAFT_BENCH_OUT="/tmp/ab_${tag}_${i}.json" \
      sbt -batch "runMain graft.Bench" > "/tmp/ab_${tag}_${i}.log" 2>&1 )
  echo "done $tag $i rc=$?"
}
for i in $(seq 1 "$rounds"); do
  run_one "$tagA" "$envA" "$i"
  run_one "$tagB" "$envB" "$i"
done
echo ALLDONE
