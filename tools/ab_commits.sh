#!/bin/bash
# Interleaved full-bench A/B across two COMMITS (round before/after
# evidence): alternates checkouts so box-epoch noise hits both sides.
# Requires a clean tree. Usage: ab_commits.sh <rounds> <tagA> <refA> <tagB> <refB>
set -eu
cd /root/repo
rounds="$1"; tagA="$2"; refA="$3"; tagB="$4"; refB="$5"
start_ref=$(git rev-parse --abbrev-ref HEAD)
[ -z "$(git status --porcelain)" ] || { echo "dirty tree"; exit 1; }
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
run_one() {
  local tag="$1" ref="$2" i="$3"
  git checkout -q "$ref"
  SPARK_GRAFT_BENCH_OUT="/tmp/abc_${tag}_${i}.json" \
    sbt -batch "runMain graft.Bench" > "/tmp/abc_${tag}_${i}.log" 2>&1 || true
  echo "done $tag($ref) $i"
}
trap 'git checkout -q "$start_ref"' EXIT
for i in $(seq 1 "$rounds"); do
  run_one "$tagA" "$refA" "$i"
  run_one "$tagB" "$refB" "$i"
done
echo ALLDONE
