#!/bin/bash
# Round-close gate runner (SURVEY §9): runs the five-corpus oracle posture
# on the CURRENT compiled classes via plain java (no sbt lock), one gate per
# invocation. Usage: round_close.sh <gate> where gate is one of
#   sf001 | sf01 | zipf | docs100x
# Corpora: /root/testdata/sf0.01, /root/testdata/sf0.1, /tmp/sf1x10z
# (symlinked as /tmp/sfzipf10), /tmp/sfdocs100x — regenerate via
# tools/make_10x_zipf.py / make_docs_100x.py after a reboot (then seed
# sfdocs100x with sf0.1's relational tables).
set -u
R=${GRAFT_ROUND:-r12}
cd "$(dirname "$0")/.."
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
CP="target/scala-2.13/classes:/opt/spark/jars/*"
run_verify() { # dir out mem (SPARK_GRAFT_CPUS set by caller, default 16)
  # capture java's own exit status (round-11 ADVICE: `| grep || true`
  # swallowed a crashed/OOM'd verify and let the gate score a stale or
  # partial output directory as if it were fresh)
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} java -Xmx"$3" $ADDOPENS -Dspark.ui.enabled=false -cp "$CP" \
    graft.Verify "$1" "$2" 2>&1 | grep -E "\[verify\].*(failed|wrote _errors)"
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "GATE ABORT: graft.Verify exited rc=$rc — not running the oracle on $2" >&2
    exit "$rc"
  fi
}
case "$1" in
  sf001)
    run_verify /root/testdata/sf0.01 "/tmp/verify_sf001_$R" 8g
    python3 tools/oracle_check.py "/tmp/verify_sf001_$R" /root/testdata/sf0.01 | tail -3 ;;
  sf01)
    run_verify /root/testdata/sf0.1 "/tmp/verify_sf01_$R" 16g
    python3 tools/oracle_check.py "/tmp/verify_sf01_$R" /root/testdata/sf0.1 | tail -3 ;;
  zipf)
    run_verify /tmp/sf1x10z "/tmp/verify_zipf10_$R" 24g
    python3 tools/oracle_check.py "/tmp/verify_zipf10_$R" /tmp/sf1x10z \
      --ulp1 ts_anomaly,ts_moving_avg --timeout 600 --memlimit 48GB \
      | tee /tmp/oracle_zipf_full.log | grep -E "^FAIL|^TIMEOUT|RESULT" ;;
  docs100x)
    run_verify /tmp/sfdocs100x "/tmp/verify_100x_$R" 24g
    python3 tools/oracle_check.py "/tmp/verify_100x_$R" /tmp/sfdocs100x \
      --ulp1 ts_anomaly,ts_moving_avg --timeout 600 --memlimit 48GB \
      | tee /tmp/oracle_100x_full.log | grep -E "^FAIL|^TIMEOUT|RESULT" ;;
  *) echo "unknown gate $1"; exit 2 ;;
esac
