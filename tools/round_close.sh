#!/bin/bash
# Round-close gate runner (SURVEY §9): runs the close gates on the CURRENT
# compiled classes via plain java (no sbt lock), one gate per invocation,
# and APPENDS each gate's result to bench/CLOSE_${GRAFT_ROUND}.md so the
# close is auditable from the committed repo (round-12 verdict #1 — the
# /tmp corpora and verify outputs do not survive reboots, so the committed
# artifact is the only durable record). Usage: round_close.sh <gate>:
#   suite | sf001 | sf01 | zipf | docs100x | secondshape
# Corpora: /root/testdata/sf0.01, /root/testdata/sf0.1, /tmp/sf1x10z
# (symlinked as /tmp/sfzipf10), /tmp/sfdocs100x — regenerate via
# tools/make_10x_zipf.py / make_docs_100x.py after a reboot (then seed
# sfdocs100x with sf0.1's relational tables).
set -u
R=${GRAFT_ROUND:-r13}
cd "$(dirname "$0")/.."
CLOSE="bench/CLOSE_${R}.md"
if [ ! -f "$CLOSE" ]; then
  printf '# Round close gates — %s\n\nAppended by tools/round_close.sh, one section per gate run.\n' "$R" > "$CLOSE"
fi
stamp() { # gate name -> section header with time + HEAD the gate ran on
  printf '\n## %s — %s @ %s\n\n```\n' "$1" "$(date -u +%FT%TZ)" "$(git rev-parse --short HEAD)$(git diff --quiet && git diff --cached --quiet || echo '+dirty')" >> "$CLOSE"
}
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
    echo "GATE ABORT: graft.Verify exited rc=$rc" >> "$CLOSE"
    echo '```' >> "$CLOSE"
    exit "$rc"
  fi
}
case "$1" in
  suite)
    stamp suite
    sbt -batch test 2>&1 | tail -6 | tee -a "$CLOSE"
    rc=${PIPESTATUS[0]}
    echo "sbt exit=$rc" >> "$CLOSE" ;;
  sf001)
    stamp sf001
    run_verify /root/testdata/sf0.01 "/tmp/verify_sf001_$R" 8g
    python3 tools/oracle_check.py "/tmp/verify_sf001_$R" /root/testdata/sf0.01 | tail -3 | tee -a "$CLOSE" ;;
  sf01)
    stamp sf01
    run_verify /root/testdata/sf0.1 "/tmp/verify_sf01_$R" 16g
    python3 tools/oracle_check.py "/tmp/verify_sf01_$R" /root/testdata/sf0.1 | tail -3 | tee -a "$CLOSE" ;;
  zipf)
    stamp zipf
    run_verify /tmp/sf1x10z "/tmp/verify_zipf10_$R" 24g
    python3 tools/oracle_check.py "/tmp/verify_zipf10_$R" /tmp/sf1x10z \
      --ulp1 ts_anomaly,ts_moving_avg --timeout 600 --memlimit 48GB \
      | tee /tmp/oracle_zipf_full.log | grep -E "^FAIL|^TIMEOUT|RESULT" | tee -a "$CLOSE" ;;
  docs100x)
    stamp docs100x
    run_verify /tmp/sfdocs100x "/tmp/verify_100x_$R" 24g
    python3 tools/oracle_check.py "/tmp/verify_100x_$R" /tmp/sfdocs100x \
      --ulp1 ts_anomaly,ts_moving_avg --timeout 600 --memlimit 48GB \
      | tee /tmp/oracle_100x_full.log | grep -E "^FAIL|^TIMEOUT|RESULT" | tee -a "$CLOSE" ;;
  secondshape)
    stamp secondshape
    GRAFT_XSCALE_DIR=/tmp/sfdocs100x sbt -batch "testOnly graft.SecondShapeSpec" 2>&1 \
      | tail -8 | tee -a "$CLOSE"
    rc=${PIPESTATUS[0]}
    echo "sbt exit=$rc" >> "$CLOSE" ;;
  *) echo "unknown gate $1"; exit 2 ;;
esac
echo '```' >> "$CLOSE"
