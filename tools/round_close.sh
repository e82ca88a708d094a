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
R=${GRAFT_ROUND:-r14}
cd "$(dirname "$0")/.."
# Round-13 process failure: a red gate's "fix" landed after the last gate
# run and was never re-gated — the verdict rule is that a gate section
# must stamp the commit that contains what it verifies. Refuse to append
# a gate over a dirty tree unless explicitly running a dev iteration.
dirty() { # the CLOSE record itself is appended by every gate — a pending
          # append must not block the NEXT gate; everything else counts
  git status --porcelain | grep -v " bench/CLOSE_" | grep -q .
}
if [ "${GRAFT_ALLOW_DIRTY:-0}" != "1" ] && dirty; then
  echo "REFUSED: working tree is dirty — commit first so the gate stamps the" >&2
  echo "commit it verifies (set GRAFT_ALLOW_DIRTY=1 for a throwaway dev run)." >&2
  exit 3
fi
CLOSE="bench/CLOSE_${R}.md"
if [ ! -f "$CLOSE" ]; then
  printf '# Round close gates — %s\n\nAppended by tools/round_close.sh, one section per gate run.\n' "$R" > "$CLOSE"
fi
stamp() { # gate name -> section header with time + HEAD the gate ran on
  # dirty marker uses the same CLOSE-file exclusion as the guard: a pending
  # gate-record append must not mislabel a clean-source run as +dirty
  printf '\n## %s — %s @ %s\n\n```\n' "$1" "$(date -u +%FT%TZ)" "$(git rev-parse --short HEAD)$(dirty && echo '+dirty')" >> "$CLOSE"
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
# Record an sbt test run durably: the summary tail, PLUS every failing
# test/suite line (a fixed tail window truncated the failing test's name
# out of CLOSE_r13 — round-13 ADVICE), and propagate the exit status so a
# red gate fails this script instead of silently exiting 0.
record_sbt_run() { # log-file
  tail -6 "$1" | tee -a "$CLOSE"
  grep -E '\*\*\* FAILED \*\*\*|Failed tests:|^\[error\]\s+graft\.' "$1" >> "$CLOSE" || true
}
case "$1" in
  suite)
    stamp suite
    sbt -batch test 2>&1 | tee /tmp/close_suite_$R.log | tail -3
    rc=${PIPESTATUS[0]}
    record_sbt_run /tmp/close_suite_$R.log
    echo "sbt exit=$rc" >> "$CLOSE"
    echo '```' >> "$CLOSE"
    exit "$rc" ;;
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
      --tempdir "/tmp/duckdb_spill_$R" \
      | tee /tmp/oracle_zipf_full.log | grep -E "^FAIL|^TIMEOUT|RESULT" | tee -a "$CLOSE" ;;
  docs100x)
    stamp docs100x
    # free-space preflight: the r13 sweep died writing DuckDB spill to a
    # full disk; the heavy 100x oracles spill tens of GB
    df -B1G --output=avail / | tail -1 | { read -r av;
      echo "disk avail ${av} GiB" >> "$CLOSE";
      if [ "$av" -lt 40 ]; then
        echo "GATE ABORT: <40 GiB free — clean /tmp before the 100x oracle sweep" | tee -a "$CLOSE"
        echo '```' >> "$CLOSE"; exit 4
      fi; }
    run_verify /tmp/sfdocs100x "/tmp/verify_100x_$R" 24g
    # timeout 1200: curation_funnel / dedup_simhash_pairs exceeded the old
    # 600 s oracle budget at 100x (r13 — a timeout means the ORACLE cannot
    # reach the scale, but give it a fair budget before recording that)
    python3 tools/oracle_check.py "/tmp/verify_100x_$R" /tmp/sfdocs100x \
      --ulp1 ts_anomaly,ts_moving_avg --timeout 1200 --memlimit 48GB \
      --tempdir "/tmp/duckdb_spill_$R" \
      | tee /tmp/oracle_100x_full.log | grep -E "^FAIL|^TIMEOUT|RESULT" | tee -a "$CLOSE" ;;
  secondshape)
    stamp secondshape
    GRAFT_XSCALE_DIR=/tmp/sfdocs100x sbt -batch "testOnly graft.SecondShapeSpec" 2>&1 \
      | tee /tmp/close_secondshape_$R.log | tail -3
    rc=${PIPESTATUS[0]}
    grep -F '[mem]' /tmp/close_secondshape_$R.log >> "$CLOSE" || true
    record_sbt_run /tmp/close_secondshape_$R.log
    echo "sbt exit=$rc" >> "$CLOSE"
    echo '```' >> "$CLOSE"
    exit "$rc" ;;
  *) echo "unknown gate $1"; exit 2 ;;
esac
echo '```' >> "$CLOSE"
