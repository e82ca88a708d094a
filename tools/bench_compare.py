#!/usr/bin/env python3
"""Dev-only: per-query comparison of two Bench JSON outputs (the files
graft.Bench writes via SPARK_GRAFT_BENCH_OUT, or a driver BENCH_r*.json
whose tail embeds the per-query map). Flags queries beyond a ratio
threshold, prints totals and the queries present on only one side.

Usage: bench_compare.py OLD.json NEW.json [ratio=1.3] [min_sec=0.5]
"""
import json, re, signal, sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # play nice with | head


def load(path):
    d = json.load(open(path))
    if "queries" in d:
        return {k: float(v) for k, v in d["queries"].items()}
    # driver artifact: per-query map lives in the (possibly truncated) tail
    tail = d.get("tail", "")
    return {k: float(v) for k, v in re.findall(r'"([a-z0-9_]+)":([0-9.]+)', tail)}


old, new = load(sys.argv[1]), load(sys.argv[2])
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
min_sec = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
common = sorted(set(old) & set(new))
print(f"common {len(common)}: old {sum(old[k] for k in common):.1f}s "
      f"new {sum(new[k] for k in common):.1f}s")
only_old = sorted(set(old) - set(new))
only_new = sorted(set(new) - set(old))
if only_old:
    print(f"only in old: {only_old}")
if only_new:
    print(f"only in new: {{{', '.join(f'{k}: {new[k]:.2f}' for k in only_new)}}}")
flagged = [(k, new[k] / old[k]) for k in common
           if new[k] > ratio * old[k] and new[k] > min_sec]
for k, r in sorted(flagged, key=lambda t: -t[1]):
    print(f"  SLOWER {k}: {new[k]:.2f}s vs {old[k]:.2f}s = {r:.2f}x")
faster = [(k, old[k] / new[k]) for k in common
          if old[k] > ratio * new[k] and old[k] > min_sec]
for k, r in sorted(faster, key=lambda t: -t[1]):
    print(f"  faster {k}: {new[k]:.2f}s vs {old[k]:.2f}s")
print("RESULT:", f"{len(flagged)} flagged beyond {ratio}x" if flagged else "no regressions flagged")
