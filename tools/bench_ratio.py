#!/usr/bin/env python3
"""Symmetric like-for-like bench ratio between two rounds' artifacts.

r15 verdict what's-wrong #1: the round-15 record divided r15's
per-query min-of-both-runs by r14's best single run — asymmetric in
r15's favor. This script is the one-liner the round record must match:
BOTH sides get the same statistic (per-query min over however many run
files each side supplies), the ratio is summed over the SHARED query
set only, and the per-query worst/best movers are printed so a bisect
can start from the artifact alone.

Usage:
  python3 tools/bench_ratio.py NEW.json [NEW_run1.json ...] -- OLD.json [OLD_run1.json ...]

Output: one JSON line.
"""
import json
import sys


def load_side(paths):
    mins = {}
    streaming = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        for q, sec in d.get("queries", {}).items():
            if not isinstance(sec, (int, float)):
                continue
            mins[q] = min(mins.get(q, float("inf")), float(sec))
        s = d.get("streaming", {})
        if "ev_per_sec" in s:
            streaming.append(s["ev_per_sec"])
    return mins, streaming


def main(argv):
    if "--" not in argv:
        sys.exit(__doc__)
    cut = argv.index("--")
    new_paths, old_paths = argv[:cut], argv[cut + 1:]
    if not new_paths or not old_paths:
        sys.exit(__doc__)
    new, new_stream = load_side(new_paths)
    old, old_stream = load_side(old_paths)
    shared = sorted(set(new) & set(old))
    new_sum = sum(new[q] for q in shared)
    old_sum = sum(old[q] for q in shared)
    # a zero old-side time would make ratio=inf, and json.dumps emits
    # bare `Infinity` (not valid JSON) — clamp to a large finite marker
    # so the "one JSON line" contract survives a degenerate artifact
    per_q = sorted(
        ((new[q] / old[q] if old[q] > 0 else 1e9, q) for q in shared),
        reverse=True,
    )
    out = {
        "n_shared": len(shared),
        "n_new_only": len(set(new) - set(old)),
        "n_old_only": len(set(old) - set(new)),
        "new_runs": len(new_paths),
        "old_runs": len(old_paths),
        "new_min_sum_sec": round(new_sum, 1),
        "old_min_sum_sec": round(old_sum, 1),
        "ratio": round(new_sum / old_sum, 3) if old_sum else None,
        "over_2x": [q for r, q in per_q if r > 2.0],
        "worst": [{"q": q, "ratio": round(r, 2), "new": round(new[q], 2),
                   "old": round(old[q], 2)} for r, q in per_q[:5]],
        "best": [{"q": q, "ratio": round(r, 2)} for r, q in per_q[-5:]],
        "streaming_new_best": max(new_stream) if new_stream else None,
        "streaming_old_best": max(old_stream) if old_stream else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
