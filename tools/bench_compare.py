"""Diff two bench JSON outputs: per-query deltas, regressions flagged.

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio_threshold=2.0]

Accepts either a raw bench line or a driver BENCH_r{N}.json wrapper with a
``parsed`` field. Exit code 1 if any common query regressed ≥ threshold
(with ≥ 0.5 s absolute growth, so sub-second noise never fails a build).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d["queries"]


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    regressions = []
    print(f"{'query':40s} {'old':>7s} {'new':>7s} {'ratio':>6s}")
    for q in sorted(common, key=lambda q: -(new[q] / old[q] if old[q] else 0)):
        ratio = new[q] / old[q] if old[q] else float("inf")
        flag = ""
        if ratio >= threshold and new[q] - old[q] >= 0.5:
            regressions.append(q)
            flag = "  <-- REGRESSION"
        print(f"{q:40s} {old[q]:7.2f} {new[q]:7.2f} {ratio:5.1f}x{flag}")
    print(
        f"\ncommon {len(common)}: {sum(old[q] for q in common):.1f}s -> "
        f"{sum(new[q] for q in common):.1f}s | added {len(added)} "
        f"({sum(new[q] for q in added):.1f}s) | removed {len(removed)}"
    )
    if regressions:
        print(f"regressions (>= {threshold}x and >= 0.5s): {regressions}")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
