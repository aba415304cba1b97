"""Compare two bench JSON records host-independently.

This host shows ±2-3× run-to-run variance (BENCH_NOTES.md), so raw
seconds across rounds are meaningless.  From r6 on, every bench run
carries ``calibration_sec`` (a fixed zero-repo-code Spark workload
timed in the same session); this tool normalizes each query by its
run's calibration before comparing, and falls back to raw seconds
(with a loud warning) for pre-r6 records that lack calibration.

Usage: python tools/bench_compare.py BENCH_r05.json BENCH_r06.json [-n TOP]
Output: per-query normalized ratio (new/old; <1 = faster), the median
ratio (the honest round-over-round signal), and the biggest movers.
"""

from __future__ import annotations

import json
import statistics
import sys


def _load(path: str) -> tuple[dict[str, float], float | None]:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" not in d and "tail" in d:
        # the round driver's BENCH_r{N}.json wraps bench.py's JSON line
        # inside the captured stdout "tail" string — unwrap it
        for line in reversed(d["tail"].splitlines()):
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                d = json.loads(line)
                break
    qs = {
        k: v
        for k, v in d.get("queries", {}).items()
        if isinstance(v, (int, float)) and k.startswith("q_")
    }
    return qs, d.get("calibration_sec")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old_path, new_path = sys.argv[1], sys.argv[2]
    top = int(sys.argv[sys.argv.index("-n") + 1]) if "-n" in sys.argv else 10
    old_q, old_cal = _load(old_path)
    new_q, new_cal = _load(new_path)
    if old_cal and new_cal:
        norm_old, norm_new = old_cal, new_cal
        print(f"calibration: {old_cal}s -> {new_cal}s (normalizing by each)")
    else:
        norm_old = norm_new = 1.0
        print(
            "WARNING: calibration_sec missing in at least one record — "
            "comparing RAW seconds; host drift is NOT controlled for"
        )
    common = sorted(set(old_q) & set(new_q))
    if not common:
        print("no common queries")
        return 1
    ratios = {
        k: (new_q[k] / norm_new) / (old_q[k] / norm_old) for k in common
    }
    med = statistics.median(ratios.values())
    print(f"{len(common)} common queries; median normalized ratio "
          f"(new/old): {med:.3f} ({'faster' if med < 1 else 'slower'})")
    movers = sorted(ratios.items(), key=lambda kv: kv[1])
    print(f"\nbiggest improvements:")
    for k, r in movers[:top]:
        print(f"  {k:24s} {old_q[k]:7.3f}s -> {new_q[k]:7.3f}s  x{r:.2f}")
    print(f"\nbiggest regressions:")
    for k, r in movers[-top:][::-1]:
        print(f"  {k:24s} {old_q[k]:7.3f}s -> {new_q[k]:7.3f}s  x{r:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
