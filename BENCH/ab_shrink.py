"""Interleaved A/B of COARSE_SHRINK_TARGET_ROWS (the coarse-level
edge-rows-per-partition target that drives the row-proportional partition
shrink in ``louvain()``) at the driver-harness configuration (sf0.1,
local[32], min_moves_frac=0.02, median of N trials per setting, settings
interleaved within each trial round so VM drift hits all settings equally).

Labels must be byte-identical across settings (the shrink is partition-count
only; partition-invariance is pinned by the determinism suite) — asserted via
a sha over the sorted label rows. Result: adopt the fastest setting, or keep
32768 and record a negative result in BENCH/BASELINE.md §7.

Usage: python BENCH/ab_shrink.py [--trials 3]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TARGETS = [8192, 16384, 32768, 65536]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="ab_shrink.json")
    args = ap.parse_args()

    import __spark_entry__ as em
    from graftlouvain.operators import louvain as lv
    from graftlouvain.session import get_spark

    spark = get_spark(app_name="ab-shrink", master="local[32]", shuffle_partitions=32)
    g = em._graph(spark, args.sf)
    g.edges.count()  # warm the edge cache once; every setting reuses it

    walls: dict[int, list[float]] = {t: [] for t in TARGETS}
    shas: set[str] = set()
    supersteps: set[int] = set()
    # one unmeasured warmup (JIT) on the default setting
    lv.louvain(g, min_moves_frac=0.02)
    for trial in range(args.trials):
        for target in TARGETS:
            lv.COARSE_SHRINK_TARGET_ROWS = target
            t0 = time.monotonic()
            res = lv.louvain(g, min_moves_frac=0.02)
            rows = sorted(
                (r["id"], r["community"]) for r in res.assignments.collect()
            )
            walls[target].append(round(time.monotonic() - t0, 3))
            shas.add(hashlib.sha256(str(rows).encode()).hexdigest())
            supersteps.add(sum(l.supersteps for l in res.levels))
    lv.COARSE_SHRINK_TARGET_ROWS = 32_768  # restore the committed default

    report = {
        "sf": args.sf,
        "trials": args.trials,
        "medians": {
            str(t): round(statistics.median(w), 3) for t, w in walls.items()
        },
        "runs": {str(t): w for t, w in walls.items()},
        "labels_identical_across_settings": len(shas) == 1,
        "supersteps": sorted(supersteps),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    out = REPO / "BENCH" / "results" / args.out
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
