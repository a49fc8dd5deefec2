"""r6 scaling measurement addressing the r5 verdict's item #5: the 0.694
efficiency point had the local[8] leg run FIRST with ±18 % spread, so leg
order was a confound. Here the two parallelism levels run INTERLEAVED
(8, 32, 8, 32, …) in alternating fresh JVMs, plus the same sequence started
from the other leg on request, over the 30.7M-directed-edge planted
partition graph (BENCH/.data/direct_18000000). Labels are sha-hashed per
trial so cross-parallelism determinism is asserted on every pair.

Usage: python BENCH/r06_scaling_interleaved.py [pairs] [--start 32]
Writes BENCH/results/r06_scaling_interleaved.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "BENCH"))
from scaling import WORKER  # noqa: E402 — same worker, one JVM per trial

EDGES = REPO / "BENCH" / ".data" / "direct_18000000"


def one_trial(cpus: int) -> dict:
    env = dict(os.environ, GRAFT_REPO=str(REPO), GRAFT_HASH_LABELS="1")
    proc = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(EDGES)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"worker local[{cpus}] failed:\n{proc.stderr[-3000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("pairs", type=int, nargs="?", default=3)
    ap.add_argument("--start", type=int, choices=(8, 32), default=8)
    args = ap.parse_args()
    pairs, start = args.pairs, args.start
    order = [start, 40 - start] * pairs  # 8<->32 alternation
    trials: dict[int, list[dict]] = {8: [], 32: []}
    for i, cpus in enumerate(order):
        t0 = time.monotonic()
        r = one_trial(cpus)
        r["trial_index"] = i
        trials[cpus].append(r)
        print(
            f"trial {i}: local[{cpus}] louvain {r['louvain_sec']}s "
            f"({round(time.monotonic() - t0, 1)}s wall incl. jvm+build)",
            flush=True,
        )
    med = {c: statistics.median(r["louvain_sec"] for r in trials[c]) for c in (8, 32)}
    thr = {
        c: statistics.median(
            r["superstep_edge_throughput_per_sec"] for r in trials[c]
        )
        for c in (8, 32)
    }
    shas = {r["labels_sha"] for c in (8, 32) for r in trials[c]}
    eff = (thr[32] / thr[8]) / 4.0
    report = {
        "edges_path": str(EDGES),
        "leg_order": order,
        "local8_louvain_sec": [r["louvain_sec"] for r in trials[8]],
        "local32_louvain_sec": [r["louvain_sec"] for r in trials[32]],
        "median_louvain_sec": med,
        "median_throughput": thr,
        "scaling_efficiency": round(eff, 3),
        "labels_identical_across_all_trials": len(shas) == 1,
        "supersteps": trials[8][0]["supersteps"],
        "directed_edges": trials[8][0]["directed_edges"],
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    out = REPO / "BENCH" / "results" / "r06_scaling_interleaved.json"
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
