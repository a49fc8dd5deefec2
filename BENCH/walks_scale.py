"""Walk corpus at the PRODUCTION operating point (round-4 verdict #7):
DeepWalk-style uniform walks at L=40, walks_per_vertex=10 over the 18M-edge
planted-partition graph, feeding walk_skipgram_pairs — the full
graph→sequence→training-pairs stage an embedding pipeline actually runs.
The r4 chain-hygiene curve (lazy = quadratic, cache-only = planner melt at
L≈16, per-step materialize = linear) was measured to L=32; this script is
the evidence the materialize discipline holds at DeepWalk's real L.

Reports steps/sec for the walk stage (V·wpv·L hops / wall) and pairs/sec for
the skip-gram stage, one JSON line + a BENCH/results artifact.

Usage: python BENCH/walks_scale.py [--edges-target 18000000] [--length 40]
       [--wpv 10] [--window 5] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
RESULTS = REPO / "BENCH" / "results"
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges-target", type=int, default=18_000_000)
    ap.add_argument("--length", type=int, default=40)
    ap.add_argument("--wpv", type=int, default=10)
    ap.add_argument("--window", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default="walks_l40.json")
    args = ap.parse_args()

    from BENCH.scaling import generate_direct
    from graftlouvain.operators.graph import LinkGraph
    from graftlouvain.operators.walks import random_walks, walk_skipgram_pairs
    from graftlouvain.session import get_spark

    edges_path = generate_direct(args.edges_target)
    spark = get_spark(
        app_name="walks-l40",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    g = LinkGraph.from_edges(spark.read.parquet(str(edges_path)),
                             num_partitions=args.cpus)

    t0 = time.monotonic()
    walks = random_walks(g, length=args.length, walks_per_vertex=args.wpv)
    n_rows = walks.count()
    walk_wall = time.monotonic() - t0
    hops = g.stats.num_vertices * args.wpv * args.length

    t0 = time.monotonic()
    pairs = walk_skipgram_pairs(walks, window=args.window)
    n_pairs = pairs.count()
    pair_wall = time.monotonic() - t0

    report = {
        "edges_directed": g.stats.num_directed_edges,
        "vertices": g.stats.num_vertices,
        "length": args.length,
        "walks_per_vertex": args.wpv,
        "window": args.window,
        "cpus": args.cpus,
        "walk_rows": n_rows,
        "walk_sec": round(walk_wall, 2),
        "steps_per_sec": round(hops / walk_wall, 1),
        "skipgram_pairs": n_pairs,
        "skipgram_sec": round(pair_wall, 2),
        "pairs_per_sec": round(n_pairs / pair_wall, 1),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    RESULTS.mkdir(parents=True, exist_ok=True)
    (RESULTS / args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
