"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Primary metric (BASELINE.md): edges-processed/sec per Louvain level — each
superstep's neighbor-community join processes every directed edge once, so
throughput = directed_edges × supersteps / louvain_wall. Scaling efficiency
between parallelism levels is measured separately by BENCH/scaling.py (one
JVM per parallelism level) and reported in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from graftlouvain.session import get_spark

    spark = get_spark(
        app_name="graftlouvain-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    import __spark_entry__ as entrymod
    from graftlouvain.operators.louvain import louvain

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    # graph build once (counted as its own phase)
    t0 = time.monotonic()
    g = entrymod._graph(spark, sf_dir)
    timings["graph_build"] = round(time.monotonic() - t0, 3)

    # flagship: full multi-level Louvain
    t0 = time.monotonic()
    res = louvain(g)
    res.assignments.count()
    louvain_wall = time.monotonic() - t0
    timings["louvain"] = round(louvain_wall, 3)
    supersteps = sum(l.supersteps for l in res.levels)
    extras["louvain_supersteps"] = supersteps
    extras["louvain_levels"] = len(res.levels)
    extras["louvain_modularity"] = round(res.modularity, 6)
    extras["graph_directed_edges"] = g.stats.num_directed_edges
    extras["edges_per_sec_per_level"] = round(
        g.stats.num_directed_edges * supersteps / louvain_wall, 1
    )

    qs = entrymod.queries()
    for name in [
        "pagerank",
        "connected_components",
        "label_propagation",
        "triangles_per_vertex",
        "dedup_exact",
        "ngram_jaccard_dups",
        "minhash_lsh_dups",
        "simhash_dups",
        "embedding_topk",
        "lang_id",
        "quality_scores",
        "events_sessionize",
    ]:
        timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "cpus": int(cpus),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
