"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Primary metric (BASELINE.md): Louvain WALL TIME plus supersteps-to-
convergence, reported separately. The work-normalized engine speed
``superstep_edge_throughput_per_sec`` = directed_edges × supersteps / wall
(each superstep's neighbor-community join processes every directed edge
once) is emitted as a secondary utilization metric — on its own it REWARDS
running more supersteps, so it must never be compared across configurations
that converge in different superstep counts (round-2 verdict; the old
``edges_per_sec_per_level`` name was dropped for exactly that reason).
Scaling efficiency between parallelism levels is measured separately by
BENCH/scaling.py (one JVM per parallelism level) and reported in
BENCH/BASELINE.md.

Louvain runs with the standard convergence slack min_moves_frac=0.02 (level
ends when two consecutive supersteps each move <2% of vertices) — measured at
sf0.1: Q within 8.5e-5 of the exact-fixpoint run, ~25% fewer supersteps. The
exact-fixpoint configuration (slack 0.0) stays the oracle-pinned default of
the library API.

Per-query times (louvain included) are the MEDIAN of
``$SPARK_GRAFT_BENCH_RUNS`` (default 3) runs — single-run wall times vary
±30% on this box and the first louvain run additionally pays JVM/JIT warmup;
the raw runs are emitted under "runs" so regressions can be diffed
query-by-query across rounds.

Per-op targets are FORCED (r5b): each result is evaluated via
``bit_xor(xxhash64(*columns))`` — every value of every row computed — not
``.count()``. The r1-r4 harness counted rows, and Catalyst legally PRUNES
terminal projections and unique-key left joins under count, so entries whose
plan ends that way were never measuring their real work: triangles and
clustering_coeff never enumerated a single wedge (0.6 s recorded vs ~16-35 s
real on the ~91 %-dense supplier graph), dedup_exact never hashed a byte,
lang_id/quality_scores never ran their regexes. Queries that end in
aggregations/filters were already forced by count — for those, forced ≈
count within drift (verified interleaved: pagerank 6.2 vs 6.4, minhash 4.5
vs 5.0, kcore equal), so their round-over-round history remains valid. The
order-independent forced digest of each result is emitted under "digests" —
a free cross-round value-determinism signal.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LOUVAIN_MIN_MOVES_FRAC = 0.02


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from graftlouvain.session import get_spark

    spark = get_spark(
        app_name="graftlouvain-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    import __spark_entry__ as entrymod
    from graftlouvain.operators.louvain import louvain

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    extras: dict[str, float] = {}

    # graph build: median of n_runs fresh builds (round-2 verdict: a single
    # run is indistinguishable from VM drift); previous build's edge cache is
    # dropped so each run pays the full scan+shuffle+cache cost
    build_walls = []
    g = None
    for _ in range(n_runs):
        if g is not None:
            g.edges.unpersist()
            g.degrees.unpersist()
        t0 = time.monotonic()
        g = entrymod._graph(spark, sf_dir)
        build_walls.append(round(time.monotonic() - t0, 3))
    runs["graph_build"] = build_walls
    timings["graph_build"] = round(statistics.median(build_walls), 3)

    # flagship: full multi-level Louvain (median of n_runs; superstep count
    # is deterministic across runs, wall time is not)
    louvain_walls = []
    for _ in range(n_runs):
        t0 = time.monotonic()
        res = louvain(g, min_moves_frac=LOUVAIN_MIN_MOVES_FRAC)
        res.assignments.count()
        louvain_walls.append(round(time.monotonic() - t0, 3))
    runs["louvain"] = louvain_walls
    louvain_wall = statistics.median(louvain_walls)
    timings["louvain"] = round(louvain_wall, 3)
    supersteps = sum(l.supersteps for l in res.levels)
    extras["louvain_supersteps"] = supersteps
    extras["louvain_levels"] = len(res.levels)
    extras["louvain_modularity"] = round(res.modularity, 6)
    extras["louvain_min_moves_frac"] = LOUVAIN_MIN_MOVES_FRAC
    extras["graph_directed_edges"] = g.stats.num_directed_edges
    # work-normalized engine speed — see module docstring for why this is
    # secondary to (wall, supersteps) and must not be compared across runs
    # with different superstep counts
    extras["superstep_edge_throughput_per_sec"] = round(
        g.stats.num_directed_edges * supersteps / louvain_wall, 1
    )

    # continuity secondary: ONE run under the r2-r4 parity gate, so the
    # round-over-round louvain history stays directly comparable after the
    # r5 conflict-gate default (which halves supersteps; at sf0.1 the
    # per-superstep job floor hides most of that in wall time — the gap
    # shows at the 66M/95M scaling points where supersteps are
    # data-dominated). Q differs slightly between gates under convergence
    # slack: both reach true local-move fixpoints at slack 0 (conflict
    # 0.015966 >= parity 0.015949 at sf0.1), but slack 0.02 stops
    # conflict's shorter tail earlier (0.014286) — a documented
    # speed-vs-last-digit-of-Q tradeoff, not a correctness gap.
    t0 = time.monotonic()
    resp = louvain(g, min_moves_frac=LOUVAIN_MIN_MOVES_FRAC, gate_mode="parity")
    resp.assignments.count()
    extras["louvain_parity_sec"] = round(time.monotonic() - t0, 3)
    extras["louvain_parity_supersteps"] = sum(l.supersteps for l in resp.levels)
    extras["louvain_parity_modularity"] = round(resp.modularity, 6)

    # Per-operator bench targets. Names and computations are PINNED to the
    # r1-r4 bench history for round-over-round comparability; the r5
    # queries() consolidation folded some of these into combined driver rows
    # (lang_id/quality_scores → text_stats, random_walks → walk_corpus,
    # embedding_topk → ann_topk), so entries consolidated out of the dict are
    # benched via their still-exported q_* functions / operators directly.
    qs = entrymod.queries()
    from graftlouvain.operators.dedup import exact_dedup as _exact_dedup
    from graftlouvain.operators.textstats import lang_id as _lang_id
    from graftlouvain.operators.textstats import quality_scores as _quality

    bench_targets = {
        "pagerank": qs["pagerank"],
        "connected_components": qs["connected_components"],
        "label_propagation": qs["label_propagation"],
        "triangles_per_vertex": qs["triangles_per_vertex"],
        "clustering_coeff": qs["clustering_coeff"],
        "kcore": qs["kcore"],
        "random_walks": entrymod.q_random_walks,
        # r5b: the driver's dedup_exact row absorbed the LSH-clusters
        # composition; the bench target stays the PURE sha-dedup operator so
        # the r1-r4 history holds (the LSH path is already the
        # minhash_lsh_dups target)
        "dedup_exact": lambda spark, sf: _exact_dedup(
            entrymod._read(spark, sf, "documents")
        ),
        "ngram_jaccard_dups": qs["ngram_jaccard_dups"],
        "minhash_lsh_dups": qs["minhash_lsh_dups"],
        "simhash_dups": qs["simhash_dups"],
        "embedding_topk": entrymod.q_embedding_topk,
        "embedding_near_dups": qs["embedding_near_dups"],
        "lang_id": lambda spark, sf: _lang_id(entrymod._read(spark, sf, "documents")),
        "quality_scores": lambda spark, sf: _quality(entrymod._read(spark, sf, "documents")),
        "events_sessionize": qs["events_sessionize"],
        "substring_dup_spans": qs["substring_dup_spans"],
        "substring_mask": qs["substring_mask"],
        "contamination_flags": qs["contamination_flags"],
    }
    def _force(df):
        """Full-value evaluation: xxhash64 of every column of every row,
        folded with the order-independent bit_xor aggregate (no overflow
        under ANSI mode, deterministic digest across partitionings)."""
        from pyspark.sql import functions as F

        return df.agg(F.bit_xor(F.xxhash64(*df.columns))).first()[0]

    digests: dict[str, int] = {}
    for name, fn in bench_targets.items():
        walls = []
        for _ in range(n_runs):
            t0 = time.monotonic()
            digests[name] = _force(fn(spark, sf_dir))
            walls.append(round(time.monotonic() - t0, 3))
        runs[name] = walls
        timings[name] = round(statistics.median(walls), 3)

    total = round(sum(timings.values()), 3)
    # Stop the JVM BEFORE printing: executor GC warnings ([warning][gc,alloc]
    # GCLocker retries, observed under the dense-graph wedge load) share fd 1
    # and a line landing after the JSON would corrupt the driver's
    # last-line parse. With Spark stopped, the JSON line is guaranteed last.
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "total_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "digests": digests,
                "sf": sf_dir,
                "cpus": int(cpus),
                "bench_runs_per_query": n_runs,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
