"""Round-6 optimization side-bench (guide §1.4): times individual bench
targets in isolation with the SAME forced full-value evaluation as bench.py
(bit_xor(xxhash64(*cols)) — digests double as value-identity evidence for
every rewrite), captures ``.explain("formatted")`` plans for the judge
(plans/r06/), and optionally enables the Spark UI so stage metrics are
readable.

Usage:
    python bench_extra.py time <target> [n_runs]      # isolate one target
    python bench_extra.py time-all [n_runs]           # all targets
    python bench_extra.py plan <target> <outfile>     # explain(formatted)
    python bench_extra.py plan-all <dir>              # all targets' plans

bench.py stays FROZEN (driver contract); every number cited in
OPTIMIZATION_r06.md from this file says so explicitly.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def get_targets(spark, sf_dir):
    import __spark_entry__ as entrymod
    from graftlouvain.operators.dedup import exact_dedup as _exact_dedup
    from graftlouvain.operators.textstats import lang_id as _lang_id
    from graftlouvain.operators.textstats import quality_scores as _quality

    qs = entrymod.queries()
    return {
        "pagerank": qs["pagerank"],
        "connected_components": qs["connected_components"],
        "label_propagation": qs["label_propagation"],
        "triangles_per_vertex": qs["triangles_per_vertex"],
        "clustering_coeff": qs["clustering_coeff"],
        "kcore": qs["kcore"],
        "random_walks": entrymod.q_random_walks,
        "dedup_exact": lambda spark, sf: _exact_dedup(
            entrymod._read(spark, sf, "documents")
        ),
        "ngram_jaccard_dups": qs["ngram_jaccard_dups"],
        "minhash_lsh_dups": qs["minhash_lsh_dups"],
        "simhash_dups": qs["simhash_dups"],
        "embedding_topk": entrymod.q_embedding_topk,
        "embedding_near_dups": qs["embedding_near_dups"],
        "lang_id": lambda spark, sf: _lang_id(entrymod._read(spark, sf, "documents")),
        "quality_scores": lambda spark, sf: _quality(
            entrymod._read(spark, sf, "documents")
        ),
        "events_sessionize": qs["events_sessionize"],
        "substring_dup_spans": qs["substring_dup_spans"],
        "substring_mask": qs["substring_mask"],
        "contamination_flags": qs["contamination_flags"],
    }


def _force(df):
    return df.agg(F.bit_xor(F.xxhash64(*df.columns))).first()[0]


def _spark():
    from graftlouvain.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    extra = {}
    if os.environ.get("SPARK_GRAFT_UI"):
        extra["spark.ui.enabled"] = "true"
    spark = get_spark(
        app_name="graftlouvain-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf=extra,
    )
    return spark, sf_dir


def cmd_time(names, n_runs):
    spark, sf_dir = _spark()
    targets = get_targets(spark, sf_dir)
    out = {}
    for name in names:
        fn = targets[name]
        walls, dig = [], None
        for _ in range(n_runs):
            t0 = time.monotonic()
            dig = _force(fn(spark, sf_dir))
            walls.append(round(time.monotonic() - t0, 3))
        out[name] = {
            "median": round(statistics.median(walls), 3),
            "min": min(walls),
            "runs": walls,
            "digest": dig,
        }
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print("RESULT " + json.dumps(out))


def cmd_louvain(n_runs):
    import __spark_entry__ as entrymod
    from graftlouvain.operators.louvain import louvain

    spark, sf_dir = _spark()
    g = entrymod._graph(spark, sf_dir)
    walls = []
    sup = None
    for _ in range(n_runs):
        t0 = time.monotonic()
        res = louvain(g, min_moves_frac=0.02)
        res.assignments.count()
        walls.append(round(time.monotonic() - t0, 3))
        sup = sum(l.supersteps for l in res.levels)
    print(
        "RESULT "
        + json.dumps(
            {
                "louvain": {
                    "median": round(statistics.median(walls), 3),
                    "min": min(walls),
                    "runs": walls,
                    "supersteps": sup,
                }
            }
        )
    )
    spark.stop()


def cmd_graph_build(n_runs):
    import __spark_entry__ as entrymod

    spark, sf_dir = _spark()
    walls = []
    g = None
    for _ in range(n_runs):
        if g is not None:
            g.edges.unpersist()
            g.degrees.unpersist()
        t0 = time.monotonic()
        g = entrymod._graph(spark, sf_dir)
        walls.append(round(time.monotonic() - t0, 3))
    print(
        "RESULT "
        + json.dumps(
            {
                "graph_build": {
                    "median": round(statistics.median(walls), 3),
                    "min": min(walls),
                    "runs": walls,
                }
            }
        )
    )
    spark.stop()


def cmd_plan(names, outdir_or_file, suffix):
    spark, sf_dir = _spark()
    targets = get_targets(spark, sf_dir)
    for name in names:
        df = targets[name](spark, sf_dir)
        plan = df.sparkSession._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if len(names) == 1 and outdir_or_file.endswith(".txt"):
            path = outdir_or_file
        else:
            path = os.path.join(outdir_or_file, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "time":
        cmd_time([sys.argv[2]], int(sys.argv[3]) if len(sys.argv) > 3 else 5)
    elif cmd == "time-list":
        cmd_time(sys.argv[2].split(","), int(sys.argv[3]) if len(sys.argv) > 3 else 5)
    elif cmd == "time-all":
        cmd_time(
            list(get_targets(None, None).keys()),
            int(sys.argv[2]) if len(sys.argv) > 2 else 3,
        )
    elif cmd == "louvain":
        cmd_louvain(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    elif cmd == "graph-build":
        cmd_graph_build(int(sys.argv[2]) if len(sys.argv) > 2 else 5)
    elif cmd == "plan":
        cmd_plan([sys.argv[2]], sys.argv[3], sys.argv[4] if len(sys.argv) > 4 else "plan")
    elif cmd == "plan-all":
        names = list(get_targets(None, None).keys())
        cmd_plan(names, sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "before")
    else:
        raise SystemExit(f"unknown command {cmd}")
