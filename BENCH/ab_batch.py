"""Same-session A/B: batched (2 supersteps/materialization) vs unbatched
Louvain at a given SF dir. Asserts byte-identical labels, prints medians.

Usage: python BENCH/ab_batch.py [sf_dir] [runs]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graftlouvain.session import get_spark  # noqa: E402


def label_sha(df):
    from pyspark.sql import functions as F

    row = (
        df.select(F.md5(F.concat_ws(",", "id", "community")).alias("h"))
        .agg(F.sha2(F.concat_ws("", F.sort_array(F.collect_list("h"))), 256).alias("s"))
        .first()
    )
    return row["s"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="ab-batch", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    import __spark_entry__ as entrymod
    from graftlouvain.operators.louvain import louvain

    g = entrymod._graph(spark, sf_dir)
    out = {"sf": sf_dir, "cpus": int(cpus)}
    shas = {}
    for batch in (1, 2):
        walls, ss = [], None
        for _ in range(runs):
            t0 = time.monotonic()
            # pinned to gate_mode="parity": batching composes the even/odd
            # pair, so the r5 conflict default would force batch=1 and make
            # this A/B compare identical runs
            res = louvain(
                g, min_moves_frac=0.02, batch_supersteps=batch,
                gate_mode="parity",
            )
            shas[batch] = label_sha(res.assignments)
            walls.append(round(time.monotonic() - t0, 2))
            ss = sum(l.supersteps for l in res.levels)
        out[f"batch{batch}"] = {
            "median": statistics.median(walls),
            "runs": walls,
            "supersteps": ss,
            "sha": shas[batch][:16],
        }
    out["labels_identical"] = shas[1] == shas[2]
    print(json.dumps(out))
    assert shas[1] == shas[2], "labels diverged between batch modes!"


if __name__ == "__main__":
    main()
