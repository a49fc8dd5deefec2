"""Same-session interleaved A/B: simhash near-dup pair generation via the
round-2 single exploded-band self-join vs the round-1 four-join cached
signature table. The round-2 judge flagged 4.3 s vs 3.4 s across sessions as
drift-or-regression; this interleaves the two variants in ONE session so VM
drift hits both equally. Asserts identical output pair sets.

Usage: python BENCH/ab_simhash.py [sf_dir] [runs_per_variant]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graftlouvain.operators.dedup import simhash64, simhash_near_dup_pairs  # noqa: E402
from graftlouvain.session import get_spark  # noqa: E402


def pairs_cached4(docs, max_hamming=8):
    """Round-1 shape: signature table cached, one self-join per 16-bit band,
    union + distinct, Hamming verify."""
    sigs = simhash64(docs).cache()
    sigs.count()
    parts = []
    for b in range(4):
        left = sigs.select(
            F.col("doc_id").alias("a"), F.col("simhash").alias("sa"),
            F.col(f"band{b}").alias("k"),
        )
        right = sigs.select(
            F.col("doc_id").alias("b"), F.col("simhash").alias("sb"),
            F.col(f"band{b}").alias("k"),
        )
        parts.append(
            left.join(right, "k").where(F.col("a") < F.col("b")).select("a", "b", "sa", "sb")
        )
    cands = parts[0]
    for p in parts[1:]:
        cands = cands.unionByName(p)
    out = (
        cands.distinct()
        .withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
    rows = {(r["a"], r["b"], r["hamming"]) for r in out.collect()}
    sigs.unpersist()
    return rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="ab-simhash", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    walls = {"exploded": [], "cached4": []}
    sets = {}
    for _ in range(runs):
        for name in ("exploded", "cached4"):  # interleaved — drift hits both
            t0 = time.monotonic()
            if name == "exploded":
                rows = {
                    (r["a"], r["b"], r["hamming"])
                    for r in simhash_near_dup_pairs(docs, max_hamming=8).collect()
                }
            else:
                rows = pairs_cached4(docs, max_hamming=8)
            walls[name].append(round(time.monotonic() - t0, 2))
            sets[name] = rows
    assert sets["exploded"] == sets["cached4"], "variant outputs diverge!"
    print(json.dumps({
        "sf": sf_dir, "cpus": int(cpus), "pairs": len(sets["exploded"]),
        "exploded": {"median": statistics.median(walls["exploded"]), "runs": walls["exploded"]},
        "cached4": {"median": statistics.median(walls["cached4"]), "runs": walls["cached4"]},
        "identical_output": True,
    }))


if __name__ == "__main__":
    main()
