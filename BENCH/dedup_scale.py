"""Exact-vs-MinHash dedup scaling evidence: on a corpus with real near-dup
mass, the exact n-gram self-join grows with the number of colliding pairs
while MinHash-LSH grows with docs + true candidates.

The sf0.1 documents table has essentially no near-dup mass (0 pairs at
J ≥ 0.5), so bench.py shows the two paths near parity there — both dominated
by the gram scan. This benchmark plants duplicate clusters (the regime dedup
exists for) and times both operators on identical inputs, asserting equal
output pairs.

Usage: python BENCH/dedup_scale.py [--docs 20000] [--dup-frac 0.3]
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

def gen_docs(n_docs: int, dup_frac: float, seed: int = 42,
             n_phrases: int = 4000, phrases_per_doc: int = 10):
    """(doc_id, text) rows modeling the regime dedup runs in at scale:
    each unique doc = ``phrases_per_doc`` boilerplate phrases drawn from a
    pool of ``n_phrases`` (each phrase lands in ~n_docs·ppd/n_phrases docs —
    moderately-common grams UNDER the df cap, the fat tail that makes the
    exact gram self-join quadratic) plus 20 unique tokens; ``dup_frac`` of
    docs are near-copies of earlier docs (one token substituted, J ≈ 0.9)."""
    rng = random.Random(seed)

    def tok() -> str:
        return f"{rng.getrandbits(40):010x}"

    phrases = [" ".join(tok() for _ in range(5)) for _ in range(n_phrases)]
    rows = []
    n_unique = int(n_docs * (1 - dup_frac))
    for i in range(n_unique):
        parts = [phrases[rng.randrange(n_phrases)] for _ in range(phrases_per_doc)]
        parts += [tok() for _ in range(20)]
        rows.append((i, " ".join(parts)))
    for i in range(n_unique, n_docs):
        _, src_text = rows[rng.randrange(n_unique)]
        words = src_text.split()
        words[rng.randrange(len(words))] = tok()
        rows.append((i, " ".join(words)))
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000)
    ap.add_argument("--dup-frac", type=float, default=0.3)
    ap.add_argument("--n-phrases", type=int, default=4000,
                    help="boilerplate pool size; phrase df ≈ 10·docs/n_phrases "
                         "— the exact join's pair expansion grows ~df² per gram")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from graftlouvain.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
    from graftlouvain.session import get_spark

    spark = get_spark(app_name="dedup-scale", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    docs = spark.createDataFrame(
        gen_docs(args.docs, args.dup_frac, n_phrases=args.n_phrases),
        "doc_id long, text string",
    ).cache()
    docs.count()

    def timed(fn):
        t0 = time.monotonic()
        out = {(r["a"], r["b"]) for r in fn().collect()}
        return out, round(time.monotonic() - t0, 2)

    # warm both paths once at 1/10 scale to absorb JIT
    small = docs.where(f"doc_id < {args.docs // 10}")
    ngram_jaccard_pairs(small, threshold=0.5).count()
    minhash_lsh_pairs(small, threshold=0.5).count()

    exact, t_exact = timed(
        lambda: ngram_jaccard_pairs(docs, threshold=0.5)
    )
    lsh, t_lsh = timed(
        lambda: minhash_lsh_pairs(docs, threshold=0.5)
    )
    # composed clusters pipeline (pairs → connected components → cluster
    # labels — the q_dedup_clusters shape): verify the LSH-composed pipeline
    # inherits the pair-stage speedup and yields IDENTICAL clusters
    from pyspark.sql import functions as F

    from graftlouvain.operators.components import components
    from graftlouvain.operators.graph import LinkGraph

    def clusters_from(pairs_fn):
        t0 = time.monotonic()
        edges = pairs_fn().select(
            F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1.0).alias("weight")
        )
        cc = components(LinkGraph.from_edges(edges))
        labels = {(r["id"], r["component"]) for r in cc.collect()}
        return labels, round(time.monotonic() - t0, 2)

    cl_exact, t_cl_exact = clusters_from(
        lambda: ngram_jaccard_pairs(docs, threshold=0.5)
    )
    cl_lsh, t_cl_lsh = clusters_from(
        lambda: minhash_lsh_pairs(docs, threshold=0.5)
    )
    print(json.dumps({
        "docs": args.docs,
        "dup_frac": args.dup_frac,
        "true_pairs": len(exact),
        "lsh_pairs": len(lsh),
        "recall": round(len(exact & lsh) / max(len(exact), 1), 4),
        "exact_sec": t_exact,
        "minhash_lsh_sec": t_lsh,
        "speedup": round(t_exact / max(t_lsh, 1e-9), 2),
        "clusters_identical": cl_exact == cl_lsh,
        "clusters_exact_sec": t_cl_exact,
        "clusters_lsh_sec": t_cl_lsh,
        "clusters_speedup": round(t_cl_exact / max(t_cl_lsh, 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
