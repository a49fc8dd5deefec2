"""Salted two-stage aggregation for hub-vertex skew (SURVEY.md §4, BASELINE.json
"salted skew handling for hub vertices").

The reference has no skew handling (block partitioning assigns hub vertices
wholesale to one rank). On power-law link graphs a single hub key can hold a
double-digit percentage of all edges, so a naive ``groupBy(key).sum`` funnels
that key's rows through one reducer. Spark's hash aggregate already does
map-side partial aggregation — which collapses each *map partition's* rows per
key before the shuffle — so plain sums rarely skew. Salting matters when the
aggregation state per key is large (e.g. collect_list adjacency for the
pandas-UDF local phase) or when AQE is off; we expose it as a reusable
primitive and verify it is exactly equivalent to the unsalted aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    out_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """``df.groupBy(key).sum(value)`` via two stages: partial sums per
    (key, salt) — salt = xxhash64 of all columns mod buckets — then a final sum
    per key. Identical results (sums are associative/commutative; float order
    differs but tests pin integer-valued weights where exactness is required).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(F.sum(value_col).alias("_partial"))
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias(out_col))


def salted_collect_adjacency(
    edges: DataFrame,
    salt_buckets: int = 16,
) -> DataFrame:
    """Adjacency-list build (G8 CSR analogue, graph.rs:198-207) that survives
    hub vertices: collect_list per (src, salt) first, then flatten per src.
    Output: [src, adj: array<struct<dst:long, weight:double>>].

    At 100 TB a hub with 10^8 neighbors still cannot fit one row; callers that
    feed pandas-UDF local phases should cap adjacency with ``max_neighbors``
    (top-by-weight truncation) — a documented approximation, off by default.
    """
    salted = edges.withColumn(
        "_salt", F.pmod(F.xxhash64("dst"), F.lit(salt_buckets))
    )
    partial = salted.groupBy("src", "_salt").agg(
        F.collect_list(F.struct("dst", "weight")).alias("_chunk")
    )
    return partial.groupBy("src").agg(
        F.flatten(F.collect_list("_chunk")).alias("adj")
    )
