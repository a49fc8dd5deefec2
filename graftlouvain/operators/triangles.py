"""Triangle counting (SURVEY.md §2h — [north-star]; standard degree-ordered
edge-orientation algorithm, cf. Suri & Vassilvitskii 2011 "Counting Triangles
and the Curse of the Last Reducer").

Edges are oriented from the lower (degree, id) endpoint to the higher one —
the key trick that bounds wedge fan-out by O(sqrt(E)) per vertex and defuses
hub skew: a hub's wedges are only built over its FEW higher-degree neighbors.
Triangles = oriented wedges (a→b, b→c) closed by oriented edge (a→c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graftlouvain.operators.graph import LinkGraph


def _oriented(graph: LinkGraph) -> DataFrame:
    """Unique undirected pairs oriented by (degree, id) ordering."""
    deg = graph.degrees
    pairs = graph.edges.where(F.col("src") < F.col("dst")).select("src", "dst")
    d_src = deg.select(F.col("id").alias("src"), F.col("degree").alias("deg_src"))
    d_dst = deg.select(F.col("id").alias("dst"), F.col("degree").alias("deg_dst"))
    keyed = pairs.join(d_src, "src").join(d_dst, "dst")
    fwd = F.struct("deg_src", "src") < F.struct("deg_dst", "dst")
    return keyed.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("hi"),
    )


def triangle_list(graph: LinkGraph) -> DataFrame:
    """Returns each triangle once as [a, b, c] (orientation order).

    The oriented edge list is MATERIALIZED (lineage cut + truthful size
    stats) before being referenced three times. Without it the orientation
    join re-executes per reference, and — the expensive part — the closure
    check plans as a shuffled semi join that partitions the WEDGE relation
    on (a, c): on the ~91 %-dense sf0.1 supplier graph that is ~1.6e9 wedge
    rows (~38 GB) written to shuffle to probe a 453k-row edge table.
    With the real byte size (~7 MB) stamped on the leaf, the static planner
    broadcasts the edge table on BOTH joins and the wedge relation streams
    map-side without ever being exchanged (measured: 84 s median with
    96 s GC-locker-thrashing outliers → ~14 s stable). At scale the same
    stamped-truthful stats flip the decision back to a shuffle join the
    moment the oriented list outgrows ``autoBroadcastJoinThreshold`` —
    size-adaptive by construction, no hand-written threshold."""
    from graftlouvain.functions.iterate import materialize

    o = materialize(_oriented(graph))
    e1 = o.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = o.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    wedges = e1.join(e2, "b")
    closing = o.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    return wedges.join(closing, ["a", "c"], "left_semi").select("a", "b", "c")


def triangle_count(graph: LinkGraph) -> int:
    return triangle_list(graph).count()


def triangles_per_vertex(graph: LinkGraph) -> DataFrame:
    """Returns [id, triangles] — every vertex of every triangle credited once
    per triangle; vertices in no triangle get 0.

    The per-triangle credit is ONE ``explode`` over the (a, b, c) array, not
    a 3-way union of projections: a union references the triangle-join
    subplan three times and Spark re-executes deterministic subplan
    references, so the whole wedge enumeration ran 3× (measured 110 s vs
    ~35 s for a single enumeration on the ~91 %-dense sf0.1 supplier graph,
    124.5M triangles). The explode credits all three corners in the same
    pass; partial aggregation then collapses the 3T rows map-side before the
    V-row shuffle."""
    tris = triangle_list(graph)
    exploded = tris.select(
        F.explode(F.array("a", "b", "c")).alias("id")
    )
    counts = exploded.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    return (
        graph.vertices.join(counts, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )


def clustering_coefficients(graph: LinkGraph) -> DataFrame:
    """[id, nbrs, triangles, coeff] — local clustering coefficient
    C(v) = 2·T(v) / (n(v)·(n(v)−1)) with n(v) = #distinct neighbors
    (self-loops excluded); vertices with fewer than two neighbors get 0.
    Watts & Strogatz 1998; rounded to 6 dp (the module-wide cross-engine
    float policy). Cost on top of :func:`triangles_per_vertex`: one
    edge-table aggregation + a V-row join — the triangle stage's
    degree-oriented wedge bound (module docstring) still dominates."""
    tri = triangles_per_vertex(graph)
    # edges are pair-aggregated (one row per (src, dst)), so COUNT(*) is the
    # distinct-neighbor count
    nbrs = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("nbrs"))
    )
    n = F.col("nbrs")
    return (
        tri.join(nbrs, "id", "left")
        .select(
            "id",
            F.coalesce("nbrs", F.lit(0)).alias("nbrs"),
            "triangles",
            F.round(
                F.when(
                    F.coalesce(n, F.lit(0)) >= 2,
                    2.0 * F.col("triangles") / (n * (n - F.lit(1))),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("coeff"),
        )
    )
