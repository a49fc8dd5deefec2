"""Synchronous label propagation (SURVEY.md §2h — [north-star]; semantics from
Raghavan et al. 2007, synchronous variant with deterministic tie-breaking).

Per superstep every vertex adopts the label with the largest summed incident
edge weight among its neighbors' current labels; ties broken by the SMALLEST
label id; vertices keep their label when they have no neighbors. Synchronous
LPA can oscillate on bipartite-ish structures, so the loop runs a fixed
``max_iter`` with early stop on a stable labeling — deterministic by
construction (pure function of the input graph), matched exactly by the
sequential oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graftlouvain.functions.iterate import materialize, superstep_planning
from graftlouvain.operators.graph import LinkGraph


def label_propagation(graph: LinkGraph, max_iter: int = 5) -> DataFrame:
    """Returns [id, label]."""
    with superstep_planning(graph.edges.sparkSession):
        labels = materialize(graph.vertices.select("id", F.col("id").alias("label")))
        for _i in range(max_iter):
            weighted = (
                graph.edges.where(F.col("src") != F.col("dst"))
                .join(
                    labels.select(F.col("id").alias("dst"), F.col("label").alias("l")), "dst"
                )
                .groupBy(F.col("src").alias("id"), F.col("l"))
                .agg(F.sum("weight").alias("w"))
            )
            w_rank = Window.partitionBy("id").orderBy(F.desc("w"), F.asc("l"))
            winners = (
                weighted.withColumn("rn", F.row_number().over(w_rank))
                .where(F.col("rn") == 1)
                .select("id", F.col("l").alias("new_label"))
            )
            new_labels = materialize(
                labels.join(winners, "id", "left")
                .select("id", F.coalesce("new_label", "label").alias("label"))
            )
            changed = (
                new_labels.join(labels.withColumnRenamed("label", "old"), "id")
                .where(F.col("label") != F.col("old"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
    return labels
