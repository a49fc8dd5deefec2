"""Iteration state hygiene for Spark DataFrame fixpoint loops.

Two separate pathologies must be handled every superstep:

1. **Lineage growth** — each superstep's plan references the previous state
   several times, so unchecked plans grow exponentially in node count.
   ``localCheckpoint`` truncates the plan to a LogicalRDD leaf.
2. **Statistics snowball** — ``localCheckpoint`` COPIES the truncated plan's
   size estimate onto the LogicalRDD. Size estimates of joins are products of
   their inputs, so the carried estimate roughly CUBES every superstep; by
   superstep ~15 the driver burns minutes per plan in BigInteger
   multiplication inside every rule that asks for ``stats.sizeInBytes``
   (JoinSelection.canBroadcastBySize, InjectRuntimeFilter, ...). Layering an
   eagerly-materialized ``cache()`` on top replaces the estimate with the REAL
   in-memory byte size, so downstream planning sees truthful (tiny) numbers
   and broadcast decisions stay correct.

``materialize`` applies both; callers unpersist the previous state once the
new one is materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Cut lineage AND reset the planner's size statistics to reality."""
    cached = df.localCheckpoint(eager=True).cache()
    cached.count()
    return cached


def swap(old: DataFrame | None, new: DataFrame) -> DataFrame:
    """Materialize ``new`` then release ``old`` (safe order: the new state is
    fully computed before its input is evicted)."""
    out = materialize(new)
    if old is not None:
        try:
            old.unpersist()
        except Exception:
            pass
    return out
