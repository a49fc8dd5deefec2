"""Structured-Streaming ingestion of the events table: incremental hourly
rollups with watermarked late-data handling.

The reference has no streaming surface (SURVEY.md §2g lists it out of the
reference's scope); this module exists because a link-graph pipeline at corpus
scale ingests edge events continuously — the batch query
``__spark_entry__.q_events_hourly`` computes the identical frame, which is how
the streaming path is oracle-checked (batch/stream parity test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def hourly_rollup_stream(
    spark: SparkSession, events_dir: str, watermark: str = "1 hour",
    glob: str | None = None,
) -> DataFrame:
    """readStream over a parquet DIRECTORY (the file source monitors it for
    new files) → watermarked hourly aggregation. ``glob`` filters file names
    (e.g. ``events.parquet`` to stream one table out of a shared directory).
    Caller attaches the sink (memory sink in tests, real sink in prod)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 4)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    stream = reader.parquet(events_dir)
    # watermarks require TIMESTAMP (tz-aware); the table stores TIMESTAMP_NTZ —
    # cast is exact under the session's pinned UTC timezone
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def hourly_topk_stream(
    spark: SparkSession, events_dir: str,
    watermark: str = "1 hour", glob: str | None = None,
) -> DataFrame:
    """Per-hour top-k event types by event count (ties → alphabetically
    first type). Ranking over a streaming aggregate requires a second
    stateful stage, which append mode cannot express — so the rollup streams
    (watermarked) and the rank is applied by the SINK query over the
    complete-mode result table (:func:`run_to_completion` + :func:`topk_of`,
    which is where ``k`` is chosen — this function deliberately takes no
    ``k``), the standard pattern for continuously-maintained leaderboards.
    The batch twin ``q_events_topk`` computes the identical frame and
    carries the DuckDB oracle."""
    return hourly_rollup_stream(spark, events_dir, watermark=watermark, glob=glob)


def topk_of(rollup: DataFrame, k: int = 3) -> DataFrame:
    """[hour_epoch, event_type, n_events, rank ≤ k] from an hourly rollup
    frame — shared by the batch twin and the streaming sink query."""
    from pyspark.sql import Window

    w = Window.partitionBy("hour_epoch").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        rollup.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("hour_epoch", "event_type", "n_events", "rank")
    )


def run_to_completion(result: DataFrame, query_name: str = "rollup") -> DataFrame:
    """Drive the streaming frame over all currently-available input via a
    memory sink (complete mode) and return the final table — the synchronous
    smoke path for tests."""
    q = (
        result.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return result.sparkSession.sql(f"SELECT * FROM {query_name}")
