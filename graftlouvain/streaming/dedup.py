"""Streaming exact deduplication: first-occurrence-per-content-hash over a
document stream (the streaming twin of ``operators.dedup.exact_dedup``).

``dropDuplicates`` on the sha256 keeps O(distinct hashes) of state and emits
each content exactly once in append mode — the shape of a continuous
training-data ingestion dedup stage. The documents table carries no event
time, so state is unbounded here (documented honestly); feeds that DO carry
an ingestion timestamp should use ``dedup_stream(..., watermark_col="ts",
watermark="1 hour")``, which switches to ``dropDuplicatesWithinWatermark``
and bounds state to the watermark horizon.

Batch/stream parity is tested on the SET of distinct content hashes kept
(identical by construction) rather than on representative doc_ids: the batch
operator keeps min(doc_id) per hash while a stream keeps the first ARRIVAL,
which coincide only for id-ordered feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def dedup_stream(
    spark: SparkSession,
    docs_dir: str,
    glob: str | None = None,
    watermark_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """readStream over a documents directory → [doc_id, content_sha, lang,
    source, n_chars], one row per distinct content hash (first occurrence)."""
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA).option("maxFilesPerTrigger", 2)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    stream = reader.parquet(docs_dir).withColumn(
        "content_sha", F.sha2(F.col("text"), 256)
    ).select("doc_id", "content_sha", "lang", "source", "n_chars")
    if watermark_col:
        return stream.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(
            ["content_sha"]
        )
    return stream.dropDuplicates(["content_sha"])
