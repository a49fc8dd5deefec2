"""Streaming/batch parity: the Structured-Streaming hourly rollup must equal
the batch aggregation over the same parquet input."""

from pyspark.sql import functions as F

from graftlouvain.streaming.events import hourly_rollup_stream, run_to_completion


def test_stream_equals_batch(spark):
    sf = "/root/testdata/sf0.001"
    out = run_to_completion(
        hourly_rollup_stream(spark, sf, glob="events.parquet"), "rollup_test"
    )
    got = {
        (r["hour_epoch"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in out.collect()
    }
    batch = (
        spark.read.parquet(f"{sf}/events.parquet")
        .groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("s"))
    )
    want = {
        (r["hour_epoch"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()
    }
    assert got == want
    assert len(got) > 0
