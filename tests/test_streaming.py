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


def test_stateful_sessionization(spark):
    """Custom stateful operator (applyInPandasWithState): closed sessions from
    the stream must agree with the batch sessionizer. The open tail session
    per user stays in state, so stream_closed + open_tails == batch_total."""
    from graftlouvain.streaming.sessions import sessionize_stream
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    sf = "/root/testdata/sf0.001"
    out = sessionize_stream(spark, sf, glob="events.parquet")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT user_id, count(*) AS closed FROM sessions_test GROUP BY user_id"
    )
    closed = {r["user_id"]: r["closed"] for r in got.collect()}

    ev = spark.read.parquet(f"{sf}/events.parquet").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp(F.col("ts").cast("timestamp")) - F.unix_timestamp(
        F.lag(F.col("ts").cast("timestamp")).over(w)
    )
    batch = (
        ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("total"))
    )
    total = {r["user_id"]: r["total"] for r in batch.collect()}
    assert set(closed) <= set(total)
    # every user: closed sessions = total − 1 (the open tail never times out
    # inside processAllAvailable)
    for u, t in total.items():
        assert closed.get(u, 0) == t - 1


def test_sessionize_buffered_out_of_order(spark, tmp_path):
    """Watermark-buffered sessionization under SHUFFLED file arrival: slices
    of the events table are fed in scrambled order (one micro-batch each,
    mtime-controlled), with a watermark delay covering the full disorder.
    After three flush probes advance the watermark past every real event,
    the emitted sessions must equal the batch sessionizer's FULL per-user
    session rows (start, end, count, sum) computed over the in-order data —
    exactly, not just counts."""
    import datetime as dt
    import os
    import random

    from pyspark.sql import Window

    from graftlouvain.streaming.sessions import sessionize_stream_buffered

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    bounds = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    hi = bounds["hi"]
    span = int((hi - bounds["lo"]).total_seconds())
    delay_s = span + 3600  # covers ANY shuffle of the slices

    feed = tmp_path / "feed"
    feed.mkdir()

    def write_one(df, name, mtime):
        outd = tmp_path / ("w_" + name)
        df.coalesce(1).write.mode("overwrite").parquet(str(outd))
        part = next(p for p in outd.iterdir() if p.name.endswith(".parquet"))
        dst = feed / name
        part.rename(dst)
        os.utime(dst, (mtime, mtime))

    w = Window.orderBy("ts", "event_id")
    sliced = ev.withColumn("_slice", F.ntile(6).over(w))
    order = list(range(1, 7))
    random.Random(7).shuffle(order)  # deterministic scramble: [5,1,3,6,2,4]-ish
    t0 = 1_700_000_000
    for i, s in enumerate(order):
        write_one(
            sliced.where(F.col("_slice") == s).drop("_slice"),
            f"slice_{i}.parquet", t0 + i * 10,
        )
    # three flush probes, each its own batch: the k-th advances the watermark
    # computed DURING batch k+1, so probe 1 finalizes every real event and
    # probe 2 finalizes probe 1 (closing each user's last real session)
    users = [r["user_id"] for r in ev.select("user_id").distinct().collect()]
    fts = hi + dt.timedelta(seconds=delay_s + 1800 + 100)
    for j in range(3):
        rows = [
            (10_000_000 + j * 100_000 + k, fts, u, "flush", 0.0, None)
            for k, u in enumerate(users)
        ]
        write_one(
            spark.createDataFrame(rows, ev.schema),
            f"zflush_{j}.parquet", t0 + 1000 + j * 10,
        )
        fts = fts + dt.timedelta(seconds=delay_s + 100)

    out = sessionize_stream_buffered(
        spark, str(feed), delay=f"{delay_s} seconds", max_files_per_trigger=1
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_ooo")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT user_id, unix_timestamp(session_start) AS s, "
            "unix_timestamp(session_end) AS e, n_events, "
            "round(sum_value, 6) AS v FROM sess_ooo"
        ).collect()
    }

    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(wu))
    sess = ev.withColumn(
        "new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn(
        "sid", F.sum("new").over(wu.rowsBetween(Window.unboundedPreceding, 0))
    )
    want = {
        tuple(r)
        for r in sess.groupBy("user_id", "sid")
        .agg(
            F.unix_timestamp(F.min("ts")).alias("s"),
            F.unix_timestamp(F.max("ts")).alias("e"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 6).alias("v"),
        )
        .select("user_id", "s", "e", "n", "v")
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_topk_matches_batch(spark):
    """Streaming leaderboard: rank applied over the complete-mode rollup
    equals the batch twin exactly (hour, type, count, rank)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as em
    from graftlouvain.streaming.events import (
        hourly_topk_stream,
        run_to_completion,
        topk_of,
    )

    sf = "/root/testdata/sf0.001"
    rollup = hourly_topk_stream(spark, sf, glob="events.parquet")
    final = run_to_completion(rollup, query_name="topk_stream_test")
    got = sorted(tuple(r) for r in topk_of(final, k=3).collect())
    want = sorted(tuple(r) for r in em.q_events_topk(spark, sf).collect())
    assert got == want and len(got) > 0


def test_stream_dedup_matches_batch(spark):
    """Streaming first-occurrence dedup keeps exactly the batch operator's
    distinct content hashes (one row per hash)."""
    from graftlouvain.operators.dedup import exact_dedup
    from graftlouvain.streaming.dedup import dedup_stream

    sf = "/root/testdata/sf0.001"
    out = dedup_stream(spark, sf, glob="documents.parquet")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream_test")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM dedup_stream_test").collect()
    finally:
        q.stop()
    got = [r["content_sha"] for r in rows]
    assert len(got) == len(set(got))  # one row per hash
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    want = {
        r["content_sha"]
        for r in exact_dedup(docs).select("content_sha").distinct().collect()
    }
    assert set(got) == want


def test_stream_dedup_watermark_path(spark, tmp_path):
    """Timestamped feeds: custom schema + watermark_col routes through
    dropDuplicatesWithinWatermark and still keeps one row per hash."""
    from pyspark.sql import types as T

    from graftlouvain.streaming.dedup import dedup_stream

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    rows = [
        (i, f"content-{i % 5}", base + dt.timedelta(minutes=i)) for i in range(20)
    ]
    src = str(tmp_path / "feed")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    out = dedup_stream(spark, src, watermark_col="ts", watermark="1 hour", schema=schema)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_wm_test")
        .start()
    )
    try:
        q.processAllAvailable()
        got = [r["content_sha"] for r in spark.sql("SELECT * FROM dedup_wm_test").collect()]
    finally:
        q.stop()
    assert len(got) == len(set(got)) == 5  # 5 distinct contents within horizon
    # parity with the batch twin (q_stream_dedup_first semantics): the kept
    # hash set equals first-arrival-per-sha over the same timestamped feed
    from pyspark.sql import functions as F

    feed = spark.read.parquet(src).withColumn(
        "content_sha", F.sha2(F.col("text"), 256)
    )
    want = {
        r["content_sha"]
        for r in feed.groupBy("content_sha")
        .agg(F.min(F.struct("ts", "doc_id")).alias("f"))
        .collect()
    }
    assert set(got) == want
