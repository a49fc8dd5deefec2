"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §2g "grouped-map vectorized UDF" +
Structured Streaming state API).

Per user, events are folded into sessions that close after ``gap_seconds`` of
inactivity; closed sessions are emitted in append mode. State per key is the
open session's (start, last_ts, n_events, sum_value). This is the canonical
custom-stateful shape (the batch twin is ``__spark_entry__.q_events_sessionize``,
which the test compares against for session COUNTS).

Scale: state is O(active users); Arrow batches per group, no per-row Python.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from graftlouvain.streaming.events import EVENTS_SCHEMA

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
STATE_SCHEMA = "start long, last long, n long, v double"


def _sessionize(
    key: Tuple[Any], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    gap = 1800
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, v = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="s")],
                "session_end": [pd.Timestamp(last, unit="s")],
                "n_events": [n],
                "sum_value": [v],
            }
        )
        return

    # (ts, event_id) ordering matches the batch twin's window tiebreak.
    # ACROSS micro-batches the operator assumes in-order arrival: an event
    # landing in a later micro-batch with ts earlier than the open session's
    # `last` is folded into it (gap computed vs `last`, never negative-split).
    # For out-of-order sources, pre-sort the input or add a watermark buffer
    # upstream — see sessionize_stream docstring.
    rows = pd.concat(list(batches)).sort_values(["ts", "event_id"])
    ts = rows["ts"].astype("int64") // 1_000_000_000
    vals = rows["value"].fillna(0.0)

    if state.exists:
        start, last, n, v = state.get
    else:
        start = last = int(ts.iloc[0])
        n, v = 0, 0.0

    out = []
    for t, val in zip(ts, vals):
        t = int(t)
        if t - last > gap:
            out.append((user_id, start, last, n, v))
            start, n, v = t, 0, 0.0
        last = max(last, t)
        n += 1
        v += float(val)
    state.update((start, last, n, v))
    try:
        state.setTimeoutDuration(gap * 1000)
    except Exception:
        pass  # NoTimeout mode: timeouts not permitted; tails remain in state
    if out:
        yield pd.DataFrame(
            {
                "user_id": [o[0] for o in out],
                "session_start": [pd.Timestamp(o[1], unit="s") for o in out],
                "session_end": [pd.Timestamp(o[2], unit="s") for o in out],
                "n_events": [o[3] for o in out],
                "sum_value": [o[4] for o in out],
            }
        )


def sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    glob: str | None = None,
    use_timeout: bool = False,
) -> DataFrame:
    """readStream → per-user stateful sessionization. Closed sessions are
    appended; the open tail session stays in state. ``use_timeout=True``
    flushes idle tails via processing-time timeouts — only for genuinely
    continuous streams: with a finite input the pending timeouts keep the
    micro-batch engine spinning, so the default (NoTimeout) leaves tails in
    state and tests account for them.

    In-order-input assumption: within a micro-batch events are sorted by
    (ts, event_id) — the batch twin's exact tiebreak — but events that arrive
    in a LATER micro-batch with a timestamp before the open session's last
    event are folded into that session rather than re-splitting it. Feed
    time-ordered files (or watermark-buffer upstream) when batch parity
    matters."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 2)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    stream = reader.parquet(events_dir).withColumn("ts", F.col("ts").cast("timestamp"))
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if use_timeout
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
