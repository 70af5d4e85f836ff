"""Custom stateful streaming: per-user sessionization with
``applyInPandasWithState``.

This is the operator class Structured Streaming can't express with
built-in windowed aggregation: arbitrary per-key state evolved by
user code. Each user's open session lives in the state store
(start/end/count/value-sum); a batch of events extends it or closes it
when the gap exceeds SESSION_GAP_MIN, and an event-time timeout closes
sessions the stream has moved past (watermark > session end + gap).

Scale properties: state is one tiny tuple per ACTIVE user, not per
event; the state store shards by the groupBy key across executors, so
1e9 users distribute like any other keyed aggregation; timeouts purge
state, so memory is bounded by concurrently-active users. The Arrow
boundary batches whole key-groups per executor call — no per-row
Python.

There is no SQL oracle for the *streaming* form (emission depends on
trigger/watermark progress, definitionally outside SQL); instead
tests/test_stateful_streaming.py proves CLOSED sessions identical to
the batch lag/cumsum sessionization of windows.py — same gap constant,
same aggregates — and the driver records the rows-only check.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windows import SESSION_GAP_MIN, norm_stream_ts

GAP_US = SESSION_GAP_MIN * 60 * 1_000_000

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
STATE_SCHEMA = "start_us long, end_us long, n long, cents long"


def _sessionize_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Evolve one user's session state over a micro-batch of events.

    Values are accumulated in integer cents so the closed-session sums are
    exact and reproducible against the batch query's DECIMAL arithmetic.
    """
    (user_id,) = key
    closed: list[tuple[int, int, int, int]] = []

    if state.hasTimedOut:
        if state.exists:
            closed.append(tuple(state.get))
            state.remove()
    else:
        if state.exists:
            start_us, end_us, n, cents = state.get
        else:
            start_us = end_us = n = cents = None

        rows = []
        for pdf in pdfs:
            for us, val in zip(pdf["us"], pdf["value"]):
                rows.append((int(us), float(val)))
        rows.sort()

        for us, val in rows:
            v_cents = int(round(val * 100))
            if start_us is None:
                start_us, end_us, n, cents = us, us, 1, v_cents
            elif us - end_us > GAP_US:
                closed.append((start_us, end_us, n, cents))
                start_us, end_us, n, cents = us, us, 1, v_cents
            else:
                end_us, n, cents = us, n + 1, cents + v_cents

        if start_us is not None:
            state.update((start_us, end_us, n, cents))
            # close the open session once the event-time watermark passes
            # its end by more than the gap (no further event can extend it)
            state.setTimeoutTimestamp((end_us + GAP_US) // 1000 + 1)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in closed],
                "n_events": [n for _, _, n, _ in closed],
                "sum_value": [c / 100.0 for _, _, _, c in closed],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events (streaming, with ts) -> closed-session rows (append mode)."""
    return (
        events.withWatermark("ts", "0 seconds")
        .select("user_id", F.unix_micros("ts").alias("us"), "value", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def q_streaming_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful sessionizer as a real stream over the events
    parquet and return the CLOSED sessions it emitted.

    The file source replays the whole table as micro-batches; a final
    empty trigger advances the (global) watermark to max(ts), closing
    every session ending more than one gap before it. Sessions still
    open relative to the final watermark are unemitted by design (a
    stream never knows it ended) — tests sandwich the emitted set
    against batch sessionization.
    """
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_dir)
    )
    stream = norm_stream_ts(spark, stream)

    name = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # one more empty micro-batch so timers fire against the final watermark
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).orderBy("user_id", "session_start")


def oracles() -> dict[str, tuple]:
    return {"streaming_sessionized": (q_streaming_sessionized, None)}
