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

Hash-checkable since round 7 (the sandwich-audit conversion the r6
verdict asked for): although emission *timing* depends on
trigger/watermark progress, the SET a terminated replay has emitted is
a pure function of the data — every batch session whose end sits more
than one gap before the stream's final watermark (max event ts, 0 s
delay). A session closed mid-stream by a later same-user event
satisfies that predicate automatically (the successor event IS later
than end+gap), and a session closed by event-time timeout satisfies it
by the timeout condition itself. So the DuckDB oracle is the batch
lag/cumsum sessionization filtered to ``end + gap < max(ts)`` — proven
hash-identical to the real applyInPandasWithState replay at
sf0.001/0.01/0.1. Boundary note: the stream's timeout fires at
millisecond resolution ((end_us+gap)//1000 + 1) while the filter is
exact microseconds; the two can only disagree for a session ending
within 2 ms of exactly one gap before max(ts), and the fixture's
second-granular timestamps with whole-minute gaps keep every session
≥ 1 s away from that boundary. tests/test_stateful_streaming.py
independently proves the closed-session semantics against the batch
form.
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

    The fold is VECTORIZED (guide §4: numpy inside the Arrow plane, no
    per-row Python): sort by us, split where diff(us) > gap, aggregate
    each segment with ``np.add.reduceat``. Provably identical to the
    row-at-a-time fold it replaced: the running ``end_us`` is always the
    previous sorted event, so the gap checks ARE diff(us) (the first
    event checks against the carried state's end instead); same-us tie
    order cannot change any segment's (start, end, n, cents) because
    integer cents addition is commutative; ``np.rint`` and Python
    ``round`` both round half-to-even on float64.
    """
    import numpy as np

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

        chunks = [
            (pdf["us"].to_numpy(np.int64), pdf["value"].to_numpy(np.float64))
            for pdf in pdfs
            if len(pdf)
        ]
        if chunks:
            us = np.concatenate([c[0] for c in chunks])
            vals = np.concatenate([c[1] for c in chunks])
            order = np.argsort(us, kind="stable")
            us = us[order]
            v_cents = np.rint(vals[order] * 100.0).astype(np.int64)
            brk = np.flatnonzero(np.diff(us) > GAP_US) + 1
            seg_lo = np.concatenate(([0], brk))
            seg_hi = np.concatenate((brk, [us.size]))
            seg_start = us[seg_lo]
            seg_end = us[seg_hi - 1]
            seg_n = (seg_hi - seg_lo).astype(np.int64)
            seg_cents = np.add.reduceat(v_cents, seg_lo)
            if start_us is not None:
                if us[0] - end_us > GAP_US:
                    closed.append((start_us, end_us, n, cents))
                else:
                    # merge the carried session into the first segment:
                    # start stays the carried start (the fold never
                    # rewound it), end is the segment's last event
                    seg_start[0] = start_us
                    seg_n[0] += n
                    seg_cents[0] += cents
            closed.extend(
                (int(seg_start[i]), int(seg_end[i]), int(seg_n[i]), int(seg_cents[i]))
                for i in range(len(seg_lo) - 1)
            )
            start_us = int(seg_start[-1])
            end_us = int(seg_end[-1])
            n = int(seg_n[-1])
            cents = int(seg_cents[-1])

        if start_us is not None:
            state.update((start_us, end_us, n, cents))
            # close the open session once the event-time watermark passes
            # its end by more than the gap (no further event can extend
            # it). CLAMPED to just past the current watermark: in a
            # multi-file replay a later micro-batch can deliver rows
            # OLDER than the already-advanced global watermark (file
            # order is not time order), and Spark rejects a timeout set
            # behind the watermark — the clamp fires such a session's
            # timer at the earliest legal instant instead, emitting the
            # same closure-predicate set (end + gap < final watermark).
            timeout_ms = (end_us + GAP_US) // 1000 + 1
            state.setTimeoutTimestamp(
                max(timeout_ms, state.getCurrentWatermarkMs() + 1)
            )

    if closed:
        arr = np.asarray(closed, dtype=np.int64)
        yield pd.DataFrame(
            {
                "user_id": np.full(len(closed), user_id, dtype=np.int64),
                "session_start": pd.to_datetime(arr[:, 0], unit="us"),
                "session_end": pd.to_datetime(arr[:, 1], unit="us"),
                "n_events": arr[:, 2],
                "sum_value": arr[:, 3] / 100.0,
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
    stream never knows it ended) — the oracle applies the same closure
    predicate to the batch sessionization (module docstring), so the
    driver hash-checks the emitted set exactly.
    """
    import math
    import os

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # Batch the replay into a FIXED small number of micro-batches
    # instead of one per source file: per-batch cost is fixed machinery
    # (state-store load/commit x partitions + an Arrow worker round), so
    # wall time scales with batch COUNT, not data. ceil(n/3) keeps the
    # replay multi-batch whenever the source has >=3 files — sessions
    # still close both ways (successor-event mid-stream and event-time
    # timeout across batch boundaries), which is what the sandwich
    # oracle's closure predicate certifies — while bounding the
    # fixed-overhead multiplier at ~3 regardless of file count. The
    # testdata table is a single file (1 data batch + 1 timer batch);
    # multi-batch state evolution is pinned independently by
    # tests/test_stateful_streaming.py's chunked replays.
    # the source must match the layout: a directory-shaped
    # events.parquet is streamed DIRECTLY (a pathGlobFilter of
    # 'events.parquet' would match leaf-file NAMES — part-*.parquet —
    # and silently read zero files), while the single-file testdata
    # layout needs the glob to exclude the sibling tables in sf_dir
    ev_path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(ev_path):
        # Multi-batch replay is only event-time-faithful when the file
        # source's delivery order (mtime) matches event-time order — a
        # contract a sequentially-written directory satisfies because
        # each part file lands strictly after the previous one. A
        # directory written by ONE parallel Spark job has near-identical
        # mtimes: cross-batch order is then arbitrary, sessions
        # straddling a batch boundary can split, and the closure-
        # predicate oracle hash breaks. ENFORCE the contract instead of
        # assuming it: if any two part files share an mtime (order not
        # a strict total order), replay everything in a single trigger
        # — one batch has no cross-batch order, so it is always safe.
        parts = [
            os.path.join(ev_path, f)
            for f in os.listdir(ev_path)
            if f.endswith(".parquet")
        ]
        n_files = len(parts)
        mtimes = sorted(os.stat(p).st_mtime_ns for p in parts)
        strict = all(a < b for a, b in zip(mtimes, mtimes[1:]))
        per_trigger = max(1, math.ceil(n_files / 3)) if strict else n_files
        reader = spark.readStream.schema(raw_schema).option(
            "maxFilesPerTrigger", str(per_trigger)
        )
        stream = reader.parquet(ev_path)
    else:
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .option("maxFilesPerTrigger", "1")
            .parquet(sf_dir)
        )
    stream = norm_stream_ts(spark, stream)

    # The stateful operator's state-store instance count is frozen to
    # spark.sql.shuffle.partitions at query start, and the replay's wall
    # time is dominated by PER-PARTITION fixed machinery (state-store
    # setup/commit + one Arrow Python-worker round per partition PER
    # micro-batch), not by data volume — state is one tiny tuple per
    # active user, the same node-domain-state class session.state_width
    # governs in the iterative loops. At the bench's width 32 that fixed
    # cost ran 2 batches x 32 stores and made the recorded number
    # maximally sensitive to host contention (r8: 3.99 s -> 10.97 s with
    # zero code change). Derive the width from configured parallelism
    # instead: 8 on local[32] (4x less fixed overhead), growing with
    # shuffle.partitions on a real cluster where 10^8 active users need
    # the state sharded wide. Emitted SET is width-invariant (proven by
    # the SPARK_GRAFT_PARTS=5 re-drive), so the oracle hash is unchanged.
    from ..session import state_width

    part_key = "spark.sql.shuffle.partitions"
    orig_parts = spark.conf.get(part_key)
    spark.conf.set(part_key, str(state_width(stream)))

    name = f"sessions_{uuid.uuid4().hex[:8]}"
    try:
        q = (
            sessionize_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            # one more empty micro-batch so timers fire against the final
            # watermark
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set(part_key, orig_parts)
    return spark.table(name).orderBy("user_id", "session_start")


# The batch lag/cumsum sessionization (windows.py's ORACLE_EVENTS_
# SESSIONIZED shape) filtered to the stream's closure predicate: a
# session is emitted iff its end sits more than one gap before the
# final watermark max(ts). sum_value mirrors the stream's exact
# integer-cents accumulation (SUM(ROUND(value*100)) / 100.0 — identical
# doubles, no float summation).
ORACLE_STREAMING_SESSIONIZED = f"""
WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {GAP_US}
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
    SELECT user_id, ts, value,
           CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_no
    FROM flagged
),
sess AS (
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM numbered
    GROUP BY user_id, session_no
),
wm AS (SELECT MAX(ts) AS mx FROM events)
SELECT user_id, session_start, session_end, n_events, sum_value
FROM sess, wm
WHERE epoch_us(session_end) + {GAP_US} < epoch_us(mx)
ORDER BY user_id, session_start
"""


def oracles() -> dict[str, tuple]:
    return {
        "streaming_sessionized": (
            q_streaming_sessionized,
            ORACLE_STREAMING_SESSIONIZED,
        )
    }
