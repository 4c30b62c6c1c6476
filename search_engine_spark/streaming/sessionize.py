"""Sessionization: gap-based event sessions, in both execution modes.

* ``batch_sessionize`` — the classic gaps-and-islands window query
  (lag → new-session flag → running sum → group).  Pure JVM expressions,
  fully oracle-mirrorable in SQL (driver_queries 'sessionize').
* ``stream_sessionize`` — the same semantics as a custom STATEFUL
  streaming operator via ``applyInPandasWithState`` (the Structured
  Streaming escape hatch for operators Spark lacks, SURVEY-extras):
  per-user state holds ALL sessions the watermark has not yet sealed
  (not just the latest open one), each new micro-batch re-runs the
  gaps-and-islands sweep over (pending sessions ∪ new events), and a
  session is emitted only once ``end + gap ≤ watermark`` — the point
  after which no in-watermark event can extend or bridge it.  Buffering
  every unsealed session (instead of emitting a closed session the
  moment a later event arrives) is what makes out-of-order deliveries
  converge to batch_sessionize exactly: a burst of late events can merge
  with each other AND with any earlier still-unsealed session.

Scale: state is O(active users), partitioned by user_id; the watermark
bounds it — late events beyond the watermark are dropped, so state never
grows unboundedly (the reference's analogue is its bounded queues,
Parser.cpp:203-246, which solve the same problem less precisely).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total double"
)
# parallel arrays: one entry per unsealed session, ascending by start.
#
# STATE VERSION 2 — checkpoint compatibility: this schema replaced the
# round-2 scalar-field state (one unsealed session per user).  Structured
# Streaming persists state rows in the checkpoint, so a query resumed from
# a pre-change checkpoint would deserialize old state under the new schema
# and fail or corrupt sessions.  Discard the old checkpoint directory when
# upgrading (callers are encouraged to version their checkpoint paths,
# e.g. .../sessionize_v2 — the same convention __spark_entry__ uses for
# its _v4 warehouse cache).
_STATE_VERSION = 2
_STATE_SCHEMA = (
    "starts array<long>, ends array<long>, ns array<long>, "
    "totals array<double>"
)


def batch_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # EXACT microsecond gap arithmetic — the same precision the streaming
    # twin's state machine uses (gap_us), so batch ≡ stream holds at
    # sub-second session boundaries too (unix_timestamp would TRUNCATE to
    # seconds and merge a 1800.5 s gap the stream correctly splits)
    gap_us = gap_minutes * 60 * 1_000_000
    with_flag = events.select(
        "user_id", "ts", "event_id", "value",
        F.lag("ts").over(w).alias("prev_ts"),
    ).withColumn(
        "new_session",
        (
            F.col("prev_ts").isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("prev_ts").cast("timestamp"))
                > gap_us
            )
        ).cast("int"),
    )
    with_sid = with_flag.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_sid.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("total"),
    ).drop("session_id")


def stream_sessionize(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "10 minutes") -> DataFrame:
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]

        def emit(s) -> pd.DataFrame:
            return pd.DataFrame({
                "user_id": [user_id],
                "session_start": [pd.Timestamp(s[0], unit="us")],
                "session_end": [pd.Timestamp(s[1], unit="us")],
                "n_events": [s[2]],
                "total": [s[3]],
            })

        wm_us = state.getCurrentWatermarkMs() * 1000

        def flush_keep_reschedule(sessions):
            """Emit sealed sessions, re-store the rest, re-arm the timer.

            A session [start, end] is sealed once end + gap ≤ watermark: any
            future event has ts ≥ watermark > end + gap ≥ start + gap, so it
            can neither extend the session at either edge nor bridge into it
            through intermediate events.
            """
            keep = []
            for s in sessions:
                if s[1] + gap_us <= wm_us:
                    yield emit(s)
                else:
                    keep.append(s)
            if keep:
                state.update((
                    [s[0] for s in keep], [s[1] for s in keep],
                    [s[2] for s in keep], [s[3] for s in keep],
                ))
                # fire when the watermark passes the EARLIEST unsealed end +
                # gap (must be strictly after the current watermark)
                t_ms = min(s[1] for s in keep) // 1000 + gap_minutes * 60 * 1000
                state.setTimeoutTimestamp(max(t_ms, wm_us // 1000 + 1))
            elif state.exists:
                state.remove()

        def stored():
            if not state.exists:
                return []
            starts, ends, ns, totals = state.get
            return [list(s) for s in zip(starts, ends, ns, totals)]

        if state.hasTimedOut:
            yield from flush_keep_reschedule(stored())
            return

        # gaps-and-islands sweep over (unsealed sessions ∪ new events):
        # every in-watermark event — however late — merges exactly as the
        # fully-sorted batch query would, including event-to-event merges
        # within a late burst and session-bridging deliveries.
        items = stored()
        for pdf in pdfs:
            for ts, val in zip(pdf["ts"], pdf["value"]):
                t = int(ts.value // 1000)  # ns → us
                items.append([t, t, 1, float(val)])
        items.sort(key=lambda s: (s[0], s[1]))
        merged: list[list] = []
        for s in items:
            if merged and s[0] - merged[-1][1] <= gap_us:
                m = merged[-1]
                m[1] = max(m[1], s[1])
                m[2] += s[2]
                m[3] += s[3]
            else:
                merged.append(s)
        yield from flush_keep_reschedule(merged)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
