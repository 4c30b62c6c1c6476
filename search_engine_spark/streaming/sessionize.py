"""Sessionization: gap-based event sessions, in both execution modes.

* ``batch_sessionize`` — the classic gaps-and-islands window query
  (lag → new-session flag → running sum → group).  Pure JVM expressions,
  fully oracle-mirrorable in SQL (driver_queries 'sessionize').
* ``stream_sessionize`` — the same semantics as a custom STATEFUL
  streaming operator via ``applyInPandasWithState`` (the Structured
  Streaming escape hatch for operators Spark lacks, SURVEY-extras):
  per-user open-session state, sessions closed by a gap-exceeding event
  emit immediately, dangling sessions flush on event-time timeout when
  the watermark passes their end + gap.

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
_STATE_SCHEMA = "start long, end long, n long, total double"


def batch_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    with_flag = events.select(
        "user_id", "ts", "event_id", "value",
        F.lag("ts").over(w).alias("prev_ts"),
    ).withColumn(
        "new_session",
        (
            F.col("prev_ts").isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > gap_s)
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

        if state.hasTimedOut:
            if state.exists:
                yield emit(state.get)
            state.remove()
            return

        cur = list(state.get) if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, val in zip(pdf["ts"], pdf["value"]):
                t = int(ts.value // 1000)  # ns → us
                if cur is None:
                    cur = [t, t, 1, float(val)]
                elif t - cur[1] > gap_us:
                    # strictly after the open session by more than the gap
                    yield emit(cur)
                    cur = [t, t, 1, float(val)]
                elif cur[0] - t > gap_us:
                    # late-but-in-watermark event more than a gap BEFORE the
                    # open session: in the batch (fully sorted) result it
                    # forms its own earlier session — emit that singleton
                    # now (it can never merge with the open session)
                    yield emit([t, t, 1, float(val)])
                else:
                    # merges into the open session; an out-of-order event
                    # within the gap of either edge must min/max-update BOTH
                    # edges so session_start matches batch_sessionize
                    cur[0] = min(cur[0], t)
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
                    cur[3] += float(val)
        if cur is not None:
            state.update(tuple(cur))
            # flush when the watermark passes session end + gap
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_minutes * 60 * 1000)

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
