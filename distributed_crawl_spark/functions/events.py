"""Event-stream analytics: gap-based sessionization.

The crawl side of the engine consumes the events table as a stream
(hourly watermarked rollups, streaming/stream.py); this module adds the
batch twin every log pipeline needs — grouping a user's events into
sessions split at inactivity gaps. No reference analog
(thebenjy/distributed_crawl has no event analytics); included as part
of the training-data/analytics extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_SESSIONS_PER_USER = 1 << 20


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               event_col: str = "event_id") -> DataFrame:
    """Assign every event a session id: a new session starts at a
    user's first event and whenever the gap since their previous event
    exceeds ``gap_minutes``. ``session_id = user_id * 2^20 +
    session_seq`` (globally unique; 2^20 sessions/user headroom).

    One window shuffle keyed by user: ``lag`` finds each event's
    predecessor, a running sum of session-start flags numbers the
    sessions — both ride the SAME window ordering (ts, event_id — the
    id tie-break makes simultaneous events deterministic), so Catalyst
    plans a single sort + single exchange. Per-user event counts bound
    the sort partitions; a pathological bot user is an AQE-skew case,
    not a plan change (sessionization inherently needs the user's full
    ordered history in one place — that IS the operator).

    Returns (event_id, user_id, ts, session_id, is_session_start).
    """
    gap_s = gap_minutes * 60
    w = Window.partitionBy(user_col).orderBy(ts_col, event_col)
    prev = F.lag(F.col(ts_col)).over(w)
    is_start = (
        prev.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev) > gap_s)
    )
    seq = F.sum(is_start.cast("long")).over(
        Window.partitionBy(user_col).orderBy(ts_col, event_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return events.select(
        event_col, user_col, ts_col,
        (F.col(user_col) * F.lit(MAX_SESSIONS_PER_USER) + seq - 1)
        .cast("long").alias("session_id"),
        is_start.alias("is_session_start"),
    )


def session_stats(events: DataFrame, gap_minutes: int = 30,
                  user_col: str = "user_id", ts_col: str = "ts",
                  event_col: str = "event_id") -> DataFrame:
    """Per-session rollup of :func:`sessionize`: (session_id, user_id,
    n_events, start_ts, end_ts, duration_s). One additional map-side-
    combinable groupBy over session_id — keys are finer than users, so
    this agg is strictly better-distributed than the window before it."""
    s = sessionize(events, gap_minutes, user_col, ts_col, event_col)
    return s.groupBy("session_id", user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col)))
        .alias("duration_s"),
    )
