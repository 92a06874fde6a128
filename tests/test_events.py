"""Gap-based sessionization: planted session boundaries, tie-breaks,
rollup consistency, and the one-exchange plan claim."""

from __future__ import annotations

import datetime as dt

from distributed_crawl_spark.functions import events as EV


def _ts(minute, second=0):
    return dt.datetime(2026, 1, 1, 12 + minute // 60, minute % 60, second)


def test_sessionize_planted_gaps(spark):
    rows = [
        # user 1: events at 0, 10, 20 min (one session), then 120 min (new)
        (1, 1, _ts(0)), (2, 1, _ts(10)), (3, 1, _ts(20)), (4, 1, _ts(120)),
        # user 2: single event
        (5, 2, _ts(5)),
        # user 3: two events at the SAME timestamp — event_id breaks the tie
        (7, 3, _ts(0)), (6, 3, _ts(0)),
    ]
    df = spark.createDataFrame(rows, "event_id LONG, user_id LONG, ts TIMESTAMP")
    got = {r.event_id: r for r in EV.sessionize(df, gap_minutes=30).collect()}
    M = EV.MAX_SESSIONS_PER_USER
    assert [got[i].session_id for i in (1, 2, 3)] == [1 * M] * 3
    assert got[4].session_id == 1 * M + 1 and got[4].is_session_start
    assert got[1].is_session_start and not got[2].is_session_start
    assert got[5].session_id == 2 * M
    # simultaneous events: both in one session, lower event_id starts it
    assert got[6].session_id == got[7].session_id == 3 * M
    assert got[6].is_session_start and not got[7].is_session_start


def test_session_stats_rollup(spark):
    rows = [
        (1, 1, _ts(0)), (2, 1, _ts(10)), (3, 1, _ts(20)), (4, 1, _ts(120)),
        (5, 2, _ts(5)),
    ]
    df = spark.createDataFrame(rows, "event_id LONG, user_id LONG, ts TIMESTAMP")
    got = {r.session_id: r for r in EV.session_stats(df, gap_minutes=30).collect()}
    M = EV.MAX_SESSIONS_PER_USER
    s = got[1 * M]
    assert s.n_events == 3 and s.duration_s == 1200
    assert got[1 * M + 1].n_events == 1 and got[1 * M + 1].duration_s == 0
    assert got[2 * M].n_events == 1


def test_sessionize_single_exchange(spark):
    """The lag and the running sum share one window ordering -> the
    physical plan must contain exactly ONE shuffle."""
    df = spark.createDataFrame(
        [(1, 1, _ts(0))], "event_id LONG, user_id LONG, ts TIMESTAMP"
    )
    plan = EV.sessionize(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
