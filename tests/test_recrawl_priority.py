"""Poisson recrawl scheduling (functions/recrawl.py): exact agreement
with a pure-Python mirror of the quantized estimator, plus the
scheduling-order sanity properties (faster-changing and staler pages
rank higher)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from distributed_crawl_spark.functions import recrawl as R

T0 = datetime(2024, 1, 1)


def _visits(spec):
    """spec: {page: [(hours_offset, digest), ...]} -> rows."""
    rows = []
    i = 0
    for page, vs in spec.items():
        for hours, digest in vs:
            rows.append((page, T0 + timedelta(hours=hours), digest, i))
            i += 1
    return rows


def _py_priority(rows):
    """Pure-python mirror of recrawl_priority's quantized math."""
    by_page = {}
    for page, ts, digest, ordk in rows:
        by_page.setdefault(page, []).append((ts, ordk, digest))
    horizon = int(max(ts for _, ts, _, _ in rows).timestamp())
    out = {}
    for page, vs in by_page.items():
        vs.sort()
        if len(vs) < 2:
            continue
        n = len(vs)
        changes = sum(
            1 for a, b in zip(vs, vs[1:]) if a[2] != b[2]
        )
        span = int(vs[-1][0].timestamp()) - int(vs[0][0].timestamp())
        mean_iv = span // (n - 1)
        if mean_iv <= 0:
            continue
        r_milli = min((changes * 1000) // (n - 1), R.R_CAP_MILLI)
        lam = math.floor(
            -math.log(1.0 - r_milli / 1000.0) / mean_iv * R.LAM_SCALE
        )
        age = horizon - int(vs[-1][0].timestamp())
        p = math.floor((1.0 - math.exp(-(lam * age) / float(R.LAM_SCALE)))
                       * R.P_SCALE)
        out[page] = (n, changes, mean_iv, lam, age, p)
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["page", "ts", "digest", "event_id"])
    return {
        r.page: (r.n_visits, r.n_changes, r.mean_iv_s, r.lam_x1e9,
                 r.age_s, r.p_stale_x1e6)
        for r in R.recrawl_priority(df, order_col="event_id").collect()
    }


def test_matches_python_reference(spark):
    rows = _visits({
        # changes every visit (r capped at 999/1000)
        "volatile": [(0, "a"), (6, "b"), (12, "c"), (18, "d"), (24, "e")],
        # never changes
        "static": [(0, "x"), (8, "x"), (16, "x"), (24, "x")],
        # changes half the time
        "half": [(0, "p"), (4, "q"), (8, "q"), (12, "r"), (16, "r")],
        # single visit: excluded (no interval to estimate from)
        "once": [(3, "z")],
    })
    got = _run(spark, rows)
    want = _py_priority(rows)
    assert got == want
    assert "once" not in got


def test_faster_change_means_higher_staleness(spark):
    """Same revisit cadence and same age: the page that changed more
    often must carry the higher p_stale."""
    rows = _visits({
        "hot": [(0, "a"), (6, "b"), (12, "c"), (18, "d")],
        "lukewarm": [(0, "a"), (6, "a"), (12, "b"), (18, "b")],
        "cold": [(0, "a"), (6, "a"), (12, "a"), (18, "a")],
        # horizon anchor so every page above has the same positive age
        "anchor": [(0, "h"), (30, "h")],
    })
    got = _run(spark, rows)
    assert got["hot"][5] > got["lukewarm"][5] > got["cold"][5] == 0


def test_staler_page_ranks_higher(spark):
    """Same change behavior, older last visit => larger age => larger
    p_stale (exp decay is monotone in age)."""
    rows = _visits({
        "fresh": [(0, "a"), (10, "b"), (20, "c"), (40, "d")],
        "stale": [(0, "a"), (10, "b"), (20, "c")],
        "anchor": [(0, "h"), (40, "h")],
    })
    got = _run(spark, rows)
    assert got["stale"][4] > got["fresh"][4]
    assert got["stale"][5] > got["fresh"][5]


def test_layout_invariant(spark):
    rows = _visits({
        f"p{i}": [(j * 3, "d" + str((i * j) % 3)) for j in range(5)]
        for i in range(20)
    })
    df = spark.createDataFrame(rows, ["page", "ts", "digest", "event_id"])
    a = sorted(map(tuple, R.recrawl_priority(df, order_col="event_id").collect()))
    b = sorted(map(tuple, R.recrawl_priority(
        df.repartition(11), order_col="event_id").collect()))
    assert a == b


def test_refetch_frontier_drains_stalest_first(spark):
    """Scheduler composition: refetch_frontier rows run through the
    SAME politeness window as organic crawling, and within one host's
    budget the stalest pages (highest p_stale) win the slots."""
    from distributed_crawl_spark.operators.politeness import (
        rank_frontier, split_ranked,
    )

    # 6 pages on one host with distinct change rates: page i changes
    # on i of its 5 revisit intervals; all share the same cadence and
    # last-visit time, so p_stale strictly increases with i.
    rows = []
    eid = 0
    for i in range(6):
        digests = ["a"] * (6 - i) + [f"c{j}" for j in range(i)]
        for j, dg in enumerate(digests[:6]):
            rows.append(
                (f"https://h.test/p{i}", T0 + timedelta(hours=4 * j), dg, eid)
            )
            eid += 1
    rows.append(("https://h.test/anchor", T0 + timedelta(hours=40), "x", eid))
    rows.append(("https://h.test/anchor", T0 + timedelta(hours=41), "x", eid + 1))
    df = spark.createDataFrame(rows, ["page", "ts", "digest", "event_id"])

    pri = R.recrawl_priority(df, order_col="event_id")
    frontier = R.refetch_frontier(pri, min_p_stale_x1e6=1)
    # the never-changing page 0 and the fresh anchor fall below the floor
    urls = {r.url for r in frontier.collect()}
    assert "https://h.test/p0" not in urls and "https://h.test/anchor" not in urls

    selected, deferred = split_ranked(rank_frontier(frontier, host_budget=3))
    picked = {r.url for r in selected.collect()}
    # budget 3 on one host: the three most-changing pages win
    assert picked == {f"https://h.test/p{i}" for i in (3, 4, 5)}
    assert deferred.count() == frontier.count() - 3
