"""Politeness window: budget enforcement, FIFO-priority selection, and
heavy-host salting balance (SURVEY.md §7.3 risk 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawl_spark.operators.politeness import (
    rank_frontier,
    select_round,
    split_ranked,
)


def _frontier(spark, rows):
    # rows: (url, host, level, attempt, seq)
    return spark.createDataFrame(
        [(u, h, l, a, s, None, 0, 0, 0) for (u, h, l, a, s) in rows],
        "url string, host string, level int, attempt int, seq long, "
        "parent_url string, parent_seq long, link_pos int, discovered_round int",
    )


def test_budget_enforced_per_host(spark):
    rows = [(f"https://a.test/{i}", "a.test", 0, 0, i) for i in range(10)]
    rows += [(f"https://b.test/{i}", "b.test", 0, 0, 100 + i) for i in range(3)]
    selected, deferred = select_round(_frontier(spark, rows), host_budget=4,
                                      salt_threshold=1000)
    per_host = {
        r.host: r["cnt"]
        for r in selected.groupBy("host").agg(F.count("*").alias("cnt")).collect()
    }
    assert per_host == {"a.test": 4, "b.test": 3}
    assert deferred.count() == 6


def test_selection_respects_priority_order(spark):
    """Lowest (level, attempt, seq) rows win the budget."""
    rows = [
        ("https://a.test/l1", "a.test", 1, 0, 5),
        ("https://a.test/retry", "a.test", 0, 1, 1),
        ("https://a.test/first", "a.test", 0, 0, 9),
        ("https://a.test/l2", "a.test", 2, 0, 0),
    ]
    selected, _ = select_round(_frontier(spark, rows), host_budget=2,
                               salt_threshold=1000)
    got = {r.url for r in selected.collect()}
    assert got == {"https://a.test/first", "https://a.test/retry"}


def test_unlimited_budget_selects_all(spark):
    rows = [(f"https://a.test/{i}", "a.test", 0, 0, i) for i in range(10)]
    selected, deferred = select_round(_frontier(spark, rows), host_budget=None)
    assert selected.count() == 10
    assert deferred.count() == 0


def test_heavy_host_salting_spreads_and_overshoots_bounded(spark):
    """A host above salt_threshold splits into lanes; the selected count is
    within [budget, budget + n_salts) (per-lane ceil overshoot is the
    documented cost of skew mitigation), and light hosts are unaffected."""
    rows = [(f"https://mega.test/{i}", "mega.test", 0, 0, i) for i in range(2000)]
    rows += [(f"https://tiny.test/{i}", "tiny.test", 0, 0, 10_000 + i) for i in range(5)]
    selected, deferred = select_round(
        _frontier(spark, rows), host_budget=100, salt_threshold=500, max_salts=8
    )
    per_host = {
        r.host: r["cnt"]
        for r in selected.groupBy("host").agg(F.count("*").alias("cnt")).collect()
    }
    assert per_host["tiny.test"] == 5
    n_salts = 4  # ceil(2000/500)
    assert 100 <= per_host["mega.test"] <= 100 + n_salts
    # lane balance: recompute the salt and check spread
    lanes = (
        selected.filter(F.col("host") == "mega.test")
        .withColumn("salt", F.pmod(F.xxhash64("url"), F.lit(n_salts)))
        .groupBy("salt").count().collect()
    )
    assert len(lanes) == n_salts
    counts = [r["count"] for r in lanes]
    assert max(counts) == 25  # ceil(100/4) per lane


def test_budgets_derived_from_source_rollup(spark):
    """End-to-end curation → scheduling composition: the per-source
    rollup's duplicate share derives per-host politeness budgets
    (dup-heavy sources get 1 slot, clean sources the full budget), and
    the ranking window honors them — the recrawl-budget loop the
    source_rollup docstring promises."""
    from distributed_crawl_spark.functions.curation import source_rollup

    # dupsite: 3 docs, 2 of them exact copies; cleansite: 3 unique docs
    docs = spark.createDataFrame(
        [
            (0, "copy me", "dup.test"), (1, "copy me", "dup.test"),
            (2, "fresh text one", "dup.test"),
            (3, "alpha beta", "clean.test"), (4, "gamma delta", "clean.test"),
            (5, "epsilon zeta", "clean.test"),
        ],
        "doc_id LONG, text STRING, source STRING",
    )
    rollup = source_rollup(docs)
    budgets = rollup.select(
        F.col("source").alias("host"),
        F.when(
            F.col("n_dup_docs") * 2 > F.col("n_docs"), F.lit(1)
        ).otherwise(F.lit(3)).cast("long").alias("budget"),
    )
    got = {r.host: r.budget for r in budgets.collect()}
    assert got == {"dup.test": 1, "clean.test": 3}

    rows = [
        (f"https://{h}/p{i}", h, 0, 0, None, 0, 0, i, 0)
        for h in ("dup.test", "clean.test")
        for i in range(5)
    ]
    frontier = spark.createDataFrame(
        rows,
        "url STRING, host STRING, level INT, attempt INT, parent_url STRING,"
        "parent_seq LONG, link_pos INT, seq LONG, discovered_round INT",
    )
    selected, deferred = split_ranked(
        rank_frontier(frontier, host_budget=5, host_budgets=budgets)
    )
    per_host = {
        r.host: r.n
        for r in selected.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert per_host == {"dup.test": 1, "clean.test": 3}
    assert deferred.count() == 4 + 2


def test_error_backoff_budgets_composition(spark):
    """Backoff math (halve per failure, shift cap, floor) and the
    politeness hook: a failing host's selected slots shrink to its
    backed-off budget while healthy hosts keep the default."""
    from distributed_crawl_spark.operators.politeness import (
        error_backoff_budgets,
        rank_frontier,
        split_ranked,
    )

    failures = spark.createDataFrame(
        [("ok.com", 0), ("flaky.com", 2), ("dead.com", 50)],
        ["host", "n_failures"],
    )
    budgets = error_backoff_budgets(failures, base_budget=8)
    got = {r.host: r.budget for r in budgets.collect()}
    assert got == {"ok.com": 8, "flaky.com": 2, "dead.com": 1}

    frontier = spark.createDataFrame(
        [
            (f"https://{h}/p{i}", h, 0, 0, i)
            for h in got
            for i in range(10)
        ],
        ["url", "host", "level", "attempt", "seq"],
    )
    selected, deferred = split_ranked(
        rank_frontier(frontier, host_budget=4, host_budgets=budgets)
    )
    sel = {h: 0 for h in got}
    for r in selected.collect():
        sel[r.host] += 1
    assert sel == {"ok.com": 8, "flaky.com": 2, "dead.com": 1}
    assert selected.count() + deferred.count() == 30


def test_politeness_audit_gap_census(spark):
    """Known gap layout: violations counted strictly-under the delay, a
    boundary gap (== delay) is compliant, a single-fetch host reports
    zero gaps / NULL min, simultaneous fetches tie-break on seq (gap 0
    counted once, deterministically)."""
    from datetime import datetime, timedelta

    from distributed_crawl_spark.operators.politeness import politeness_audit

    t0 = datetime(2024, 1, 1)
    rows = [
        # hostA: gaps 5s (violation), 10s (== delay, compliant), 30s
        ("a", t0, 0),
        ("a", t0 + timedelta(seconds=5), 1),
        ("a", t0 + timedelta(seconds=15), 2),
        ("a", t0 + timedelta(seconds=45), 3),
        # hostB: one fetch -> no gaps
        ("b", t0, 4),
        # hostC: two fetches at the SAME ts -> gap 0 (violation)
        ("c", t0, 6),
        ("c", t0, 5),
    ]
    log = spark.createDataFrame(rows, "host STRING, ts TIMESTAMP, event_id LONG")
    out = {r.host: r for r in politeness_audit(log, delay_s=10).collect()}

    a = out["a"]
    assert (a.n_fetches, a.n_gaps, a.min_gap_s, a.n_violations) == (4, 3, 5, 1)
    assert a.violation_bp == 3333          # floor(1/3 * 10000)
    b = out["b"]
    assert (b.n_fetches, b.n_gaps, b.min_gap_s, b.n_violations,
            b.violation_bp) == (1, 0, None, 0, 0)
    c = out["c"]
    assert (c.n_fetches, c.n_gaps, c.min_gap_s, c.n_violations,
            c.violation_bp) == (2, 1, 0, 1, 10000)


def test_drain_plan_ceil_and_fallback(spark):
    """Ceil division pinned on exact/inexact multiples, a host missing
    from budgets and a non-positive budget both fall back to
    default_budget, and worst-host-first ordering holds."""
    from distributed_crawl_spark.operators.politeness import drain_plan

    frontier = spark.createDataFrame(
        [("a",)] * 10 + [("b",)] * 7 + [("c",)] * 3 + [("d",)] * 1,
        "host STRING",
    )
    budgets = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 0)],   # c: non-positive -> fallback
        "host STRING, budget LONG",       # d: absent -> fallback
    )
    rows = drain_plan(frontier, budgets, default_budget=2).collect()
    got = {r.host: (r.n_queued, r.budget, r.rounds_needed) for r in rows}
    assert got == {
        "a": (10, 5, 2),    # exact multiple
        "b": (7, 3, 3),     # ceil(7/3)
        "c": (3, 2, 2),     # fallback budget, ceil(3/2)
        "d": (1, 2, 1),
    }
    assert [r.host for r in rows] == ["b", "a", "c", "d"]  # ties: host asc

    # no budgets table at all -> every host at default
    nb = {r.host: r.rounds_needed
          for r in drain_plan(frontier, default_budget=4).collect()}
    assert nb == {"a": 3, "b": 2, "c": 1, "d": 1}
