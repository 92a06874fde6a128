"""Redirect resolution (pointer doubling) and rendezvous lane pinning.

resolve_redirects is checked against a brute-force stepwise Python walk
on a seeded random graph dense with cycles and long chains — doubling
vs stepping must agree on (final, hops, resolved) for every source.
lane_assignment is checked for the rendezvous minimal-disruption
property: shrinking the fleet by one lane moves ONLY the hosts that
were pinned to the removed lane.
"""

from __future__ import annotations

import random

import pytest

from distributed_crawl_spark.functions.redirects import (
    redirect_aliases,
    resolve_redirects,
)
from distributed_crawl_spark.operators.politeness import (
    lane_assignment,
    lane_load,
)


def _walk(emap: dict[str, str], src: str, max_hops: int):
    """Stepwise reference: follow emap from src up to max_hops hops."""
    cur, hops = src, 0
    while hops < max_hops and cur in emap:
        cur = emap[cur]
        hops += 1
    return cur, hops, cur not in emap


def _random_edges(seed: int, n: int):
    """Functional map over n nodes with planted cycles + long chains."""
    rng = random.Random(seed)
    emap = {}
    # chains toward low ids (node 0 terminal)
    for i in range(1, n):
        emap[f"n{i}"] = f"n{rng.randrange(i)}"
    # a long linear chain
    for i in range(1, 30):
        emap[f"chain{i}"] = f"chain{i - 1}"
    # cycles of length 2, 3, 5 plus feeders
    for name, length in (("two", 2), ("tri", 3), ("pent", 5)):
        for j in range(length):
            emap[f"{name}{j}"] = f"{name}{(j + 1) % length}"
        emap[f"feed_{name}"] = f"{name}0"
    return emap


@pytest.mark.parametrize("seed,max_hops", [(7, 8), (11, 16)])
def test_resolve_matches_stepwise_walk(spark, seed, max_hops):
    emap = _random_edges(seed, 60)
    edges = spark.createDataFrame(list(emap.items()), ["src", "dst"])
    got = {
        r["src"]: (r["final"], r["hops"], r["resolved"])
        for r in resolve_redirects(edges, max_hops=max_hops).collect()
    }
    assert set(got) == set(emap)
    for src in emap:
        assert got[src] == _walk(emap, src, max_hops), src


def test_resolve_functionalizes_min_dst(spark):
    # duplicate sources reduce to min(dst) before resolution
    edges = spark.createDataFrame(
        [("a", "z"), ("a", "b"), ("b", "t")], ["src", "dst"]
    )
    got = {r["src"]: (r["final"], r["hops"]) for r in
           resolve_redirects(edges, max_hops=4).collect()}
    assert got["a"] == ("t", 2)  # a→b (min) →t, not a→z


def test_resolve_rejects_non_power_of_two(spark):
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        resolve_redirects(edges, max_hops=6)


def test_aliases_census(spark):
    emap = {"a1": "t", "a2": "t", "a3": "a2", "c0": "c1", "c1": "c0"}
    edges = spark.createDataFrame(list(emap.items()), ["src", "dst"])
    rows = {r["final"]: (r["n_aliases"], r["max_hops_seen"]) for r in
            redirect_aliases(resolve_redirects(edges, max_hops=4)).collect()}
    # cycle members excluded; t collects all three aliases (a3 via 2 hops)
    assert rows == {"t": (3, 2)}


def test_rendezvous_minimal_disruption(spark):
    hosts = spark.createDataFrame(
        [(f"host{i}.example",) for i in range(300)], ["host"]
    )
    at16 = {r["host"]: r["lane"] for r in
            lane_assignment(hosts, n_lanes=16).collect()}
    at15 = {r["host"]: r["lane"] for r in
            lane_assignment(hosts, n_lanes=15).collect()}
    moved = {h for h in at16 if at15[h] != at16[h]}
    # ONLY hosts pinned to the removed lane 15 may move
    assert moved == {h for h, lane in at16.items() if lane == 15}
    # and the fleet actually uses many lanes (sanity against constant hash)
    assert len(set(at16.values())) == 16


def test_lane_load_weights(spark):
    hosts = spark.createDataFrame(
        [(f"h{i}",) for i in range(40)], ["host"]
    )
    assigned = lane_assignment(hosts, n_lanes=4)
    weights = spark.createDataFrame(
        [(f"h{i}", i + 1) for i in range(40)], ["host", "weight"]
    )
    rows = lane_load(assigned, weights).collect()
    assert sum(r["n_hosts"] for r in rows) == 40
    assert sum(r["total_weight"] for r in rows) == sum(range(1, 41))
    # unweighted: every host weighs 1
    rows1 = lane_load(assigned).collect()
    assert sum(r["total_weight"] for r in rows1) == 40
