"""Persistent IVF+PQ vector index: round trip, exactness vs the
in-memory PQ path, incremental add, and the partitioned inverted-file
layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_crawl_spark.functions.similarity import pq_topk
from distributed_crawl_spark.functions.vecindex import (
    INDEX_FORMAT,
    add_to_vector_index,
    read_vector_index,
    vector_index_topk,
    vector_index_topk_rerank,
    write_vector_index,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_round_trip_and_manifest(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "idx")
    manifest = write_vector_index(emb, path, n_cells=8, m=8, n_codes=16)
    assert manifest["format"] == INDEX_FORMAT
    idx = read_vector_index(spark, path)
    assert idx.params == manifest
    n = emb.count()
    assert idx.centroids.count() == 8
    assert idx.codebooks.count() == 8 * 16
    assert idx.codes.count() == n * 8          # one row per (vec, sub)
    assert idx.codes.select("vec_id").distinct().count() == n
    # partitioned inverted-file layout on disk
    cells = [r.cell_id for r in idx.codes.select("cell_id").distinct().collect()]
    import os

    dirs = {d for d in os.listdir(f"{path}/codes") if d.startswith("cell_id=")}
    assert dirs == {f"cell_id={c}" for c in cells}


def test_full_probe_equals_in_memory_pq_topk(spark, tmp_path):
    """nprobe = n_cells probes every cell, so the persisted-index search
    must equal the in-memory all-cells ADC ranking row for row."""
    emb = _emb(spark)
    path = str(tmp_path / "idx")
    write_vector_index(emb, path, n_cells=8, m=8, n_codes=16)
    idx = read_vector_index(spark, path)
    queries = emb.filter(F.col("vec_id") < 5)
    got = vector_index_topk(idx, queries, k=5, nprobe=8)
    want = pq_topk(emb, queries, k=5, m=8, n_codes=16)
    assert _rows(got) == _rows(want)


def test_partial_probe_is_subset_of_cells(spark, tmp_path):
    """nprobe=1: every returned candidate lives in its query's top cell."""
    emb = _emb(spark)
    path = str(tmp_path / "idx")
    write_vector_index(emb, path, n_cells=8)
    idx = read_vector_index(spark, path)
    queries = emb.filter(F.col("vec_id") < 5)
    got = vector_index_topk(idx, queries, k=5, nprobe=1)
    cell_of = {
        r.vec_id: r.cell_id
        for r in idx.codes.select("vec_id", "cell_id").distinct().collect()
    }
    from distributed_crawl_spark.functions.similarity import ivf_assign

    qcell = {
        r.query_id: r.cell_id
        for r in ivf_assign(
            queries, idx.centroids, nprobe=1, out_id="query_id"
        ).collect()
    }
    rows = got.collect()
    assert rows
    for r in rows:
        assert cell_of[r.vec_id] == qcell[r.query_id]


def test_incremental_add_equals_bulk_build(spark, tmp_path):
    """write(80%) + add(20%) == write(100%) when both use the SAME
    frozen quantizers (the 80%-corpus seeds): identical codes table,
    identical search results."""
    emb = _emb(spark)
    base = emb.filter(F.col("vec_id") % 5 != 0)
    inc = emb.filter(F.col("vec_id") % 5 == 0)

    p_inc = str(tmp_path / "incr")
    write_vector_index(base, p_inc, n_cells=8)
    add_to_vector_index(spark, p_inc, inc)

    idx_base = read_vector_index(spark, p_inc)
    p_bulk = str(tmp_path / "bulk")
    write_vector_index(
        emb, p_bulk, n_cells=8,
        centroids=idx_base.centroids, codebooks=idx_base.codebooks,
    )
    idx_bulk = read_vector_index(spark, p_bulk)

    a = _rows(read_vector_index(spark, p_inc).codes)
    b = _rows(idx_bulk.codes)
    assert a == b
    queries = emb.filter(F.col("vec_id") < 5)
    assert _rows(vector_index_topk(idx_base, queries, k=5, nprobe=4)) == \
        _rows(vector_index_topk(idx_bulk, queries, k=5, nprobe=4))


def test_rerank_recovers_exact_order_on_shortlist(spark, tmp_path):
    """Index shortlist + exact cosine re-rank: the top-k is exactly the
    cosine ranking of the shortlisted candidates (spot-checked against a
    brute-force cosine over the same candidate set)."""
    emb = _emb(spark)
    path = str(tmp_path / "idx")
    write_vector_index(emb, path, n_cells=8)
    idx = read_vector_index(spark, path)
    queries = emb.filter(F.col("vec_id") < 3)
    got = vector_index_topk_rerank(
        idx, queries, emb, k=3, shortlist=20, nprobe=8
    ).collect()
    short = vector_index_topk(idx, queries, k=20, nprobe=8)
    import math

    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a))
                      * math.sqrt(sum(x * x for x in b)))

    by_q: dict[int, list[int]] = {}
    for r in short.collect():
        by_q.setdefault(r.query_id, []).append(r.vec_id)
    for qid, cands in by_q.items():
        want = sorted(
            cands,
            key=lambda v: (-cos(vecs[qid], vecs[v]), v),
        )[:3]
        mine = [r.vec_id for r in sorted(
            (x for x in got if x.query_id == qid), key=lambda x: x.rank
        )]
        assert mine == want


def test_bad_format_rejected(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "idx")
    write_vector_index(emb, path, n_cells=8)
    spark.createDataFrame([('{"format": "other/v9"}',)], "manifest STRING") \
        .coalesce(1).write.mode("overwrite").json(f"{path}/manifest")
    import pytest

    with pytest.raises(ValueError, match="unsupported vector index"):
        read_vector_index(spark, path)


def test_index_neardup_flags_planted_dup(spark, tmp_path):
    """A near-copy of an indexed vector is flagged with the right dup_of
    at full probe; an orthogonal-ish increment row is kept; every
    increment row gets a verdict."""
    from distributed_crawl_spark.functions.vecindex import index_neardup

    emb = _emb(spark)
    path = str(tmp_path / "idx_nd")
    write_vector_index(emb, path, n_cells=8, m=8, n_codes=16)
    idx = read_vector_index(spark, path)

    base = emb.filter(F.col("vec_id") == 3).first().embedding
    near = [float(x) + 0.001 for x in base]
    far = [0.0] * 63 + [1.0]
    inc = spark.createDataFrame(
        [(1001, near), (1002, far)],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r for r in index_neardup(
        idx, inc, emb, threshold_m=900, nprobe=8, shortlist=50
    ).collect()}
    assert set(got) == {1001, 1002}
    assert got[1001].is_dup and got[1001].dup_of == 3
    assert got[1001].cos_m >= 990
    assert not got[1002].is_dup


def test_index_neardup_add_continual(spark, tmp_path):
    """index_neardup_add keeps only survivors and appends them: the same
    batch re-screened (fresh ids) is then fully duplicate — the keep-one
    contract continued across batches."""
    from distributed_crawl_spark.functions.vecindex import index_neardup_add

    emb = _emb(spark)
    path = str(tmp_path / "idx_nda")
    write_vector_index(emb, path, n_cells=8, m=8, n_codes=16)

    far1 = [0.0] * 62 + [1.0, 0.0]
    far2 = [0.0] * 62 + [0.0, 1.0]
    batch1 = spark.createDataFrame(
        [(2001, far1), (2002, far2)],
        "vec_id long, embedding array<float>",
    )
    flags1 = index_neardup_add(
        spark, path, batch1, emb, threshold_m=900, nprobe=8, shortlist=50
    )
    assert {r.vec_id for r in flags1.filter("is_dup").collect()} == set()
    n_after = read_vector_index(spark, path).codes.select(
        "vec_id").distinct().count()
    assert n_after == emb.count() + 2

    # same vectors, new ids: screened against batch1's keepers.
    # Rerank needs the full-precision table of whatever is indexed.
    batch2 = spark.createDataFrame(
        [(3001, far1), (3002, far2)],
        "vec_id long, embedding array<float>",
    )
    full = emb.select("vec_id", "embedding").unionByName(batch1)
    flags2 = index_neardup_add(
        spark, path, batch2, full, threshold_m=900, nprobe=8, shortlist=50
    )
    got = {r.vec_id: r for r in flags2.collect()}
    assert got[3001].is_dup and got[3001].dup_of == 2001
    assert got[3002].is_dup and got[3002].dup_of == 2002
    # dups were NOT added
    assert read_vector_index(spark, path).codes.select(
        "vec_id").distinct().count() == n_after
