"""O(increment) evidence for the persisted BM25 text index (mirror of
tools/vecindex_scaling.py): add a FIXED 1k-doc increment to an index of
5k vs 50k documents — the add wall must be ~flat in index size (the
increment's postings append their own bucket partitions; the corpus
postings are never read; only the vocabulary-sized idf table and the
1-row stats are rewritten, and the vocabulary is shared between the two
corpora by construction). Also times a 3-term search at both index
sizes: the bucket pruning bounds the scan to <= |terms| of 64 postings
directories, so search grows with per-bucket posting volume (~linear in
corpus/64), not with file count — reported for honesty; the FLAT claim
is the add path. Interleaved medians of 3. One JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from distributed_crawl_spark.functions import search as SE
from distributed_crawl_spark.session import build_session
from dedup_scaling import build_corpus  # noqa: E402  (same twin corpus)


def main() -> None:
    spark = build_session(app_name="textindex-scaling")
    small_dir = build_corpus(spark, 5_000, "/tmp/tix_scale1x")
    big_dir = build_corpus(spark, 50_000, "/tmp/tix_scale10x")
    inc_dir = build_corpus(spark, 1_000, "/tmp/tix_scale_inc",
                           id_offset=1_000_000)
    docs = {
        "small": spark.read.parquet(f"{small_dir}/documents.parquet"),
        "big": spark.read.parquet(f"{big_dir}/documents.parquet"),
    }
    inc = spark.read.parquet(f"{inc_dir}/documents.parquet")
    terms = ["join", "vector", "stream"]

    paths = {"small": "/tmp/tix_scale_small", "big": "/tmp/tix_scale_big"}

    def rebuild() -> None:
        for name, src in docs.items():
            shutil.rmtree(paths[name], ignore_errors=True)
            SE.write_text_index(src, paths[name])

    build_s = {}
    for name, src in docs.items():
        shutil.rmtree(paths[name], ignore_errors=True)
        t0 = time.monotonic()
        SE.write_text_index(src, paths[name])
        build_s[name] = round(time.monotonic() - t0, 2)

    add_s: dict[str, list[float]] = {"small": [], "big": []}
    search_s: dict[str, list[float]] = {"small": [], "big": []}
    for _ in range(3):
        for name in ("small", "big"):
            t0 = time.monotonic()
            SE.add_to_text_index(spark, paths[name], inc)
            add_s[name].append(time.monotonic() - t0)
            idx = SE.read_text_index(spark, paths[name])
            t0 = time.monotonic()
            SE.text_index_topk(idx, terms, k=20).write.format("noop").mode(
                "overwrite"
            ).save()
            search_s[name].append(time.monotonic() - t0)
        # drop the appended increment so every round adds to the same base
        rebuild()

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    out = {
        "metric": "textindex_scaling_10x",
        "build_s": build_s,
        "add_1k_s": {n: round(med(v), 2) for n, v in add_s.items()},
        "add_ratio": round(med(add_s["big"]) / med(add_s["small"]), 2),
        "search_s": {n: round(med(v), 2) for n, v in search_s.items()},
        "search_ratio": round(
            med(search_s["big"]) / med(search_s["small"]), 2
        ),
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
