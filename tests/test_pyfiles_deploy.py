"""The north-rule deployment path: spark-submit --py-files engine.zip
from a cwd where the repo package is NOT importable — drivers and
executors must resolve distributed_crawl_spark from the zip alone."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_make_pyfiles_deterministic(tmp_path):
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import make_pyfiles
    finally:
        sys.path.pop(0)
    n1, d1 = make_pyfiles.build(tmp_path / "a.zip")
    n2, d2 = make_pyfiles.build(tmp_path / "b.zip")
    assert n1 == n2 > 20
    assert d1 == d2          # byte-identical artifact for identical sources


def test_spark_submit_pyfiles_curate(tmp_path):
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import make_pyfiles
    finally:
        sys.path.pop(0)
    zp = tmp_path / "engine.zip"
    make_pyfiles.build(zp)
    # neutral cwd: only curate.py + the zip are visible; the repo root is
    # deliberately NOT on any path
    (tmp_path / "curate.py").write_bytes((REPO / "curate.py").read_bytes())
    out = tmp_path / "out"
    r = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", str(zp), "curate.py",
            "--docs", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out),
            "--gopher", "--gopher-stopwords", "a,the,and,is,of,to,in,that,it",
            "--pack-tokens", "500",
        ],
        capture_output=True, text=True, cwd=tmp_path, timeout=400,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads((out / "report.json").read_text())
    assert report["n_input"] == 500 and report["n_output"] > 0
    assert list(out.glob("*.parquet"))
