"""Build the spark-submit --py-files artifact (engine.zip).

The north-rule deployment path is ``spark-submit --py-files engine.zip
crawl.py|curate.py`` on a multi-executor cluster: the driver and every
executor import ``distributed_crawl_spark`` from the zip, so the repo
never needs to exist on cluster nodes. This builder is deterministic —
sorted entries, fixed timestamps — so the artifact's digest only changes
when the code does (reproducible deploys, cacheable by content hash).

Usage: python tools/make_pyfiles.py [out.zip]   (default: engine.zip)
"""

from __future__ import annotations

import hashlib
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "distributed_crawl_spark"
# fixed timestamp => byte-identical zip for identical sources
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build(out: Path) -> tuple[int, str]:
    """Write the package zip to ``out``; return (n_files, sha256)."""
    files = sorted(
        p for p in (REPO / PKG).rglob("*.py") if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(REPO)), date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, p.read_bytes())
    digest = hashlib.sha256(out.read_bytes()).hexdigest()
    return len(files), digest


def main(argv: list[str]) -> int:
    out = Path(argv[1]) if len(argv) > 1 else REPO / "engine.zip"
    n, digest = build(out)
    print(f"{out}: {n} files, sha256 {digest[:16]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
