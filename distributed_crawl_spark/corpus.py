"""Deterministic synthetic page corpus — the "network", reified as a table.

Emits the driver-contract ``pages`` shape (url, warc_ts, html, text, lang)
at two tiers:

- **tiny**  — the 7-page two-host mock-site graph mirroring the reference's
  hermetic E2E fixture (testsetup/test_setup.py:40-260, test_urls.txt:1-7):
  a "normal" site with a 4-page cross-linked graph plus one cross-host
  link, and a geo-blocked site whose every page contains the trigger phrase
  "Your location not permitted". Plus edge-case pages for the slug /
  normalize / filter golden tests (FIXTURES.md §1).
- **scaled** — N pages with Zipf-distributed hosts (one heavy host for the
  skew/salting tests), deterministic filler text, and a link mix including
  same-host, cross-host, dead, blocked-extension, mailto and fragment
  links. Generated distributively (spark.range → mapInPandas) so the sf0.1
  bench corpus builds in parallel; every byte derives from the page id via
  md5, so the output is independent of partitioning.

The ``text`` column is precomputed with the SAME extraction invariant the
engine must reproduce (functions/text.py) — it plays the role of the
reference-produced text in the byte-identity check.

No wall clock, no RNG state: warc_ts is a fixed epoch + id seconds.
"""

from __future__ import annotations

import datetime as dt
import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .functions.text import extract_text_and_hrefs
from .schema import PAGES_SCHEMA, ROBOTS_SCHEMA, SEEDS_SCHEMA

SITE_A = "http://sitea.test"
SITE_B = "http://siteb.test"  # geo-blocked
GEO_PHRASE = "Your location not permitted"
WARC_EPOCH = dt.datetime(2025, 6, 8, 12, 0, 0)

# Mock-site link graph — mirrors testsetup/test_setup.py:55-58,94-96,
# 125-127,157-159 (site A) and :223-224,256-257 (site B; "/" has no links).
MOCK_GRAPH: dict[str, list[str]] = {
    f"{SITE_A}/": ["/about", "/services", "/contact", f"{SITE_B}/"],
    f"{SITE_A}/about": ["/", "/services", "/contact"],
    f"{SITE_A}/services": ["/", "/about", "/contact"],
    f"{SITE_A}/contact": ["/", "/about", "/services"],
    f"{SITE_B}/": [],
    f"{SITE_B}/about": ["/", "/premium"],
    f"{SITE_B}/premium": ["/", "/about"],
}

MOCK_SEEDS = [
    f"{SITE_A}/",
    f"{SITE_A}/about",
    f"{SITE_A}/services",
    f"{SITE_A}/contact",
    f"{SITE_B}/",
    f"{SITE_B}/about",
    f"{SITE_B}/premium",
]

_WORDS = (
    "data page crawl spark frontier fetch queue host link text table row "
    "column batch round filter window hash shard merge scan index graph "
    "node edge depth level seed robots budget token stream block store"
).split()


def _mock_html(url: str, hrefs: list[str], geo: bool) -> str:
    items = "\n".join(f'<li><a href="{h}">{h}</a></li>' for h in hrefs)
    banner = f"<p>{GEO_PHRASE}</p>" if geo else "<p>Plain fixture page content.</p>"
    name = url.rsplit("/", 1)[-1] or "home"
    return (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        f"<title>Fixture {name}</title>\n<meta charset=\"utf-8\">\n"
        "<style>body { color: black; }</style>\n"
        "<script>var skipped = 'this text must not appear';</script>\n"
        "</head>\n<body>\n"
        f"<h1>Fixture page {name}</h1>\n{banner}\n"
        "<p>Two  spaces split   here.</p>\n"
        f"<ul>\n{items}\n</ul>\n"
        "</body>\n</html>\n"
    )


def mock_site_rows() -> list[dict]:
    """The 7-page fixture graph as pages rows."""
    rows = []
    for i, (url, hrefs) in enumerate(MOCK_GRAPH.items()):
        geo = url.startswith(SITE_B)
        html = _mock_html(url, hrefs, geo)
        text, _ = extract_text_and_hrefs(html)
        rows.append(
            {
                "url": url,
                "warc_ts": WARC_EPOCH + dt.timedelta(seconds=i),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": "en",
            }
        )
    return rows


def edge_case_rows() -> list[dict]:
    """Pages whose URLs exercise slug/normalize edge cases and whose bodies
    carry hrefs that must be filtered (blocked extensions, mailto,
    fragments, javascript:) — FIXTURES.md §1."""
    urls = [
        "https://www.example.com/",
        "https://sub.multi.dot.example.co.uk/path/page.html",
        "https://example.com/products/item.php",
        "http://example.com:8080/with/port/",
        "https://example.com/a/b/c/deeply/nested/very-long-page-name-beyond-fifty-chars.html",
        "https://example.com/search?q=spark&utm_source=gmb",
        "https://example.com/p",
        "https://example.com/p#section",  # fragment-only difference
        "https://example.com/trailing/",
        "https://example.com/.hidden",
    ]
    tricky_hrefs = [
        "/docs/manual.pdf",  # blocked ext
        "/files/archive.zip",  # blocked ext
        "mailto:someone@example.com",  # non-http scheme
        "#top",  # fragment-only
        "javascript:void(0)",  # non-http scheme
        "",  # empty
        "/kept/relative",
        "https://elsewhere.test/kept/absolute",
    ]
    rows = []
    for i, url in enumerate(urls):
        html = _mock_html(url, tricky_hrefs, geo=False)
        text, _ = extract_text_and_hrefs(html)
        rows.append(
            {
                "url": url,
                "warc_ts": WARC_EPOCH + dt.timedelta(seconds=100 + i),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": "en" if i % 3 else "de",
            }
        )
    return rows


def tiny_pages(spark: SparkSession) -> DataFrame:
    rows = mock_site_rows() + edge_case_rows()
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)


def tiny_seeds(spark: SparkSession) -> DataFrame:
    rows = [
        {"url": u, "seq": int(i), "unique_id": None}
        for i, u in enumerate(MOCK_SEEDS)
    ]
    return spark.createDataFrame(rows, schema=SEEDS_SCHEMA)


def tiny_robots(spark: SparkSession) -> DataFrame:
    """Fixture robots: site B disallows /premium; a crawl-delay host; an
    empty-robots host (allow-all default) — FIXTURES.md §3."""
    rows = [
        {
            "host": "siteb.test",
            "robots_txt": "User-agent: *\nDisallow: /premium\n",
            "crawl_delay": None,
        },
        {
            "host": "slow.test",
            "robots_txt": "User-agent: *\nCrawl-delay: 5\n",
            "crawl_delay": "5",
        },
        {"host": "sitea.test", "robots_txt": "", "crawl_delay": None},
    ]
    return spark.createDataFrame(rows, schema=ROBOTS_SCHEMA)


# --- scaled corpus ----------------------------------------------------------


def _zipf_cdf(n_hosts: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n_hosts + 1, dtype=np.float64), s)
    return np.cumsum(w) / w.sum()


def _u64(page_id: int, salt: str) -> int:
    return int.from_bytes(
        hashlib.md5(f"{salt}:{page_id}".encode()).digest()[:8], "big"
    )


def _page_record(page_id: int, n_pages: int, zipf_cdf: np.ndarray) -> dict:
    """Everything about page ``page_id`` derives from md5(page_id) — stable
    under any partitioning."""
    n_hosts = len(zipf_cdf)
    u = _u64(page_id, "host") / 2**64
    host_id = int(np.searchsorted(zipf_cdf, u))
    host = f"host{host_id:05d}.test"
    path_id = _u64(page_id, "path") % 10_000_000
    url = f"https://{host}/p/{path_id}"

    # links: 8 candidates, ~87.5% alive (point at real page ids)
    hrefs = []
    for j in range(8):
        r = _u64(page_id, f"link{j}")
        target = r % n_pages
        kind = r % 8
        if kind == 7:
            hrefs.append(f"https://dead{r % 1000:03d}.test/gone/{target}")
        else:
            t_u = _u64(target, "host") / 2**64
            t_host = f"host{int(np.searchsorted(zipf_cdf, t_u)):05d}.test"
            t_path = _u64(target, "path") % 10_000_000
            hrefs.append(f"https://{t_host}/p/{t_path}")
    if page_id % 13 == 0:
        hrefs.append("/files/report.pdf")  # must be dropped by F4... (kept
        # by link filter — extension filtering happens frontier-side)
    if page_id % 17 == 0:
        hrefs.append("mailto:x@y.test")

    # realistic page weight: 200-800 words (~2-6 KB html, Common-Crawl-ish
    # order of magnitude) — extraction cost per page must dominate row
    # bookkeeping, as it does on real pages. One seeded RNG per page keeps
    # generation deterministic under any partitioning.
    rng = np.random.RandomState(_u64(page_id, "words") % (2**32))
    n_words = 200 + int(_u64(page_id, "nwords") % 600)
    words = np.asarray(_WORDS, dtype=object)[
        rng.randint(0, len(_WORDS), size=n_words)
    ]
    geo = host_id == 3  # one whole host is geo-blocked
    body = " ".join(words.tolist())
    banner = f"<p>{GEO_PHRASE}</p>" if geo else ""
    items = "\n".join(f'<li><a href="{h}">link</a></li>' for h in hrefs)
    html = (
        f"<html><head><title>Page {page_id}</title>"
        "<script>var x = 1;</script></head>"
        f"<body><h1>Page {page_id}</h1>{banner}<p>{body}</p>"
        f"<ul>{items}</ul></body></html>"
    )
    text, _ = extract_text_and_hrefs(html)
    return {
        "url": url,
        "warc_ts": WARC_EPOCH + dt.timedelta(seconds=page_id % 86400),
        "html": html.encode("utf-8"),
        "text": text,
        "lang": "en" if page_id % 7 else "de",
    }


def scaled_pages(
    spark: SparkSession, n_pages: int, n_hosts: int | None = None
) -> DataFrame:
    """Distributed generation: spark.range → mapInPandas."""
    if n_hosts is None:
        n_hosts = max(16, n_pages // 200)
    cdf = _zipf_cdf(n_hosts)

    def gen(batches):
        for pdf in batches:
            rows = [
                _page_record(int(i), n_pages, cdf) for i in pdf["id"]
            ]
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            yield out

    n_parts = min(64, max(1, n_pages // 2000))
    return (
        spark.range(0, n_pages, numPartitions=n_parts)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def scaled_seeds(spark: SparkSession, n_pages: int, n_seeds: int,
                 n_hosts: int | None = None) -> DataFrame:
    """First n_seeds page urls (by id) as seeds — generated distributively
    (a driver-side row list stops scaling long before 10^7 seeds)."""
    if n_hosts is None:
        n_hosts = max(16, n_pages // 200)
    cdf = _zipf_cdf(n_hosts)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                u = _u64(int(i), "host") / 2**64
                host = f"host{int(np.searchsorted(cdf, u)):05d}.test"
                path_id = _u64(int(i), "path") % 10_000_000
                rows.append(f"https://{host}/p/{path_id}")
            yield pd.DataFrame(
                {"url": rows, "seq": ids, "unique_id": None}
            )

    n_parts = min(32, max(1, n_seeds // 5000))
    return spark.range(0, n_seeds, numPartitions=n_parts).mapInPandas(
        gen, schema=SEEDS_SCHEMA
    )


def clustered_embeddings(
    spark: SparkSession,
    n_vectors: int = 500,
    n_clusters: int = 20,
    dim: int = 64,
    noise: float = 0.55,
    seed: int = 42,
) -> DataFrame:
    """Planted-cluster embeddings in the testdata ``embeddings`` shape
    (vec_id, embedding float[], label): unit-norm cluster centers +
    per-vector gaussian noise, renormalized. With noise=0.55 intra-cluster
    cosine concentrates around 1/(1+noise²) ≈ 0.77 — the "neighbors at
    cos ≥ 0.7" regime real document embeddings live in, unlike the
    i.i.d.-gaussian worst case (pairwise cos ≈ 0) the driver testdata
    exercises. Deterministic via a hashed-per-row generation distributed
    through mapInPandas — same vector for a given (seed, vec_id)
    regardless of partitioning.
    """
    from pyspark.sql.types import (
        ArrayType, FloatType, IntegerType, LongType, StructField, StructType,
    )

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ])
    # centers derive from the seed only — identical on every executor
    centers = np.random.default_rng(seed).normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs, labels = [], []
            for i in ids:
                rng = np.random.default_rng((seed << 20) ^ int(i))
                c = int(_u64(int(i), f"cluster{seed}") % n_clusters)
                # per-coordinate sigma scaled so the TOTAL noise norm is
                # ~`noise` (a dim-dim gaussian has norm sigma*sqrt(dim)),
                # giving member-member cosine ~ 1/(1+noise^2)
                v = centers[c] + (noise / np.sqrt(dim)) * rng.normal(size=dim)
                v /= np.linalg.norm(v)
                vecs.append(v.astype(np.float32))
                labels.append(c)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": vecs, "label": labels}
            )

    n_parts = min(32, max(1, n_vectors // 2000))
    return spark.range(0, n_vectors, numPartitions=n_parts).mapInPandas(
        gen, schema=schema
    )
