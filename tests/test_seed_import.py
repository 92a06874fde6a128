"""S2 CSV seed import vs an in-process oracle of the reference logic
(hybrid_crawler.py:204-293) and S1 URL-list scan (hybrid_crawler.py:839-841)."""

from __future__ import annotations

import csv
import hashlib

from distributed_crawl_spark.sources.seeds import load_seed_csv, load_url_list


def ref_load_csv(path: str) -> list[tuple[str, str]]:
    """Pure-Python re-implementation of the reference's load_csv_data:
    returns [(url, unique_id)] in file order."""
    out = []
    with open(path, encoding="utf-8") as f:
        sample = f.read(1024)
        f.seek(0)
        delimiter = csv.Sniffer().sniff(sample).delimiter
        reader = csv.DictReader(f, delimiter=delimiter)
        fieldnames = [x.strip() for x in reader.fieldnames]
        site = lat_c = long_c = id_c = None
        for field in fieldnames:
            fl = field.lower()
            if fl in ("site", "url", "website"):
                site = field
            elif fl in ("lat", "latitude"):
                lat_c = field
            elif fl in ("long", "lng", "longitude"):
                long_c = field
            elif fl in ("uniqueid", "unique_id", "id"):
                id_c = field
        for row in reader:
            clean = {k.strip(): (v.strip() if v else "") for k, v in row.items()}
            url = clean.get(site, "").strip()
            if not url:
                continue
            if not url.startswith(("http://", "https://")):
                url = "https://" + url
            uid = clean.get(id_c, "").strip() if id_c else ""
            if not uid and lat_c and long_c:
                lat, long = clean.get(lat_c, ""), clean.get(long_c, "")
                if lat and long:
                    uid = hashlib.sha1(f"{lat}{long}".encode()).hexdigest()[:12]
                else:
                    uid = hashlib.sha1(url.encode()).hexdigest()[:12]
            elif not uid:
                uid = hashlib.sha1(url.encode()).hexdigest()[:12]
            out.append((url, uid))
    return out


CSV_BODY = """\
 Site , LATITUDE ,Lng, UniqueID ,notes
example.com/a,33.45, -112.07 ,,first
https://b.test/x,,,given-id-7,second
c.test/deep/page.html,40.7,,,no longitude
,1.0,2.0,,empty url skipped
http://d.test,,,,plain
"""


def _write(tmp_path, body, name="seeds.csv"):
    p = tmp_path / name
    p.write_text(body, encoding="utf-8")
    return str(p)


def test_csv_import_matches_reference(spark, tmp_path):
    path = _write(tmp_path, CSV_BODY)
    expect = ref_load_csv(path)
    got = [
        (r.url, r.unique_id)
        for r in load_seed_csv(spark, path).orderBy("seq").collect()
    ]
    assert got == expect
    # spot invariants: scheme default, given-id precedence, latlong hash
    urls = dict(got)
    assert "https://example.com/a" in urls
    assert urls["https://b.test/x"] == "given-id-7"
    assert (
        urls["https://example.com/a"]
        == hashlib.sha1(b"33.45-112.07").hexdigest()[:12]
    )
    # missing longitude → url-hash fallback
    assert (
        urls["https://c.test/deep/page.html"]
        == hashlib.sha1(b"https://c.test/deep/page.html").hexdigest()[:12]
    )


def test_csv_import_semicolon_dialect(spark, tmp_path):
    body = "website;id\nx.test/p;abc\ny.test;\n"
    path = _write(tmp_path, body)
    got = {
        r.url: r.unique_id for r in load_seed_csv(spark, path).collect()
    }
    assert got["https://x.test/p"] == "abc"
    assert got["https://y.test"] == hashlib.sha1(b"https://y.test").hexdigest()[:12]


def test_csv_import_requires_url_column(spark, tmp_path):
    path = _write(tmp_path, "a,b\n1,2\n")
    try:
        load_seed_csv(spark, path)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "site" in str(e)


def test_url_list_scan(spark, tmp_path):
    p = tmp_path / "urls.txt"
    p.write_text("https://a.test/1\n\n  https://b.test/2  \n\n", encoding="utf-8")
    rows = load_url_list(spark, str(p)).orderBy("seq").collect()
    assert [(r.url, r.seq) for r in rows] == [
        ("https://a.test/1", 0),
        ("https://b.test/2", 1),
    ]


def test_url_list_multi_chunk_order_and_plan(spark, tmp_path):
    """seq must equal file order even when the scan splits the file into
    many input chunks, and the seed rows must never pass through a
    single-task exchange (the only global ordering allowed is over the
    chunk-count aggregate — one row per input split)."""
    path = tmp_path / "seeds.txt"
    urls = [f"http://h{i % 97}.test/p{i}" for i in range(60_000)]
    path.write_text("\n".join(urls) + "\n")

    before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024))
    try:
        df = load_url_list(spark, str(path))
        got = [r.url for r in df.orderBy("seq").collect()]
        assert got == urls
        n_parts = spark.read.text(str(path)).rdd.getNumPartitions()
        assert n_parts >= 4  # the scan really was split
        plan = df._jdf.queryExecution().executedPlan().toString()
        # exactly one SinglePartition exchange: the per-chunk count
        # aggregate (metadata-sized), never the row stream
        assert plan.count("SinglePartition") <= 1
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", before)


def test_csv_multi_chunk_seq(spark, tmp_path):
    path = tmp_path / "seeds.csv"
    lines = ["site,uniqueid"] + [f"h{i}.test/p,{i:06d}" for i in range(20_000)]
    path.write_text("\n".join(lines) + "\n")
    before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    try:
        df = load_seed_csv(spark, str(path))
        rows = df.orderBy("seq").collect()
        assert [r.unique_id for r in rows] == [f"{i:06d}" for i in range(20_000)]
        assert [r.seq for r in rows] == list(range(20_000))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", before)
