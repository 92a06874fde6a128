

def test_sitemap_coverage_census(spark):
    """Coverage and unlisted counts vs hand-set URL layouts: full
    coverage, partial, zero (host never fetched), fetch-only host
    (full-join side), and dup listings/fetches collapsing via
    distinct."""
    from distributed_crawl_spark.operators.robots import sitemap_coverage

    listed = spark.createDataFrame(
        [("a", "u1"), ("a", "u2"), ("a", "u2"),      # dup listing
         ("b", "u3"), ("b", "u4"),
         ("c", "u5")],
        "host STRING, url STRING",
    )
    fetched = spark.createDataFrame(
        [("a", "u1"), ("a", "u2"), ("a", "u9"), ("a", "u9"),  # dup fetch
         ("b", "u3"),
         ("d", "u7")],                                # never listed
        "host STRING, url STRING",
    )
    out = {r.host: (r.n_listed, r.n_fetched_listed, r.coverage_bp,
                    r.n_unlisted_fetched)
           for r in sitemap_coverage(listed, fetched).collect()}
    assert out == {
        "a": (2, 2, 10000, 1),
        "b": (2, 1, 5000, 0),
        "c": (1, 0, 0, 0),
        "d": (0, 0, 0, 1),
    }
