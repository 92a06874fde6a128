

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


def test_robots_audit_flags_gate_bypasses(spark):
    """A fetch log audited against per-host robots: disallowed prefixes
    count as violations with the min URL as the example; hosts absent
    from robots or with empty robots_txt are clean; clean hosts report
    NULL example."""
    from distributed_crawl_spark.operators.robots import robots_audit

    fetched = spark.createDataFrame(
        [("a", "https://a/private/1"), ("a", "https://a/private/2"),
         ("a", "https://a/pub/1"), ("a", "https://a/pub/2"),
         ("b", "https://b/private/1"),     # b: no robots -> allowed
         ("c", "https://c/anything")],     # c: empty robots -> allowed
        "host STRING, url STRING",
    )
    robots = spark.createDataFrame(
        [("a", "User-agent: *\nDisallow: /private/"),
         ("c", "   ")],
        "host STRING, robots_txt STRING",
    )
    out = {r.host: (r.n_fetched, r.n_denied, r.denied_bp, r.example_denied)
           for r in robots_audit(fetched, robots).collect()}
    assert out == {
        "a": (4, 2, 5000, "https://a/private/1"),
        "b": (1, 0, 0, None),
        "c": (1, 0, 0, None),
    }
