"""Crawl configuration — mirrors the reference's ``CrawlConfig``
(run_crawl_local.py:42-55) and config file (all.configfiles.json:2-31),
plus the engine's scale knobs (politeness budget, salting, bloom)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class CrawlConfig:
    # reference-parity knobs
    max_levels: int = 2          # run_crawl_local.py:46
    retry_attempts: int = 3      # run_crawl_local.py:47
    max_links: int = 10          # per-page link cap (hybrid_crawler.py:344)
    extract_links: bool = True
    allowed_domains: tuple[str, ...] = ()  # empty = no whitelist (utils.py:61-63)
    block_extensions: bool = True          # utils.py:50-52 filter
    # F5: restrict children to the parent's host (present-but-commented in
    # the reference, webcrawleranalyzer.py:181-183)
    same_domain_only: bool = False
    # F8/R2/R3 geo-block routing (hybrid_crawler.py:588-643): 'keep' = keep
    # the local content tagged method='local_geo_blocked' (the reference's
    # lambda-failed fallback); 'skip' = don't follow links, log to errors
    # with a 200-char preview, status geo_blocked_skipped (disable_lambda
    # path)
    geo_block_policy: str = "keep"
    # D3 storage parity (hybrid_crawler.py:539-544): the reference names
    # stored files by content hash, so its store keeps ONE copy per
    # distinct content. True = dedup the crawl_results append on md_hash
    # (within-round min-url pick + cross-round anti-join) and report the
    # withheld count as RoundStats.content_deduped. Crawl flow (children,
    # retries, counters) is unaffected. Default False = log-every-fetch,
    # with exact_duplicates available as a downstream query.
    content_dedup: bool = False
    # Frontier canonicalization hygiene (engine extension, default off —
    # reference parity keeps raw link strings, §2.10): strip advertising
    # params (utm_*/fbclid/gclid/msclkid) from extracted child links
    # BEFORE batch-dedup and the seen filter, so one page reached via N
    # campaign variants costs one fetch, not N.
    strip_tracking: bool = False
    # Frontier trap hygiene (engine extension, default off = parity):
    # drop trap-shaped child links (repeated path segments >= 3, depth
    # > 12, > 8 query params, path > 200 chars — functions/url.is_trap)
    # before dedup and the seen filter, so calendar traps and session-id
    # explosions can't monopolize a host's politeness budget.
    drop_traps: bool = False
    # Frontier domain blocklist (engine extension, default empty =
    # parity): child links whose host IS a listed registrable domain or
    # any subdomain of one are dropped with the same timing as
    # drop_traps (before dedup/seen/politeness). Closed-form predicate
    # — right-sized for config-scale lists; a UT1-scale list (millions
    # of domains) should instead join functions/url.blocklist_filter
    # against a blocklist table.
    block_domains: tuple[str, ...] = ()
    # Link-hygiene directives (engine extension, default off = parity):
    # drop rel="nofollow" links, and ALL links of pages declaring
    # <meta name="robots" content="...nofollow...">, from the crawl
    # graph. Captured in the same tokenizer pass as extraction.
    honor_nofollow: bool = False
    # Storage-policy twin of honor_nofollow (engine extension, default
    # off): pages declaring <meta name="robots" content="...noindex...">
    # are crawled (status completed, links followed per nofollow rules)
    # but their content is NEVER written to crawl_results — the
    # noindex contract. Withheld count = RoundStats.noindex_skipped.
    honor_noindex: bool = False
    # Text emitted by the extraction stage: 'basic' = the reference's
    # byte-identical whitespace-pipeline text (THE P7 invariant, default);
    # 'markdown' = structure-preserving markdown (the Crawl4AI-path output
    # shape reference users consumed: '#' headings, [text](url) links,
    # lists). Link semantics are mode-independent, so the crawl graph —
    # children, seen set, ordering — is identical either way; only the
    # stored text (and therefore md_hash) changes.
    extract_mode: str = "basic"
    # Web-graph extension (no reference analog — webcrawleranalyzer.py:139-140
    # discards anchor text): capture each fetched page's (target_url, anchor)
    # pairs as an extra crawl_results column, harvested in the SAME Arrow
    # pass as text/links (html never crosses into Python twice). Feeds the
    # inbound anchor census at export time (functions/graph.py) without
    # re-scanning stored html. Default off: parity-mode schema unchanged.
    capture_anchors: bool = False
    # Focused crawling (engine extension, shark-search shape; default
    # off = reference ordering parity): when set, each parent's capped
    # link list is REORDERED by inbound-anchor topic relevance
    # (rel = Σ |distinct topic terms in the link's anchor text|, integer)
    # before link_pos is assigned, so the seq formula — and therefore
    # determinism, collision-freedom, and first-enqueuer-wins — is
    # untouched while per-parent budgets and the max_links cap spend
    # themselves on the most topic-endorsed children first. Requires
    # capture_anchors (the anchor text is the evidence).
    focused_topic: tuple = ()

    # engine scale knobs (SURVEY.md §2.9/§4)
    host_budget: int | None = None  # None = unlimited (parity mode)
    salt_threshold: int = 100_000
    max_salts: int = 32
    use_bloom: bool = True
    # 'bloom' (default, cheapest) | 'cuckoo' (deletable — recrawl TTLs)
    seen_filter: str = "bloom"
    bloom_buckets: int = 64
    bloom_bits: int = 1 << 20
    cuckoo_buckets: int = 1 << 16
    # 'broadcast': stream the pages table against a broadcast round slice —
    # html never shuffles; right whenever the politeness budget bounds the
    # slice below executor memory. 'shuffle': plain partitioned join — for
    # clusters where pages+frontier are co-bucketed by url in Iceberg, or
    # slices too large to broadcast. 'auto' (default): per round, broadcast
    # iff the observed selected-slice row count is <= broadcast_row_limit
    # (and a politeness budget exists to bound it at all) — an unbounded
    # broadcast is an executor/driver OOM, not a perf tradeoff.
    fetch_join_strategy: str = "auto"
    broadcast_row_limit: int = 2_000_000  # ~urls only, hundreds of MB tops

    # Fold url_seen/crawl_results/... append deltas into one delta (and gc
    # dead version dirs) every K completed rounds, so a read stops paying
    # O(rounds) parquet-dir unions. None disables (read amplification grows
    # linearly with rounds — only for short crawls / debugging).
    compact_every: int | None = 16

    # Honor robots Crawl-delay: hosts declaring a delay of D seconds get
    # max(1, floor(crawl_delay_round_seconds / D)) slots per round (capped
    # at host_budget) — the batch analog of inter-request spacing, with
    # rounds modeling a wall-clock window of crawl_delay_round_seconds.
    # Requires a robots table and a host_budget (the politeness window).
    honor_crawl_delay: bool = False
    crawl_delay_round_seconds: float = 60.0

    # Per-host budget table (parquet path, columns host/budget) produced
    # OFFLINE by a rank job — rank_budgets(host_rank(...)) or the
    # trust-weighted rank_budgets(trust_rank(...), rank_col='trust_x1e6')
    # that starves link farms — the 100-TB pattern: graph jobs run out of
    # band, the crawler consumes their verdict as a broadcast table.
    # Merged with Crawl-delay budgets by LEAST (both constraints honored);
    # hosts in neither table fall back to the scalar host_budget.
    # Requires host_budget (the politeness window must exist).
    host_budgets_path: str | None = None

    # Learned DUST rewrite (engine extension, default off = raw-string
    # parity): parquet of pagehealth.strippable_params verdicts (host,
    # param, strippable). Loaded once, folded to per-host drop sets, and
    # broadcast into every round's child-link stage: each host's
    # content-proven strippable params are removed (survivors sorted)
    # BEFORE batch-dedup and the seen filter, so session-id/utm variants
    # cost one frontier entry. Hosts absent from the table pass through
    # untouched. Same out-of-band pattern as host_budgets_path: the
    # learning job runs offline, the crawler consumes its verdict.
    strip_params_path: str | None = None

    # Submit independent per-round staged writes concurrently — what a real
    # cluster driver does for independent stages: {miss_log ∥ children
    # seen-probe} both depend only on the results append, and {url_seen ∥
    # errors ∥ bloom_state ∥ partition_metrics} only on the frontier
    # replace, so each group's jobs overlap their fixed driver/commit costs
    # instead of queueing. Table contents are identical either way (the
    # writes touch disjoint tables over already-materialized inputs);
    # False serializes them for debugging / sequential job-log readability.
    concurrent_commits: bool = True

    # Round-local scratch tables (_round_ranked/_round_hits/...) land under
    # <checkpoint>/_scratch by default; point this at a tmpfs mount (e.g.
    # "/dev/shm") to take the per-round staged-write hot path off disk.
    # Scratch is never part of a commit and is cleared at every begin().
    scratch_dir: str | None = None

    # loop bounds
    max_rounds: int = 100

    def validate(self) -> None:
        if self.max_levels < 1:
            raise ValueError("max_levels >= 1")
        if self.retry_attempts < 1:
            raise ValueError("retry_attempts >= 1")
        if self.host_budget is not None and self.host_budget < 1:
            raise ValueError("host_budget >= 1 or None")
        if self.fetch_join_strategy not in ("auto", "broadcast", "shuffle"):
            raise ValueError("fetch_join_strategy: auto|broadcast|shuffle")
        if self.extract_mode not in ("basic", "markdown"):
            raise ValueError("extract_mode: basic|markdown")
        if self.fetch_join_strategy == "broadcast" and self.host_budget is None:
            # nothing bounds the round slice in parity mode — broadcasting
            # the whole pending frontier is an OOM hazard; use auto/shuffle
            raise ValueError(
                "fetch_join_strategy='broadcast' requires a host_budget "
                "(unbounded slice); use 'auto' or 'shuffle'"
            )
        if self.broadcast_row_limit < 1:
            raise ValueError("broadcast_row_limit >= 1")
        if self.geo_block_policy not in ("keep", "skip"):
            raise ValueError("geo_block_policy: keep|skip")
        if self.seen_filter not in ("bloom", "cuckoo"):
            raise ValueError("seen_filter: bloom|cuckoo")
        if self.compact_every is not None and self.compact_every < 1:
            raise ValueError("compact_every >= 1 or None")
        if self.focused_topic and not self.capture_anchors:
            raise ValueError(
                "focused_topic requires capture_anchors=True (anchor "
                "text is the relevance evidence)"
            )
        if self.honor_crawl_delay and self.host_budget is None:
            raise ValueError(
                "honor_crawl_delay requires a host_budget (the politeness "
                "window is what enforces per-host slots)"
            )
        if self.crawl_delay_round_seconds <= 0:
            raise ValueError("crawl_delay_round_seconds > 0")
        if self.host_budgets_path is not None and self.host_budget is None:
            raise ValueError(
                "host_budgets_path requires a host_budget (the politeness "
                "window is what applies per-host budgets)"
            )
