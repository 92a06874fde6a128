"""Pure-Python oracle of the reference crawl loop.

Reimplements the semantics of ``run_crawl_local.py:254-329`` (FIFO
scheduler + ``add_urls`` dedup + retry-with-cap) under the deterministic
reproduction configuration of SURVEY.md §2.10: workers=1 and pinned link
order (the engine's first-occurrence dedup replaces the reference's
``list(set(...))``). The "network" is the pages dict, exactly like the
engine's fetch-join. Extraction and link resolution call the same pure
functions the engine's pandas UDF wraps, so text parity is byte-level by
construction and ordering/seen-set parity is the real assertion.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from urllib.parse import urlparse

from distributed_crawl_spark.functions.text import (
    extract_text_and_hrefs,
    resolve_links,
)

BLOCKED_EXTS = (".pdf", ".doc", ".docx", ".xls", ".xlsx",
                ".zip", ".rar", ".exe", ".dmg", ".pkg")


@dataclass
class OracleStatus:
    status: str = "pending"
    level: int = 0
    attempt_count: int = 0
    parent_url: str | None = None
    md_hash: str | None = None
    text: str | None = None


@dataclass
class OracleResult:
    order: list[tuple[str, int, int]] = field(default_factory=list)  # (url, level, attempt)
    status: dict[str, OracleStatus] = field(default_factory=dict)

    @property
    def seen(self) -> set[str]:
        return set(self.status)


def _is_valid(url: str) -> bool:
    p = urlparse(url)
    return bool(p.scheme and p.netloc) and p.scheme in ("http", "https")


def reference_crawl(
    pages: dict[str, bytes],
    seeds: list[str],
    max_levels: int = 2,
    retry_attempts: int = 3,
    max_links: int = 10,
    block_extensions: bool = True,
    allowed_domains: tuple[str, ...] = (),
) -> OracleResult:
    res = OracleResult()
    pending: list[str] = []

    def add_urls(urls: list[str], level: int, parent: str | None) -> None:
        # run_crawl_local.py:162-171 — membership in crawl_status IS dedup
        for u in urls:
            if u not in res.status:
                pending.append(u)
                res.status[u] = OracleStatus(level=level, parent_url=parent)

    add_urls([u for u in seeds if _is_valid(u)], 0, None)

    while pending:
        url = pending.pop(0)  # run_crawl_local.py:273 FIFO
        st = res.status[url]
        if st.status == "completed":
            continue  # :276-277 in-loop recheck
        st.attempt_count += 1  # :208 incremented at processing start
        res.order.append((url, st.level, st.attempt_count))

        html = pages.get(url)
        if html is not None:
            st.status = "completed"
            text, hrefs = extract_text_and_hrefs(html)
            st.text = text
            st.md_hash = hashlib.sha256(text.encode()).hexdigest()[:16]
            if st.level < max_levels - 1:  # :178,228-232
                links = resolve_links(url, hrefs, max_links)
                links = [l for l in links if _is_valid(l)]
                if block_extensions:
                    links = [
                        l for l in links
                        if not l.lower().endswith(BLOCKED_EXTS)
                    ]
                if allowed_domains:
                    links = [
                        l for l in links
                        if urlparse(l).netloc in allowed_domains
                    ]
                add_urls(links, st.level + 1, url)
        else:
            if st.attempt_count < retry_attempts:  # :240-250
                st.status = "pending"
                pending.append(url)
            else:
                st.status = "failed"
    return res
