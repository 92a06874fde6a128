"""Pure-Python oracle implementations of the reference's scalar semantics.

These are *independent reimplementations* (written from the SURVEY.md spec
of hybrid_crawler.py / utils.py / webcrawleranalyzer.py), used only as test
oracles against the engine's Spark-native columns. Ground truth is the
reference CODE, not its README (whose slug examples contradict the code —
e.g. ``localhost:8001`` yields domain ``localhost8001``, and hyphens are in
the keep-set)."""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin, urlparse


def ref_page_slug(url: str) -> str:
    """Oracle for P3 (hybrid_crawler.py:147-182 semantics)."""
    p = urlparse(url)
    domain = p.netloc.replace("www.", "")
    domain = re.sub(r"[^a-zA-Z0-9.-]", "", domain).replace(".", "_")

    path = p.path.strip("/")
    if not path:
        page = "index"
    else:
        page = re.sub(r"\.[^.]*$", "", path.split("/")[-1])
        if not page:
            page = path.replace("/", "_").strip("_")
    page = re.sub(r"_+", "_", re.sub(r"[^a-zA-Z0-9\-_]", "_", page)).strip("_")
    if not page:
        page = "page"
    return f"{domain}_{page}"[:50].strip("_")


def ref_normalize_url(url: str, base_url: str | None = None) -> str:
    """Oracle for P2 (utils.py:32-43 semantics)."""
    if base_url:
        url = urljoin(base_url, url)
    p = urlparse(url)
    out = f"{p.scheme}://{p.netloc}{p.path}"
    if p.query:
        out += f"?{p.query}"
    return out


def ref_is_valid_url(url: str) -> bool:
    try:
        p = urlparse(url)
        return bool(p.scheme and p.netloc) and p.scheme in ("http", "https")
    except ValueError:
        return False


def ref_content_hash(content: str) -> str:
    return hashlib.sha256(content.encode("utf-8")).hexdigest()[:16]


def ref_unique_id(lat: str, long: str) -> str:
    return hashlib.sha1(f"{lat.strip()}{long.strip()}".encode()).hexdigest()[:12]


def ref_clean_markdown(markdown: str) -> str:
    """Oracle for P8 (utils.py:611-633 semantics)."""
    if not markdown:
        return ""
    cleaned: list[str] = []
    for line in markdown.split("\n"):
        if line.strip():
            cleaned.append(line.rstrip())
        elif cleaned and cleaned[-1].strip():
            cleaned.append("")
    while cleaned and not cleaned[-1].strip():
        cleaned.pop()
    return "\n".join(cleaned)


def ref_truncate(content: str, max_words: int = 4000) -> str:
    words = content.split()
    if len(words) <= max_words:
        return content
    return " ".join(words[:max_words]) + "\n\n[Content truncated...]"


def ref_title(content: str) -> str | None:
    for line in content.split("\n"):
        line = line.strip()
        if line.startswith("#"):
            return line.lstrip("#").strip()
    return None
