"""Content-analysis stage (SURVEY.md §2.12) — the reference's per-page LLM
call (hybrid_crawler.py:490-534, webcrawleranalyzer.py:493-618), re-expressed
as a batch `mapInPandas` stage.

The reference POSTs each page's first 4000 chars to DeepSeek R1 and expects
a JSON object ``{main_topic, content_type, summary, key_points,
relevance_score, location_relevance}`` (prompt schema
webcrawleranalyzer.py:507-526), with a fallback object on parse failure
(:565-596). A remote LLM is out of the determinism contract, so the engine
ships the **plumbing** (schema, batching, truncation, fallback) with a
deterministic heuristic analyzer in place of the model call; a real
endpoint drops into ``analyze_fn`` without touching the plan.

The heuristic is simple enough to be re-expressed in ANSI SQL, so the
DuckDB oracle verifies the whole stage value-for-value:

- main_topic     = first markdown heading, else first word, else 'unknown'
- content_type   = 'article' if >300 words; 'page' if >50; else 'snippet'
- summary        = first 30 words of the (4000-char-truncated) content
- relevance_score= (word_count mod 11) / 10.0 — a stand-in score that is
                   deterministic and exercises the numeric column path
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

PROMPT_TRUNCATE_CHARS = 4000  # hybrid_crawler.py:504
SUMMARY_WORDS = 30

ANALYSIS_SCHEMA = StructType(
    [
        StructField("main_topic", StringType()),
        StructField("content_type", StringType()),
        StructField("summary", StringType()),
        StructField("relevance_score", DoubleType()),
    ]
)


def heuristic_analyze(content: str) -> dict:
    """Deterministic stand-in for the LLM call. Mirrors the reference's
    fallback-analysis shape (webcrawleranalyzer.py:565-596)."""
    text = (content or "")[:PROMPT_TRUNCATE_CHARS]
    words = text.split()
    title = ""
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("#"):
            title = s.lstrip("#").strip()
            break
    main_topic = title or (words[0] if words else "unknown")
    n = len(words)
    content_type = "article" if n > 300 else ("page" if n > 50 else "snippet")
    return {
        "main_topic": main_topic,
        "content_type": content_type,
        "summary": " ".join(words[:SUMMARY_WORDS]),
        "relevance_score": (n % 11) / 10.0,
    }


def analyze_documents(
    docs: DataFrame,
    text_col: str = "text",
    analyze_fn: Callable[[str], dict] = heuristic_analyze,
) -> DataFrame:
    """Append analysis columns via mapInPandas — one Arrow batch per model
    call window, the shape a real batched-inference endpoint needs. All
    input columns pass through."""
    out_schema = StructType(docs.schema.fields + ANALYSIS_SCHEMA.fields)
    names = [f.name for f in ANALYSIS_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results = [analyze_fn(t) for t in pdf[text_col]]
            for name in names:
                pdf[name] = [r[name] for r in results]
            yield pdf

    return docs.mapInPandas(run, schema=out_schema)
