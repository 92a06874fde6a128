"""distributed_crawl_spark — a brand-new PySpark-native URL-frontier and
fetch scheduler with the semantics of the reference crawler
``thebenjy/distributed_crawl`` (see SURVEY.md), re-expressed as DataFrame
dataflow over Common-Crawl-style page tables.

Layout
------
- ``schema``     : StructTypes for every table (pages, frontier, url_seen, ...)
- ``session``    : tuned SparkSession builders (local test / bench)
- ``corpus``     : deterministic synthetic page-corpus generator
- ``functions/`` : scalar kernels (URL canonicalization, slugs, hashes,
                   HTML→text extraction, text quality, dedup signatures)
- ``operators/`` : frontier operators (url-seen filter, politeness window,
                   robots gate, fetch join, link extraction)
- ``sources/``   : seed list / CSV import / pages readers
- ``plans/``     : one-crawl-round logical plan builder
- ``streaming/`` : micro-batch round driver + atomic checkpoint store
"""

__version__ = "0.1.0"
