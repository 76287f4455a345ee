"""URL blocklist filtering (crawl stage-1), as a paired Spark/DuckDB
query.

The cheapest filter every web pipeline runs FIRST — before fetch, before
extraction — is URL-level: drop documents whose host is on a curated
blocklist or whose path carries a blocked keyword (RefinedWeb §3.1 runs
exactly this pair: a UT1-style domain blocklist plus a weighted
URL-keyword score; C4 likewise applies a "bad words" URL screen).
Reference parity: the reference gates crawling per-domain
(`crawler/robots.py`, per-domain allow/deny) — this is that decision as
a corpus-scale column operator.

Synthesis device (urlops pattern): the driver ships no URL column, so
each doc renders a deterministic URL whose host is site{j%7}.example.com
and whose first path segment cycles through 8 section words by j%8 —
two of which ('casino', 'pills') are on the keyword blocklist, while
host site5.example.com is on the domain blocklist. Both dialects run
the REAL matching logic (host equality against the domain list,
substring scan against the keyword list) over the rendered string, with
precedence domain > keyword; the driver therefore hashes genuine
blocklist decisions, not the closed form.

100-TB shape: pure codegen projection — render, match, flag; zero
shuffle, zero Generate, scan pruned to doc_id. A real deployment swaps
the inline lists for a broadcast lookup of the curated blocklist; the
decision column and precedence logic are unchanged.
"""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.plans.registry import Query, register

BLOCKED_DOMAINS = ("site5.example.com",)
BLOCKED_KEYWORDS = ("casino", "pills")
PATH_SECTIONS = (
    "news", "blog", "casino", "shop", "pills", "docs", "forum", "wiki",
)


def _url_blocklist_filter(dialect: str) -> str:
    d = "div" if dialect == SPARK else "//"
    cast_str = "STRING" if dialect == SPARK else "VARCHAR"
    j = f"(doc_id {d} 2)"
    section_arms = " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(PATH_SECTIONS)
    )
    url = (
        f"concat('https://site', cast({j} % 7 AS {cast_str}), "
        f"'.example.com/', (CASE {j} % {len(PATH_SECTIONS)} {section_arms} END), "
        f"'/post-', cast({j} AS {cast_str}))"
    )
    # Host between '://' and the first '/' after it — the real parse,
    # not the closed form (same regexp syntax in both engines).
    host = r"regexp_extract(url, '^[a-z]+://([^/]+)', 1)"
    domain_hit = " OR ".join(f"host = '{b}'" for b in BLOCKED_DOMAINS)
    keyword_hit = " OR ".join(
        f"url LIKE '%/{k}/%'" for k in BLOCKED_KEYWORDS
    )
    return f"""
WITH _u AS (SELECT doc_id, {url} AS url FROM documents),
_h AS (SELECT doc_id, url, {host} AS host FROM _u)
SELECT doc_id, url, host,
       cast(CASE WHEN {domain_hit} THEN 1 ELSE 0 END AS int)
           AS domain_blocked,
       cast(CASE WHEN {keyword_hit} THEN 1 ELSE 0 END AS int)
           AS keyword_blocked,
       CASE WHEN {domain_hit} THEN 'domain'
            WHEN {keyword_hit} THEN 'keyword'
            ELSE 'none' END AS block_reason,
       cast(CASE WHEN ({domain_hit}) OR ({keyword_hit}) THEN 0 ELSE 1 END
            AS int) AS allowed
FROM _h
"""


register(Query(
    "url_blocklist_filter",
    "Stage-1 URL filtering: domain blocklist + path-keyword screen with "
    "domain>keyword precedence — one codegen projection, zero shuffle",
    _url_blocklist_filter,
))
