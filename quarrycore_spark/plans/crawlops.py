"""Per-URL crawl-revision census (CDX-style), as a paired Spark/DuckDB
query.

Recurring crawls of the Common-Crawl shape store one record per
(url, warc_ts) fetch; the index-side dedup axis is *revisit analysis*:
for each URL, how many times was it crawled, how many DISTINCT content
versions did those crawls see, and which crawl is the latest? A stable
URL (same content hash every visit) needs only one stored copy plus
revisit records — the `response`-vs-`revisit` distinction in the CDX /
WARC ecosystem — while a churning URL invalidates cached copies.
Complements `incremental_dedup` (content-level dump-over-dump probe):
this is the URL-keyed longitudinal view the crawl scheduler consumes
(re-crawl priority ∝ observed change rate).

Synthesis device: the driver ships neither url nor warc_ts, so both are
deterministic closed forms of doc_id. j = doc_id div 3 keys the URL
(three crawls per URL: c = doc_id % 3), crawl_ts = 1,700,000,000 +
j·1000 + c·100 (unique per crawl, BIGINT epoch seconds — the
no-floats/no-timestamp-type rule), and the fetched content follows the
URL's churn class j % 3:
  class 0 — churning: every crawl sees a new version  (3 distinct)
  class 1 — stable:   every crawl sees version 0      (1 distinct)
  class 2 — changed once: versions 0, 1, 1            (2 distinct)
The REAL normalize→sha256 content-hash contract (functions/dialect.py)
runs over the synthesized content in BOTH dialects, so the driver
hashes actual revisit decisions, not the closed form.

100-TB shape: one projection (url/ts/content render + hash) fused into
the scan, then the standard two-phase distinct-agg: a partial
(url, chash) dedup runs map-side before the exchange, the merge rides
a (url, chash) exchange, and the url rollup (count, changed flag,
max_by latest pick, ts span) rides the final url exchange — two slim
exchanges, no join, scan pruned to doc_id alone. URL is a hash key
whose cardinality grows with the corpus; no skew beyond AQE's reach.
"""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK, content_hash, norm_text
from quarrycore_spark.plans.registry import Query, register

CRAWLS_PER_URL = 3
TS_BASE = 1_700_000_000


def _crawls_cte(dialect: str) -> str:
    """CTE `_crawls`: (doc_id, url, crawl_ts, chash) — the ONE synthesis
    of the crawl records that `url_revisions`, `cdx_index` and
    `crawl_schedule` all census. Shared so the operators can never drift
    apart on what a capture is (same URL template, churn classes,
    timestamps, and the real normalize→sha256 content hash)."""
    d = "div" if dialect == SPARK else "//"
    cast_str = "STRING" if dialect == SPARK else "VARCHAR"
    j = f"(doc_id {d} {CRAWLS_PER_URL})"
    c = f"(doc_id % {CRAWLS_PER_URL})"
    # Version seen by crawl c of url j, per churn class j % 3.
    version = (
        f"CASE WHEN {j} % 3 = 0 THEN {c} "
        f"WHEN {j} % 3 = 1 THEN 0 "
        f"ELSE (CASE WHEN {c} = 0 THEN 0 ELSE 1 END) END"
    )
    url = (
        f"concat('https://site', cast({j} % 7 AS {cast_str}), "
        f"'.example.com/post-', cast({j} AS {cast_str}))"
    )
    content = (
        f"concat('Crawled page body for post ', cast({j} AS {cast_str}), "
        f"' version ', cast({version} AS {cast_str}), '. End.')"
    )
    return f"""_crawls AS (
  SELECT doc_id,
         {url} AS url,
         cast({TS_BASE} + {j} * 1000 + {c} * 100 AS BIGINT) AS crawl_ts,
         {content_hash(norm_text(content, dialect), dialect)} AS chash
  FROM documents)"""


def _url_revisions_sql(dialect: str) -> str:
    maxby = "max_by" if dialect == SPARK else "arg_max"
    return f"""
WITH {_crawls_cte(dialect)}
SELECT url,
       cast(count(*) AS int) AS n_crawls,
       cast(count(DISTINCT chash) AS int) AS n_versions,
       cast(CASE WHEN count(DISTINCT chash) > 1 THEN 1 ELSE 0 END AS int)
           AS changed,
       {maxby}(doc_id, crawl_ts) AS latest_doc_id,
       max(crawl_ts) AS latest_ts,
       cast(max(crawl_ts) - min(crawl_ts) AS BIGINT) AS span_s
FROM _crawls
GROUP BY url
"""


register(Query(
    "url_revisions",
    "CDX-style per-URL crawl-revision census: crawls, distinct content "
    "versions, change flag, latest pick — one hash agg on the url key",
    _url_revisions_sql,
))


def _cdx_index_sql(dialect: str) -> str:
    """CDX(J) capture index: one line per (SURT key, timestamp) capture.

    Web archives locate captures through a CDX index keyed by the SURT
    form of the URL (Sort-friendly URI Reordering Transform: host
    components reversed and comma-joined, then the path — so one domain's
    captures sort contiguously) plus the 14-digit capture timestamp and a
    content digest. This emits that index for the same synthesized crawl
    records `url_revisions` censuses: the REAL host parse + SURT
    transform + digest run in BOTH dialects (the oracle does not use the
    closed form). Pure codegen projection — rendering an index for 10^12
    captures is one scan; the archive-side sort is the consumer's
    (writer's) concern, not the operator's.
    """
    host = r"regexp_extract(url, '^[a-z]+://([^/]+)', 1)"
    path = r"regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1)"
    if dialect == SPARK:
        surt_host = "array_join(reverse(split(host, '\\\\.')), ',')"
    else:
        surt_host = "array_to_string(list_reverse(string_split(host, '.')), ',')"
    # 14-digit CDX timestamp from the integer epoch. Spark renders under
    # the session timezone (pinned to UTC by session.py AND the driver
    # harness); DuckDB's to_timestamp() would render under the HOST
    # timezone, so the oracle uses make_timestamp(µs) instead — a naive
    # UTC timestamp whose strftime is timezone-independent (verified:
    # identical output under TimeZone='America/New_York').
    if dialect == SPARK:
        ts14 = "date_format(to_timestamp(crawl_ts), 'yyyyMMddHHmmss')"
    else:
        ts14 = "strftime(make_timestamp(crawl_ts * 1000000), '%Y%m%d%H%M%S')"
    return f"""
WITH {_crawls_cte(dialect)},
_h AS (SELECT doc_id, url, crawl_ts, chash, {host} AS host, {path} AS path
       FROM _crawls)
SELECT doc_id,
       concat({surt_host}, ')', path) AS surt_key,
       {ts14} AS ts14,
       substr(chash, 1, 16) AS digest16,
       url
FROM _h
"""


register(Query(
    "cdx_index",
    "CDX(J) capture index: SURT key (reversed host + path), 14-digit "
    "timestamp, content digest per capture — one codegen projection",
    _cdx_index_sql,
))


def _crawl_schedule_sql(dialect: str) -> str:
    """Per-domain recrawl scheduling from observed change rates.

    The consumer of `url_revisions`: a crawl scheduler allocates budget
    by how often a domain's pages actually change (stable domains decay
    to rare revisits, churning domains get priority — the classic
    freshness-driven policy). Per domain: URLs tracked, URLs that
    changed across snapshots, exact change rate in milli-units, and a
    deterministic priority rank (change rate DESC, domain ASC).

    Shape: the per-URL census is the same two-phase distinct agg as
    `url_revisions` (shared `_crawls_cte` — one synthesis, three
    consumers), the domain rollup is one more slim agg, and the rank is
    ONE window over the domain frame (tiny by construction). No joins.
    """
    d = "div" if dialect == SPARK else "//"
    host = r"regexp_extract(url, '^[a-z]+://([^/]+)', 1)"
    return f"""
WITH {_crawls_cte(dialect)},
_per_url AS (
  SELECT {host} AS domain, url,
         count(DISTINCT chash) AS n_versions
  FROM _crawls GROUP BY {host}, url),
_per_dom AS (
  SELECT domain,
         count(*) AS n_urls,
         sum(CASE WHEN n_versions > 1 THEN 1 ELSE 0 END) AS n_changed
  FROM _per_url GROUP BY domain)
SELECT domain,
       cast(n_urls AS int) AS n_urls,
       cast(n_changed AS int) AS n_changed,
       cast((n_changed * 1000) {d} n_urls AS int) AS change_milli,
       cast(row_number() OVER (
           ORDER BY (n_changed * 1000) {d} n_urls DESC, domain
       ) AS int) AS priority_rank
FROM _per_dom
"""


register(Query(
    "crawl_schedule",
    "Freshness-driven recrawl priorities: per-domain change rate from "
    "the crawl-revision census + one rank window on the domain frame",
    _crawl_schedule_sql,
))
