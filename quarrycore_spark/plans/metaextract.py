"""P14 oracle surface: a CORRECTNESS-checked query over the real
page-metadata extraction path (extraction/metadata.py).

Same synthesis device as structops.doc_link_stats: the driver ships no
HTML table, so each `documents.doc_id` deterministically renders a page
whose OpenGraph / Twitter-card / JSON-LD / meta-date / canonical / author
populations follow closed-form integer formulas of doc_id, wrapped in
noise the extractor must ignore (fake og/meta markup inside a <script>
string and an HTML comment). The SPARK side renders the page and runs the
REAL P14 operator (with_page_metadata); the DUCKDB oracle computes every
field arithmetically. Any parser regression — wrong merge priority,
date-cascade order, missed urljoin, comment leakage — breaks the hash.

Formulas (i = doc_id, site = i % 7, all blocks independent):
  base URL    https://site{site}.example.com/2021/{1+i%12}/{1+i%28}/post-{i}
  OG block    iff i%3 != 0: title 'OG Title {i}', type article(odd)/
              website(even), site_name 'Site {site}', image /img/{i}.png
              (resolved against the base URL)
  Twitter     iff i%4 != 0: card summary(even)/summary_large_image(odd),
              creator @user{i%9}
  JSON-LD     iff i%5 != 0: @type [Article,NewsArticle,BlogPosting][i%3],
              headline 'Schema Headline {i}', author Person 'Alex
              Name{i%11}', datePublished {2000+i%15}-{1+i%12}-{1+i%28},
              dateModified 2022-01-{1+i%9} (an 85-confidence decoy the
              95-confidence datePublished must outrank)
  meta date   iff i%6 < 2: article:published_time 2019-05-{20+i%4}T08:30:00Z
  time elem   iff i%7 == 0: <time datetime="2018-02-03T01:02:03">
  canonical   iff i%3 != 1: /canon/{i} (resolved)
  meta author iff i%2 == 0: 'Meta Person {i%13}'
  css author  iff i%8 == 0: <div class="author-name">Casey Css{i%5}</div>

Expected cascade results (the part that actually tests P14's ladder):
  published_date: JSON-LD (structured_data, 95) → meta (meta_tags, 90) →
  time (time_element, 85) → URL path (url_pattern, 75 — always present,
  so the column is never null).
  author: JSON-LD (90) → meta (70); the css author (60, only on i%8==0 ⊂
  even ids) can never be top but does raise n_authors.

All checked columns are strings / ints, nulls coalesced to ''/-1 on both
sides (the near_dup_recall_synth device) so no None-vs-NaN ambiguity
crosses the comparison.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quarrycore_spark.functions.dialect import DUCKDB
from quarrycore_spark.plans.registry import Query, register

_NOISE = (
    "<script>var fake='<meta property=\"og:title\" content=\"FAKE OG\">"
    "<meta name=\"author\" content=\"Fake Scripter\">';</script>"
    "<!-- <meta property=\"article:published_time\" content=\"1999-01-01T00:00:00Z\">"
    " <meta name=\"author\" content=\"Commented Author\"> -->"
)

_SCHEMA_TYPES = ("Article", "NewsArticle", "BlogPosting")


def page_url(i: int) -> str:
    return f"https://site{i % 7}.example.com/2021/{1 + i % 12}/{1 + i % 28}/post-{i}"


def render_page_html(i: int) -> bytes:
    parts = [f"<html><head><title>Doc {i}</title>", _NOISE]
    if i % 3 != 0:
        og_type = "article" if i % 2 == 1 else "website"
        parts.append(f'<meta property="og:title" content="OG Title {i}">')
        parts.append(f'<meta property="og:type" content="{og_type}">')
        parts.append(f'<meta property="og:site_name" content="Site {i % 7}">')
        parts.append(f'<meta content="/img/{i}.png" property="og:image">')
    if i % 4 != 0:
        card = "summary" if i % 2 == 0 else "summary_large_image"
        parts.append(f'<meta name="twitter:card" content="{card}">')
        parts.append(f'<meta name="twitter:creator" content="@user{i % 9}">')
    if i % 5 != 0:
        parts.append(
            '<script type="application/ld+json">'
            f'{{"@type":"{_SCHEMA_TYPES[i % 3]}",'
            f'"headline":"Schema Headline {i}",'
            f'"author":{{"@type":"Person","name":"Alex Name{i % 11}"}},'
            f'"datePublished":"{2000 + i % 15:04d}-{1 + i % 12:02d}-{1 + i % 28:02d}",'
            f'"dateModified":"2022-01-{1 + i % 9:02d}"}}'
            "</script>"
        )
    if i % 6 < 2:
        parts.append(
            f'<meta property="article:published_time" '
            f'content="2019-05-{20 + i % 4}T08:30:00Z">'
        )
    if i % 3 != 1:
        parts.append(f'<link rel="canonical" href="/canon/{i}">')
    if i % 2 == 0:
        parts.append(f'<meta name="author" content="Meta Person {i % 13}">')
    parts.append("</head><body>")
    if i % 7 == 0:
        parts.append('<time datetime="2018-02-03T01:02:03">Feb 3</time>')
    if i % 8 == 0:
        parts.append(f'<div class="author-name">Casey Css{i % 5}</div>')
    parts.append(f"<p>Body text for document {i}.</p></body></html>")
    return "".join(parts).encode("utf-8")


def _spark_page_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quarrycore_spark.extraction.metadata import with_page_metadata
    from quarrycore_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")["documents"].select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "url": [page_url(int(i)) for i in ids],
                    "html": [render_page_html(int(i)) for i in ids],
                }
            )

    from quarrycore_spark.operators._partitioning import spread

    pages = spread(docs).mapInPandas(gen, schema="url string, html binary")
    meta = with_page_metadata(pages)
    s = lambda c: F.coalesce(F.col(c), F.lit("")).alias(c)  # noqa: E731
    return meta.select(
        F.regexp_extract("url", r"post-(\d+)$", 1).cast("bigint").alias("doc_id"),
        s("title"),
        s("og_type"),
        s("og_image"),
        s("og_site_name"),
        s("twitter_card"),
        s("twitter_creator"),
        s("schema_type"),
        s("schema_author"),
        s("schema_date_published"),
        s("canonical_url"),
        s("meta_author"),
        s("published_date"),
        s("date_method"),
        F.coalesce(F.col("date_confidence_pct"), F.lit(-1))
        .cast("int").alias("date_confidence_pct"),
        s("author"),
        F.coalesce(F.col("author_confidence_pct"), F.lit(-1))
        .cast("int").alias("author_confidence_pct"),
        F.col("n_authors").cast("int").alias("n_authors"),
    )


def _page_metadata(dialect: str) -> str:
    fmt = "printf" if dialect == DUCKDB else "format_string"
    site = "CAST(doc_id % 7 AS VARCHAR)"
    i = "CAST(doc_id AS VARCHAR)"
    sched = (
        f"{fmt}('%04d-%02d-%02d', 2000 + doc_id % 15,"
        " 1 + doc_id % 12, 1 + doc_id % 28)"
    )
    urldate = f"{fmt}('2021-%02d-%02d', 1 + doc_id % 12, 1 + doc_id % 28)"
    metadate = f"'2019-05-' || CAST(20 + doc_id % 4 AS VARCHAR)"
    return f"""
SELECT doc_id,
       CASE WHEN doc_id % 3 != 0 THEN 'OG Title ' || {i}
            WHEN doc_id % 5 != 0 THEN 'Schema Headline ' || {i}
            ELSE '' END AS title,
       CASE WHEN doc_id % 3 = 0 THEN ''
            WHEN doc_id % 2 = 1 THEN 'article' ELSE 'website' END AS og_type,
       CASE WHEN doc_id % 3 = 0 THEN ''
            ELSE 'https://site' || {site} || '.example.com/img/' || {i} || '.png'
            END AS og_image,
       CASE WHEN doc_id % 3 = 0 THEN ''
            ELSE 'Site ' || {site} END AS og_site_name,
       CASE WHEN doc_id % 4 = 0 THEN ''
            WHEN doc_id % 2 = 0 THEN 'summary'
            ELSE 'summary_large_image' END AS twitter_card,
       CASE WHEN doc_id % 4 = 0 THEN ''
            ELSE '@user' || CAST(doc_id % 9 AS VARCHAR) END AS twitter_creator,
       CASE WHEN doc_id % 5 = 0 THEN ''
            WHEN doc_id % 3 = 0 THEN 'Article'
            WHEN doc_id % 3 = 1 THEN 'NewsArticle'
            ELSE 'BlogPosting' END AS schema_type,
       CASE WHEN doc_id % 5 = 0 THEN ''
            ELSE 'Alex Name' || CAST(doc_id % 11 AS VARCHAR) END AS schema_author,
       CASE WHEN doc_id % 5 = 0 THEN '' ELSE {sched} END AS schema_date_published,
       CASE WHEN doc_id % 3 = 1 THEN ''
            ELSE 'https://site' || {site} || '.example.com/canon/' || {i}
            END AS canonical_url,
       CASE WHEN doc_id % 2 = 1 THEN ''
            ELSE 'Meta Person ' || CAST(doc_id % 13 AS VARCHAR) END AS meta_author,
       CASE WHEN doc_id % 5 != 0 THEN {sched}
            WHEN doc_id % 6 < 2 THEN {metadate}
            WHEN doc_id % 7 = 0 THEN '2018-02-03'
            ELSE {urldate} END AS published_date,
       CASE WHEN doc_id % 5 != 0 THEN 'structured_data'
            WHEN doc_id % 6 < 2 THEN 'meta_tags'
            WHEN doc_id % 7 = 0 THEN 'time_element'
            ELSE 'url_pattern' END AS date_method,
       CAST(CASE WHEN doc_id % 5 != 0 THEN 95
                 WHEN doc_id % 6 < 2 THEN 90
                 WHEN doc_id % 7 = 0 THEN 85
                 ELSE 75 END AS INT) AS date_confidence_pct,
       CASE WHEN doc_id % 5 != 0 THEN 'Alex Name' || CAST(doc_id % 11 AS VARCHAR)
            WHEN doc_id % 2 = 0 THEN 'Meta Person ' || CAST(doc_id % 13 AS VARCHAR)
            ELSE '' END AS author,
       CAST(CASE WHEN doc_id % 5 != 0 THEN 90
                 WHEN doc_id % 2 = 0 THEN 70
                 ELSE -1 END AS INT) AS author_confidence_pct,
       CAST((CASE WHEN doc_id % 5 != 0 THEN 1 ELSE 0 END)
            + (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
            + (CASE WHEN doc_id % 8 = 0 THEN 1 ELSE 0 END) AS INT) AS n_authors
FROM documents
"""


register(
    Query(
        "page_metadata",
        "P14: OpenGraph/Twitter/JSON-LD/canonical/date/author extraction "
        "from the real metadata operator over deterministic synthetic HTML "
        "(arithmetic oracle; reference metadata_extractor.py + "
        "structured_data_parser.py + date_extractor.py + author_extractor.py)",
        _page_metadata,
        spark_fn=_spark_page_metadata,
        tables=("documents",),
    )
)
