"""Domain-level link graph from extracted anchors — the web-graph
operator a crawler-fed pipeline runs before prioritizing fetches.

The reference extracts per-page links (protocols.py:212-220, populated by
the extractor cascade) and keeps domain metadata; a 100 TB corpus wants
those anchors aggregated into the domain→domain edge list (crawl-frontier
scoring, spam-cluster detection, in/out-degree features for quality
models — the OPIC/PageRank substrate). Two queries:

* `link_graph` — (src_domain, dst_domain, n_links, n_src_docs) edges.
* `domain_degrees` — per domain: out_degree / in_degree (distinct
  neighbor domains), n_outlinks, n_inlinks.

Like `doc_link_stats`/`media_phash_pairs`, the driver ships no HTML
table, so pages are rendered deterministically from `documents.doc_id`
and the SPARK side runs the REAL extraction path (mapInPandas render →
extraction/structured.py anchor parse → JVM-side href classification +
aggregation); the DUCKDB oracle computes the same edges arithmetically.

Page URL of doc i:   https://site{i % 20}.example.com/d{i}
Per page i:
  - i % 4 absolute outlinks  https://site{(i + 3j + 1) % 20}.example.com/p{j}
    for j in 0..(i%4)-1 (3j+1 is never 0 mod 20 for j<=2, so an absolute
    link never self-loops — self edges come ONLY from relative hrefs);
  - 1 + i % 3 copies of a RELATIVE link /self?k={k} → resolves against
    the page host: a self-edge with multiplicity (so n_links >
    n_src_docs on self edges — the hash catches a dedup bug);
  - noise the classifier must drop: a mailto:, a javascript:, a
    fragment-only #frag anchor, an anchor with no href, plus the
    commented-out <a> the extractor itself must ignore.

Scale shape: render+extract is one Arrow map pass (no shuffle); the
edge list is ONE two-stage hash aggregate over slim (src, dst, doc_id)
rows — map-side combine absorbs hot domain pairs; degrees are two more
small aggs over the edge list joined domain-to-domain (broadcast at sf,
sort-merge at scale). Anchor text and HTML never cross an exchange.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quarrycore_spark.plans.registry import Query, register

N_SITES = 20

_NOISE = (
    "<script>var a=\"<a href='https://fake.example.com/x'>fake</a>\";</script>"
    "<!-- <a href=\"https://commented.example.com/c\">commented</a> -->"
)


def page_url(doc_id: int) -> str:
    return f"https://site{doc_id % N_SITES}.example.com/d{doc_id}"


def render_link_html(doc_id: int) -> bytes:
    parts = [f"<html><head><title>d{doc_id}</title>{_NOISE}</head><body>"]
    for j in range(doc_id % 4):
        dst = (doc_id + 3 * j + 1) % N_SITES
        parts.append(f'<a href="https://site{dst}.example.com/p{j}">t{j}</a>')
    for k in range(1 + doc_id % 3):
        parts.append(f'<a href="/self?k={k}">self {k}</a>')
    parts.append('<a href="mailto:x@example.com">mail</a>')
    parts.append('<a href="javascript:void(0)">js</a>')
    parts.append('<a href="#frag">frag</a>')
    parts.append("<a>no href</a>")
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_domain, dst_domain, doc_id) — one row per kept anchor."""
    from quarrycore_spark.extraction.structured import with_structured_content
    from quarrycore_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")["documents"].select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "url": [page_url(int(i)) for i in ids],
                    "html": [render_link_html(int(i)) for i in ids],
                }
            )

    from quarrycore_spark.operators._partitioning import spread

    pages = spread(docs).mapInPandas(gen, schema="url string, html binary")
    links = (
        with_structured_content(pages)
        .select(
            F.regexp_extract("url", r"/d(\d+)$", 1).cast("bigint").alias("doc_id"),
            F.parse_url("url", F.lit("HOST")).alias("src_domain"),
            F.explode("links").alias("l"),
        )
        .select(
            "doc_id", "src_domain",
            F.col("l.href").alias("href"),
            F.col("l.text").alias("anchor_text"),
        )
    )
    # Classify hrefs: absolute http(s) -> target host; site-relative path
    # -> the page's own host; everything else (mailto/javascript/#frag)
    # is not a graph edge.
    dst = (
        F.when(
            F.col("href").startswith("http"),
            F.parse_url("href", F.lit("HOST")),
        )
        .when(F.col("href").startswith("/"), F.col("src_domain"))
        .otherwise(F.lit(None))
    )
    return (
        links.withColumn("dst_domain", dst)
        .filter(F.col("dst_domain").isNotNull())
        .select("src_domain", "dst_domain", "doc_id", "anchor_text")
    )


def _spark_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _edges(spark, sf_dir)
        .groupBy("src_domain", "dst_domain")
        .agg(
            F.count("*").cast("int").alias("n_links"),
            F.countDistinct("doc_id").cast("int").alias("n_src_docs"),
        )
    )


def _oracle_edge_cte(dialect: str, with_text: bool = False) -> str:
    """CTE `_edges`(src_domain, dst_domain, doc_id[, anchor_text]): the
    closed-form per-anchor rows (DuckDB dialect; the Spark side is the
    real extraction). ONE synthesis with four consumers — link_graph,
    domain_degrees/two_hop, anchor_text_stats, domain_pagerank — so a
    change to render_link_html's link counts cannot silently diverge a
    single oracle."""
    site = "'site' || cast({n} as varchar) || '.example.com'"
    src = site.format(n=f"doc_id % {N_SITES}")
    dst = site.format(n=f"(doc_id + 3 * j + 1) % {N_SITES}")
    t_abs = ", 't' || cast(j as varchar) AS anchor_text" if with_text else ""
    t_self = (
        ", 'self ' || cast(k as varchar) AS anchor_text" if with_text else ""
    )
    return f"""
_abs AS (SELECT doc_id, unnest(range(0, cast(doc_id % 4 as int))) AS j
         FROM documents),
_self AS (SELECT doc_id,
                 unnest(range(0, cast(1 + doc_id % 3 as int))) AS k
          FROM documents),
_edges AS (
  SELECT {src} AS src_domain, {dst} AS dst_domain, doc_id{t_abs} FROM _abs
  UNION ALL
  SELECT {src} AS src_domain, {src} AS dst_domain, doc_id{t_self} FROM _self
)"""


def _link_graph(dialect: str) -> str:
    return f"""
WITH {_oracle_edge_cte(dialect)}
SELECT src_domain, dst_domain,
       cast(count(*) as int) AS n_links,
       cast(count(DISTINCT doc_id) as int) AS n_src_docs
FROM _edges
GROUP BY src_domain, dst_domain
"""


register(
    Query(
        "link_graph",
        "Domain->domain link-graph edges from REAL anchor extraction over "
        "deterministic synthetic pages (relative-href resolution, "
        "mailto/javascript/fragment filtering; arithmetic oracle)",
        _link_graph,
        spark_fn=_spark_link_graph,
        tables=("documents",),
    )
)


def _spark_domain_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Eager localCheckpoint: the aggregated edge frame is tiny (domains²)
    # but is consumed by BOTH degree aggregates below — without the
    # checkpoint Catalyst inlines it and the corpus-sized render +
    # extraction runs once per reference (same rationale as
    # plans/pagerank.py).
    edges = (
        _edges(spark, sf_dir)
        .groupBy("src_domain", "dst_domain")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    out = edges.groupBy(F.col("src_domain").alias("domain")).agg(
        F.countDistinct("dst_domain").cast("int").alias("out_degree"),
        F.sum("n").cast("int").alias("n_outlinks"),
    )
    in_ = edges.groupBy(F.col("dst_domain").alias("domain")).agg(
        F.countDistinct("src_domain").cast("int").alias("in_degree"),
        F.sum("n").cast("int").alias("n_inlinks"),
    )
    return (
        out.join(in_, "domain", "full_outer")
        .fillna(0, ["out_degree", "n_outlinks", "in_degree", "n_inlinks"])
        .select("domain", "out_degree", "in_degree", "n_outlinks", "n_inlinks")
    )


def _domain_degrees(dialect: str) -> str:
    return f"""
WITH {_oracle_edge_cte(dialect)},
_g AS (SELECT src_domain, dst_domain, count(*) AS n
       FROM _edges GROUP BY src_domain, dst_domain),
_out AS (SELECT src_domain AS domain,
                count(DISTINCT dst_domain) AS out_degree,
                sum(n) AS n_outlinks
         FROM _g GROUP BY src_domain),
_in AS (SELECT dst_domain AS domain,
               count(DISTINCT src_domain) AS in_degree,
               sum(n) AS n_inlinks
        FROM _g GROUP BY dst_domain)
SELECT coalesce(o.domain, i.domain) AS domain,
       cast(coalesce(o.out_degree, 0) as int) AS out_degree,
       cast(coalesce(i.in_degree, 0) as int) AS in_degree,
       cast(coalesce(o.n_outlinks, 0) as int) AS n_outlinks,
       cast(coalesce(i.n_inlinks, 0) as int) AS n_inlinks
FROM _out o FULL OUTER JOIN _in i ON o.domain = i.domain
"""


register(
    Query(
        "domain_degrees",
        "Per-domain in/out degree + link volumes over the extracted link "
        "graph (crawl-frontier / quality-model features)",
        _domain_degrees,
        spark_fn=_spark_domain_degrees,
        tables=("documents",),
    )
)


def _spark_two_hop_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 2-hop reachability: per domain, distinct NON-SELF domains
    reachable in one hop and in at most two directed hops.

    The self-join runs on the DISTINCT domain-level edge list — after the
    first aggregate the graph is bounded by (domains)², not corpus size,
    so the expensive part (anchor extraction + edge agg) happens once and
    the hop join moves kilobytes at any corpus scale. The eager
    localCheckpoint makes "once" literal: `e` is referenced by four
    subplans below, and without it Catalyst inlines the corpus-sized
    extraction into every reference (same rationale as pagerank.py)."""
    e = (
        _edges(spark, sf_dir)
        .select("src_domain", "dst_domain")
        .distinct()
        .localCheckpoint(eager=True)
    )
    one = e.filter(F.col("src_domain") != F.col("dst_domain"))
    e2 = e.select(
        F.col("src_domain").alias("mid"), F.col("dst_domain").alias("dst2")
    )
    two = (
        e.join(e2, e.dst_domain == e2.mid)
        .select("src_domain", F.col("dst2").alias("dst_domain"))
        .filter(F.col("src_domain") != F.col("dst_domain"))
    )
    reach = one.unionByName(two).distinct()
    # every SOURCE domain gets a row — a domain whose only edges are
    # self-loops still exists in the graph, with zero non-self reach
    base = e.select(F.col("src_domain").alias("domain")).distinct()
    return (
        base.join(
            one.groupBy(F.col("src_domain").alias("domain")).agg(
                F.countDistinct("dst_domain").cast("int").alias("n_one_hop")
            ),
            "domain",
            "left",
        )
        .join(
            reach.groupBy(F.col("src_domain").alias("domain")).agg(
                F.countDistinct("dst_domain").cast("int").alias("n_two_hop")
            ),
            "domain",
            "left",
        )
        .fillna(0, ["n_one_hop", "n_two_hop"])
        .select("domain", "n_one_hop", "n_two_hop")
    )


def _two_hop_domains(dialect: str) -> str:
    return f"""
WITH {_oracle_edge_cte(dialect)},
_g AS (SELECT DISTINCT src_domain, dst_domain FROM _edges),
_one AS (SELECT src_domain, dst_domain FROM _g
         WHERE src_domain != dst_domain),
_two AS (
  SELECT a.src_domain, b.dst_domain
  FROM _g a JOIN _g b ON a.dst_domain = b.src_domain
  WHERE a.src_domain != b.dst_domain
),
_reach AS (SELECT src_domain, dst_domain FROM _one
           UNION SELECT src_domain, dst_domain FROM _two),
_base AS (SELECT DISTINCT src_domain AS domain FROM _g),
_n1 AS (SELECT src_domain AS domain,
               count(DISTINCT dst_domain) AS n_one_hop
        FROM _one GROUP BY src_domain),
_n2 AS (SELECT src_domain AS domain,
               count(DISTINCT dst_domain) AS n_two_hop
        FROM _reach GROUP BY src_domain)
SELECT d.domain, cast(coalesce(a.n_one_hop, 0) as int) AS n_one_hop,
       cast(coalesce(b.n_two_hop, 0) as int) AS n_two_hop
FROM _base d
LEFT JOIN _n1 a ON d.domain = a.domain
LEFT JOIN _n2 b ON d.domain = b.domain
"""


register(
    Query(
        "two_hop_domains",
        "Bounded 2-hop domain reachability over the extracted link graph "
        "(distinct non-self neighbors at <=1 and <=2 hops); the hop join "
        "runs on the domain-level edge list, not the corpus",
        _two_hop_domains,
        spark_fn=_spark_two_hop_domains,
        tables=("documents",),
    )
)


def _spark_anchor_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per target domain: anchor-text rollup from the REAL extraction.

    Anchor text pointing AT a page is a classic quality/relevance signal
    (it is how others describe the target — search engines and webtext
    quality models both consume it). Shape: the per-(dst, text) count is
    a two-stage hash agg riding the edge extraction's output; the winner
    pick is ONE window over the (small) domain×distinct-text frame, and
    the domain rollup rides the same exchange. Nothing here scales with
    the corpus beyond the first agg's map-side partials.
    """
    from pyspark.sql import Window

    per_text = (
        _edges(spark, sf_dir)
        .groupBy("dst_domain", "anchor_text")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("dst_domain").orderBy(
        F.col("n").desc(), F.col("anchor_text")
    )
    return (
        per_text.withColumn("rn", F.row_number().over(w))
        .groupBy("dst_domain")
        .agg(
            F.sum("n").cast("int").alias("n_anchors"),
            F.count("*").cast("int").alias("n_distinct_texts"),
            F.max(F.when(F.col("rn") == 1, F.col("anchor_text"))).alias(
                "top_text"
            ),
            F.max(F.when(F.col("rn") == 1, F.col("n"))).cast("int").alias(
                "top_text_count"
            ),
        )
    )


def _anchor_text_stats(dialect: str) -> str:
    """Oracle: the shared closed-form anchor rows (cross links carry
    text 't{j}', self links 'self {k}' — render_link_html) rolled up
    identically to the Spark side."""
    return f"""
WITH {_oracle_edge_cte(dialect, with_text=True)},
_pt AS (SELECT dst_domain, anchor_text, count(*) AS n
        FROM _edges GROUP BY dst_domain, anchor_text),
_rk AS (SELECT dst_domain, anchor_text, n,
               row_number() OVER (PARTITION BY dst_domain
                                  ORDER BY n DESC, anchor_text) AS rn
        FROM _pt)
SELECT dst_domain,
       cast(sum(n) as int) AS n_anchors,
       cast(count(*) as int) AS n_distinct_texts,
       max(CASE WHEN rn = 1 THEN anchor_text END) AS top_text,
       cast(max(CASE WHEN rn = 1 THEN n END) as int) AS top_text_count
FROM _rk
GROUP BY dst_domain
"""


register(
    Query(
        "anchor_text_stats",
        "Per-target-domain anchor-text rollup (count, distinct texts, "
        "dominant text) from REAL anchor extraction; arithmetic oracle",
        _anchor_text_stats,
        spark_fn=_spark_anchor_text_stats,
        tables=("documents",),
    )
)
