"""DOM-metrics oracle surface: a CORRECTNESS-checked query over the real
DOM analyzer path (extraction/domstats.py) — same synthesis device as
structops.doc_link_stats: each documents.doc_id renders a deterministic
page whose element populations follow closed-form integer formulas, the
SPARK side runs the REAL operator over the rendered page, and the DUCKDB
oracle computes every count arithmetically.

Page layout per doc_id = i (d = i%6, h2 = i%4, sem = (i//4)%3,
fm = (i//12)%2, im = i%3, lk = (i//3)%4):

  html>head>title("x"), body with: h1("x"); h2("x")*h2; d nested divs
  around one p("x"); <section><p>x</p></section>*sem;
  <form><input><button>x</button></form>*fm; im images (alt on even
  index); lk links (absolute href on odd index); one comment.

Every text fragment is exactly "x", so vis_text_len = 2*F - 1 where F is
the fragment count — the whitespace-squeeze semantics of the analyzer
pinned arithmetically. html_len is deliberately NOT in the checked
columns (its value depends on digit widths of index literals — exact but
unreasonable to express in SQL); the operator still emits it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quarrycore_spark.functions.dialect import DUCKDB
from quarrycore_spark.plans.registry import Query, register


def render_dom_page(i: int) -> bytes:
    d = i % 6
    n_h2 = i % 4
    sem = (i // 4) % 3
    fm = (i // 12) % 2
    im = i % 3
    lk = (i // 3) % 4
    parts = ["<html><head><title>x</title></head><body><h1>x</h1>"]
    parts += ["<h2>x</h2>"] * n_h2
    parts.append("<div>" * d + "<p>x</p>" + "</div>" * d)
    parts += ["<section><p>x</p></section>"] * sem
    parts += ["<form><input><button>x</button></form>"] * fm
    for j in range(im):
        alt = ' alt="a"' if j % 2 == 0 else ""
        parts.append(f'<img src="/i{j}.png"{alt}>')
    for j in range(lk):
        href = f"https://e{j}.example.com/p" if j % 2 == 1 else f"/rel{j}"
        parts.append(f'<a href="{href}">x</a>')
    parts.append("<!-- c --></body></html>")
    return "".join(parts).encode("utf-8")


def _spark_dom_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quarrycore_spark.extraction.domstats import with_dom_stats
    from quarrycore_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")["documents"].select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "url": [str(i) for i in ids],
                    "html": [render_dom_page(int(i)) for i in ids],
                }
            )

    from quarrycore_spark.operators._partitioning import spread

    pages = spread(docs).mapInPandas(gen, schema="url string, html binary")
    stats = with_dom_stats(pages)
    return stats.select(
        F.col("url").cast("bigint").alias("doc_id"),
        "n_elements", "n_distinct_tags", "max_depth", "vis_text_len",
        "n_headings", "n_h1", "n_semantic", "n_forms", "n_inputs",
        "n_buttons", "n_imgs", "n_imgs_with_alt", "n_links", "n_links_abs",
        "n_comments", "n_scripts",
    )


def _dom_stats_sql(dialect: str) -> str:
    dv = "//" if dialect == DUCKDB else "div"
    d = "(doc_id % 6)"
    h2 = "(doc_id % 4)"
    sem = f"((doc_id {dv} 4) % 3)"
    fm = f"((doc_id {dv} 12) % 2)"
    im = "(doc_id % 3)"
    lk = f"((doc_id {dv} 3) % 4)"
    # fragment count F: title + h1 + h2s + nested p + section ps + buttons + links
    frags = f"(3 + {h2} + {sem} + {fm} + {lk})"
    return f"""
SELECT doc_id,
       CAST(6 + {h2} + {d} + 2 * {sem} + 3 * {fm} + {im} + {lk} AS INT)
           AS n_elements,
       CAST(6 + (CASE WHEN {h2} > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN {d} > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN {sem} > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN {fm} > 0 THEN 3 ELSE 0 END)
              + (CASE WHEN {im} > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN {lk} > 0 THEN 1 ELSE 0 END) AS INT)
           AS n_distinct_tags,
       CAST(GREATEST({d} + 3,
                     CASE WHEN {sem} > 0 OR {fm} > 0 THEN 4 ELSE 3 END) AS INT)
           AS max_depth,
       CAST(2 * {frags} - 1 AS INT) AS vis_text_len,
       CAST(1 + {h2} AS INT) AS n_headings,
       CAST(1 AS INT) AS n_h1,
       CAST({sem} AS INT) AS n_semantic,
       CAST({fm} AS INT) AS n_forms,
       CAST({fm} AS INT) AS n_inputs,
       CAST({fm} AS INT) AS n_buttons,
       CAST({im} AS INT) AS n_imgs,
       CAST(({im} + 1) {dv} 2 AS INT) AS n_imgs_with_alt,
       CAST({lk} AS INT) AS n_links,
       CAST({lk} {dv} 2 AS INT) AS n_links_abs,
       CAST(1 AS INT) AS n_comments,
       CAST(0 AS INT) AS n_scripts
FROM documents
"""


register(
    Query(
        "dom_stats",
        "P14/DOM: element census, depth, visible-text length, structure "
        "counts from the real DOM analyzer over deterministic synthetic "
        "HTML (arithmetic oracle; reference metadata/dom_analyzer.py "
        "regex-path parity)",
        _dom_stats_sql,
        spark_fn=_spark_dom_stats,
        tables=("documents",),
    )
)
