"""P18 oracle surface: a CORRECTNESS-checked query over the real
structured-content extraction path (extraction/structured.py).

The driver ships no HTML table, so `doc_link_stats` derives one
deterministically from `documents.doc_id` (the same device as
mediaops.media_phash_pairs): each doc becomes a synthetic page whose
link/image/code/table populations follow closed-form integer formulas of
doc_id, wrapped in noise the extractor must ignore (a <script> containing
fake <a>/<img> markup, a commented-out link and table, an <img> with no
src). The SPARK side renders the page and runs the REAL P18 operator
(with_structured_content → ARRAY<STRUCT> columns → JVM-side size/aggregate
counts); the DUCKDB oracle computes the same counts arithmetically from
the formulas. Any parser regression — counting links inside comments,
missing balanced-block tables, double-counting <pre><code> — breaks the
hash match.

Formulas (doc_id is non-negative, so % agrees across engines):
    n_links       = doc_id % 5
    n_images      = (doc_id // 5) % 4        (+1 src-less img, ignored)
    n_code_blocks = (doc_id // 20) % 3 + (1 if doc_id % 2 == 0 else 0)
                    (<pre><code> pairs count ONCE; the even-doc bonus is a
                     bare inline <code>)
    n_tables      = (doc_id // 60) % 2       (2 rows × 3 cells each)
    n_table_cells = n_tables * 6
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quarrycore_spark.plans.registry import Query, register

_NOISE = (
    "<script>var a=\"<a href='x'>fake</a><img src='s.png'>\";</script>"
    "<style>.x{color:red}</style>"
    "<!-- <a href=\"c\">commented</a> <table><tr><td>x</td></tr></table> -->"
)


def render_doc_html(doc_id: int) -> bytes:
    n_links = doc_id % 5
    n_imgs = (doc_id // 5) % 4
    n_code = (doc_id // 20) % 3
    n_tables = (doc_id // 60) % 2
    parts = [f"<html><head><title>d{doc_id}</title>{_NOISE}</head><body>"]
    parts += [f'<a href="/p{i}">t{i}</a>' for i in range(n_links)]
    parts += [f'<img src="/i{i}.png" alt="a{i}">' for i in range(n_imgs)]
    parts.append("<img alt='no src, must not count'>")
    parts += [f"<pre><code>block {i} of {doc_id}</code></pre>" for i in range(n_code)]
    if doc_id % 2 == 0:
        parts.append(f"<code>inline {doc_id}</code>")
    parts += [
        "<table><tr><th>h1</th><th>h2</th><th>h3</th></tr>"
        "<tr><td>a</td><td>b</td><td>c</td></tr></table>"
        for _ in range(n_tables)
    ]
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def _spark_doc_link_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quarrycore_spark.extraction.structured import with_structured_content
    from quarrycore_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")["documents"].select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "url": [str(i) for i in ids],
                    "html": [render_doc_html(int(i)) for i in ids],
                }
            )

    from quarrycore_spark.operators._partitioning import spread

    pages = spread(docs).mapInPandas(gen, schema="url string, html binary")
    structured = with_structured_content(pages)
    return structured.select(
        F.col("url").cast("bigint").alias("doc_id"),
        F.size("links").alias("n_links"),
        F.size("images").alias("n_images"),
        F.size("code_blocks").alias("n_code_blocks"),
        F.size("tables").alias("n_tables"),
        F.expr(
            "aggregate(tables, 0, (acc, t) -> "
            "acc + aggregate(t, 0, (a, r) -> a + size(r)))"
        ).alias("n_table_cells"),
    )


def _doc_link_stats(dialect: str) -> str:
    div = "div" if dialect == "spark" else "//"
    return f"""
SELECT doc_id,
       doc_id % 5 AS n_links,
       (doc_id {div} 5) % 4 AS n_images,
       (doc_id {div} 20) % 3 + (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
           AS n_code_blocks,
       (doc_id {div} 60) % 2 AS n_tables,
       ((doc_id {div} 60) % 2) * 6 AS n_table_cells
FROM documents
"""


register(
    Query(
        "doc_link_stats",
        "P18: per-doc link/image/code-block/table counts from the real "
        "structured-content extractor over deterministic synthetic HTML "
        "(arithmetic oracle)",
        _doc_link_stats,
        spark_fn=_spark_doc_link_stats,
        tables=("documents",),
    )
)
