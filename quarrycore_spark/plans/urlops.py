"""URL-level dedup over canonical URL forms, as a paired Spark/DuckDB
query.

The first dedup tier of every web pipeline (cheaper than any content
hash: it fires before the body is even fetched twice): normalize each
document's URL (functions/urlnorm.py) and group by the canonical form.
Reference parity: the reference consumes `<link rel=canonical>` where
pages declare it (`metadata/metadata_extractor.py`); the computed
canonical form here is the crawl-side complement.

Synthesis device (same as metaextract.page_metadata): the driver ships
no URL column, so each `documents.doc_id` deterministically renders a
MESSY url whose cosmetic noise follows closed-form formulas of doc_id,
with j = doc_id div 2 controlling everything content-identifying —
so consecutive doc pairs (2j, 2j+1) render different messy strings
that must normalize to the SAME canonical URL. The SPARK side runs the
REAL normalizer on the messy string; the DUCKDB oracle computes the
expected canonical form arithmetically from doc_id. Any normalizer
regression — case, www, default port, trailing slash, fragment,
tracking-param, param-order — breaks the value hash.

Messy formula (i = doc_id, j = i div 2):
  scheme     http (j even) / https (j odd); UPPERCASED when i even
  host       site{j%7}.example.com; i%3==0 -> 'WWW.' + uppercase,
             i%3==1 -> 'www.' prefix, i%3==2 -> plain
  port       ':8080' iff j%4==1 (kept); else default ':80'/':443'
             appended when i%4==0 (stripped)
  path       /Articles/post-{j}; trailing '/' added when i%5==0
  query      j%6==3 -> only '?utm_campaign=c{i}' (empties);
             else params a={j%3}, b={j%9} in messy order with
             utm_/fbclid/gclid junk interleaved by i parity
  fragment   '#frag{i%5}' appended when i%3==1

100-TB shape: normalization is one codegen projection; the dedup is a
single window (or hash agg) on the canonical string — identical
exchange shape to exact content dedup, no UDF, no extra shuffle.
"""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.functions.urlnorm import canonical_url_ctes
from quarrycore_spark.plans.registry import Query, register


def messy_url_cte(table: str = "documents") -> str:
    """CTE `_m`: doc_id, url (the messy synthetic form). Spark dialect."""
    scheme = "CASE WHEN (doc_id div 2) % 2 = 0 THEN 'http' ELSE 'https' END"
    host = ("concat('site', cast((doc_id div 2) % 7 AS STRING), "
            "'.example.com')")
    default_port = ("CASE WHEN (doc_id div 2) % 2 = 0 THEN ':80' "
                    "ELSE ':443' END")
    qs_a = "cast((doc_id div 2) % 3 AS STRING)"
    qs_b = "cast((doc_id div 2) % 9 AS STRING)"
    return f"""
_m AS (SELECT doc_id, concat(
  CASE WHEN doc_id % 2 = 0 THEN upper({scheme}) ELSE {scheme} END, '://',
  CASE WHEN doc_id % 3 = 0 THEN upper(concat('www.', {host}))
       WHEN doc_id % 3 = 1 THEN concat('www.', {host})
       ELSE {host} END,
  CASE WHEN (doc_id div 2) % 4 = 1 THEN ':8080'
       WHEN doc_id % 4 = 0 THEN {default_port}
       ELSE '' END,
  '/Articles/post-', cast(doc_id div 2 AS STRING),
  CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
  CASE WHEN (doc_id div 2) % 6 = 3
       THEN concat('?utm_campaign=c', cast(doc_id AS STRING))
       WHEN doc_id % 2 = 0
       THEN concat('?utm_source=feed&b=', {qs_b}, '&a=', {qs_a},
                   '&fbclid=X', cast(doc_id AS STRING))
       ELSE concat('?a=', {qs_a}, '&b=', {qs_b},
                   '&gclid=g', cast(doc_id AS STRING), '&utm_medium=email')
       END,
  CASE WHEN doc_id % 3 = 1
       THEN concat('#frag', cast(doc_id % 5 AS STRING)) ELSE '' END
) AS url FROM {table})"""


_FINAL = """
SELECT doc_id, canonical_url,
       cast(min(doc_id) OVER w AS bigint) AS url_canonical_id,
       cast(count(*) OVER w AS int) AS url_group_size,
       cast(CASE WHEN doc_id = min(doc_id) OVER w THEN 1 ELSE 0 END AS int)
           AS is_url_survivor
FROM _canon
WINDOW w AS (PARTITION BY canonical_url)
"""


def _url_dedup_sql(dialect: str) -> str:
    if dialect == SPARK:
        return f"WITH {messy_url_cte()},\n{canonical_url_ctes('_m')}\n{_FINAL}"
    # Oracle: the expected canonical form, directly from the formulas.
    j = "(doc_id // 2)"
    return f"""
WITH _canon AS (SELECT doc_id, concat(
  CASE WHEN {j} % 2 = 0 THEN 'http' ELSE 'https' END,
  '://site', cast({j} % 7 AS STRING), '.example.com',
  CASE WHEN {j} % 4 = 1 THEN ':8080' ELSE '' END,
  '/Articles/post-', cast({j} AS STRING),
  CASE WHEN {j} % 6 = 3 THEN ''
       ELSE concat('?a=', cast({j} % 3 AS STRING),
                   '&b=', cast({j} % 9 AS STRING)) END
) AS canonical_url FROM documents)
{_FINAL}"""


register(
    Query(
        "url_dedup",
        "URL-level dedup: normalize messy synthetic URLs (case, www, "
        "default port, trailing slash, fragment, tracking params, "
        "param order) with the real codegen normalizer and group by "
        "the canonical form; the oracle computes the expected "
        "canonical string arithmetically",
        _url_dedup_sql,
    )
)
