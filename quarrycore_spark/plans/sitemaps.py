"""Sitemap parsing — the crawler-family sibling of robots_decisions, as
a paired Spark/DuckDB query.

A crawl frontier is seeded from sitemaps (sitemaps.org protocol:
``<urlset><url><loc>…</loc><lastmod>…</lastmod></url>…``); at corpus
scale "parse the sitemaps" is a column operator: extract the
(loc, lastmod) entries of every fetched sitemap document into rows the
scheduler can join against the seen-URL set. Reference parity: the
reference's crawler consumes per-domain URL lists (crawler module);
this is the standard protocol source for them.

Synthesis device: each doc renders a deterministic sitemap XML with
1 + doc_id % 5 entries (host rotating over the 7 synthesized sites,
lastmod day cycling through a month), PLUS two noise shapes the parser
must not trip on — an entry-less comment and a ``<loc>`` wrapped in
CDATA-free whitespace. The REAL extraction (regexp over the XML, loc
and lastmod arrays zipped positionally) runs in BOTH dialects; the
driver hashes actual parsed entries.

100-TB shape: render + regexp arrays fuse into the scan projection;
the explode emits (sitemap, position) rows with no shuffle at all —
a pure Generate over materialized regexp arrays (NOT a lambda-built
array — see BENCH.md's round-7 explode note; regexp_extract_all
children are codegen-safe). Zero exchanges, zero joins.
"""

from __future__ import annotations

from quarrycore_spark.functions import dialect as D
from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.plans.registry import Query, register

MAX_ENTRIES = 5


def _sitemap_entries_sql(dialect: str) -> str:
    d = "div" if dialect == SPARK else "//"
    cast_str = "STRING" if dialect == SPARK else "VARCHAR"
    fmt = "format_string" if dialect == SPARK else "printf"
    # One <url> entry, parameterized by the sequence index j.
    pad = "(CASE WHEN j = 0 THEN '  ' ELSE '' END)"
    entry = (
        f"'<url><loc>' || {pad} || "
        f"'https://site' || cast((doc_id + j) % 7 AS {cast_str}) "
        f"|| '.example.com/page-' || cast(doc_id AS {cast_str}) || '-' || "
        f"cast(j AS {cast_str}) || {pad} || '</loc>' || "
        f"'<lastmod>' || {fmt}('2025-01-%02d', cast(1 + (doc_id + j) % 28 "
        f"as int)) || '</lastmod></url>'"
    )
    if dialect == SPARK:
        entries = (
            f"array_join(transform(sequence(0, cast(doc_id % {MAX_ENTRIES} "
            f"as int)), j -> {entry}), '')"
        )
        locs = r"regexp_extract_all(xml, '<loc>\\s*([^<\\s]+)\\s*</loc>', 1)"
        mods = r"regexp_extract_all(xml, '<lastmod>([^<]+)</lastmod>', 1)"
        elem = "element_at(mods, pos + 1)"
    else:
        entries = (
            f"array_to_string(list_transform(range(0, cast(doc_id % "
            f"{MAX_ENTRIES} as int) + 1), j -> {entry}), '')"
        )
        locs = (
            r"regexp_extract_all(xml, '<loc>\s*([^<\s]+)\s*</loc>', 1)"
        )
        mods = r"regexp_extract_all(xml, '<lastmod>([^<]+)</lastmod>', 1)"
        elem = "mods[pos + 1]"
    # j = doc_id % MAX_ENTRIES ranges 0..4 → 1..5 entries. Noise: a
    # comment, and entry 0's loc is whitespace-padded so the regex trim
    # branch demonstrably fires on every sitemap.
    xml = (
        f"'<?xml version=\"1.0\"?><urlset>' || "
        f"'<!-- generated {MAX_ENTRIES} -->' || {entries} || '</urlset>'"
    )
    return f"""
WITH _x AS (SELECT doc_id, {xml} AS xml FROM documents),
_a AS (SELECT doc_id, {locs} AS locs, {mods} AS mods FROM _x),
_e AS (SELECT doc_id, mods, {D.posexplode('locs', 'pos', 'loc', dialect)}
       FROM _a)
SELECT doc_id AS sitemap_id,
       cast(pos as int) AS pos,
       loc,
       {elem} AS lastmod
FROM _e
"""


register(Query(
    "sitemap_entries",
    "Sitemap-protocol entry extraction: (loc, lastmod) rows per fetched "
    "sitemap via real regexp parsing — zero-shuffle Generate projection",
    _sitemap_entries_sql,
))
