"""Canonical-URL normalization as pure Spark column expressions.

The standard web-pipeline URL equivalence step (reference:
`/root/reference/src/quarrycore/metadata/metadata_extractor.py` reads
`<link rel=canonical>` when a page declares one; crawl-side pipelines
additionally need a *computed* canonical form so the same resource
fetched under cosmetic URL variants dedups before any content work).

Policy (each rule is deterministic; the whole form is a pure function
of the input string):

  1. strip the fragment (`#...`)
  2. lowercase the scheme
  3. lowercase the host; strip one leading `www.`
  4. drop the default port (`:80` for http, `:443` for https); keep
     any other explicit port
  5. trim trailing `/` from the path (root `/` trims to empty — the
     authority alone identifies the resource)
  6. drop tracking query params (`utm_*` prefix family plus the exact
     names in TRACKING_PARAMS), sort the survivors byte-wise, re-join
     with `&`; an emptied query drops its `?`
  7. path and query VALUES keep their case (RFC 3986: only scheme and
     host are case-insensitive)

100-TB shape: every rule is a built-in string expression — one
whole-stage-codegen projection, no UDF, no shuffle. URL-level dedup is
then the same single hash-aggregate as content dedup, on a short
string key.

Single source of truth: `url_steps()` returns (column, expression)
pairs where each expression only references the input column and
earlier step columns. `with_canonical_url` folds them over a
DataFrame; `canonical_url_ctes` folds the SAME list into a SQL CTE
chain — the two surfaces cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Exact param names stripped as tracking junk (plus the utm_* prefix
# family). Kept deliberately short and documented: stripping a legit
# param merges distinct resources, so only the unambiguous offenders.
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_eid", "igshid", "ref")
TRACKING_PREFIXES = ("utm_",)

_TEMP_PREFIX = "_u_"


def _kept_query_expr(qs: str) -> str:
    """Sorted '&'-joined query params of `qs` minus tracking params."""
    drop = ["p = ''"]
    drop += [f"p LIKE '{pre}%'" for pre in TRACKING_PREFIXES]
    drop += [f"p LIKE '{name}=%'" for name in TRACKING_PARAMS]
    pred = " OR ".join(drop)
    return (
        f"array_join(array_sort(filter(split({qs}, '&'), "
        f"p -> NOT ({pred}))), '&')"
    )


def url_steps(url: str = "url", out: str = "canonical_url") -> list[tuple[str, str]]:
    """(column, Spark-SQL expression) pairs computing `out` from `url`.

    Temp columns carry the `_u_` prefix so callers can drop them.
    """
    return [
        # 1. fragment off first: it trails the query in a URL.
        ("_u_nf", f"substring_index({url}, '#', 1)"),
        ("_u_base", "substring_index(_u_nf, '?', 1)"),
        ("_u_qs",
         "CASE WHEN instr(_u_nf, '?') > 0 "
         "THEN substr(_u_nf, instr(_u_nf, '?') + 1) ELSE '' END"),
        ("_u_scheme", "lower(substring_index(_u_base, '://', 1))"),
        ("_u_rest", "substr(_u_base, instr(_u_base, '://') + 3)"),
        ("_u_hostport",
         "CASE WHEN instr(_u_rest, '/') > 0 "
         "THEN substr(_u_rest, 1, instr(_u_rest, '/') - 1) ELSE _u_rest END"),
        ("_u_path",
         "CASE WHEN instr(_u_rest, '/') > 0 "
         "THEN substr(_u_rest, instr(_u_rest, '/')) ELSE '' END"),
        ("_u_lhost",
         "lower(CASE WHEN instr(_u_hostport, ':') > 0 "
         "THEN substr(_u_hostport, 1, instr(_u_hostport, ':') - 1) "
         "ELSE _u_hostport END)"),
        ("_u_port",
         "CASE WHEN instr(_u_hostport, ':') > 0 "
         "THEN substr(_u_hostport, instr(_u_hostport, ':') + 1) ELSE '' END"),
        ("_u_host",
         "CASE WHEN _u_lhost LIKE 'www.%' THEN substr(_u_lhost, 5) "
         "ELSE _u_lhost END"),
        ("_u_kept", _kept_query_expr("_u_qs")),
        (out,
         "concat(_u_scheme, '://', _u_host, "
         "CASE WHEN _u_port = '' "
         "  OR (_u_scheme = 'http' AND _u_port = '80') "
         "  OR (_u_scheme = 'https' AND _u_port = '443') "
         "THEN '' ELSE concat(':', _u_port) END, "
         "CASE WHEN _u_path = '' THEN '' "
         "ELSE trim(TRAILING '/' FROM _u_path) END, "
         "CASE WHEN _u_kept = '' THEN '' "
         "ELSE concat('?', _u_kept) END)"),
    ]


def with_canonical_url(df: DataFrame, url: str = "url",
                       out: str = "canonical_url") -> DataFrame:
    """Append `out` (the canonical form of `df[url]`) — one codegen
    projection chain, temp columns dropped."""
    for name, expr in url_steps(url, out):
        df = df.selectExpr("*", f"{expr} AS {name}")
    keep = [c for c in df.columns if not c.startswith(_TEMP_PREFIX)]
    return df.select(*keep)


def canonical_url_ctes(source_cte: str, url: str = "url",
                       out: str = "canonical_url",
                       keep: tuple[str, ...] = ("doc_id",)) -> str:
    """SQL CTE chain `_u0.._uN` over `source_cte` (which must expose
    `url`); the final CTE `_canon` carries `keep` plus `out`. Spark
    dialect only (the DuckDB oracle computes its expected canonical
    form arithmetically)."""
    steps = url_steps(url, out)
    parts = []
    prev = source_cte
    for i, (name, expr) in enumerate(steps):
        cte = f"_u{i}"
        parts.append(f"{cte} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = cte
    cols = ", ".join((*keep, out))
    parts.append(f"_canon AS (SELECT {cols} FROM {prev})")
    return ",\n".join(parts)
