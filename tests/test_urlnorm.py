"""URL canonicalization: edge cases, pure-Python reference parity,
and DataFrame-vs-SQL no-drift."""

from __future__ import annotations

from urllib.parse import urlsplit

from quarrycore_spark.functions.urlnorm import (
    TRACKING_PARAMS,
    TRACKING_PREFIXES,
    canonical_url_ctes,
    with_canonical_url,
)
from quarrycore_spark.plans.registry import REGISTRY
from quarrycore_spark.plans.urlops import messy_url_cte

SF = "/root/testdata/sf0.001"


def py_canonical(url: str) -> str:
    """Pure-Python reference implementation of the documented policy."""
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = parts.hostname or ""
    if host.startswith("www."):
        host = host[4:]
    port = ""
    if parts.port is not None:
        default = {"http": 80, "https": 443}.get(scheme)
        if parts.port != default:
            port = f":{parts.port}"
    path = parts.path.rstrip("/")
    kept = [
        p for p in parts.query.split("&")
        if p
        and not any(p.startswith(pre) for pre in TRACKING_PREFIXES)
        and not any(p.startswith(f"{name}=") for name in TRACKING_PARAMS)
    ]
    query = "?" + "&".join(sorted(kept)) if kept else ""
    return f"{scheme}://{host}{port}{path}{query}"


EDGE_CASES = [
    # (input, expected canonical)
    ("HTTP://WWW.Example.COM:80/A/b/?utm_source=x#frag",
     "http://example.com/A/b"),
    ("https://example.com:443/", "https://example.com"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com", "http://example.com"),
    ("http://example.com/p?z=2&a=1&fbclid=F&gclid=G&ref=feed",
     "http://example.com/p?a=1&z=2"),
    ("http://example.com/p?utm_campaign=only", "http://example.com/p"),
    ("http://example.com/p///", "http://example.com/p"),
    # www only stripped as a leading label; path case preserved.
    ("http://www.www2.example.com/Q?b=2&a=1",
     "http://www2.example.com/Q?a=1&b=2"),
    # query values keep their case; only scheme/host lowercase.
    ("HTTPS://Example.com/Path?Key=Value#x",
     "https://example.com/Path?Key=Value"),
]


def test_edge_cases(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(EDGE_CASES)],
                               "i long, url string")
    got = {r["i"]: r["canonical_url"]
           for r in with_canonical_url(df).collect()}
    for i, (url, want) in enumerate(EDGE_CASES):
        assert got[i] == want, f"{url!r}: {got[i]!r} != {want!r}"
        assert py_canonical(url) == want, f"py ref drifted on {url!r}"


def test_python_reference_parity_on_corpus(spark):
    """The Spark normalizer and the urllib-based reference agree on
    every synthetic messy URL."""
    table = f"parquet.`{SF}/documents.parquet`"
    messy = spark.sql(
        f"WITH {messy_url_cte(table=table)} SELECT doc_id, url FROM _m")
    rows = with_canonical_url(messy).collect()
    assert len(rows) == 500
    for r in rows:
        assert r["canonical_url"] == py_canonical(r["url"]), r["url"]


def test_sql_ctes_match_dataframe_helper(spark):
    """canonical_url_ctes and with_canonical_url derive from the same
    step list — prove the two surfaces emit identical values."""
    table = f"parquet.`{SF}/documents.parquet`"
    via_sql = spark.sql(
        f"WITH {messy_url_cte(table=table)},\n{canonical_url_ctes('_m')}\n"
        "SELECT doc_id, canonical_url FROM _canon"
    ).collect()
    messy = spark.sql(
        f"WITH {messy_url_cte(table=table)} SELECT doc_id, url FROM _m")
    via_df = with_canonical_url(messy).select("doc_id", "canonical_url").collect()
    assert sorted(map(tuple, via_sql)) == sorted(map(tuple, via_df))


def test_pair_groups(spark):
    """Docs (2j, 2j+1) must land in the same canonical group."""
    df = REGISTRY["url_dedup"].run_spark(spark, SF)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) == 500
    for i, r in rows.items():
        assert r["url_canonical_id"] == (i // 2) * 2
        assert r["url_group_size"] == 2
        assert r["is_url_survivor"] == (1 if i % 2 == 0 else 0)


def test_plan_is_udf_free(spark):
    df = REGISTRY["url_dedup"].run_spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
