"""url_revisions: churn-class truth, latest-pick determinism, and the
one-exchange plan shape."""

from __future__ import annotations

from quarrycore_spark.plans.crawlops import CRAWLS_PER_URL, TS_BASE
from quarrycore_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE


def _rows(spark):
    return [
        r.asDict()
        for r in REGISTRY["url_revisions"].run_spark(spark, SF_SMOKE).collect()
    ]


def test_churn_classes_match_closed_form(spark):
    rows = _rows(spark)
    assert rows
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchone()[0]
    by_url = {r["url"]: r for r in rows}
    # Rebuild the expected census from the closed form and compare.
    from collections import defaultdict

    crawls = defaultdict(list)
    for doc_id in range(n_docs):
        j, c = divmod(doc_id, CRAWLS_PER_URL)
        url = f"https://site{j % 7}.example.com/post-{j}"
        if j % 3 == 0:
            v = c
        elif j % 3 == 1:
            v = 0
        else:
            v = 0 if c == 0 else 1
        crawls[url].append((doc_id, TS_BASE + j * 1000 + c * 100, v))
    assert set(by_url) == set(crawls)
    for url, visits in crawls.items():
        r = by_url[url]
        assert r["n_crawls"] == len(visits)
        assert r["n_versions"] == len({v for _, _, v in visits})
        assert r["changed"] == (1 if r["n_versions"] > 1 else 0)
        latest = max(visits, key=lambda t: t[1])
        assert r["latest_doc_id"] == latest[0]
        assert r["latest_ts"] == latest[1]
        ts = [t for _, t, _ in visits]
        assert r["span_s"] == max(ts) - min(ts)


def test_all_three_churn_classes_observed(spark):
    rows = _rows(spark)
    assert {r["n_versions"] for r in rows} >= {1, 2, 3}
    assert {r["changed"] for r in rows} == {0, 1}


def test_agg_only_plan(spark):
    df = REGISTRY["url_revisions"].run_spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the two-phase distinct-agg shape: partial (url, chash) dedup
    # map-side, exchange on (url, chash), then the url rollup exchange —
    # and nothing else (no join, no extra shuffle, pruned scan).
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Join" not in plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_cdx_index_surt_and_timestamp(spark):
    import re
    from datetime import datetime, timezone

    rows = [
        r.asDict()
        for r in REGISTRY["cdx_index"].run_spark(spark, SF_SMOKE).collect()
    ]
    assert rows
    for r in rows:
        j = r["doc_id"] // CRAWLS_PER_URL
        c = r["doc_id"] % CRAWLS_PER_URL
        # SURT: reversed host components, ')' separator, then the path.
        assert r["surt_key"] == f"com,example,site{j % 7})/post-{j}"
        assert re.fullmatch(r"\d{14}", r["ts14"])
        epoch = TS_BASE + j * 1000 + c * 100
        want = datetime.fromtimestamp(epoch, tz=timezone.utc).strftime(
            "%Y%m%d%H%M%S"
        )
        assert r["ts14"] == want
        assert re.fullmatch(r"[0-9a-f]{16}", r["digest16"])
    # the SURT property: one domain's captures sort contiguously
    ordered = sorted(rows, key=lambda r: r["surt_key"])
    hosts = [r["surt_key"].split(")")[0] for r in ordered]
    seen, prev = set(), None
    for h in hosts:
        if h != prev:
            assert h not in seen  # a host never reappears after a gap
            seen.add(h)
            prev = h


def test_crawl_schedule_closed_form(spark):
    import duckdb
    from collections import defaultdict

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchone()[0]
    rows = [
        r.asDict()
        for r in REGISTRY["crawl_schedule"].run_spark(spark, SF_SMOKE).collect()
    ]
    per_dom = defaultdict(lambda: [0, 0])  # domain -> [n_urls, n_changed]
    for j in range((n_docs + CRAWLS_PER_URL - 1) // CRAWLS_PER_URL):
        dom = f"site{j % 7}.example.com"
        per_dom[dom][0] += 1
        # classes 0 (churning) and 2 (changed-once) have >1 version —
        # but only if >=2 crawls of this url exist in the corpus
        n_crawls = min(CRAWLS_PER_URL, n_docs - j * CRAWLS_PER_URL)
        versions = set()
        for c in range(n_crawls):
            if j % 3 == 0:
                versions.add(c)
            elif j % 3 == 1:
                versions.add(0)
            else:
                versions.add(0 if c == 0 else 1)
        if len(versions) > 1:
            per_dom[dom][1] += 1
    assert {r["domain"] for r in rows} == set(per_dom)
    for r in rows:
        n_urls, n_changed = per_dom[r["domain"]]
        assert r["n_urls"] == n_urls
        assert r["n_changed"] == n_changed
        assert r["change_milli"] == n_changed * 1000 // n_urls
    # ranks are a permutation of 1..n and ordered by (rate desc, domain)
    ranks = sorted(r["priority_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    ordered = sorted(rows, key=lambda r: (-r["change_milli"], r["domain"]))
    for i, r in enumerate(ordered):
        assert r["priority_rank"] == i + 1
