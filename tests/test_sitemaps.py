"""sitemap_entries: closed-form reconstruction and parse hygiene."""

from __future__ import annotations

from quarrycore_spark.plans.registry import REGISTRY
from quarrycore_spark.plans.sitemaps import MAX_ENTRIES
from tests.conftest import SF_SMOKE


def test_entries_match_closed_form(spark):
    rows = [
        r.asDict()
        for r in REGISTRY["sitemap_entries"].run_spark(spark, SF_SMOKE).collect()
    ]
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["sitemap_id"], []).append(r)
    for i, entries in by_doc.items():
        assert len(entries) == 1 + i % MAX_ENTRIES
        for r in sorted(entries, key=lambda r: r["pos"]):
            j = r["pos"]
            want_loc = f"https://site{(i + j) % 7}.example.com/page-{i}-{j}"
            assert r["loc"] == want_loc  # padding trimmed by the parse
            assert r["lastmod"] == f"2025-01-{1 + (i + j) % 28:02d}"
            assert not r["loc"].startswith(" ")
