"""domain_pagerank: pure-Python recurrence agreement, mass sanity, and
ordering sanity."""

from __future__ import annotations

from collections import defaultdict

from quarrycore_spark.plans.pagerank import DAMP_MILLI, ITERS, SCALE
from quarrycore_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE


def _python_pagerank(n_docs: int) -> dict[str, int]:
    """The exact integer recurrence over the closed-form edge list."""
    edges = set()
    for i in range(n_docs):
        src = f"site{i % 20}.example.com"
        for j in range(i % 4):
            edges.add((src, f"site{(i + 3 * j + 1) % 20}.example.com"))
        edges.add((src, src))  # the relative self-link
    domains = {s for s, _ in edges} | {d for _, d in edges}
    n = len(domains)
    base = (150 * SCALE) // (1000 * n)
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    rank = {d: SCALE // n for d in domains}
    for _ in range(ITERS):
        nxt = defaultdict(int)
        for s, d in edges:
            nxt[d] += rank[s] // outdeg[s]
        rank = {d: base + (DAMP_MILLI * c) // 1000 for d, c in nxt.items()}
    return rank


def test_matches_python_recurrence(spark):
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchone()[0]
    got = {
        r["domain"]: r["rank_micro"]
        for r in (
            REGISTRY["domain_pagerank"].run_spark(spark, SF_SMOKE).collect()
        )
    }
    want = _python_pagerank(n_docs)
    assert got == want


def test_mass_and_ordering(spark):
    rows = [
        r.asDict()
        for r in REGISTRY["domain_pagerank"].run_spark(spark, SF_SMOKE).collect()
    ]
    assert len(rows) == 20
    total = sum(r["rank_micro"] for r in rows)
    # floor division leaks a little mass each step; it can only shrink
    assert 0.9 * SCALE <= total <= SCALE
    ranks = sorted(r["rank_micro"] for r in rows)
    assert ranks[0] > 0
    assert ranks[-1] > ranks[0]  # the graph is not rank-uniform
