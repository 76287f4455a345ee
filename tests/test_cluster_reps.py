"""cluster_representatives (plans/registry.py): quality-aware canonical
selection. The DuckDB dialect is exercised over fixture corpora where the
best-quality member is provably NOT the oldest, so the query's difference
from the min-doc-id rule is pinned (not vacuously identical). Spark-vs-
DuckDB parity over the real sf0.01 corpus is covered by
test_oracle_parity's registry sweep."""

from __future__ import annotations

import duckdb
import pandas as pd

from quarrycore_spark.config import DEFAULT_CONFIG as CFG
from quarrycore_spark.functions.dialect import DUCKDB
from quarrycore_spark.plans.registry import (
    _cluster_representatives_sql,
    _dedup_clusters_sql,
)

LONG = "unique words " + " ".join(f"w{i}" for i in range(120))  # > 400 chars


def run_duck(sql: str, docs: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", docs)
    return con.sql(sql).fetchdf()


def docs_df(rows: list[tuple[int, str, str]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
        }
    )


def test_rep_is_best_quality_not_oldest():
    """Docs 1 and 2 are byte-identical (exact-dup cluster); 2 is 'en' so
    its quality (100) beats 1's 'de' (42) — the rep must be 2 although
    the cluster_id (min member) is 1."""
    docs = docs_df(
        [
            (1, LONG, "de"),
            (2, LONG, "en"),
            (3, "a lone short doc", "en"),
        ]
    )
    got = run_duck(_cluster_representatives_sql(DUCKDB), docs)
    by_cluster = {r.cluster_id: r for r in got.itertuples()}
    assert by_cluster[1].rep_id == 2
    assert by_cluster[1].cluster_size == 2
    assert by_cluster[1].n_discarded == 1
    assert by_cluster[1].rep_quality > 42  # the en member's score
    # singleton cluster: its own rep, nothing discarded
    assert by_cluster[3].rep_id == 3
    assert by_cluster[3].n_discarded == 0


def test_quality_tie_breaks_to_oldest():
    docs = docs_df([(10, LONG, "en"), (11, LONG, "en")])
    got = run_duck(_cluster_representatives_sql(DUCKDB), docs)
    assert len(got) == 1
    assert got.iloc[0]["rep_id"] == 10  # equal quality -> doc_id asc


def test_consistent_with_cluster_assignment():
    """Every cluster in dedup_clusters appears exactly once, the rep is a
    member, and sizes agree."""
    docs = docs_df(
        [
            (1, LONG, "de"),
            (2, LONG, "en"),
            (3, LONG + " different tail", "en"),
            (4, "tiny", "fr"),
        ]
    )
    clusters = run_duck(_dedup_clusters_sql(DUCKDB), docs)
    reps = run_duck(_cluster_representatives_sql(DUCKDB), docs)
    sizes = clusters.groupby("cluster_id").size()
    assert set(reps["cluster_id"]) == set(sizes.index)
    members = clusters.groupby("cluster_id")["doc_id"].apply(set)
    for r in reps.itertuples():
        assert r.rep_id in members[r.cluster_id]
        assert r.cluster_size == sizes[r.cluster_id]


def test_quality_formula_matches_text_quality():
    """The inlined scalar equals the standalone text_quality score."""
    from quarrycore_spark.plans.textops import _text_quality

    docs = docs_df(
        [(i, LONG if i % 2 else "short", ["en", "de", "zh"][i % 3]) for i in range(9)]
    )
    tq = run_duck(_text_quality(DUCKDB), docs).set_index("doc_id")
    # recompute via the representatives CTE fragment
    from quarrycore_spark.plans.registry import _quality_scaled_sql

    q = run_duck(
        f"SELECT doc_id, {_quality_scaled_sql(DUCKDB)} AS q FROM documents",
        docs,
    ).set_index("doc_id")
    for i in docs["doc_id"]:
        assert q.loc[i, "q"] == tq.loc[i, "quality_scaled"], i
    # thresholds actually split the fixtures
    assert q["q"].nunique() >= 3
    assert CFG.min_quality_scaled in range(0, 101)
