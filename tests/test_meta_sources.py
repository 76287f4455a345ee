"""Coverage for metaops queries, the URL-list source (S2), and the
blocked-ANN exactness invariant."""

from __future__ import annotations

from tests.test_oracle_parity import compare_query


def test_metaops_queries_match_oracle(spark):
    for name in (
        "source_dedup_stats",
        "event_props_metadata",
        "stratified_sample",
        "windowed_event_counts",
        "content_metrics",
    ):
        compare_query(spark, name)


def test_read_url_list(spark, tmp_path):
    p = tmp_path / "urls.txt"
    p.write_text(
        "https://a.example/1\n"
        "\n"
        "# comment line\n"
        "  https://b.example/2  \n"
        "https://a.example/1\n"
    )
    from quarrycore_spark.sources.tables import read_url_list

    rows = [r["url"] for r in read_url_list(spark, str(p)).collect()]
    assert rows.count("https://a.example/1") == 2  # source keeps duplicates
    assert "https://b.example/2" in rows  # trimmed
    assert len(rows) == 3  # blanks + comments dropped


def test_embedding_dup_pairs_blocking_invariant(spark):
    """The block-pair self-join must produce the identical pair set for any
    block count (each unordered pair lands in exactly one group)."""
    from quarrycore_spark.operators.ann import embedding_dup_pairs
    from quarrycore_spark.sources.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")["embeddings"]

    def pairs(n_blocks):
        return sorted(
            (r["a_id"], r["b_id"], r["dot"])
            for r in embedding_dup_pairs(emb, n_blocks=n_blocks).collect()
        )

    p1, p3, p8 = pairs(1), pairs(3), pairs(8)
    assert p1 == p3 == p8
    assert len(p1) > 0
