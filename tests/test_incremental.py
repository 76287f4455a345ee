"""Snapshot-incremental dedup: planted-truth structure, within-snapshot
isolation, and plan shape."""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.plans.registry import REGISTRY
from quarrycore_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def test_planted_truth(spark):
    """Exactly the docs 20m+16 are seen (via their planted twin 20m+6),
    with the right provenance; every other new doc is unseen."""
    df = REGISTRY["incremental_dedup"].run_spark(spark, SF)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert set(rows) == {i for i in range(500) if i % 20 >= 16}
    for i, r in rows.items():
        if i % 20 == 16:
            assert r["seen_before"] == 1
            assert r["first_seen_doc"] == i - 10  # 20m+6
            assert r["n_prior_copies"] == 1
        else:
            assert (r["seen_before"], r["first_seen_doc"],
                    r["n_prior_copies"]) == (0, -1, 0)


def test_within_snapshot_dups_not_flagged(spark):
    """Two new-snapshot docs sharing content (but absent from the prior
    corpus) stay unseen — within-snapshot dedup is exact_dedup's job."""
    data = [
        (21, "old unique text"),          # prior corpus (src1)
        (37, "duplicated inside new"),    # new (src17)
        (38, "duplicated inside new"),    # new (src18)
        (39, "old unique text"),          # new (src19), dup of prior 21
    ]
    spark.createDataFrame(data, "doc_id long, text string") \
         .createOrReplaceTempView("documents")
    try:
        got = {r["doc_id"]: r for r in
               spark.sql(REGISTRY["incremental_dedup"].sql(SPARK)).collect()}
    finally:
        load(spark, SF, "documents")  # restore the real view
    assert got[37]["seen_before"] == 0
    assert got[38]["seen_before"] == 0
    assert got[39]["seen_before"] == 1
    assert got[39]["first_seen_doc"] == 21


def test_plan_shape(spark):
    """No Python eval in the plan; prior side is pre-aggregated (the
    join reads an Aggregate, not raw text rows)."""
    df = REGISTRY["incremental_dedup"].run_spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" in opt
