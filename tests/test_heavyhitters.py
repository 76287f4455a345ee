"""Heavy-hitter n-grams: planted dominance, tie-break determinism,
and the top-K plan shape."""

from __future__ import annotations

from quarrycore_spark.plans.heavyhitters import NGRAM_K, SENTENCES, TOP_K
from quarrycore_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def _sentence_grams(s: str) -> set[str]:
    w = s.split()
    return {" ".join(w[i:i + NGRAM_K]) for i in range(len(w) - NGRAM_K + 1)}


def test_planted_sentences_dominate(spark):
    df = REGISTRY["heavy_hitter_ngrams"].run_spark(spark, SF)
    rows = df.collect()
    assert len(rows) == TOP_K
    planted = _sentence_grams(SENTENCES[0]) | _sentence_grams(SENTENCES[1])
    got = {r["gram"]: r["doc_freq"] for r in rows}
    # Each sentence rides 1/8 of the corpus (500 docs -> ~62/63 docs);
    # every planted trigram must make the top-K and dominate the tail.
    assert planted <= set(got)
    planted_min = min(got[g] for g in planted)
    natural = [f for g, f in got.items() if g not in planted]
    assert all(f <= planted_min for f in natural)
    for g in planted:
        assert got[g] in (62, 63)


def test_deterministic_across_runs(spark):
    q = REGISTRY["heavy_hitter_ngrams"]
    a = sorted(map(tuple, q.run_spark(spark, SF).collect()))
    b = sorted(map(tuple, q.run_spark(spark, SF).collect()))
    assert a == b


def test_topk_plan_not_full_sort(spark):
    df = REGISTRY["heavy_hitter_ngrams"].run_spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
