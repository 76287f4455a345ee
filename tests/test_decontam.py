"""Benchmark decontamination (plans/decontam.py): a pure-Python
simulation pinned against the DuckDB dialect of the registered query.
Spark-vs-DuckDB parity over the real sf0.01 corpus is covered by
test_oracle_parity's registry sweep."""

from __future__ import annotations

import duckdb
import pandas as pd

from quarrycore_spark.functions.dialect import DUCKDB
from quarrycore_spark.plans.decontam import (
    EVAL_MOD,
    EVAL_RESIDUE,
    NGRAM_K,
    PASSAGES,
    PLANT_MOD,
    PLANT_RESIDUE,
    _decontaminate_sql,
    decontam_augmented_cte,
)

# --- pure-Python simulation ------------------------------------------------------


def py_grams(text: str) -> set[str]:
    w = text.split()
    return {" ".join(w[i : i + NGRAM_K]) for i in range(len(w) - NGRAM_K + 1)}


def ref_decontaminate(docs: dict[int, str]) -> dict[int, dict[str, int]]:
    aug = {}
    for i, t in docs.items():
        if i % EVAL_MOD == EVAL_RESIDUE or i % PLANT_MOD == PLANT_RESIDUE:
            t = t + "\n" + PASSAGES[i % len(PASSAGES)]
        aug[i] = t
    eval_grams: set[str] = set()
    for i, t in aug.items():
        if i % EVAL_MOD == EVAL_RESIDUE:
            eval_grams |= py_grams(t)
    out = {}
    for i, t in aug.items():
        if i % EVAL_MOD == EVAL_RESIDUE:
            continue
        g = py_grams(t)
        hits = len(g & eval_grams)
        out[i] = {
            "n_distinct_grams": len(g),
            "n_eval_hits": hits,
            "is_contaminated": int(hits >= 1),
            "contaminated_milli": 0 if not g else (hits * 1000) // len(g),
        }
    return out


# --- fixtures --------------------------------------------------------------------

WORDS = "the quick brown fox jumps over a lazy dog and runs far away home".split()


def doc_text(i: int, n_words: int = 30) -> str:
    # deterministic per-doc word soup; doc i repeats a doc-salted cycle
    return " ".join(WORDS[(i * 7 + j * 3) % len(WORDS)] + f"x{i}" for j in range(n_words))


def docs_df(n: int = 220) -> pd.DataFrame:
    texts = {i: doc_text(i) for i in range(n)}
    # one natural contamination: doc 7 (train) IS a substring of doc
    # EVAL_RESIDUE's text (eval) — the real-duplicate case the operator
    # exists to catch, with zero planted passage involved (7%13 != 5)
    texts[EVAL_RESIDUE] = texts[7] + " trailing tail words here"
    return pd.DataFrame({"doc_id": list(range(n)), "text": [texts[i] for i in range(n)]})


def run_duck(docs: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", docs)
    return (
        con.sql(_decontaminate_sql(DUCKDB))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# --- tests -----------------------------------------------------------------------


def test_decontaminate_matches_python_reference():
    docs = docs_df()
    got = run_duck(docs)
    exp = ref_decontaminate(dict(zip(docs["doc_id"], docs["text"])))
    assert set(got["doc_id"]) == set(exp)
    for _, row in got.iterrows():
        e = exp[row["doc_id"]]
        for k, v in e.items():
            assert row[k] == v, (row["doc_id"], k, dict(row), e)


def test_decontaminate_planted_and_natural_hits_fire():
    docs = docs_df()
    got = run_duck(docs).set_index("doc_id")
    # every planted train doc whose passage variant appears in some eval
    # doc is flagged with >= 4 hits (16-word passage -> 4 13-grams)
    eval_variants = {
        i % len(PASSAGES)
        for i in docs["doc_id"]
        if i % EVAL_MOD == EVAL_RESIDUE
    }
    planted = [
        i
        for i in docs["doc_id"]
        if i % EVAL_MOD != EVAL_RESIDUE
        and i % PLANT_MOD == PLANT_RESIDUE
        and i % len(PASSAGES) in eval_variants
    ]
    assert planted, "fixture must contain planted train docs"
    for i in planted:
        assert got.loc[i, "is_contaminated"] == 1, i
        assert got.loc[i, "n_eval_hits"] >= 4, i
    # the natural (un-planted) substring duplicate is caught too
    assert got.loc[7, "is_contaminated"] == 1
    assert got.loc[7, "n_eval_hits"] == got.loc[7, "n_distinct_grams"]
    assert got.loc[7, "contaminated_milli"] == 1000
    # and clean docs exist
    assert (got["is_contaminated"] == 0).any()


def test_decontaminate_short_docs_zero_guard():
    """Docs with fewer than NGRAM_K words produce zero grams, zero hits."""
    docs = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["too short", "also quite short text"]}
    )
    got = run_duck(docs).set_index("doc_id")
    for i in (1, 2):
        assert got.loc[i, "n_distinct_grams"] == 0
        assert got.loc[i, "n_eval_hits"] == 0
        assert got.loc[i, "is_contaminated"] == 0
        assert got.loc[i, "contaminated_milli"] == 0


def test_passages_have_disjoint_13grams():
    gsets = [py_grams(p) for p in PASSAGES]
    for a in range(len(gsets)):
        assert gsets[a], "each passage must contribute grams"
        for b in range(a + 1, len(gsets)):
            assert not (gsets[a] & gsets[b]), (a, b)


def test_augmented_cte_plants_exactly_where_specified():
    docs = docs_df(60)
    con = duckdb.connect()
    con.register("documents", docs)
    rows = con.sql(
        f"WITH {decontam_augmented_cte(DUCKDB)} "
        "SELECT doc_id, atext, is_eval FROM _aug"
    ).fetchdf()
    for _, r in rows.iterrows():
        i = r["doc_id"]
        planted = i % EVAL_MOD == EVAL_RESIDUE or i % PLANT_MOD == PLANT_RESIDUE
        assert ("eval passage" in r["atext"]) == planted, i
        assert r["is_eval"] == int(i % EVAL_MOD == EVAL_RESIDUE), i
        if planted:
            assert r["atext"].endswith(PASSAGES[i % len(PASSAGES)]), i
