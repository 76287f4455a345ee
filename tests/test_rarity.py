"""Word-rarity scoring (plans/rarity.py): a pure-Python simulation
pinned against the DuckDB dialect of the registered query.
Spark-vs-DuckDB parity over the real sf0.01 corpus is covered by
test_oracle_parity's registry sweep."""

from __future__ import annotations

from collections import Counter

import duckdb
import pandas as pd

from quarrycore_spark.functions.dialect import DUCKDB
from quarrycore_spark.plans.rarity import (
    TAIL_MILLI_MIN,
    _word_rarity_sql,
    rarity_augmented_cte,
)

# --- pure-Python simulation ------------------------------------------------------


def flog2(n: int) -> int:
    """floor(log2(n)) for n >= 1, via bit length (matches length(bin(n))-1)."""
    return n.bit_length() - 1


def plant(i: int, text: str) -> str:
    out = text
    for j in range(1, 4):
        if i % 4 >= j:
            out += f" rare{j}w{i}"
    return out


def ref_rarity(docs: dict[int, str]) -> dict[int, dict[str, int]]:
    aug = {i: plant(i, t) for i, t in docs.items()}
    counts: Counter = Counter()
    for t in aug.values():
        counts.update(t.split())
    tot = sum(counts.values())
    out = {}
    for i, t in aug.items():
        words = t.split()
        if not words:
            out[i] = {"n_words": 0, "rarity_milli": 0, "is_tail": 0}
            continue
        s = sum(flog2(tot) - flog2(counts[w]) for w in words)
        milli = (s * 1000) // len(words)
        out[i] = {
            "n_words": len(words),
            "rarity_milli": milli,
            "is_tail": int(milli >= TAIL_MILLI_MIN),
        }
    return out


# --- fixtures --------------------------------------------------------------------

COMMON = "the data row key scan join sort merge hash table".split()


def docs_df(n: int = 120) -> pd.DataFrame:
    texts = {
        i: " ".join(COMMON[(i + j) % len(COMMON)] for j in range(10 + i % 17))
        for i in range(n)
    }
    texts[5] = ""  # zero-guard path (plus its planted word for 5 % 4 == 1)
    return pd.DataFrame({"doc_id": list(range(n)), "text": [texts[i] for i in range(n)]})


def run_duck(docs: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", docs)
    return (
        con.sql(_word_rarity_sql(DUCKDB))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# --- tests -----------------------------------------------------------------------


def test_word_rarity_matches_python_reference():
    docs = docs_df()
    got = run_duck(docs)
    exp = ref_rarity(dict(zip(docs["doc_id"], docs["text"])))
    assert set(got["doc_id"]) == set(exp)
    for _, row in got.iterrows():
        e = exp[row["doc_id"]]
        for k, v in e.items():
            assert row[k] == v, (row["doc_id"], k, dict(row), e)


def test_word_rarity_orders_planted_docs_up():
    """More planted singletons => strictly rarer on average, holding the
    base text fixed."""
    base = "alpha beta gamma delta " * 8
    docs = pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": [base] * 4})
    got = run_duck(docs).set_index("doc_id")
    r = [got.loc[i, "rarity_milli"] for i in range(4)]
    assert r[0] < r[1] < r[2] < r[3], r


def test_word_rarity_zero_words_guard():
    """A doc that is empty even after planting (doc_id % 4 == 0)."""
    docs = pd.DataFrame({"doc_id": [0, 4], "text": ["", "x y z"]})
    got = run_duck(docs).set_index("doc_id")
    assert got.loc[0, "n_words"] == 0
    assert got.loc[0, "rarity_milli"] == 0
    assert got.loc[0, "is_tail"] == 0


def test_word_rarity_surprisal_is_exact_bit_length():
    """One ubiquitous word + one singleton: surprisal must be exactly
    len(bin(tot)) - len(bin(cnt)), no float-log rounding."""
    # 63 occurrences of 'w' in doc 0 (plus nothing planted: 0 % 4 == 0),
    # and doc 4 is just 'w' too => tot = 64 = 2^6 exactly
    docs = pd.DataFrame({"doc_id": [0, 4], "text": ["w " * 63, "w"]})
    got = run_duck(docs).set_index("doc_id")
    # tot=64 -> flog2=6; cnt('w')=64 -> surprisal 0 for every occurrence
    assert got.loc[0, "rarity_milli"] == 0
    assert got.loc[4, "rarity_milli"] == 0


def test_rarity_cte_plants_exactly():
    docs = docs_df(12)
    con = duckdb.connect()
    con.register("documents", docs)
    rows = con.sql(
        f"WITH {rarity_augmented_cte(DUCKDB)} SELECT doc_id, atext FROM _aug"
    ).fetchdf()
    for _, r in rows.iterrows():
        i = r["doc_id"]
        assert r["atext"] == plant(i, docs.loc[docs.doc_id == i, "text"].iloc[0]), i
