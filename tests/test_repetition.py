"""Repetition filters (plans/repetition.py): pure-Python simulations of
the Gopher-style within-doc metrics and the C4-style cross-doc line
dedup pinned against the DuckDB dialect of the registered queries.
Spark-vs-DuckDB parity over the real sf0.01 corpus is covered by
test_oracle_parity's registry sweep."""

from __future__ import annotations

from collections import Counter

import duckdb
import pandas as pd

from quarrycore_spark.functions.dialect import DUCKDB
from quarrycore_spark.plans.repetition import (
    DUP_2GRAM_MILLI_MAX,
    DUP_3GRAM_MILLI_MAX,
    DUP_LINE_MILLI_MAX,
    MIN_DOCS_FOR_DUP,
    _clean_dup_lines,
    _corpus_dup_lines,
    _doc_repetition,
    repetition_augmented_cte,
)

# --- pure-Python simulations ---------------------------------------------------


def py_lines(text: str) -> list[str]:
    return [ln.strip() for ln in text.split("\n") if ln.strip() != ""]


def py_ngrams(words: list[str], k: int) -> list[str]:
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def dup_milli(total: int, uniq: int) -> int:
    return 0 if total == 0 else ((total - uniq) * 1000) // total


def ref_repetition(text: str) -> dict[str, int]:
    lines = py_lines(text)
    words = text.split()
    g2, g3 = py_ngrams(words, 2), py_ngrams(words, 3)
    out = {
        "n_lines": len(lines),
        "n_words": len(words),
        "dup_line_milli": dup_milli(len(lines), len(set(lines))),
        "dup_2gram_milli": dup_milli(len(g2), len(set(g2))),
        "dup_3gram_milli": dup_milli(len(g3), len(set(g3))),
    }
    out["is_repetitive"] = int(
        out["dup_line_milli"] > DUP_LINE_MILLI_MAX
        or out["dup_2gram_milli"] > DUP_2GRAM_MILLI_MAX
        or out["dup_3gram_milli"] > DUP_3GRAM_MILLI_MAX
    )
    return out


# --- fixtures -------------------------------------------------------------------

TEXTS = [
    "",  # empty -> zero-guard paths
    "one single line of plain text",
    "alpha\nbeta\n  gamma  \n\nalpha",  # whitespace lines + a duplicate
    "spam ham spam ham spam ham spam ham",  # heavy 2-/3-gram repetition
    "w",  # single word: no n-grams at all
    "x y",  # exactly one 2-gram, no 3-gram
    ("line a\nline b\nline a\nline b\nline a\n" * 4),  # dup-line heavy
    "the quick brown fox jumps over the lazy dog again and again",
]


def docs_df(n: int = 64) -> pd.DataFrame:
    return pd.DataFrame(
        {"doc_id": list(range(n)), "text": [TEXTS[i % len(TEXTS)] for i in range(n)]}
    )


def run_duck(sql: str, docs: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", docs)
    return con.sql(sql).fetchdf().sort_values("doc_id").reset_index(drop=True)


def augmented(docs: pd.DataFrame) -> dict[int, str]:
    rows = run_duck(
        f"WITH {repetition_augmented_cte(DUCKDB)} SELECT doc_id, atext FROM _aug",
        docs,
    )
    return dict(zip(rows["doc_id"], rows["atext"]))


# --- doc_repetition --------------------------------------------------------------


def test_doc_repetition_matches_python_reference():
    docs = docs_df()
    atexts = augmented(docs)
    got = run_duck(_doc_repetition(DUCKDB), docs)
    assert len(got) == len(docs)
    for _, row in got.iterrows():
        exp = ref_repetition(atexts[row["doc_id"]])
        for k, v in exp.items():
            assert row[k] == v, (row["doc_id"], k, dict(row), exp)


def test_doc_repetition_metrics_fire():
    got = run_duck(_doc_repetition(DUCKDB), docs_df())
    for col in ("dup_line_milli", "dup_2gram_milli", "dup_3gram_milli"):
        assert (got[col] > 0).any(), f"{col} never fired"
    assert got["is_repetitive"].sum() > 0
    assert (got["is_repetitive"] == 0).any()


def test_doc_repetition_degenerate_docs():
    """Empty text and sub-k word counts take the zero-guard paths."""
    docs = pd.DataFrame({"doc_id": [300, 304, 305], "text": ["", "w", "x y"]})
    # doc_ids chosen so every planted piece is off (id%5=0, %3=0, %6=0 is
    # impossible for all three simultaneously — instead verify vs python)
    atexts = augmented(docs)
    got = run_duck(_doc_repetition(DUCKDB), docs)
    for _, row in got.iterrows():
        exp = ref_repetition(atexts[row["doc_id"]])
        for k, v in exp.items():
            assert row[k] == v, (row["doc_id"], k)


# --- corpus_dup_lines -------------------------------------------------------------


def ref_corpus(atexts: dict[int, str]) -> dict[int, dict[str, int]]:
    doc_lines = {i: py_lines(t) for i, t in atexts.items()}
    docs_per_line: Counter = Counter()
    for i, lns in doc_lines.items():
        for ln in set(lns):
            docs_per_line[ln] += 1
    dup = {ln for ln, c in docs_per_line.items() if c >= MIN_DOCS_FOR_DUP}
    out = {}
    for i, lns in doc_lines.items():
        if not lns:
            continue  # docs with zero lines produce no rows
        distinct = set(lns)
        nb = len(distinct & dup)
        out[i] = {
            "n_line_occurrences": len(lns),
            "n_distinct_lines": len(distinct),
            "n_boilerplate_lines": nb,
            "boilerplate_milli": dup_milli(len(distinct), len(distinct) - nb),
        }
    return out


def test_corpus_dup_lines_matches_python_reference():
    docs = docs_df()
    atexts = augmented(docs)
    exp = ref_corpus(atexts)
    got = run_duck(_corpus_dup_lines(DUCKDB), docs)
    assert set(got["doc_id"]) == set(exp)
    for _, row in got.iterrows():
        e = exp[row["doc_id"]]
        for k, v in e.items():
            assert row[k] == v, (row["doc_id"], k, dict(row), e)


def test_corpus_dup_lines_threshold():
    """A line in exactly MIN_DOCS_FOR_DUP-1 docs is not boilerplate;
    one more doc flips it."""
    base = [
        (0, "shared line\nunique zero"),
        (1, "shared line\nunique one"),
    ]
    for extra, want in ((0, 0), (1, 1)):
        rows = base + [(2, "shared line\nunique two")] * extra
        # doc_ids 0,1,2: planted pieces differ per id but none equals
        # 'shared line', so the planted lines cannot fake the count
        docs = pd.DataFrame(
            {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
        )
        got = run_duck(_corpus_dup_lines(DUCKDB), docs)
        atexts = augmented(docs)
        exp = ref_corpus(atexts)
        for _, row in got.iterrows():
            assert row["n_boilerplate_lines"] == exp[row["doc_id"]][
                "n_boilerplate_lines"
            ]
        if want:
            assert ("shared line" in {
                ln
                for t in atexts.values()
                for ln in py_lines(t)
            })
            assert (got["n_boilerplate_lines"] >= 1).sum() >= 3


# --- clean_dup_lines --------------------------------------------------------------


def ref_clean(atexts: dict[int, str]) -> dict[int, dict]:
    doc_lines = {i: py_lines(t) for i, t in atexts.items()}
    docs_per_line: Counter = Counter()
    for lns in doc_lines.values():
        for ln in set(lns):
            docs_per_line[ln] += 1
    dup = {ln for ln, c in docs_per_line.items() if c >= MIN_DOCS_FOR_DUP}
    out = {}
    for i, lns in doc_lines.items():
        if not lns:
            continue
        kept = [ln for ln in lns if ln not in dup]
        out[i] = {
            "clean_text": "\n".join(kept),
            "n_kept": len(kept),
            "n_removed": len(lns) - len(kept),
        }
    return out


def test_clean_dup_lines_matches_python_reference():
    docs = docs_df()
    atexts = augmented(docs)
    exp = ref_clean(atexts)
    got = run_duck(_clean_dup_lines(DUCKDB), docs)
    assert set(got["doc_id"]) == set(exp)
    for _, row in got.iterrows():
        e = exp[row["doc_id"]]
        for k, v in e.items():
            assert row[k] == v, (row["doc_id"], k, dict(row), e)
    assert got["n_removed"].sum() > 0  # the planted boilerplate fires


def test_clean_dup_lines_preserves_order_and_duplicates():
    """Within-doc duplicate non-boilerplate lines survive in place."""
    docs = pd.DataFrame(
        {
            # doc_ids 3,6,9: %5 in {3,1,4} -> dup-line planting active on
            # 3 and 9; the shared 'b' line is in 3 docs -> boilerplate
            "doc_id": [3, 6, 9],
            "text": ["z\nb\nz\nq3", "b\nq6", "q9\nb"],
        }
    )
    atexts = augmented(docs)
    exp = ref_clean(atexts)
    got = run_duck(_clean_dup_lines(DUCKDB), docs)
    for _, row in got.iterrows():
        assert row["clean_text"] == exp[row["doc_id"]]["clean_text"]


def test_clean_dup_lines_consistent_with_detector():
    """n_removed equals the detector's per-doc occurrence count of
    boilerplate lines (occurrences, not distinct)."""
    docs = docs_df()
    clean = run_duck(_clean_dup_lines(DUCKDB), docs)
    det = run_duck(_corpus_dup_lines(DUCKDB), docs)
    merged = clean.merge(det, on="doc_id")
    assert (
        merged["n_kept"] + merged["n_removed"] == merged["n_line_occurrences"]
    ).all()
    # a doc with zero boilerplate removes nothing
    none = merged[merged["n_boilerplate_lines"] == 0]
    assert (none["n_removed"] == 0).all()
