"""Sequence packing (plans/packing.py): a pure-Python concat-and-chunk
simulation pinned against the DuckDB dialect of the registered query.
Spark-vs-DuckDB parity over the real sf0.01 corpus is covered by
test_oracle_parity's registry sweep."""

from __future__ import annotations

import duckdb
import pandas as pd

from quarrycore_spark.functions.dialect import DUCKDB
from quarrycore_spark.plans.packing import CONTEXT_TOKENS, _pack_sequences_sql


def ref_pack(docs: list[tuple[int, str, str]]) -> dict[int, tuple]:
    """(doc_id, source, text) -> doc_id: (n_tokens, bin_id, bin_offset,
    spans_boundary); per-source streams ordered by doc_id."""
    pos: dict[str, int] = {}
    out = {}
    for did, src, text in sorted(docs, key=lambda d: (d[1], d[0])):
        n = len(text.split())
        p = pos.get(src, 0)
        out[did] = (
            n,
            p // CONTEXT_TOKENS,
            p % CONTEXT_TOKENS,
            int(p % CONTEXT_TOKENS + n > CONTEXT_TOKENS),
        )
        pos[src] = p + n
    return out


def run_duck(docs: list[tuple[int, str, str]]) -> pd.DataFrame:
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(docs, columns=["doc_id", "source", "text"]),
    )
    return (
        con.sql(_pack_sequences_sql(DUCKDB))
        .fetchdf()
        .sort_values("doc_id")
        .set_index("doc_id")
    )


def check(docs: list[tuple[int, str, str]]) -> pd.DataFrame:
    got = run_duck(docs)
    exp = ref_pack(docs)
    assert set(got.index) == set(exp)
    for did, e in exp.items():
        g = (
            got.loc[did, "n_tokens"],
            got.loc[did, "bin_id"],
            got.loc[did, "bin_offset"],
            got.loc[did, "spans_boundary"],
        )
        assert g == e, (did, g, e)
    return got


def test_pack_matches_python_reference():
    docs = [
        (i, f"src{i % 3}", " ".join(f"w{j}" for j in range(10 + (i * 37) % 300)))
        for i in range(60)
    ]
    check(docs)


def test_pack_exact_boundary_doc_starts_next_bin():
    w = CONTEXT_TOKENS
    docs = [
        (0, "s", "x " * w),      # fills bin 0 exactly
        (1, "s", "y y y"),       # must start bin 1 at offset 0
    ]
    got = check(docs)
    assert got.loc[0, "bin_id"] == 0 and got.loc[0, "bin_offset"] == 0
    assert got.loc[0, "spans_boundary"] == 0  # exact fit does not span
    assert got.loc[1, "bin_id"] == 1 and got.loc[1, "bin_offset"] == 0


def test_pack_giant_doc_spans_multiple_bins():
    docs = [
        (0, "s", "a a a"),                       # offset 0
        (1, "s", "b " * (3 * CONTEXT_TOKENS)),   # spans >= 3 bins
        (2, "s", "c"),
    ]
    got = check(docs)
    assert got.loc[1, "spans_boundary"] == 1
    assert got.loc[2, "bin_id"] == 3  # 3 + 3*CT tokens before it


def test_pack_sources_are_independent_streams():
    docs = [
        (0, "a", "x " * 10),
        (1, "b", "y " * 10),
    ]
    got = check(docs)
    assert got.loc[0, "bin_offset"] == 0
    assert got.loc[1, "bin_offset"] == 0


def test_pack_empty_doc_is_zero_width():
    docs = [(0, "s", "x " * 5), (1, "s", ""), (2, "s", "z " * 5)]
    got = check(docs)
    assert got.loc[1, "n_tokens"] == 0
    assert got.loc[1, "bin_offset"] == 5
    assert got.loc[2, "bin_offset"] == 5  # empty doc consumed no budget
