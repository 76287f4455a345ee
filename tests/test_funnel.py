"""Filter-funnel retention report (plans/funnel.py): pure-Python
simulation of the cascade pinned against the DuckDB dialect. Spark-vs-
DuckDB parity over the real sf0.01 corpus is covered by
test_oracle_parity's registry sweep."""

from __future__ import annotations

import re

import duckdb
import pandas as pd

from quarrycore_spark.config import DEFAULT_CONFIG as CFG
from quarrycore_spark.functions.dialect import DUCKDB
from quarrycore_spark.plans.classify import PII_PATTERNS, pii_augmented_cte
from quarrycore_spark.plans.funnel import STAGES, _filter_funnel
from quarrycore_spark.plans.repetition import (
    DUP_2GRAM_MILLI_MAX,
    DUP_3GRAM_MILLI_MAX,
    DUP_LINE_MILLI_MAX,
    repetition_augmented_cte,
)

LANGS = ["en", "de", "zh", "en", "fr"]
TEXTS = [
    "short",
    # long, lexically diverse -> passes length + repetition gates
    " ".join(f"alpha{i} beta{i}" for i in range(60)),
    ("line a\nline b\n" * 40),  # long AND repetitive
    " ".join(f"gamma{i} delta{i} eps{i}" for i in range(50)),
    "z",
]


def docs_df(n: int = 50) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": list(range(n)),
            "text": [TEXTS[i % len(TEXTS)] for i in range(n)],
            "lang": [LANGS[i % len(LANGS)] for i in range(n)],
        }
    )


def run_duck(sql: str, docs: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", docs)
    return con.sql(sql).fetchdf()


def augmented(docs: pd.DataFrame) -> dict[int, str]:
    """The funnel's chained augmentation: repetition plants, then PII."""
    sql = (
        f"WITH {repetition_augmented_cte(DUCKDB, name='_aug_rep')},\n"
        f"{pii_augmented_cte(DUCKDB, name='_aug', src='_aug_rep', text_col='atext')}\n"
        f"SELECT doc_id, atext FROM _aug"
    )
    rows = run_duck(sql, docs)
    return dict(zip(rows["doc_id"], rows["atext"]))


def dup_milli(total: int, uniq: int) -> int:
    return 0 if total == 0 else ((total - uniq) * 1000) // total


def ref_flags(atext: str, lang: str) -> tuple[int, int, int, int]:
    f1 = int(len(atext) > CFG.min_text_len)
    score = ((30 * f1 + 40 * int(lang == "en")) * 100) // 70
    f2 = int(score >= CFG.min_quality_scaled)
    lines = [ln.strip() for ln in atext.split("\n") if ln.strip()]
    words = atext.split()
    g2 = [" ".join(words[i : i + 2]) for i in range(len(words) - 1)]
    g3 = [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
    f3 = int(
        dup_milli(len(lines), len(set(lines))) <= DUP_LINE_MILLI_MAX
        and dup_milli(len(g2), len(set(g2))) <= DUP_2GRAM_MILLI_MAX
        and dup_milli(len(g3), len(set(g3))) <= DUP_3GRAM_MILLI_MAX
    )
    f4 = int(
        sum(len(re.findall(p, atext)) for p in PII_PATTERNS.values()) == 0
    )
    return f1, f2, f3, f4


def ref_funnel(docs: pd.DataFrame) -> list[tuple[int, str, int, int, int]]:
    atexts = augmented(docs)
    flags = [
        ref_flags(atexts[r.doc_id], r.lang) for r in docs.itertuples()
    ]
    counts = [len(flags)]
    for k in range(4):
        counts.append(sum(1 for f in flags if all(f[: k + 1])))
    out = []
    for i, stage in enumerate(STAGES):
        prev = counts[i - 1] if i else counts[0]
        out.append((i, stage, prev, counts[i], prev - counts[i]))
    return out


def test_funnel_matches_python_reference():
    docs = docs_df()
    got = run_duck(_filter_funnel(DUCKDB), docs)
    got = got.sort_values("stage_idx").reset_index(drop=True)
    exp = ref_funnel(docs)
    assert len(got) == len(STAGES)
    for row, e in zip(got.itertuples(), exp):
        assert (
            row.stage_idx,
            row.stage,
            row.docs_in,
            row.docs_out,
            row.dropped,
        ) == e


def test_funnel_is_monotone_and_conserves_counts():
    docs = docs_df()
    got = run_duck(_filter_funnel(DUCKDB), docs).sort_values("stage_idx")
    outs = list(got["docs_out"])
    assert outs[0] == len(docs)
    assert all(a >= b for a, b in zip(outs, outs[1:]))  # non-increasing
    assert (got["docs_in"] - got["docs_out"] == got["dropped"]).all()
    # cascade chaining: stage k's docs_in is stage k-1's docs_out
    ins = list(got["docs_in"])
    assert ins[1:] == outs[:-1]


def test_funnel_every_stage_fires_on_fixtures():
    got = run_duck(_filter_funnel(DUCKDB), docs_df())
    per_stage = dict(zip(got["stage"], got["dropped"]))
    for stage in STAGES[1:]:
        assert per_stage[stage] > 0, f"stage {stage} dropped nothing"
