"""Filter-funnel retention report: the observability operator every
staged cleaning pipeline runs before committing a 100 TB pass.

Published webtext pipelines (C4, Gopher/MassiveText, CCNet, RefinedWeb)
all apply their document filters as an ordered cascade and publish the
per-stage retention table — "N docs in, N docs out, N dropped" per rule —
because that table is how you notice one mis-tuned threshold silently
deleting half the corpus. The reference keeps per-stage counters too
(pipeline.py's processed/rejected tallies riding each stage); this is
that report as one declarative query.

Stages (each condition is the SAME expression the standalone operator
query uses — the funnel is a composition, not a re-derivation):

  1. min_length   — length gate at CFG.min_text_len (LengthScorer,
                    reference scorers.py:74-84; C4's short-page rule).
  2. quality      — the integerized P11 quality gate from `text_quality`
                    (30*len_ok + 40*lang_en renormalized, >= 60).
  3. not_repetitive — Gopher rule-C flags from `doc_repetition`
                    (duplicate line / 2-gram / 3-gram milli fractions).
  4. pii_clean    — zero PII pattern hits, from `pii_scan`.

The corpus is augmented with BOTH deterministic plants (repetition lines
then PII suffixes, chained CTEs) so stages 3 and 4 demonstrably fire at
every sf; stages 1-2 fire on the real length/lang mix.

Scale shape: one pass computes all four flags per doc (pure codegen
column expressions — the repetition arrays and the regexp counts fuse
into the same WholeStageCodegen projection), then ONE aggregation
reduces the corpus to five counters; the report rows are constants
unioned over that single-row aggregate. At 100 TB this is exactly one
scan + one all-to-one agg — the minimum possible for a corpus-wide
census — and it is ~free to ride alongside any real cleaning job.
"""

from __future__ import annotations

from quarrycore_spark.config import DEFAULT_CONFIG as CFG
from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.functions.textfrag import (
    _distinct_size,
    _dup_milli,
    _lines,
    _ngrams,
    _size,
    _words,
)
from quarrycore_spark.functions.plants import (
    DUP_2GRAM_MILLI_MAX,
    DUP_3GRAM_MILLI_MAX,
    DUP_LINE_MILLI_MAX,
    PII_PATTERNS,
    pii_augmented_cte,
    regexp_count,
    repetition_augmented_cte,
)
from quarrycore_spark.plans.registry import Query, register

# Stage names, in cascade order. Index 0 is the pre-filter baseline.
STAGES = ("total", "min_length", "quality", "not_repetitive", "pii_clean")


def _quality_flag(dialect: str) -> str:
    """The `text_quality` gate on the augmented text: renormalized
    (30*len_ok + 40*lang_en)*100/70 >= CFG.min_quality_scaled."""
    d = "div" if dialect == SPARK else "//"
    len_ok = f"case when length(atext) > {CFG.min_text_len} then 1 else 0 end"
    lang_en = "case when lang = 'en' then 1 else 0 end"
    score = f"(((30 * ({len_ok}) + 40 * ({lang_en})) * 100) {d} 70)"
    return f"case when {score} >= {CFG.min_quality_scaled} then 1 else 0 end"


def _repetition_flag(dialect: str) -> str:
    """1 when NONE of the Gopher rule-C milli fractions exceeds its
    threshold — the complement of doc_repetition's is_repetitive."""
    g2 = _ngrams("w", "nw", 2, dialect)
    g3 = _ngrams("w", "nw", 3, dialect)
    line_milli = _dup_milli("nl", _distinct_size("ln", dialect), dialect)
    g2_milli = _dup_milli(
        _size(g2, dialect), _distinct_size(g2, dialect), dialect
    )
    g3_milli = _dup_milli(
        _size(g3, dialect), _distinct_size(g3, dialect), dialect
    )
    return (
        f"case when {line_milli} <= {DUP_LINE_MILLI_MAX} "
        f"and {g2_milli} <= {DUP_2GRAM_MILLI_MAX} "
        f"and {g3_milli} <= {DUP_3GRAM_MILLI_MAX} then 1 else 0 end"
    )


def _filter_funnel(dialect: str) -> str:
    pii_total = " + ".join(
        regexp_count("atext", p, dialect) for p in PII_PATTERNS.values()
    )
    # The report joins the ONE-row aggregate against a 5-row inline stage
    # table instead of UNION ALL-ing five selects over _agg: Spark inlines
    # (does not materialize) CTEs, so the union form would re-run the
    # whole flag pass — five corpus scans at 100 TB — once per branch.
    values = ", ".join(f"({i}, '{s}')" for i, s in enumerate(STAGES))
    if dialect == SPARK:
        stage_table = f"SELECT * FROM VALUES {values} AS t(stage_idx, stage)"
    else:
        stage_table = f"SELECT * FROM (VALUES {values}) t(stage_idx, stage)"
    ns = ["n0"] + [f"n{i}" for i in range(len(STAGES) - 1)]  # docs_in per stage
    docs_in = "CASE stage_idx " + " ".join(
        f"WHEN {i} THEN {n}" for i, n in enumerate(ns)
    ) + " END"
    docs_out = "CASE stage_idx " + " ".join(
        f"WHEN {i} THEN n{i}" for i in range(len(STAGES))
    ) + " END"
    report = (
        f"SELECT stage_idx, stage,\n"
        f"       cast({docs_in} as int) AS docs_in,\n"
        f"       cast({docs_out} as int) AS docs_out,\n"
        f"       cast(({docs_in}) - ({docs_out}) as int) AS dropped\n"
        f"FROM _agg CROSS JOIN _stages"
    )
    return f"""
WITH {repetition_augmented_cte(dialect, name="_aug_rep", passthrough=("lang",))},
{pii_augmented_cte(dialect, name="_aug", src="_aug_rep", text_col="atext", passthrough=("lang",))},
_t AS (SELECT doc_id, atext, lang,
              {_lines("atext", dialect)} AS ln,
              {_words("atext", dialect)} AS w
       FROM _aug),
_f AS (SELECT doc_id, atext, lang, ln, w,
              {_size("ln", dialect)} AS nl, {_size("w", dialect)} AS nw
       FROM _t),
_flags AS (SELECT doc_id,
       case when length(atext) > {CFG.min_text_len} then 1 else 0 end AS f1,
       {_quality_flag(dialect)} AS f2,
       {_repetition_flag(dialect)} AS f3,
       case when ({pii_total}) = 0 then 1 else 0 end AS f4
FROM _f),
_agg AS (SELECT count(*) AS n0,
                sum(f1) AS n1,
                sum(f1 * f2) AS n2,
                sum(f1 * f2 * f3) AS n3,
                sum(f1 * f2 * f3 * f4) AS n4
         FROM _flags),
_stages AS ({stage_table})
{report}
"""


register(
    Query(
        "filter_funnel",
        "Staged filter-cascade retention report (C4/Gopher-style): "
        "length -> quality -> repetition -> PII, cumulative docs_in/"
        "docs_out/dropped per stage; one codegen flag pass + ONE "
        "aggregation over the whole corpus",
        _filter_funnel,
    )
)
