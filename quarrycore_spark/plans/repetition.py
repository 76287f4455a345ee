"""Repetition filters for web-text training pipelines, as paired
Spark/DuckDB queries over the `documents` table.

Two classic webtext-cleaning operators the reference corpus pipeline
would need at 100 TB (graft additions beyond the reference inventory;
the reference's quality layer stops at length/ratio scoring,
quality/scorers — these are the published next tier):

* `doc_repetition` — within-document repetition signals in the style of
  Gopher/MassiveText rule C (Rae et al. 2021, table A1): the fraction
  of duplicate lines and duplicate word 2-/3-grams per document, plus a
  removal flag at Gopher-inspired thresholds. Pure per-row projection —
  array ops inside whole-stage codegen, NO shuffle, embarrassingly
  parallel at any scale.
* `corpus_dup_lines` — cross-document line deduplication in the style
  of C4 (Raffel et al. 2020: drop any three-sentence span occurring
  more than once in the corpus; here the unit is the trimmed line):
  per document, how many of its distinct lines occur in >= 3 distinct
  documents. One explode + one hash-aggregate + one hash join, all on
  the line value: map-side partial aggregation absorbs boilerplate
  mega-lines (the count-distinct is a two-stage agg over (line,
  doc_id), so a line shared by 10^9 docs never lands on one task as a
  row list), and the join back to docs broadcasts nothing — both sides
  are hash-partitioned on the line.

Both queries run the REAL operator expressions in BOTH dialects over
the sf text augmented with deterministic doc_id-derived lines, so the
metrics demonstrably fire at every sf (the synthetic corpus texts are
single-line and corpus-unique; without planted lines every fraction
would be 0 and the value hash vacuous). The no-floats rule holds:
fractions are exact milli-units via integer floor division.
"""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.plans.registry import Query, register

# Gopher-inspired removal thresholds, in milli-units of the
# distinct-fraction variants computed here (MassiveText uses 0.30 for
# duplicate line FRACTION; the n-gram rules there are char-mass based —
# the distinct-count variant is the shuffle-free per-row analogue).
DUP_LINE_MILLI_MAX = 300
DUP_2GRAM_MILLI_MAX = 200
DUP_3GRAM_MILLI_MAX = 180

# corpus_dup_lines: a line is "boilerplate" when it appears in at least
# this many distinct documents (C4 uses "more than once"; 3 keeps the
# planted signal unambiguous against accidental synthetic-text repeats).
MIN_DOCS_FOR_DUP = 3


def _words(expr: str, dialect: str) -> str:
    """Non-whitespace runs of the raw text (python str.split parity)."""
    if dialect == SPARK:
        return f"regexp_extract_all({expr}, '\\\\S+', 0)"
    return f"regexp_extract_all({expr}, '\\S+')"


def _lines(expr: str, dialect: str) -> str:
    """Trimmed non-empty lines of the text."""
    if dialect == SPARK:
        split = f"split({expr}, chr(10))"
        return f"filter(transform({split}, x -> trim(x)), x -> x != '')"
    split = f"string_split({expr}, chr(10))"
    return f"list_filter(list_transform({split}, x -> trim(x)), x -> x != '')"


def _ngrams(arr: str, n_expr: str, k: int, dialect: str) -> str:
    """Word k-grams of array `arr` whose length is `n_expr`; empty when
    fewer than k words (guarded: Spark's sequence(1, 0) would DESCEND)."""
    if dialect == SPARK:
        parts = " , ' ', ".join(f"element_at({arr}, i + {j})" for j in range(k))
        body = f"transform(sequence(1, {n_expr} - {k - 1}), i -> concat({parts}))"
        return f"case when {n_expr} < {k} then array() else {body} end"
    parts = " || ' ' || ".join(f"{arr}[i + {j}]" for j in range(k))
    body = f"list_transform(range(1, {n_expr} - {k - 2}), i -> {parts})"
    return f"case when {n_expr} < {k} then [] else {body} end"


def _distinct_size(arr: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"size(array_distinct({arr}))"
    return f"cast(len(list_distinct({arr})) as int)"


def _size(arr: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"size({arr})"
    return f"cast(len({arr}) as int)"


def _dup_milli(total: str, uniq: str, dialect: str) -> str:
    """((total - distinct) * 1000) // total, 0 for empty."""
    d = "div" if dialect == SPARK else "//"
    return (
        f"cast(case when {total} = 0 then 0 "
        f"else (({total} - {uniq}) * 1000) {d} {total} end as int)"
    )


def repetition_augmented_cte(dialect: str) -> str:
    """CTE `_aug`: doc_id, atext = text + deterministic planted lines.

    Per doc_id i: `i % 5` copies of one fixed line (within-doc duplicate
    lines), `i % 3` unique lines salted with doc_id (distinct mass), a
    repeated ' spam ham' run of length `i % 6` (duplicate 2-/3-grams),
    and two corpus-boilerplate lines gated on i%4=0 / i%7=2 (cross-doc
    duplicates for corpus_dup_lines). All pieces are newline-joined so
    the line split actually has work to do at every sf."""
    nl = "chr(10)"
    dup_line = f"repeat({nl} || 'dup line alpha beta', cast(doc_id % 5 as int))"
    uniq1 = (
        f"case when doc_id % 3 >= 1 then {nl} || 'uniq ' || doc_id || ' one' "
        f"else '' end"
    )
    uniq2 = (
        f"case when doc_id % 3 >= 2 then {nl} || 'uniq ' || doc_id || ' two' "
        f"else '' end"
    )
    spam = f"repeat(' spam ham', cast(doc_id % 6 as int))"
    boiler1 = (
        f"case when doc_id % 4 = 0 then {nl} || 'copyright boilerplate row' "
        f"else '' end"
    )
    boiler2 = (
        f"case when doc_id % 7 = 2 then {nl} || 'subscribe to our newsletter' "
        f"else '' end"
    )
    return (
        f"_aug AS (SELECT doc_id, "
        f"text || {spam} || {dup_line} || {uniq1} || {uniq2} "
        f"|| {boiler1} || {boiler2} AS atext FROM documents)"
    )


def _doc_repetition(dialect: str) -> str:
    w = "w"
    lines = "ln"
    g2 = _ngrams(w, "nw", 2, dialect)
    g3 = _ngrams(w, "nw", 3, dialect)
    return f"""
WITH {repetition_augmented_cte(dialect)},
_t AS (SELECT doc_id, {_lines("atext", dialect)} AS {lines},
              {_words("atext", dialect)} AS {w}
       FROM _aug),
_n AS (SELECT doc_id, {lines}, {w},
              {_size(lines, dialect)} AS nl, {_size(w, dialect)} AS nw
       FROM _t),
_g AS (SELECT doc_id, nl, nw,
              {_distinct_size(lines, dialect)} AS ul,
              {_distinct_size(g2, dialect)} AS u2,
              {_size(g2, dialect)} AS n2,
              {_distinct_size(g3, dialect)} AS u3,
              {_size(g3, dialect)} AS n3
       FROM _n)
SELECT doc_id,
       cast(nl as int) AS n_lines,
       cast(nw as int) AS n_words,
       {_dup_milli("nl", "ul", dialect)} AS dup_line_milli,
       {_dup_milli("n2", "u2", dialect)} AS dup_2gram_milli,
       {_dup_milli("n3", "u3", dialect)} AS dup_3gram_milli,
       cast(CASE WHEN {_dup_milli("nl", "ul", dialect)} > {DUP_LINE_MILLI_MAX}
                   OR {_dup_milli("n2", "u2", dialect)} > {DUP_2GRAM_MILLI_MAX}
                   OR {_dup_milli("n3", "u3", dialect)} > {DUP_3GRAM_MILLI_MAX}
            THEN 1 ELSE 0 END as int) AS is_repetitive
FROM _g
"""


register(
    Query(
        "doc_repetition",
        "Within-doc repetition signals (Gopher/MassiveText rule C "
        "analogue): duplicate line / word 2-gram / 3-gram fractions in "
        "milli-units + removal flag; per-row projection, no shuffle",
        _doc_repetition,
    )
)


def _corpus_dup_lines(dialect: str) -> str:
    if dialect == SPARK:
        explode = "SELECT doc_id, explode(lns) AS line FROM _l"
    else:
        explode = "SELECT doc_id, unnest(lns) AS line FROM _l"
    return f"""
WITH {repetition_augmented_cte(dialect)},
_l AS (SELECT doc_id, {_lines("atext", dialect)} AS lns FROM _aug),
_e AS ({explode}),
_d AS (SELECT line FROM _e GROUP BY line
       HAVING count(DISTINCT doc_id) >= {MIN_DOCS_FOR_DUP}),
_per AS (SELECT e.doc_id,
                count(*) AS n_line_occurrences,
                count(DISTINCT e.line) AS n_distinct_lines,
                count(DISTINCT d.line) AS n_boilerplate_lines
         FROM _e e LEFT JOIN _d d ON e.line = d.line
         GROUP BY e.doc_id)
SELECT doc_id,
       cast(n_line_occurrences as int) AS n_line_occurrences,
       cast(n_distinct_lines as int) AS n_distinct_lines,
       cast(n_boilerplate_lines as int) AS n_boilerplate_lines,
       {_dup_milli("n_distinct_lines",
                   "(n_distinct_lines - n_boilerplate_lines)", dialect)}
           AS boilerplate_milli
FROM _per
"""


register(
    Query(
        "corpus_dup_lines",
        "Cross-document duplicate-line detection (C4-style boilerplate "
        "removal): per doc, distinct lines shared by >= 3 documents; "
        "explode + two-stage hash agg + hash join on the line value",
        _corpus_dup_lines,
    )
)
