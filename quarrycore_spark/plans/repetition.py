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

# corpus_dup_lines: a line is "boilerplate" when it appears in at least
# this many distinct documents (C4 uses "more than once"; 3 keeps the
# planted signal unambiguous against accidental synthetic-text repeats).
MIN_DOCS_FOR_DUP = 3


# Shared dual-dialect fragments (moved to functions/textfrag.py to break
# the plans-module import cycle); re-exported here for back-compat.
from quarrycore_spark.functions.textfrag import (  # noqa: F401
    _distinct_size,
    _dup_milli,
    _lines,
    _ngrams,
    _size,
    _words,
)


# Thresholds + planted-line augmentation (moved to functions/plants.py
# to break the plans-module import cycle); re-exported for back-compat.
from quarrycore_spark.functions.plants import (  # noqa: E402,F401
    DUP_2GRAM_MILLI_MAX,
    DUP_3GRAM_MILLI_MAX,
    DUP_LINE_MILLI_MAX,
    repetition_augmented_cte,
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


def _clean_dup_lines(dialect: str) -> str:
    """The C4 removal TRANSFORM: `corpus_dup_lines` detects boilerplate
    lines; this query actually deletes them and hands back the cleaned
    text, preserving the surviving lines' original order.

    Shape at 100 TB: positional explode → the same two-stage dup-line
    aggregate → one LEFT hash join on the line value (flag, not filter,
    so removal counts ride the same pass) → ONE groupBy(doc_id) that
    re-assembles the text from (pos, line) pairs. Order is restored
    inside the aggregate (array_sort over structs / string_agg ORDER BY
    pos), so no extra sort exchange; the assembled text crosses exactly
    one shuffle, keyed by doc_id — the minimum for a per-doc rebuild.
    A doc whose every line is boilerplate still emits a row (empty
    clean_text, coalesce-pinned in both dialects)."""
    if dialect == SPARK:
        pos_explode = (
            "SELECT doc_id, pos, line FROM _l "
            "LATERAL VIEW posexplode(lns) t AS pos, line"
        )
        # array_sort over (pos, is_dup, line) structs orders by pos
        # (unique per doc), then surviving lines join in order.
        assemble = (
            "array_join(transform(filter(array_sort("
            "collect_list(struct(pos, is_dup, line))), "
            "s -> s.is_dup = 0), s -> s.line), chr(10))"
        )
    else:
        pos_explode = (
            "SELECT doc_id, generate_subscripts(lns, 1) AS pos, "
            "unnest(lns) AS line FROM _l"
        )
        assemble = (
            "coalesce(string_agg(CASE WHEN is_dup = 0 THEN line END, "
            "chr(10) ORDER BY pos), '')"
        )
    return f"""
WITH {repetition_augmented_cte(dialect)},
_l AS (SELECT doc_id, {_lines("atext", dialect)} AS lns FROM _aug),
_e AS ({pos_explode}),
_d AS (SELECT line FROM _e GROUP BY line
       HAVING count(DISTINCT doc_id) >= {MIN_DOCS_FOR_DUP}),
_f AS (SELECT e.doc_id, e.pos, e.line,
              CASE WHEN d.line IS NULL THEN 0 ELSE 1 END AS is_dup
       FROM _e e LEFT JOIN _d d ON e.line = d.line)
SELECT doc_id,
       {assemble} AS clean_text,
       cast(sum(1 - is_dup) as int) AS n_kept,
       cast(sum(is_dup) as int) AS n_removed
FROM _f
GROUP BY doc_id
"""


register(
    Query(
        "clean_dup_lines",
        "C4-style boilerplate-line REMOVAL transform: drop lines shared "
        "by >= 3 docs and re-assemble the cleaned text in original line "
        "order; posexplode + hash agg + one left join + one doc_id "
        "re-assembly shuffle",
        _clean_dup_lines,
    )
)
