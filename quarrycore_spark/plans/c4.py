"""C4-style line/document cleaning census, as a paired Spark/DuckDB query.

The C4 corpus rules (Raffel et al. 2020, §2.2) are the other canonical
published webtext cleaning recipe next to Gopher (plans/gopher.py) and
the line-dedup family (plans/repetition.py). Implemented here as one
declarative per-document census:

  line rules (a line survives when ALL hold):
    L1  ends in terminal punctuation  . ! ? "
    L2  has at least 5 words
    L3  does not contain 'javascript' (case-insensitive)
  document rules:
    D1  at least 3 surviving lines
    D2  does not contain '{' (code pages)
    D3  does not contain 'lorem ipsum' (case-insensitive)

Output: per-doc line counts (total / terminal-punct / short / js /
kept), kept-character mass, the three document flags, and `c4_keep` —
so a cleaning pass can both filter and publish the per-rule attrition
table (the funnel pattern). All counts are exact integers; no floats
anywhere (repo no-floats rule), so Spark and DuckDB hash identically.

Synthesis device: the sf corpus texts are single-line prose, so the
line rules would be vacuous without augmentation. Deterministic
doc_id-derived plants exercise BOTH branches of every rule: good
sentences (i%2=0), short lines (i%4=1), unterminated lines (i%5=2),
'javascript' boilerplate lines (i%6=1), a '{' (i%9=2), and a
'Lorem ipsum' marker (i%10=3).

Scale shape: pure per-row projection — line split, per-line word count,
and every rule fuse into one WholeStageCodegen stage; NO shuffle, NO
UDF. At 10^12 docs this is one corpus scan, which is the floor for any
document census.
"""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.functions.textfrag import (
    _lines,
    _size,
    _sum_elem_lengths,
)
from quarrycore_spark.plans.registry import Query, register

MIN_WORDS_PER_LINE = 5
MIN_KEPT_LINES = 3


def c4_augmented_cte(dialect: str, name: str = "_aug",
                     src: str = "documents") -> str:
    """CTE `{name}`: doc_id, atext = text + deterministic planted lines
    hitting both branches of every C4 rule at every sf. The base text is
    terminated with '.' so the real prose itself forms one candidate
    line whose L1/L2 outcome varies with the corpus mix."""
    nl = "chr(10)"
    good = (
        f"case when doc_id % 2 = 0 then {nl} || "
        f"'This planted sentence has more than five words.' || {nl} || "
        f"'Another planted sentence with enough words follows.' || {nl} || "
        f"'A third good sentence keeps this document alive.' else '' end"
    )
    short = (
        f"case when doc_id % 4 = 1 then {nl} || 'Too short.' else '' end"
    )
    unterminated = (
        f"case when doc_id % 5 = 2 then {nl} || "
        f"'this line never ends with terminal punctuation' else '' end"
    )
    js = (
        f"case when doc_id % 6 = 1 then {nl} || "
        f"'Please enable JavaScript to view the comments powered here.' "
        f"else '' end"
    )
    brace = f"case when doc_id % 9 = 2 then {nl} || 'function() {{' else '' end"
    lorem = (
        f"case when doc_id % 10 = 3 then {nl} || "
        f"'Lorem ipsum dolor sit amet, consectetur adipiscing elit.' "
        f"else '' end"
    )
    return (
        f"{name} AS (SELECT doc_id, text || '.' || {good} || {short} || "
        f"{unterminated} || {js} || {brace} || {lorem} AS atext FROM {src})"
    )


def _line_words(dialect: str) -> str:
    """Per-line word count, usable inside a line-array lambda on `x`."""
    if dialect == SPARK:
        return r"size(regexp_extract_all(x, '\\S+', 0))"
    return r"len(regexp_extract_all(x, '\S+'))"


def _count_where(arr: str, cond: str, dialect: str) -> str:
    """Number of array elements satisfying a lambda condition on `x`."""
    if dialect == SPARK:
        return f"size(filter({arr}, x -> {cond}))"
    return f"cast(len(list_filter({arr}, x -> {cond})) as int)"


def _c4_line_filter(dialect: str) -> str:
    # Rule predicates as lambda conditions over a trimmed line `x`.
    if dialect == SPARK:
        terminal = "x rlike '[.!?\"]$'"
    else:
        terminal = "regexp_matches(x, '[.!?\"]$')"
    enough_words = f"{_line_words(dialect)} >= {MIN_WORDS_PER_LINE}"
    no_js = "NOT lower(x) LIKE '%javascript%'"
    keep = f"({terminal}) AND ({enough_words}) AND ({no_js})"
    kept_arr = (
        f"filter(ln, x -> {keep})" if dialect == SPARK
        else f"list_filter(ln, x -> {keep})"
    )
    cast_big = "bigint"
    return f"""
WITH {c4_augmented_cte(dialect)},
_t AS (SELECT doc_id, atext, {_lines('atext', dialect)} AS ln FROM _aug),
_m AS (SELECT doc_id, atext, ln, {kept_arr} AS kept FROM _t),
_r AS (SELECT doc_id,
              {_size('ln', dialect)} AS n_lines,
              {_count_where('ln', terminal, dialect)} AS n_terminal_lines,
              {_count_where('ln', f'NOT ({enough_words})', dialect)} AS n_short_lines,
              {_count_where('ln', f'NOT ({no_js})', dialect)} AS n_js_lines,
              {_size('kept', dialect)} AS n_kept_lines,
              cast({_sum_elem_lengths('kept', dialect)} as {cast_big}) AS kept_chars,
              case when atext LIKE '%{{%' then 1 else 0 end AS has_brace,
              case when lower(atext) LIKE '%lorem ipsum%' then 1 else 0 end
                  AS has_lorem
       FROM _m)
SELECT doc_id, n_lines, n_terminal_lines, n_short_lines, n_js_lines,
       n_kept_lines, kept_chars, has_brace, has_lorem,
       cast(case when n_kept_lines >= {MIN_KEPT_LINES}
                  and has_brace = 0 and has_lorem = 0
            then 1 else 0 end as int) AS c4_keep
FROM _r
"""


register(Query(
    "c4_line_filter",
    "C4 line/document cleaning census (Raffel et al. 2020 §2.2)",
    _c4_line_filter,
))
