"""Shared dual-dialect SQL fragments over text/arrays.

These snippet builders are consumed by several registered query modules
(repetition, decontam, rarity, heavyhitters, packing, funnel). They live
here — outside `plans/` — because `plans/*` modules import the registry,
and the registry's registration-side-effect block imports every `plans/*`
module: a helper defined in one plans module and imported by another is a
circular import whenever the defining module is the interpreter's entry
point (e.g. pytest collecting tests/test_repetition.py first).

Names keep the leading underscore they had in `plans/repetition.py`
(their original home) so call sites read unchanged; `plans/repetition.py`
re-exports them for back-compat.
"""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK


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


def _sum_elem_lengths(arr: str, dialect: str) -> str:
    """Total characters across a string-array's elements, 0 when empty
    (shared by the Gopher mean-word-length and C4 kept-char-mass rules)."""
    if dialect == SPARK:
        return f"aggregate({arr}, 0L, (acc, x) -> acc + length(x))"
    return f"coalesce(list_sum(list_transform({arr}, x -> length(x))), 0)"
