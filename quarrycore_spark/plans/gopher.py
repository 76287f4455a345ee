"""Gopher rule-A/B document quality flags, as a paired Spark/DuckDB query.

`doc_repetition` (plans/repetition.py) covers MassiveText rule C
(within-doc repetition). This module adds the other half of the
published Gopher document-filter table (Rae et al. 2021, table A1) —
the word/line shape rules every 100-TB webtext pass applies before any
dedup work, and the natural extension of the reference's quality layer
(reference quality/scorers.py stops at length/ratio scoring):

  A1  word count in [50, 100_000]
  A2  mean word length in [3, 10] chars
  A3  symbol-to-word ratio ('#' or ellipsis) <= 0.1
  A4  fraction of lines starting with a bullet <= 0.9
  A5  fraction of lines ending with an ellipsis <= 0.3
  A6  fraction of words containing an alphabetic char >= 0.8
  B   at least 2 distinct "stop words" present (the, be, to, of, and,
      that, have, with)

All ratios are exact integer milli-units (floor division) so the Spark
plan and the DuckDB oracle hash bit-identically — the repo-wide
no-floats rule. One flag column per rule plus the AND of all seven
(`gopher_pass`), so a downstream filter can drop documents or audit
per-rule attrition (the funnel pattern).

Synthesis device: the sf corpus texts are clean single-line English, so
without augmentation rules A3-A6 would never fire and the value hash
would be vacuous. Each doc therefore gets deterministic doc_id-derived
plants exercising BOTH branches of every rule: bullet lines (i%5=0),
ellipsis-terminated lines (i%7=1), '#' symbol runs (i%3=2), all-numeric
word runs (i%11=3), and a long-word run (i%13=4). The stopword and
word-count rules fire on the real text mix.

Scale shape: pure per-row projection — the word/line arrays and every
rule fuse into one WholeStageCodegen stage; NO shuffle, NO UDF,
embarrassingly parallel at 10^12 docs. This is the cheapest possible
form of the operator: one corpus scan, flags out.
"""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.functions.plants import regexp_count
from quarrycore_spark.functions.textfrag import (
    _lines,
    _size,
    _sum_elem_lengths,
    _words,
)
from quarrycore_spark.plans.registry import Query, register

# Thresholds from Rae et al. 2021 table A1, in the units used here.
MIN_WORDS = 50
MAX_WORDS = 100_000
MEAN_WORD_LEN_MILLI_MIN = 3_000   # 3 chars
MEAN_WORD_LEN_MILLI_MAX = 10_000  # 10 chars
SYMBOL_MILLI_MAX = 100            # 0.1 symbols per word
BULLET_MILLI_MAX = 900            # 90% of lines
ELLIPSIS_MILLI_MAX = 300          # 30% of lines
ALPHA_MILLI_MIN = 800             # 80% of words
STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
MIN_STOPWORDS = 2


def gopher_augmented_cte(dialect: str, name: str = "_aug",
                         src: str = "documents") -> str:
    """CTE `{name}`: doc_id, atext = text + deterministic plants that
    make both branches of rules A3-A6 reachable at every sf."""
    nl = "chr(10)"
    d = "div" if dialect == SPARK else "//"
    # i%5=0: three bullet lines (rule A4 numerator; also line mass).
    # i%25=0: a 30-line bullet flood that pushes the bullet fraction past
    # the 0.9 ceiling so rule A4's failing branch is reachable.
    bullets = (
        f"case when doc_id % 25 = 0 then "
        f"repeat({nl} || '- bullet filler item', 30) "
        f"when doc_id % 5 = 0 then {nl} || '- item alpha' || {nl} || "
        f"'* item beta' || {nl} || '- item gamma' else '' end"
    )
    # i%7=1: two ellipsis-terminated lines (rule A5 numerator).
    ellipsis = (
        f"case when doc_id % 7 = 1 then {nl} || 'read more...' || {nl} || "
        f"'continued...' else '' end"
    )
    # i%3=2: '#' symbol run scaled by doc_id (rule A3 numerator).
    hashes = (
        f"case when doc_id % 3 = 2 then "
        f"repeat(' #tag', cast(1 + doc_id % 9 as int)) else '' end"
    )
    # i%11=3: numeric-word run (rule A6 denominator without alpha chars).
    numerics = (
        f"case when doc_id % 11 = 3 then "
        f"repeat(' 4711', cast(2 + doc_id % 7 as int)) else '' end"
    )
    # i%13=4: long-word run sized to the doc (~nw/2 45-char words) so the
    # mean word length provably exceeds 10 regardless of the doc's own
    # word mass; i%17=5: 1-char-word flood (~5nw/3 words) dragging the
    # mean below 3 — the two failing branches of rule A2.
    longwords = (
        f"case when doc_id % 13 = 4 then "
        f"repeat(' pneumonoultramicroscopicsilicovolcanoconiosis', "
        f"cast(2 + n_chars {d} 10 as int)) else '' end"
    )
    shortwords = (
        f"case when doc_id % 17 = 5 then "
        f"repeat(' a b', cast(2 + n_chars {d} 6 as int)) else '' end"
    )
    # i%2=1: stopword-rich sentence (rule B passing branch — the corpus
    # vocabulary contains only 'the' of the 8 Gopher stop words, so even
    # ids fail rule B on the real text and odd ids pass on the plant).
    stops = (
        f"case when doc_id % 2 = 1 then "
        f"' it has to be one of the pages that ship with prose' "
        f"else '' end"
    )
    return (
        f"{name} AS (SELECT doc_id, text || {bullets} || {ellipsis} || "
        f"{hashes} || {numerics} || {longwords} || {shortwords} || {stops} "
        f"AS atext FROM {src})"
    )


def _count_matching(arr: str, pattern: str, dialect: str) -> str:
    """Number of array elements matching a regex."""
    if dialect == SPARK:
        return f"size(filter({arr}, x -> x rlike '{pattern}'))"
    return (
        f"cast(len(list_filter({arr}, x -> regexp_matches(x, '{pattern}')))"
        f" as int)"
    )


def _stopword_hits(words_arr: str, dialect: str) -> str:
    """How many of the 8 Gopher stop words appear in the word array."""
    contains = "array_contains" if dialect == SPARK else "list_contains"
    terms = " + ".join(
        f"case when {contains}({words_arr}, '{w}') then 1 else 0 end"
        for w in STOPWORDS
    )
    return f"({terms})"


def _milli(num: str, den: str, dialect: str) -> str:
    """(num * 1000) // den, 0 for an empty denominator."""
    d = "div" if dialect == SPARK else "//"
    return (
        f"cast(case when {den} = 0 then 0 "
        f"else (({num}) * 1000) {d} ({den}) end as int)"
    )


def _gopher_quality_flags(dialect: str) -> str:
    lw = "lower(atext)"
    ellipsis_pat = r"(\\.\\.\\.|…)$" if dialect == SPARK else r"(\.\.\.|…)$"
    # Symbols: '#' plus both ellipsis spellings, counted on the raw text
    # (the shared helper owns the per-dialect escaping rule).
    n_symbols = regexp_count("atext", r"#|\.\.\.|…", dialect)
    flags = {
        "word_count_ok":
            f"case when nw between {MIN_WORDS} and {MAX_WORDS} "
            f"then 1 else 0 end",
        "mean_word_len_ok":
            f"case when mean_word_len_milli between "
            f"{MEAN_WORD_LEN_MILLI_MIN} and {MEAN_WORD_LEN_MILLI_MAX} "
            f"then 1 else 0 end",
        "symbol_ratio_ok":
            f"case when symbol_milli <= {SYMBOL_MILLI_MAX} then 1 else 0 end",
        "bullet_ratio_ok":
            f"case when bullet_milli <= {BULLET_MILLI_MAX} then 1 else 0 end",
        "ellipsis_ratio_ok":
            f"case when ellipsis_milli <= {ELLIPSIS_MILLI_MAX} "
            f"then 1 else 0 end",
        "alpha_ratio_ok":
            f"case when alpha_milli >= {ALPHA_MILLI_MIN} then 1 else 0 end",
        "stopwords_ok":
            f"case when stopword_hits >= {MIN_STOPWORDS} then 1 else 0 end",
    }
    flag_cols = ",\n       ".join(
        f"{expr} AS {name}" for name, expr in flags.items()
    )
    passes = " * ".join(f"({expr})" for expr in flags.values())
    return f"""
WITH {gopher_augmented_cte(dialect)},
_t AS (SELECT doc_id, atext,
              {_words('atext', dialect)} AS w,
              {_words(lw, dialect)} AS lw,
              {_lines('atext', dialect)} AS ln
       FROM _aug),
_m AS (SELECT doc_id,
              {_size('w', dialect)} AS nw,
              {_size('ln', dialect)} AS nl,
              {_sum_elem_lengths('w', dialect)} AS word_chars,
              {n_symbols} AS n_symbols,
              {_count_matching('ln', '^[-*•]', dialect)} AS n_bullet_lines,
              {_count_matching('ln', ellipsis_pat, dialect)} AS n_ellipsis_lines,
              {_count_matching('w', '[a-zA-Z]', dialect)} AS n_alpha_words,
              {_stopword_hits('lw', dialect)} AS stopword_hits
       FROM _t),
_r AS (SELECT doc_id, nw, nl, stopword_hits,
              {_milli('word_chars', 'nw', dialect)} AS mean_word_len_milli,
              {_milli('n_symbols', 'nw', dialect)} AS symbol_milli,
              {_milli('n_bullet_lines', 'nl', dialect)} AS bullet_milli,
              {_milli('n_ellipsis_lines', 'nl', dialect)} AS ellipsis_milli,
              {_milli('n_alpha_words', 'nw', dialect)} AS alpha_milli
       FROM _m)
SELECT doc_id, nw, mean_word_len_milli, symbol_milli, bullet_milli,
       ellipsis_milli, alpha_milli, cast(stopword_hits as int) AS stopword_hits,
       {flag_cols},
       cast({passes} as int) AS gopher_pass
FROM _r
"""


register(Query(
    "gopher_quality_flags",
    "Gopher rule-A/B document quality flags (Rae et al. 2021 table A1)",
    _gopher_quality_flags,
))
