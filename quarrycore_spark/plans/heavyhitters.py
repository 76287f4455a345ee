"""Corpus heavy-hitter n-grams: the top-K word trigrams by document
frequency, as a paired Spark/DuckDB query.

The boilerplate-phrase miner behind C4/MassiveText-style filter
design: before writing removal rules, you mine the corpus for the
phrases that repeat across the most documents (cookie banners, license
blurbs, nav text). Complements `corpus_dup_lines` (whole-line
duplicates) at sub-line granularity, and exercises SURVEY §2.7's
global top-K shape over an exploded intermediate.

The shipped texts are corpus-unique word soup, so high-frequency
trigrams are planted deterministically (the decontam device): every
doc with doc_id % 4 = 1 appends one of two fixed sentences chosen by
doc_id div 4 parity — each sentence contributes its trigrams to ~1/8
of the corpus, guaranteeing the planted phrases dominate the top-K at
every sf while the natural tail stays visible behind them.

100-TB shape: the Spark side explodes the cheap INT position sequence
and builds each gram string AFTER the Generate in a codegen Project
(exploding the lambda-built gram array directly is ~50 µs/row
interpreted — measured 10× slower), then counts doc frequency with ONE
count(DISTINCT doc_id) agg whose partial (gram, doc_id) dedup runs
map-side before anything shuffles, and the final ORDER BY ... LIMIT K
is Spark's TakeOrderedAndProject (a per-partition top-K merged on the
driver, never a full sort). The (count DESC,
gram ASC) tie-break makes the K-boundary deterministic.
"""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.plans.registry import Query, register
from quarrycore_spark.functions.textfrag import _ngrams, _size, _words

TOP_K = 20
NGRAM_K = 3

# Docs with doc_id % PLANT_MOD == PLANT_RESIDUE append a sentence,
# variant (doc_id div PLANT_MOD) % 2.
PLANT_MOD = 4
PLANT_RESIDUE = 1
SENTENCES = [
    "this website uses cookies to improve your browsing experience",
    "all rights reserved unauthorized reproduction is strictly prohibited",
]


def _heavy_hitter_sql(dialect: str) -> str:
    d = "div" if dialect == SPARK else "//"
    plant = (
        f"CASE WHEN doc_id % {PLANT_MOD} = {PLANT_RESIDUE} THEN "
        f"chr(10) || (CASE WHEN (doc_id {d} {PLANT_MOD}) % 2 = 0 "
        f"THEN '{SENTENCES[0]}' ELSE '{SENTENCES[1]}' END) ELSE '' END"
    )
    if dialect == SPARK:
        # Spark shape: explode the cheap INT position sequence and build
        # each gram string AFTER the Generate, in a codegen Project.
        # Exploding the lambda-built gram array directly costs ~50 µs per
        # output row (the higher-order-function child is CodegenFallback
        # and Generate drags the whole array through every emitted row) —
        # measured 10× slower at sf0.1. Per-doc dedup moves into
        # count(DISTINCT doc_id), whose partial (gram, doc_id) dedup
        # happens map-side before anything shuffles.
        gram = (
            "concat(element_at(w, i), ' ', element_at(w, i + 1), ' ', "
            "element_at(w, i + 2))"
        )
        return f"""
WITH _aug AS (SELECT doc_id, text || {plant} AS atext FROM documents),
_w AS (SELECT doc_id, {_words('atext', SPARK)} AS w FROM _aug),
_n AS (SELECT doc_id, w, size(w) AS nw FROM _w WHERE size(w) >= {NGRAM_K}),
_p AS (SELECT doc_id, w, explode(sequence(1, nw - {NGRAM_K - 1})) AS i FROM _n),
_x AS (SELECT doc_id, {gram} AS gram FROM _p),
_cnt AS (SELECT gram, count(DISTINCT doc_id) AS doc_freq FROM _x GROUP BY gram)
SELECT gram, cast(doc_freq AS int) AS doc_freq
FROM _cnt
ORDER BY doc_freq DESC, gram
LIMIT {TOP_K}
"""
    # DuckDB oracle keeps the naive definition (distinct grams per doc,
    # unnest, plain count) — an independent formulation whose value hash
    # cross-checks the Spark shape's count(DISTINCT doc_id) equivalence.
    grams = _ngrams("w", "nw", NGRAM_K, dialect)
    return f"""
WITH _aug AS (SELECT doc_id, text || {plant} AS atext FROM documents),
_w AS (SELECT doc_id, {_words('atext', dialect)} AS w FROM _aug),
_n AS (SELECT doc_id, w, {_size('w', dialect)} AS nw FROM _w),
_g AS (SELECT doc_id, list_distinct({grams}) AS grams FROM _n),
_x AS (SELECT doc_id, unnest(grams) AS gram FROM _g),
_cnt AS (SELECT gram, count(*) AS doc_freq FROM _x GROUP BY gram)
SELECT gram, cast(doc_freq AS int) AS doc_freq
FROM _cnt
ORDER BY doc_freq DESC, gram
LIMIT {TOP_K}
"""


register(
    Query(
        "heavy_hitter_ngrams",
        "Corpus heavy hitters: top-20 word trigrams by document "
        "frequency with a deterministic (count, gram) tie-break — "
        "explode distinct per-doc grams, two-stage hash count, "
        "TakeOrderedAndProject top-K (never a full sort)",
        _heavy_hitter_sql,
    )
)
