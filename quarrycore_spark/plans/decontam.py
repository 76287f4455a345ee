"""Benchmark decontamination over the `documents` table, as a paired
Spark/DuckDB query.

The classic training-data hygiene step (GPT-3 appendix C, Llama 2
appendix A.6; graft addition beyond the reference inventory — the
reference's dedup layer stops at corpus-internal duplicates): mark any
training document that shares a word 13-gram with a held-out
evaluation set, so contaminated documents can be dropped before
training.

Spark shape at 100 TB: the eval set is tiny relative to the corpus
(benchmarks are thousands of documents, the corpus is billions), so
its distinct-gram set is built once and BROADCAST; the training side
explodes its distinct grams and probes the broadcast hash table — no
shuffle of the corpus text, no all-pairs. The per-doc gram counts ride
the explode's own partitioning. A real deployment reads the eval set
from its own table; here it is carved deterministically out of
`documents` (doc_id % EVAL_MOD == EVAL_RESIDUE) so the query is
self-contained at every sf.

The synthetic corpus texts are corpus-unique word soup, so natural
13-gram collisions are ~impossible; both sides of the split are
augmented with deterministic doc_id-derived passages (4 variants) so
contamination demonstrably fires at every sf: every eval doc carries
its variant, and every PLANT_MOD-th training doc carries one too —
those training docs are the planted true positives. The no-floats
rule holds: the hit fraction is exact milli-units via integer floor
division.
"""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.plans.registry import Query, register
from quarrycore_spark.functions.textfrag import _ngrams, _size, _words

# GPT-3-style decontamination gram length (13 consecutive words).
NGRAM_K = 13

# Eval-set carve-out: doc_id % EVAL_MOD == EVAL_RESIDUE.
EVAL_MOD = 97
EVAL_RESIDUE = 3

# Training docs planted with a passage: doc_id % PLANT_MOD == PLANT_RESIDUE.
PLANT_MOD = 13
PLANT_RESIDUE = 5

# Four 16-word passages whose 13-grams are pairwise disjoint (every
# word differs across variants past the shared two-word prefix, so no
# 13-window can match across variants).
PASSAGES = [
    "eval passage alpha bravo charlie delta echo foxtrot golf hotel "
    "india juliet kilo lima mike november",
    "eval passage oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu anchor beacon",
    "eval passage cedar dahlia elm fern ginkgo hazel iris jasmine "
    "laurel maple nettle oak poplar quince",
    "eval passage amber bronze copper diamond emerald flint garnet "
    "jade marble nickel opal pearl quartz ruby",
]


def _passage_expr() -> str:
    """CASE over doc_id % 4 selecting the planted passage text."""
    arms = " ".join(f"WHEN {i} THEN '{p}'" for i, p in enumerate(PASSAGES))
    return f"(CASE doc_id % {len(PASSAGES)} {arms} END)"


def decontam_augmented_cte(dialect: str) -> str:
    """CTE `_aug`: doc_id, atext = text + planted passage (on eval docs
    and every PLANT_MOD-th training doc), is_eval flag."""
    planted = (
        f"CASE WHEN doc_id % {EVAL_MOD} = {EVAL_RESIDUE} "
        f"OR doc_id % {PLANT_MOD} = {PLANT_RESIDUE} "
        f"THEN chr(10) || {_passage_expr()} ELSE '' END"
    )
    return (
        f"_aug AS (SELECT doc_id, text || {planted} AS atext, "
        f"cast(CASE WHEN doc_id % {EVAL_MOD} = {EVAL_RESIDUE} "
        f"THEN 1 ELSE 0 END as int) AS is_eval FROM documents)"
    )


def _decontaminate_sql(dialect: str) -> str:
    if dialect == SPARK:
        hint = "/*+ BROADCAST(d) */ "
        intdiv = "div"
        # Spark shape: explode the cheap INT position sequence and build
        # each 13-gram string AFTER the Generate in a codegen Project —
        # exploding the lambda-built gram array directly costs ~250 µs
        # per output row (CodegenFallback child dragged through Generate;
        # measured 25× slower at sf0.1). Per-doc gram dedup then happens
        # in `_e`'s GROUP BY (doc_id, gram), whose map-side partial agg
        # reduces each partition before the (slim) pair rows shuffle —
        # the cross-doc DISTINCT still survives only on the tiny
        # broadcast eval side.
        parts = " , ' ', ".join(
            f"element_at(w, i + {j})" for j in range(NGRAM_K)
        )
        corpus_side = f"""
_p AS (SELECT doc_id, w, explode(sequence(1, nw - {NGRAM_K - 1})) AS i
       FROM _n WHERE nw >= {NGRAM_K}),
_e AS (SELECT doc_id, concat({parts}) AS gram FROM _p
       GROUP BY doc_id, concat({parts}))"""
    else:
        hint = ""
        intdiv = "//"
        grams = _ngrams("w", "nw", NGRAM_K, dialect)
        # DuckDB oracle keeps the naive definition (distinct grams per
        # doc, unnest) — an independent formulation whose value hash
        # cross-checks the Spark positions shape.
        corpus_side = f"""
_g AS (SELECT doc_id, list_distinct({grams}) AS grams FROM _n),
_e AS (SELECT doc_id, unnest(grams) AS gram FROM _g)"""
    return f"""
WITH {decontam_augmented_cte(dialect)},
_w AS (SELECT doc_id, {_words('atext', dialect)} AS w FROM _aug),
_n AS (SELECT doc_id, w, {_size('w', dialect)} AS nw FROM _w),{corpus_side},
_d AS (SELECT DISTINCT gram
       FROM _e WHERE doc_id % {EVAL_MOD} = {EVAL_RESIDUE}),
_hits AS (SELECT {hint}e.doc_id,
                 count(*) AS n_distinct_grams,
                 count(d.gram) AS n_eval_hits
          FROM _e e LEFT JOIN _d d ON e.gram = d.gram
          WHERE e.doc_id % {EVAL_MOD} != {EVAL_RESIDUE}
          GROUP BY e.doc_id)
SELECT a.doc_id,
       cast(coalesce(h.n_distinct_grams, 0) as int) AS n_distinct_grams,
       cast(coalesce(h.n_eval_hits, 0) as int) AS n_eval_hits,
       cast(CASE WHEN coalesce(h.n_eval_hits, 0) >= 1 THEN 1 ELSE 0 END
            as int) AS is_contaminated,
       cast(CASE WHEN coalesce(h.n_distinct_grams, 0) = 0 THEN 0
                 ELSE (coalesce(h.n_eval_hits, 0) * 1000) {intdiv}
                      h.n_distinct_grams END as int) AS contaminated_milli
FROM _aug a LEFT JOIN _hits h ON a.doc_id = h.doc_id
WHERE a.is_eval = 0
"""


register(
    Query(
        "decontaminate",
        "Benchmark decontamination (GPT-3/Llama-style): flag training "
        "docs sharing any word 13-gram with the held-out eval carve-out; "
        "broadcast the eval gram set, probe with the corpus side's "
        "position-exploded grams deduped in a map-side partial agg — "
        "no all-pairs, no unbounded shuffle",
        _decontaminate_sql,
    )
)
