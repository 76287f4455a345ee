"""Corpus word-frequency rarity scoring over the `documents` table, as
a paired Spark/DuckDB query.

The CCNet-style language-model quality proxy (Wenzek et al. 2020:
bucket documents by LM perplexity into head/middle/tail; graft
addition beyond the reference inventory — the reference's quality
layer is per-document only): score each document by how RARE its
words are against the corpus's own unigram distribution. A true LM is
out of scope (no model libs, and floats break the oracle contract),
so the per-word surprisal -log2 p(w) is integerized exactly as

    floor(log2(total)) - floor(log2(count(w)))
  = length(bin(total)) - length(bin(count(w)))

— pure integer/string ops, bit-identical in both engines (never
computed via floating log2, whose libm rounding is not pinned).

Spark shape at 100 TB:
* counts are a two-stage hash aggregate over (doc_id, word) first,
  then (word) — the per-doc pre-aggregation bounds the skew join that
  follows: the occurrence→count join keys on `word`, whose natural
  skew ("the") is absorbed because the left side carries at most one
  row per (doc, word) with its in-doc count, not one row per
  occurrence; AQE's skew-join split handles the residual hot words.
* the grand total rides a 1-row cross join (broadcast NL at scale).
* per-doc re-aggregation happens on doc_id — uniform key.

The synthetic corpus draws from a tiny vocabulary (near-uniform
counts), so doc_id-derived singleton words are planted (`i % 4` of
them) to give the rarity distribution real spread at every sf; the
tail flag threshold is calibrated so both classes occur.
"""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.plans.registry import Query, register
from quarrycore_spark.functions.textfrag import _words

# Documents whose mean integer surprisal exceeds this (milli-bits) are
# "tail" (rare-heavy) — the CCNet bucket a quality filter would drop
# or upweight depending on policy. Calibrated against the synthetic
# corpus: the common-word floor sits at 5000 milli-bits and the
# planted-singleton lift tops out ~7000, stably across sf (measured
# sf0.001 and sf0.01), so 5300 yields both classes at every sf.
TAIL_MILLI_MIN = 5300


def rarity_augmented_cte(dialect: str) -> str:
    """CTE `_aug`: doc_id, atext = text + `doc_id % 4` planted singleton
    words (corpus-unique, so each contributes maximal surprisal)."""
    pieces = []
    for j in range(1, 4):
        pieces.append(
            f"CASE WHEN doc_id % 4 >= {j} "
            f"THEN ' rare' || {j} || 'w' || doc_id ELSE '' END"
        )
    planted = " || ".join(pieces)
    return (
        f"_aug AS (SELECT doc_id, text || {planted} AS atext "
        f"FROM documents)"
    )


def _word_rarity_sql(dialect: str) -> str:
    if dialect == SPARK:
        explode = "explode(w) AS word"
        intdiv = "div"
    else:
        explode = "unnest(w) AS word"
        intdiv = "//"
    return f"""
WITH {rarity_augmented_cte(dialect)},
_w AS (SELECT doc_id, {_words('atext', dialect)} AS w FROM _aug),
_x AS (SELECT doc_id, {explode} FROM _w),
_dw AS (SELECT doc_id, word, count(*) AS c_dw FROM _x GROUP BY doc_id, word),
_c AS (SELECT word, sum(c_dw) AS cnt FROM _dw GROUP BY word),
_tot AS (SELECT sum(cnt) AS tot FROM _c),
_j AS (SELECT d.doc_id, d.c_dw,
              length(bin(t.tot)) - length(bin(c.cnt)) AS surprisal
       FROM _dw d JOIN _c c ON d.word = c.word CROSS JOIN _tot t),
_s AS (SELECT doc_id,
              sum(c_dw) AS n_words,
              (sum(c_dw * surprisal) * 1000) {intdiv} sum(c_dw) AS rarity_milli
       FROM _j GROUP BY doc_id)
SELECT a.doc_id,
       cast(coalesce(s.n_words, 0) as int) AS n_words,
       cast(coalesce(s.rarity_milli, 0) as int) AS rarity_milli,
       cast(CASE WHEN coalesce(s.rarity_milli, 0) >= {TAIL_MILLI_MIN}
            THEN 1 ELSE 0 END as int) AS is_tail
FROM _aug a LEFT JOIN _s s ON a.doc_id = s.doc_id
"""


def _spark_word_rarity(spark, sf_dir):
    """DataFrame-side word_rarity with the same arithmetic as the SQL
    template (which stays the DuckDB oracle). Why not the generic
    `spread` flag: the SQL's `_aug` CTE is referenced twice (explode path
    + final LEFT JOIN), so a spread view repartitions the corpus twice
    and measured net-slower (4.8 vs 3.7 s). Here only the CPU-dense
    explode side is spread; the final join consumes a slim doc_id
    projection of the plain scan."""
    from pyspark.sql import functions as F

    from quarrycore_spark.functions.dialect import SPARK
    from quarrycore_spark.operators._partitioning import spread
    from quarrycore_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")["documents"]
    # identical atext expression to rarity_augmented_cte (Spark dialect)
    pieces = []
    for j in range(1, 4):
        pieces.append(
            f"CASE WHEN doc_id % 4 >= {j} "
            f"THEN ' rare' || {j} || 'w' || doc_id ELSE '' END"
        )
    atext = "text || " + " || ".join(pieces)
    aug = docs.select("doc_id", F.expr(atext).alias("atext"))
    words = spread(aug).select(
        "doc_id", F.explode(F.expr(_words("atext", SPARK))).alias("word")
    )
    dw = words.groupBy("doc_id", "word").agg(F.count("*").alias("c_dw"))
    c = dw.groupBy("word").agg(F.sum("c_dw").alias("cnt"))
    tot = c.agg(F.sum("cnt").alias("tot"))
    j_ = (
        dw.join(c, "word")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "c_dw",
            (F.expr("length(bin(tot))") - F.expr("length(bin(cnt))")).alias(
                "surprisal"
            ),
        )
    )
    s = j_.groupBy("doc_id").agg(
        F.sum("c_dw").alias("n_words"),
        F.expr("(sum(c_dw * surprisal) * 1000) div sum(c_dw)").alias(
            "rarity_milli"
        ),
    )
    return (
        docs.select("doc_id")
        .join(s, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("int").alias("n_words"),
            F.coalesce("rarity_milli", F.lit(0)).cast("int").alias("rarity_milli"),
            F.when(
                F.coalesce("rarity_milli", F.lit(0)) >= TAIL_MILLI_MIN, 1
            ).otherwise(0).cast("int").alias("is_tail"),
        )
    )


register(
    Query(
        "word_rarity",
        "Corpus-frequency rarity scoring (CCNet head/tail LM-quality "
        "analogue): per-doc mean integer surprisal vs the corpus's own "
        "unigram counts, exact via length(bin(n)) — two-stage (doc,word) "
        "pre-agg bounds the hot-word skew join",
        _word_rarity_sql,
        spark_fn=_spark_word_rarity,
    )
)
