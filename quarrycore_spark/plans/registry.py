"""Query registry: every oracle-checked operator, as paired
(Spark plan, DuckDB oracle SQL) generated from the shared dialect snippets.

This is the Spark-native expression of the reference's operator inventory
(SURVEY.md §2): each entry names the reference operator(s) it covers.
All checked outputs are integer/string-typed — no float crosses the
Spark↔DuckDB comparison boundary.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from quarrycore_spark.config import DEFAULT_CONFIG as CFG
from quarrycore_spark.functions import dialect as D
from quarrycore_spark.functions.dialect import DUCKDB, SPARK
from quarrycore_spark.plans import prelude as P
from quarrycore_spark.sources.tables import load


@dataclass
class Query:
    name: str
    doc: str
    sql: Callable[[str], str] | None = None  # dialect -> SQL text
    spark_fn: Callable[[SparkSession, str], DataFrame] | None = None
    tables: tuple = ("documents",)

    def run_spark(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        from quarrycore_spark.session import ensure_py_files

        ensure_py_files(spark)
        load(spark, sf_dir, *self.tables)
        if self.spark_fn is not None:
            return self.spark_fn(spark, sf_dir)
        return spark.sql(self.sql(SPARK))

    def oracle(self) -> str | None:
        return self.sql(DUCKDB) if self.sql is not None else None


REGISTRY: dict[str, Query] = {}


def register(q: Query) -> Query:
    REGISTRY[q.name] = q
    return q


# ---------------------------------------------------------------------------
# Stage 1 — exact dedup (reference: hash_db.py:136-234, hybrid_dedup.py:189-204)
# ---------------------------------------------------------------------------


def _exact_dedup(dialect: str) -> str:
    """Canonical-doc selection per content hash — the Spark-idiomatic form of
    the reference's INSERT-or-fail first-writer-wins rule (hash_db.py:81-105).
    Arrival order is replaced by deterministic min(doc_id)."""
    return f"""
WITH {P.doc_norm(dialect, CFG)}
SELECT content_hash,
       min(doc_id) AS canonical_id,
       count(*) AS group_size
FROM _docs
GROUP BY content_hash
"""


register(Query("exact_dedup", "D1+D2: content hash + canonical selection", _exact_dedup))


def _exact_dup_pairs(dialect: str) -> str:
    """All (a,b) doc pairs sharing a content hash (a<b) — exact-dup edges."""
    return f"""
WITH {P.doc_norm(dialect, CFG)}
SELECT a.doc_id AS a_id, b.doc_id AS b_id
FROM _docs a JOIN _docs b
  ON a.content_hash = b.content_hash AND a.doc_id < b.doc_id
"""


register(Query("exact_dup_pairs", "D2: exact duplicate pair list", _exact_dup_pairs))


def _dedup_survivors(dialect: str) -> str:
    """Surviving (non-duplicate) docs: row_number()==1 per hash, ordered by
    doc_id — SURVEY §2.6's single window function."""
    return f"""
WITH {P.doc_norm(dialect, CFG)},
_r AS (
  SELECT doc_id, content_hash,
         row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
  FROM _docs
)
SELECT doc_id, content_hash FROM _r WHERE rn = 1
"""


register(Query("dedup_survivors", "D2/D9: exact-dedup survivor set (window)", _dedup_survivors))


def _dedup_metrics(dialect: str) -> str:
    """D17: dedup-ratio metrics. Ratio reported as exact integer pair
    (dup_docs, total_docs) — no float in the checked output."""
    return f"""
WITH {P.doc_norm(dialect, CFG)}
SELECT count(*) AS total_docs,
       count(DISTINCT content_hash) AS distinct_hashes,
       count(*) - count(DISTINCT content_hash) AS exact_dup_docs
FROM _docs
"""


register(Query("dedup_metrics", "D17: corpus-level dedup counters", _dedup_metrics))


# ---------------------------------------------------------------------------
# Stage 2 — MinHash / LSH near-dup detection
# (reference: minhash_redis.py:162-242, minhash_lsh.py:92-181)
#
# Spark side: vectorized Arrow signature operator + DataFrame joins (the
# production/scale path). DuckDB side: generated SQL with bit-identical
# integer math. The pure-SQL Spark variant exists too but recomputes the
# 256-term signature expression per CTE reference once Catalyst inlines the
# CTEs — the Arrow operator is both the faster and the 100TB-correct design.
# ---------------------------------------------------------------------------

# Cap on LSH bucket size: buckets larger than this (boilerplate mega-buckets,
# reference's unbounded datasketch buckets — SURVEY §7 hard part (d)) are
# dropped from candidate generation. Deterministic, encoded in BOTH dialects.
LSH_BUCKET_CAP = 200

_SIG_CACHE: dict = {}


def _sigs(spark: SparkSession, sf_dir: str):
    """Signature DataFrame for `documents` at sf_dir, persisted & memoized
    per session so the stage-2/3 queries share one computation."""
    from quarrycore_spark.operators.signatures import with_signatures

    key = (id(spark), sf_dir)
    if key not in _SIG_CACHE:
        docs = load(spark, sf_dir, "documents")["documents"]
        _SIG_CACHE[key] = with_signatures(docs, CFG).persist()
    return _SIG_CACHE[key]


def _sig_prelude(dialect: str) -> str:
    """CTE chain documents → normalized → shingles → 31-bit hashes → signature."""
    return (
        f"{P.doc_norm(dialect, CFG)},\n{P.doc_shingles(dialect, CFG)},\n"
        f"{P.doc_hashes31(dialect, CFG)},\n"
        f"_sig AS (SELECT doc_id, {D.minhash_array('hs', CFG, dialect)} AS sig, "
        f"{D.band_hash_array('hs', CFG, dialect)} AS bands FROM _h)"
    )


def _minhash_signatures(dialect: str) -> str:
    """D4-D6: per-doc MinHash signature, exploded to (doc_id, perm_idx, minhash)
    so the value hash checks every slot."""
    return f"""
WITH {_sig_prelude(dialect)}
SELECT doc_id, {D.posexplode('sig', 'perm_idx', 'minhash', dialect)}
FROM _sig
"""


def _spark_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    return _sigs(spark, sf_dir).select(
        "doc_id", F.posexplode("sig").alias("perm_idx", "minhash")
    )


register(
    Query(
        "minhash_signatures",
        "D4-D6: 128-perm MinHash signatures",
        _minhash_signatures,
        spark_fn=_spark_minhash_signatures,
    )
)


def _band_cte(dialect: str) -> str:
    """CTEs producing capped LSH band buckets → `_bx` (doc_id, band_idx, band_hash)."""
    return f"""{_sig_prelude(dialect)},
_bx AS (SELECT doc_id, {D.posexplode('bands', 'band_idx', 'band_hash', dialect)} FROM _sig),
_cap AS (
  SELECT band_idx, band_hash FROM _bx
  GROUP BY band_idx, band_hash
  HAVING count(*) BETWEEN 2 AND {LSH_BUCKET_CAP}
),
_bkt AS (
  SELECT b.doc_id, b.band_idx, b.band_hash
  FROM _bx b JOIN _cap c ON b.band_idx = c.band_idx AND b.band_hash = c.band_hash
)"""


def _lsh_candidate_pairs(dialect: str) -> str:
    """D7: band-bucket self-join → candidate pairs (a<b), with the number of
    bands in which the pair collides. Buckets above LSH_BUCKET_CAP dropped."""
    return f"""
WITH {_band_cte(dialect)}
SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_bands
FROM _bkt a JOIN _bkt b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


def _spark_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quarrycore_spark.operators.lsh import candidate_pairs

    return candidate_pairs(_sigs(spark, sf_dir), LSH_BUCKET_CAP)


register(
    Query(
        "lsh_candidate_pairs",
        "D7: LSH banding candidate generation",
        _lsh_candidate_pairs,
        spark_fn=_spark_lsh_candidate_pairs,
    )
)


def _minhash_verified_pairs(dialect: str) -> str:
    """D7+D8: candidates verified by signature agreement >= threshold
    (integer arithmetic: agree*100 >= num_perm*threshold_pct)."""
    thresh = f"100 * agree_cnt >= {CFG.num_perm * CFG.jaccard_threshold_pct}"
    return f"""
WITH {_band_cte(dialect)},
_cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM _bkt a JOIN _bkt b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
_ver AS (
  SELECT c.a_id, c.b_id,
         {D.sig_agreement('sa.sig', 'sb.sig', CFG.num_perm, dialect)} AS agree_cnt
  FROM _cand c
  JOIN _sig sa ON sa.doc_id = c.a_id
  JOIN _sig sb ON sb.doc_id = c.b_id
)
SELECT a_id, b_id, agree_cnt FROM _ver WHERE {thresh}
"""


def _spark_minhash_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quarrycore_spark.operators.lsh import verified_pairs

    return verified_pairs(_sigs(spark, sf_dir), CFG, LSH_BUCKET_CAP)


register(
    Query(
        "minhash_verified_pairs",
        "D7+D8: LSH candidates verified at signature-Jaccard >= 0.85",
        _minhash_verified_pairs,
        spark_fn=_spark_minhash_verified_pairs,
    )
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.run_spark for name, q in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: q.oracle() for name, q in REGISTRY.items() if q.oracle() is not None}
