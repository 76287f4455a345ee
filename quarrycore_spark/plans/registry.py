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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.run_spark for name, q in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: q.oracle() for name, q in REGISTRY.items() if q.oracle() is not None}
