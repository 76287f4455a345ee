"""Shared CTE preludes over the `documents` table, emitted per dialect.

Layering matters: each derived column (normalized text, shingle array,
shingle hashes) is materialized once in a CTE and referenced by *name*
downstream, which keeps both the Spark plan and the generated SQL compact
(a fully inlined simhash expression is ~500 KB of SQL; layered it is ~15 KB)
and lets Catalyst/DuckDB compute each stage once.
"""

from __future__ import annotations

from quarrycore_spark.config import DedupConfig
from quarrycore_spark.functions import dialect as D


def doc_norm(dialect: str, cfg: DedupConfig, table: str = "documents") -> str:
    """CTE `_docs`: doc_id, nt (normalized text), content_hash."""
    return (
        f"_docs AS (SELECT doc_id, {D.norm_text('text', dialect)} AS nt, "
        f"{D.content_hash(D.norm_text('text', dialect), dialect)} AS content_hash "
        f"FROM {table})"
    )


def doc_shingles(dialect: str, cfg: DedupConfig) -> str:
    """CTE `_sh` on `_docs`: + sh (distinct char shingles)."""
    return (
        f"_sh AS (SELECT doc_id, content_hash, "
        f"{D.char_shingles('nt', cfg.shingle_size, dialect)} AS sh FROM _docs)"
    )


def doc_hashes31(dialect: str, cfg: DedupConfig) -> str:
    """CTE `_h` on `_sh`: + hs (31-bit shingle hashes)."""
    return f"_h AS (SELECT doc_id, content_hash, {D.shingle_hashes31('sh', dialect)} AS hs FROM _sh)"


def doc_hashes60(dialect: str, cfg: DedupConfig) -> str:
    """CTE `_h60` on `_sh`: + h60s (60-bit shingle hashes for SimHash)."""
    return f"_h60 AS (SELECT doc_id, {D.shingle_hashes60('sh', dialect)} AS h60s FROM _sh)"
