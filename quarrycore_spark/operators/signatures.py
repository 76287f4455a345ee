"""Vectorized signature computation — the production (scale) path.

One `mapInPandas` pass computes, per document: normalized text, sha256
content hash, the 128-slot MinHash signature, the 16 LSH band hashes, and
the 60-bit SimHash — all with numpy over Arrow batches (no per-row Python
in the hot loop beyond the md5 shingle digests).

The math is bit-identical to the SQL emitted by
``quarrycore_spark.functions.dialect`` (the DuckDB oracle path):
md5-prefix integer hashing, universal hashing mod the 31-bit Mersenne
prime, polynomial band folding. Parity is enforced by
tests/test_signature_parity.py.

Reference semantics covered (SURVEY.md §2.3):
  D1 content hash   — sha256 over normalized text (hash_db.py:326-336)
  D4 char shingling — k=7, short-text rule (minhash_redis.py:162-184)
  D6 MinHash        — 128 perms (minhash_redis.py:186-202)
  D7 LSH banding    — 16 bands × 8 rows (minhash_lsh.py:92-103)
  D10 SimHash       — north-rule replacement for fuzzy tiers
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from quarrycore_spark.config import DEFAULT_CONFIG, MERSENNE_31, DedupConfig

_WS = re.compile(r"\s+", re.ASCII)

SIG_SCHEMA = (
    "doc_id bigint, content_hash string, sig array<bigint>, "
    "bands array<bigint>, simhash bigint"
)

_BAND_MULT = 1000003


def normalize_text(text: str) -> str:
    """Shingle-normalization contract (reference minhash_redis.py:174-176).

    Matches dialect.norm_text: collapse ASCII whitespace runs to one space,
    trim, lowercase. re.ASCII keeps \\s aligned with Java/RE2 semantics.
    """
    return _WS.sub(" ", text).strip().lower()


def char_shingles(nt: str, k: int) -> list[str]:
    """Distinct char k-shingles; len(text)<k → {text} (minhash_redis.py:172)."""
    if len(nt) < k:
        return [nt]
    return list(dict.fromkeys(nt[i : i + k] for i in range(len(nt) - k + 1)))


def _md5_prefix_ints(shingles: list[str], nchars: int) -> np.ndarray:
    """First `nchars` hex chars of md5 as int64 — matches dialect.hex_int."""
    return np.fromiter(
        (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:nchars], 16) for s in shingles),
        dtype=np.int64,
        count=len(shingles),
    )


def doc_signature(
    text: str, cfg: DedupConfig, a: np.ndarray, b: np.ndarray
) -> tuple[str, np.ndarray, np.ndarray, int]:
    nt = normalize_text(text)
    ch = hashlib.sha256(nt.encode("utf-8")).hexdigest()
    sh = char_shingles(nt, cfg.shingle_size)
    # 31-bit hashes for MinHash (np.unique = array_distinct: set semantics)
    hs31 = np.unique(_md5_prefix_ints(sh, 8) % MERSENNE_31)
    # minhash: min over shingles of (a*h+b) mod p, per permutation
    sig = ((hs31[:, None] * a[None, :] + b[None, :]) % MERSENNE_31).min(axis=0)
    # band hashes: order-sensitive polynomial fold mod p (dialect.band_hash)
    bands = np.empty(cfg.lsh_bands, dtype=np.int64)
    for i in range(cfg.lsh_bands):
        acc = np.int64(sig[i * cfg.lsh_rows])
        for s in sig[i * cfg.lsh_rows + 1 : (i + 1) * cfg.lsh_rows]:
            acc = (acc * _BAND_MULT + s) % MERSENNE_31
        bands[i] = acc
    # simhash over 60-bit shingle hashes: majority vote per bit
    hs60 = np.unique(_md5_prefix_ints(sh, 15))
    bits = (hs60[:, None] >> np.arange(cfg.simhash_bits)[None, :]) & 1
    ones = bits.sum(axis=0)
    simhash = int(((2 * ones > len(hs60)).astype(np.int64) << np.arange(cfg.simhash_bits)).sum())
    return ch, sig, bands, simhash


def with_signatures(
    docs: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs(id, text, ...) → (id, content_hash, sig, bands, simhash).

    Arrow-batched; each task processes its partition independently — no
    shuffle, scales linearly with executors.
    """
    a = np.array([p[0] for p in cfg.minhash_perms], dtype=np.int64)
    b = np.array([p[1] for p in cfg.minhash_perms], dtype=np.int64)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ch = [None] * n
            sig = [None] * n
            bands = [None] * n
            sim = np.empty(n, dtype=np.int64)
            for j, text in enumerate(pdf[text_col].astype(str)):
                c, s, bd, sm = doc_signature(text, cfg, a, b)
                ch[j], sig[j], bands[j], sim[j] = c, s, bd, sm
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "content_hash": ch,
                    "sig": sig,
                    "bands": bands,
                    "simhash": sim,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(compute, schema=SIG_SCHEMA)
