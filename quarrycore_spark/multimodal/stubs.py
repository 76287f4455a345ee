"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched UDFs.

The reference extracts multimodal payloads into typed lists
(ExtractedContent.tables/images/links — protocols.py:212-220,
content_processors.py). At Spark scale the pattern is: binary column +
STRUCT metadata + mapInPandas feature extractors. The image/audio codec
libraries are NOT in this container, so the decode kernels are stubs: a
deterministic fake (for plumbing tests) or NotImplementedError (real
decode), clearly marked. The Spark-side schema, partitioning, UDF
signatures, and batch shapes are real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, sha256 string, "
    "feature array<float>, decode_error string"
)

_FEATURE_DIM = 16


def _fake_decode_features(payload: bytes, dim: int = _FEATURE_DIM) -> np.ndarray:
    """DETERMINISTIC FAKE for the decode+embed step: a real deployment
    plugs a codec + model here (e.g. PIL decode → CLIP embed). The fake
    derives `dim` floats from the sha256 of the payload so tests are
    stable and content-sensitive."""
    d = hashlib.sha256(payload).digest()
    raw = np.frombuffer((d * ((4 * dim) // len(d) + 1))[: 4 * dim], dtype=np.uint32)
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def real_decode(payload: bytes, mime: str):  # pragma: no cover - stub
    """Real decode entry point — requires codec libs absent from this
    container. STUB by design (see module docstring)."""
    raise NotImplementedError(
        "media decoding requires image/audio codec libraries not present "
        "in this environment; use _fake_decode_features for plumbing tests"
    )


def extract_media_features(media: DataFrame, use_fake: bool = True) -> DataFrame:
    """media(media_id, kind, payload, meta) → per-item features.

    Arrow-batched; per-item failures go to `decode_error` (dead-letter
    pattern), never fail the job. Partitioning: payloads stay in their
    input partitions — no shuffle; at scale, repartition by size bucket
    first so batches have uniform decode cost.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, digests, feats, errs = [], [], [], []
            for payload in pdf["payload"]:
                try:
                    raw = bytes(payload) if payload is not None else b""
                    if not use_fake:
                        real_decode(raw, "")
                    feats.append(_fake_decode_features(raw))
                    n_bytes.append(len(raw))
                    digests.append(hashlib.sha256(raw).hexdigest())
                    errs.append(None)
                except Exception as e:  # noqa: BLE001
                    feats.append(np.zeros(_FEATURE_DIM, dtype=np.float32))
                    n_bytes.append(len(raw) if payload is not None else 0)
                    digests.append("")
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": pd.array(n_bytes, dtype="int64"),
                    "sha256": digests,
                    "feature": feats,
                    "decode_error": errs,
                }
            )

    return media.mapInPandas(compute, schema=FEATURE_SCHEMA)


def exact_media_dedup(features: DataFrame) -> DataFrame:
    """Exact multimodal dedup: group by payload sha256 (the binary analogue
    of the text content hash), keep min media_id."""
    from pyspark.sql import functions as F

    return (
        features.filter(F.col("sha256") != "")
        .groupBy("sha256")
        .agg(
            F.min("media_id").alias("canonical_media_id"),
            F.count("*").alias("group_size"),
        )
    )
