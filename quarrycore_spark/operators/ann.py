"""Embedding similarity operators — vectorized Spark implementations.

The SQL-dialect versions in plans/vectorops.py define the semantics (and
serve as the DuckDB oracle); these numpy implementations compute the exact
same quantized-integer results ~100× faster by replacing interpreted
per-element SQL lambdas with Arrow-batched matrix ops:

* brute force: broadcast the (small) quantized matrix, each task multiplies
  its partition's block against it — the classic distributed block
  matrix-product; at 10^12 rows you shard the broadcast side instead;
* hyperplane LSH: same signatures as the SQL path, numpy sign bits.

Integer contract: q = floor(x_float64 * 1000 + 0.5) as int64 — identical
IEEE arithmetic to the SQL expression, so results hash-match the oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quarrycore_spark.plans.vectorops import (
    ANN_K,
    LSH_BANDS,
    LSH_COS_PCT,
    LSH_PLANES_PER_BAND,
    PAIR_COS_PCT,
    QUERY_STRIDE,
    _planes,
)


def quantize(v: np.ndarray) -> np.ndarray:
    return np.floor(v.astype(np.float64) * 1000 + 0.5).astype(np.int64)


def _collect_quantized(emb: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy(np.int64)
    Q = quantize(np.stack(pdf["embedding"].to_numpy()))
    order = np.argsort(ids)
    return ids[order], Q[order]


def embedding_dup_pairs(emb: DataFrame, cos_pct: int = PAIR_COS_PCT) -> DataFrame:
    """All pairs with quantized cosine >= cos_pct/100 (dot>0), exact ints.

    Distributed shape: broadcast (ids, Q); each partition's rows are block-
    multiplied against the broadcast matrix. Output identical to the SQL
    all-pairs join.
    """
    spark = emb.sparkSession
    ids, Q = _collect_quantized(emb)
    b = spark.sparkContext.broadcast((ids, Q))
    thr = cos_pct * cos_pct

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_q = b.value
        norms = (all_q * all_q).sum(axis=1)
        for pdf in batches:
            my_ids = pdf["vec_id"].to_numpy(np.int64)
            my_q = quantize(np.stack(pdf["embedding"].to_numpy()))
            my_n = (my_q * my_q).sum(axis=1)
            dots = my_q @ all_q.T  # block × broadcast
            for r in range(len(my_ids)):
                if my_n[r] <= 0:
                    continue
                mask = (
                    (all_ids > my_ids[r])
                    & (norms > 0)
                    & (dots[r] > 0)
                    & (10000 * dots[r] * dots[r] >= thr * my_n[r] * norms)
                )
                if mask.any():
                    yield pd.DataFrame(
                        {
                            "a_id": np.full(mask.sum(), my_ids[r], dtype=np.int64),
                            "b_id": all_ids[mask],
                            "dot": dots[r][mask],
                            "na": np.full(mask.sum(), my_n[r], dtype=np.int64),
                            "nb": norms[mask],
                        }
                    )

    return emb.select("vec_id", "embedding").mapInPandas(
        compute, schema="a_id bigint, b_id bigint, dot bigint, na bigint, nb bigint"
    )


def ann_topk(emb: DataFrame, k: int = ANN_K, stride: int = QUERY_STRIDE) -> DataFrame:
    """Brute-force top-k for stride-sampled queries; same integer score as
    the SQL version (non-negative division then sign)."""
    spark = emb.sparkSession
    ids, Q = _collect_quantized(emb)
    b = spark.sparkContext.broadcast((ids, Q))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_q = b.value
        norms = (all_q * all_q).sum(axis=1)
        for pdf in batches:
            my_ids = pdf["vec_id"].to_numpy(np.int64)
            sel = my_ids % stride == 0
            if not sel.any():
                continue
            my_ids = my_ids[sel]
            my_q = quantize(np.stack(pdf["embedding"].to_numpy()[sel]))
            my_n = (my_q * my_q).sum(axis=1)
            dots = my_q @ all_q.T
            for r in range(len(my_ids)):
                if my_n[r] <= 0:
                    continue
                valid = (all_ids != my_ids[r]) & (norms > 0)
                d = dots[r][valid]
                nb = norms[valid]
                nid = all_ids[valid]
                # all products stay inside int64: dot²·1e5 <= 3.3e18 < 2^63
                pos = (d * d * 100000) // (my_n[r] * nb)
                score = np.where(d < 0, -pos, pos).astype(np.int64)
                # top-k by (score desc, neighbor_id asc)
                order = np.lexsort((nid, -score))[:k]
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(order), my_ids[r], dtype=np.int64),
                        "neighbor_id": nid[order],
                        "score_q": score[order],
                        "rnk": np.arange(1, len(order) + 1, dtype=np.int64),
                    }
                )

    return emb.select("vec_id", "embedding").mapInPandas(
        compute, schema="query_id bigint, neighbor_id bigint, score_q bigint, rnk bigint"
    )


def lsh_band_signatures(emb: DataFrame) -> DataFrame:
    """(vec_id, band_idx, band_sig, q, na) — hyperplane sign signatures,
    identical to the SQL banded signature."""
    planes = _planes()  # (bands*planes_per_band, DIM)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(np.int64)
            Q = quantize(np.stack(pdf["embedding"].to_numpy()))
            na = (Q * Q).sum(axis=1)
            pd_dots = Q @ planes.T  # (n, planes)
            bits = (pd_dots > 0).astype(np.int64)
            out = []
            for band in range(LSH_BANDS):
                sl = bits[:, band * LSH_PLANES_PER_BAND : (band + 1) * LSH_PLANES_PER_BAND]
                sig = (sl << np.arange(LSH_PLANES_PER_BAND)).sum(axis=1)
                out.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids,
                            "band_idx": np.full(len(ids), band, dtype=np.int64),
                            "band_sig": sig,
                            "q": list(Q),
                            "na": na,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return emb.select("vec_id", "embedding").mapInPandas(
        compute,
        schema="vec_id bigint, band_idx bigint, band_sig bigint, q array<bigint>, na bigint",
    )


def ann_lsh_pairs(emb: DataFrame, cos_pct: int = LSH_COS_PCT) -> DataFrame:
    """Banded hyperplane LSH pairs, verified *inside each bucket* — the
    10^12-row scale shape: vectors are shuffled once to their (band, sig)
    buckets, each bucket runs an in-memory numpy all-pairs verify, and only
    verified pairs (ids + exact ints, no arrays) leave the bucket. A pair
    sharing k bands is verified k times and deduped — cheaper than shuffling
    quantized vectors through a multi-million-row candidate join."""
    sigs = lsh_band_signatures(emb).filter(F.col("na") > 0)
    thr = cos_pct * cos_pct

    def verify_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in ("a_id", "b_id", "dot", "na", "nb")}
            )
        order = np.argsort(pdf["vec_id"].to_numpy(np.int64))
        ids = pdf["vec_id"].to_numpy(np.int64)[order]
        Q = np.stack(pdf["q"].to_numpy())[order]
        na = pdf["na"].to_numpy(np.int64)[order]
        dots = Q @ Q.T
        iu, ju = np.triu_indices(n, k=1)
        d = dots[iu, ju]
        keep = (d > 0) & (10000 * d * d >= thr * na[iu] * na[ju])
        return pd.DataFrame(
            {
                "a_id": ids[iu[keep]],
                "b_id": ids[ju[keep]],
                "dot": d[keep],
                "na": na[iu[keep]],
                "nb": na[ju[keep]],
            }
        )

    return (
        sigs.groupBy("band_idx", "band_sig")
        .applyInPandas(
            verify_bucket,
            schema="a_id bigint, b_id bigint, dot bigint, na bigint, nb bigint",
        )
        .dropDuplicates(["a_id", "b_id"])
    )
