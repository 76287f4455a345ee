"""LSH candidate generation + Jaccard verification as DataFrame ops.

Spark-native replacement of the reference's Redis LSH index
(minhash_redis.py:228-242): instead of per-doc band-bucket probes, the whole
corpus is exploded to (band_idx, band_hash) rows, hot buckets are capped
(the batch analogue of the reference's unbounded-bucket problem, SURVEY §4
"domain backpressure" row), and candidates come from an equi self-join —
pure shuffle, no index, AQE-salted when skewed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quarrycore_spark.config import DEFAULT_CONFIG, DedupConfig
from quarrycore_spark.operators._cache import track

DEFAULT_BUCKET_CAP = 200


def band_buckets(sigs: DataFrame, cap: int = DEFAULT_BUCKET_CAP) -> DataFrame:
    """sigs(doc_id, bands) → (doc_id, band_idx, band_hash), only buckets with
    2..cap members (singleton buckets produce no pairs; mega-buckets are
    boilerplate — dropped deterministically, counted in lineage)."""
    bx = track(sigs.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_hash")
    ))  # cap filter + both self-join sides reuse it; released via release_tracked()
    keep = (
        bx.groupBy("band_idx", "band_hash")
        .count()
        .filter((F.col("count") >= 2) & (F.col("count") <= cap))
        .drop("count")
    )
    return track(bx.join(keep, ["band_idx", "band_hash"]))


def candidate_pairs(sigs: DataFrame, cap: int = DEFAULT_BUCKET_CAP) -> DataFrame:
    """Distinct (a_id, b_id, n_bands) candidate pairs from band collisions."""
    bkt = band_buckets(sigs, cap)
    a = bkt.alias("a")
    b = bkt.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("n_bands"))
    )


_AGREE = (
    "aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1L, 0L)), "
    "0L, (acc, v) -> acc + v)"
)


def verified_pairs(
    sigs: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Candidates verified at signature agreement >= threshold.

    Signature-Jaccard (fraction of equal permutation slots) is the
    reference's verification rule (minhash_lsh.py:162-181). Integer
    threshold: agree*100 >= num_perm * threshold_pct.
    """
    cand = candidate_pairs(sigs, cap).select("a_id", "b_id")
    sig_only = sigs.select("doc_id", "sig")
    joined = (
        cand.join(sig_only.withColumnRenamed("sig", "sig_a"), cand.a_id == sig_only.doc_id)
        .drop("doc_id")
        .join(
            sig_only.withColumnRenamed("sig", "sig_b").withColumnRenamed("doc_id", "doc_id_b"),
            F.col("b_id") == F.col("doc_id_b"),
        )
        .drop("doc_id_b")
    )
    return (
        joined.withColumn("agree_cnt", F.expr(_AGREE))
        .filter(F.col("agree_cnt") * 100 >= cfg.num_perm * cfg.jaccard_threshold_pct)
        .select("a_id", "b_id", "agree_cnt")
    )
