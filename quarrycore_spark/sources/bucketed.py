"""Bucketed table layout: pre-shuffle hot tables ONCE so every later
join/aggregate on the bucket key runs with zero exchange.

The 100-TB lever the per-query plans can't give you: the dedup
pipeline joins the same keys repeatedly (doc_id between extraction /
signatures / labels; content_hash between snapshots — see
plans/incremental.py). At cluster scale each of those joins re-shuffles
terabytes unless the storage layout already agrees with the join key.
Writing both sides `bucketBy(N, key)` (hash-partitioned files + bucket
metadata in the catalog) lets Spark plan a sort-merge join whose BOTH
sides read pre-bucketed files: no ShuffleExchange at all, and with
`sortBy` the per-bucket sort is free too. Bucket count N is the unit
of join parallelism — size it so one bucket of the biggest table fits
an executor (e.g. 100 TB / 4096 buckets ≈ 25 GB/bucket of raw text,
~5 GB of signatures).

The reference has no counterpart (its SQLite hash store is a
single-node point-lookup design, storage/hash_db.py); this is the
Spark-native replacement for "the database is already indexed".

Tables are written EXTERNAL (explicit `path`) so callers control the
storage location; the catalog entry carries the bucket spec. Reading
back via `spark.table(name)` (not `spark.read.parquet`) is what
preserves bucketing — path reads lose the metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    key: str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write `df` as an external parquet table bucketed (and by default
    sorted) by `key`.

    The pre-write `repartition(buckets, key)` uses the same Murmur3
    hash as the bucket spec, so every task holds exactly one bucket and
    each bucket lands in ONE file (multi-file buckets fragment reads).
    At 100 TB this is the write-side shuffle you pay once instead of
    per downstream join.

    Honest Spark-version note: since 3.0 the scan no longer advertises
    the per-bucket sort order to the planner (verified absent in 4.1
    even under the legacy flag), so a merge join still plans
    in-partition Sort nodes — but they sort each bucket locally with
    ZERO network. The sortBy still pays for itself via parquet
    row-group min/max stats on the key.
    """
    from pyspark.sql import functions as F

    w = (
        df.repartition(buckets, F.col(key))
        .write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — REQUIRED for the bucket metadata to reach the
    planner (a plain parquet path read silently drops it)."""
    return spark.table(name)


def cobucketed_join(
    spark: SparkSession, left: str, right: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. With both
    sides bucketed on `key` this plans as a sort-merge join with no
    exchange on either side (the in-partition sorts remain; see
    write_bucketed)."""
    return read_bucketed(spark, left).join(read_bucketed(spark, right), key, how)
