"""Snapshot-partitioned table layout — the scan-pruning lever for a
10^12-row crawl corpus.

A Common-Crawl-shaped corpus accretes by DUMP: each crawl snapshot adds
a slab of pages, and almost every production query touches one snapshot
(dedup the new dump, export last month, recount one crawl). The layout
that makes those queries cheap is Hive-style partitioning on the
snapshot date: ``crawl_date=YYYY-MM-DD/`` directories that the reader
prunes BEFORE any file is opened — a date-filtered query over a 100-dump
corpus reads 1% of the files, and the pruning shows up in the plan as
``PartitionFilters`` (vs ``PushedFilters``, which still opens every
file and skips row groups). This is the parquet expression of the same
idea Iceberg partition transforms serve; swapping the writer to an
Iceberg catalog keeps the API and the pruning semantics.

Partition-count discipline: the partition column must be LOW
cardinality (dates: ~365/year — fine; urls: never). Files per
partition follow the writer's parallelism; at scale pair this with
``maxRecordsPerFile`` (sources/export.py) so one hot snapshot doesn't
produce mega-files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_snapshot_partitioned(
    df: DataFrame, out_dir: str, date_col: str = "crawl_date"
) -> None:
    """Write `df` as parquet partitioned by its snapshot-date column.

    The date column must already exist (derive it once, e.g.
    ``F.to_date("warc_ts")``) — deriving it here would hide the contract
    that the SAME derivation must be used in every filter for pruning
    to fire.
    """
    df.write.mode("overwrite").partitionBy(date_col).parquet(out_dir)


def read_snapshot(
    spark: SparkSession, out_dir: str, date: str,
    date_col: str = "crawl_date", schema=None,
) -> DataFrame:
    """One snapshot's rows; the filter prunes at the PARTITION level —
    non-matching date directories' files are never OPENED.

    Pass `schema` in production: without it the reader samples a
    parquet footer for schema inference — an extra file open that, on a
    100-dump corpus, may touch a partition the filter would have
    pruned (and is the one read that can still fail on a corrupt
    out-of-snapshot file)."""
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(out_dir).filter(F.col(date_col) == date)
