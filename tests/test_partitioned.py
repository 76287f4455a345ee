"""Snapshot partition pruning: layout, PartitionFilters in the plan,
and files-actually-read evidence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from quarrycore_spark.sources.partitioned import (
    read_snapshot,
    write_snapshot_partitioned,
)

DATES = ("2025-05-01", "2025-05-02", "2025-05-03", "2025-05-04")


def _write_corpus(spark, out_dir: str) -> None:
    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc body "), F.col("id")).alias("text"),
        F.to_date(
            F.element_at(
                F.array(*[F.lit(d) for d in DATES]),
                (F.col("id") % 4 + 1).cast("int"),
            )
        ).alias("crawl_date"),
    )
    write_snapshot_partitioned(docs, out_dir)


def test_layout_and_pruning(spark, tmp_path):
    out = str(tmp_path / "snap")
    _write_corpus(spark, out)
    # Hive-style directory layout, one dir per snapshot.
    dirs = sorted(d for d in os.listdir(out) if d.startswith("crawl_date="))
    assert dirs == [f"crawl_date={d}" for d in DATES]

    one = read_snapshot(spark, out, DATES[1])
    rows = one.collect()
    assert len(rows) == 100
    assert all(str(r.crawl_date) == DATES[1] for r in rows)

    # The filter must land in PartitionFilters (pruned before file
    # open), NOT merely PushedFilters (row-group skipping inside every
    # file).
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "crawl_date" in plan.split("PartitionFilters:")[1][:200]

    # Files-opened evidence (inputFiles() reports the PRE-filter file
    # index, so it can't show pruning): corrupt every OTHER partition's
    # parquet files — the pruned snapshot read (explicit schema, so no
    # inference footer-read) must still succeed because those files are
    # never opened, while a full scan fails.
    schema = spark.read.parquet(out).schema
    for d in DATES:
        if d == DATES[1]:
            continue
        pdir = os.path.join(out, f"crawl_date={d}")
        for f in os.listdir(pdir):
            if f.endswith(".parquet"):
                with open(os.path.join(pdir, f), "wb") as fh:
                    fh.write(b"not a parquet file")
    assert read_snapshot(spark, out, DATES[1], schema=schema).count() == 100
    import pytest

    with pytest.raises(Exception):
        spark.read.schema(schema).parquet(out).count()


def test_full_scan_still_reads_everything(spark, tmp_path):
    out = str(tmp_path / "snap2")
    _write_corpus(spark, out)
    df = spark.read.parquet(out)
    assert df.count() == 400
    # the partition column is reconstructed from the directory names
    assert {str(r.crawl_date) for r in df.select("crawl_date").distinct().collect()} == set(DATES)
