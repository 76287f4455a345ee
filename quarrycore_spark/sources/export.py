"""Dataset exporters + sampler — the reference's dataset construction
surface re-expressed as writers (S6/S7 in SURVEY §2.1 and the
quality-weighted sampler, dataset/sampler.py:21-105)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_jsonl(df: DataFrame, path: str, gzip: bool = True) -> None:
    """JSONL(.gz) shards (reference JsonlExporter, dataset/exporter.py:45-55)."""
    w = df.write.mode("overwrite")
    if gzip:
        w = w.option("compression", "gzip")
    w.json(path)


def export_parquet(df: DataFrame, path: str, shard_size: int = 50000) -> None:
    """Parquet shards with bounded records per file (reference
    ParquetExporter + chunk_size config, exporter.py:56-78, config.py:335)."""
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", shard_size)
        .option("compression", "snappy")
        .parquet(path)
    )


def quality_top_n(df: DataFrame, n: int, quality_col: str = "quality_scaled") -> DataFrame:
    """Top-n by quality with a deterministic tiebreak — the batch analogue
    of the reference's quality-weighted rejection sampler."""
    return df.orderBy(F.col(quality_col).desc(), F.col(df.columns[0])).limit(n)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Stratified sampling by a category column (sampleBy)."""
    return df.sampleBy(strata_col, fractions, seed)
