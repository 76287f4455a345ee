"""Table loading / view registration for the driver's parquet test tables."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

ALL_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def read_url_list(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited URL file → (url) rows — the reference's CLI input
    (S2, cli.py:129-165). Blank lines and #-comments dropped."""
    from pyspark.sql import functions as F

    return (
        spark.read.text(path)
        .select(F.trim("value").alias("url"))
        .filter((F.col("url") != "") & ~F.col("url").startswith("#"))
    )


def load(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read parquet tables from an sf dir and register them as temp views."""
    out: dict[str, DataFrame] = {}
    for name in names or ALL_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
