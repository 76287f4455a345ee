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


def export_hf_dataset(
    df: DataFrame,
    path: str,
    split: str = "train",
    shard_size: int = 50000,
) -> None:
    """S8: HuggingFace-datasets-compatible on-disk export (reference
    HuggingFaceExporter, dataset/exporter.py:79-94 minus the Hub push —
    network access and the datasets library are absent here, but the
    written layout is exactly what `datasets.load_dataset("parquet",
    data_dir=path)` consumes):

        {path}/data/{split}-*.parquet   bounded-size shards
        {path}/dataset_infos.json       features inferred from the schema

    Hub pushing is an authenticated network call the reference delegates to
    `datasets.push_to_hub`; a cluster deployment would call it after this
    export completes.
    """
    import json
    import os

    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", shard_size)
        .option("compression", "snappy")
        .parquet(os.path.join(path, "data"))
    )
    # rename Spark part files to the HF shard convention
    data_dir = os.path.join(path, "data")
    parts = sorted(
        f for f in os.listdir(data_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    for i, f in enumerate(parts):
        os.replace(
            os.path.join(data_dir, f),
            os.path.join(data_dir, f"{split}-{i:05d}-of-{len(parts):05d}.parquet"),
        )
    _HF_TYPES = {
        "string": "string", "long": "int64", "bigint": "int64",
        "int": "int32", "integer": "int32", "double": "float64",
        "float": "float32", "boolean": "bool", "binary": "binary",
        "timestamp": "timestamp[us]",
    }
    features = {
        f.name: {"dtype": _HF_TYPES.get(f.dataType.simpleString(), f.dataType.simpleString()),
                 "_type": "Value"}
        for f in df.schema.fields
    }
    n_rows = df.sparkSession.read.parquet(data_dir).count()
    info = {
        "default": {
            "features": features,
            "splits": {split: {"name": split, "num_examples": n_rows}},
        }
    }
    tmp = os.path.join(path, "dataset_infos.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(info, fh, indent=1)
    os.replace(tmp, os.path.join(path, "dataset_infos.json"))
