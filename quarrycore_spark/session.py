"""SparkSession factory tuned for the dedup workload.

Local-mode defaults match the sandbox (local[32], single JVM); on a real
cluster the same builder is used with master/memory supplied by
spark-submit. AQE is on so skewed LSH-bucket joins are split at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


_PYFILES_SENT: set = set()


def ensure_py_files(spark: SparkSession) -> None:
    """Ship the quarrycore_spark package to Python workers via addPyFile.

    Required whenever the SparkSession was created by an external driver
    (the grading harness, spark-submit without --py-files): the driver
    process can import the package from the repo path, but executor Python
    workers have their own sys.path. Equivalent to
    `spark-submit --py-files quarrycore_spark.zip`.
    """
    key = id(spark)
    if key in _PYFILES_SENT:
        return
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        "/tmp", f"quarrycore_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "quarrycore_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _PYFILES_SENT.add(key)


def get_spark(
    app_name: str = "quarrycore_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # let AQE re-coalesce partitions downstream of persisted plans —
        # without this, a cached exploded-bands table pins shuffle-partition
        # count and small-data joins drown in per-task overhead
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        # read small test parquet with enough splits to use all cores
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        # NOTE: an earlier revision disabled spark.sql.constraintPropagation
        # to dodge a Spark 4.1 UnionBase.rewriteConstraints
        # NoSuchElementException on unions of localCheckpointed
        # aggregate-derived branches; the round-2 pipeline restructure
        # removed that plan shape and the default optimizer passes again.
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
