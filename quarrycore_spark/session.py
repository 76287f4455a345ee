"""SparkSession factory tuned for the dedup workload.

Local-mode defaults match the sandbox (local[32], single JVM); on a real
cluster the same builder is used with master/memory supplied by
spark-submit. AQE is on so skewed LSH-bucket joins are split at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


_PYFILES_SENT: set = set()

# Allocator tuning for the Python workers (the signature/extraction hot
# path). The per-batch work frees almost everything it allocates; with
# default settings that memory is returned to the OS (pymalloc unmaps
# empty 1 MB arenas, glibc trims the heap and mmaps blocks > 128 KB) and
# the NEXT batch page-faults it straight back in. On this sandbox the
# fault handler is machine-wide serialized, so that churn is a
# non-scaling cost: measured with tools/profile_sig_kernel.py, the prep
# phase scales 1->4 procs at 0.47 with default allocators and 0.87 with
# these settings (whole kernel 0.85 -> 0.97), at unchanged 1-proc wall.
# On a production cluster the same settings are standard "keep the heap"
# tuning: they trade peak-RSS retention for zero munmap/fault round
# trips in steady state. Workers are single-threaded, so routing
# PyObject allocation through glibc malloc (PYTHONMALLOC=malloc) with
# trim disabled gives full recycling of the string churn.
WORKER_ALLOC_ENV = {
    "PYTHONMALLOC": "malloc",
    "MALLOC_TRIM_THRESHOLD_": str(1 << 30),   # never trim the heap back
    "MALLOC_MMAP_THRESHOLD_": str(128 << 20), # numpy scratch stays on heap
    "MALLOC_TOP_PAD_": str(64 << 20),         # grow sbrk in big steps
}


def apply_worker_alloc_env() -> None:
    """Export WORKER_ALLOC_ENV so Spark's Python workers inherit it.

    Must run BEFORE the JVM is launched (the pyspark daemon — and the
    workers it forks — inherit the JVM's environment). Values already
    present in the environment win, so a caller can A/B-override.
    """
    for k, v in WORKER_ALLOC_ENV.items():
        os.environ.setdefault(k, v)


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
    apply_worker_alloc_env()
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
    # local mode: workers inherit via the JVM env (apply_worker_alloc_env
    # above); cluster mode: executors get the same tuning via executorEnv.
    for k, v in WORKER_ALLOC_ENV.items():
        b = b.config(f"spark.executorEnv.{k}", os.environ.get(k, v))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
