"""Partition-count guard for CPU-dense kernels.

Spark sizes file-scan partitions by BYTES (spark.sql.files.maxPartitionBytes),
which is right for scan-bound work and wrong for kernels that cost ~100×
the scan per row (signature computation, media decode, winnowing): a 25 MB
corpus becomes 2 scan partitions and the kernel runs almost serially on a
32-core machine. ``spread`` repartitions such inputs up to the session's
default parallelism — only when the plan is BELOW it, so at real scale
(where scans yield thousands of partitions) it is a no-op and adds no
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least min_partitions (default: defaultParallelism)
    partitions ahead of a CPU-bound kernel; no-op when already wider.
    Streaming frames pass through untouched (micro-batch partitioning is
    the source's concern, and `.rdd` is illegal on a streaming plan)."""
    if df.isStreaming:
        return df
    par = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par) if df.rdd.getNumPartitions() < par else df
