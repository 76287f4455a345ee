"""Scaling-run helper: executes the dedup pipeline on a pre-generated pages
parquet at a given core count and prints one JSON line with the wall time.

Run as a subprocess by bench.py so each parallelism level gets its own JVM
(a SparkSession's master can't change within one process). This implements
the two-cluster-size scaling criterion: same job, same input, N vs 4N cores
(BASELINE.md "Target for this repo").
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time


def main() -> None:
    cores = int(sys.argv[1])
    pages_path = sys.argv[2]
    from quarrycore_spark.plans.pipeline import run_pipeline
    from quarrycore_spark.session import ensure_py_files, get_spark

    spark = get_spark(f"qc-bench-{cores}", cores=cores, shuffle_partitions=max(cores, 8))
    ensure_py_files(spark)
    pages = spark.read.parquet(pages_path)
    n = pages.count()
    out = tempfile.mkdtemp(prefix=f"qc_scale_{cores}_")
    t0 = time.time()
    # Scaling-run configuration: the measured job is the dedup DETECTION
    # pipeline (extract → exact → signatures → LSH + SimHash pairs → CC →
    # labels). checkpoint=True keeps parquet stage outputs (columnar
    # pruning matters: LogicalRDD checkpoints force full-row scans);
    # substring=False excludes the classification-only containment stage
    # whose output does not affect dedup decisions.
    res = run_pipeline(spark, pages, out, resume=False, checkpoint=True, substring=False)
    wall = time.time() - t0
    stages = {}
    for m in res.metrics:
        if "wall_s" in m:
            stages[m["stage"]] = m["wall_s"]
            print(f"# {m['stage']}: {m['wall_s']}s ({m.get('rows')} rows)", file=sys.stderr)
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"cores": cores, "docs": n, "wall_s": round(wall, 3),
                      "docs_per_sec": round(n / wall, 2), "stages": stages}))


if __name__ == "__main__":
    main()
