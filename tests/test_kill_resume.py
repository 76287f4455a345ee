"""Hard-kill resumability: SIGKILL the pipeline CLI mid-run, rerun, and the
final table must be identical to an uninterrupted run (the north rule's
"resumable from checkpoint"; reference PipelineCheckpoint semantics,
pipeline.py:990-1033)."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = """
import sys
sys.path.insert(0, {repo!r})
from quarrycore_spark.session import get_spark, ensure_py_files
from quarrycore_spark.sources.corpus import generate_pages, pages_dataframe
from quarrycore_spark.plans.pipeline import run_pipeline
spark = get_spark("kill-test", cores=4, shuffle_partitions=4)
ensure_py_files(spark)
pages = pages_dataframe(spark, generate_pages(800, seed=11))
run_pipeline(spark, pages, {out!r}, resume=True, substring=False)
print("PIPELINE_DONE")
"""


def _run(out: str, kill_after_stage: str | None = None) -> bool:
    """Run the pipeline in a subprocess; optionally SIGKILL it once the
    manifest records `kill_after_stage`. Returns True if it completed."""
    p = subprocess.Popen(
        [sys.executable, "-c", _RUNNER.format(repo=REPO, out=out)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    man = os.path.join(out, "_manifest.json")
    if kill_after_stage is None:
        stdout, _ = p.communicate(timeout=600)
        return "PIPELINE_DONE" in stdout
    deadline = time.time() + 600
    while time.time() < deadline:
        if p.poll() is not None:  # finished before we could kill it
            return True
        if os.path.exists(man):
            try:
                with open(man) as f:
                    stages = json.load(f).get("stages", {})
            except (json.JSONDecodeError, OSError):
                stages = {}
            if kill_after_stage in stages and stages[kill_after_stage].get("path"):
                os.kill(p.pid, signal.SIGKILL)
                p.wait(timeout=60)
                return False
        time.sleep(0.2)
    raise TimeoutError("stage never appeared in manifest")


def test_sigkill_resume_identical(tmp_path, spark):
    interrupted = str(tmp_path / "interrupted")
    clean = str(tmp_path / "clean")
    os.makedirs(interrupted, exist_ok=True)
    os.makedirs(clean, exist_ok=True)

    completed = _run(interrupted, kill_after_stage="signatures")
    if not completed:
        # resume after the hard kill
        assert _run(interrupted)  # second run must finish
    assert _run(clean)  # uninterrupted reference run

    a = sorted(
        map(
            tuple,
            spark.read.parquet(f"{interrupted}/docs_dedup")
            .select("doc_id", "cluster_id", "duplicate_type", "is_duplicate")
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            spark.read.parquet(f"{clean}/docs_dedup")
            .select("doc_id", "cluster_id", "duplicate_type", "is_duplicate")
            .collect(),
        )
    )
    assert a == b
    # the interrupted run actually resumed (manifest has all stages)
    with open(os.path.join(interrupted, "_manifest.json")) as f:
        stages = json.load(f)["stages"]
    assert {"extracted", "signatures", "pairs", "clusters", "docs_dedup"} <= set(stages)
