"""10x-scale validation draw for the pair family (VERDICT r6 #6) and the
round-7 line-dedup family: run minhash_verified_pairs / simhash_pairs /
substring_pairs / corpus_dup_lines / clean_dup_lines once at sf0.1
(5k docs) and once at an sf1-equivalent 50k-doc corpus, recording walls,
output rows, and shuffle bytes — direct evidence the capped-join shapes
hold off the sf0.1 operating point (walls ~linear in rows, no bucket-cap
overflow blowup).

The 50k corpus is synthesized from sf0.1's documents by 10x replication
with per-replica word permutation: replica k of doc i carries doc i's
words reordered by xxhash64(word, position, k). Permuted replicas break
near-dup similarity with their sources and each other (measured: minhash
pair rows grow 8.9x for 10x docs ~ linear; simhash 5.5x), so the minhash
and simhash draws validate pure row-scaling. Replica 0 is the untouched
original corpus, so the 1x structure embeds exactly.

Caveat recorded deliberately: the substring draw's PAIR count grows
superlinearly (81x for 10x docs) — the testdata vocabulary is ~30 words,
so a 30-char L-gram is only ~5 words and two independently shuffled
50-word docs collide on such runs by birthday chance; at 50k docs that
yields 87.5k true containment pairs. This is a corpus property, not an
operator artifact — and it makes the draw the STRONGER evidence: the
capped gram join absorbs 81x output rows at ~3.5x wall with shuffle
bytes growing 10x (input-bound, not pair-bound), i.e. no cap overflow
and no quadratic blowup in the join itself.

Shuffle bytes come from the Spark UI REST API (stage-level
shuffle read/write, summed over the stages each query ran).

Writes BENCH_SCALE_PROBE.json at the repo root; bench.py folds it into
BENCH_DETAIL.json under "scale_probe".
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from quarrycore_spark.session import get_spark  # noqa: E402

# pair family (VERDICT r6 #6) + the round-7 line-dedup family, whose
# explode + two-stage count-distinct agg + line join is the same
# shape class the probe exists to validate off the sf0.1 point.
QUERIES = (
    "minhash_verified_pairs",
    "simhash_pairs",
    "substring_pairs",
    "corpus_dup_lines",
    "clean_dup_lines",
    # word-gram census family (positions-explode shape): heavy hitters'
    # count(DISTINCT doc_id) agg and decontam's (doc_id, gram) dedup +
    # broadcast eval probe.
    "heavy_hitter_ngrams",
    "decontaminate",
)
UI_PORT = 4077
OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_SCALE_PROBE.json",
)


def _rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _shuffle_totals(app_id: str) -> tuple[int, int]:
    """(shuffle_read_bytes, shuffle_write_bytes) summed over all completed
    stages so far — deltas around a query give that query's shuffle."""
    rd = wr = 0
    for st in _rest(f"applications/{app_id}/stages?status=complete"):
        rd += st.get("shuffleReadBytes", 0)
        wr += st.get("shuffleWriteBytes", 0)
    return rd, wr


def _scaled_documents(spark, src: str, factor: int, out_dir: str) -> str:
    docs = spark.read.parquet(f"{src}/documents.parquet")
    n = docs.count()
    reps = [docs.select("doc_id", "text")]
    for k in range(1, factor):
        permuted = F.expr(
            "array_join(transform(array_sort(transform(split(text, ' '), "
            f"(w, i) -> struct(xxhash64(w, i, {k}) AS srt, w AS w))), "
            "s -> s.w), ' ')"
        )
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
                permuted.alias("text"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    path = os.path.join(out_dir, f"x{factor}")
    out.repartition(16).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(
        "scale-probe", cores=cpus, shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    app_id = spark.sparkContext.applicationId

    from quarrycore_spark.plans.registry import REGISTRY, release_sigs

    tmp = tempfile.mkdtemp(prefix="qc_scale_probe_")
    result: dict = {"queries": {}, "base_sf": sf_dir}
    for factor in (1, 10):
        path = _scaled_documents(spark, sf_dir, factor, tmp)
        n_docs = spark.read.parquet(f"{path}/documents.parquet").count()
        for name in QUERIES:
            q = REGISTRY[name]
            best = None
            for _rep in range(2):  # best-of-2: the sandbox draw lottery
                rd0, wr0 = _shuffle_totals(app_id)
                t0 = time.time()
                df = q.run_spark(spark, path)
                # noop sink, not count(): count() lets Catalyst prune
                # row-preserving tails (see bench.py) — decontaminate
                # would time as a bare scan.
                df.write.format("noop").mode("overwrite").save()
                wall = time.time() - t0
                rd1, wr1 = _shuffle_totals(app_id)
                rows = df.count()  # untimed AND after the shuffle capture
                # (the count re-execution must not inflate the deltas)
                release_sigs(spark)  # drop the memoized signature frame
                rec = {
                    "wall_s": round(wall, 2), "rows": rows, "docs": n_docs,
                    "shuffle_read_mb": round((rd1 - rd0) / 1e6, 1),
                    "shuffle_write_mb": round((wr1 - wr0) / 1e6, 1),
                }
                if best is None or rec["wall_s"] < best["wall_s"]:
                    best = rec
            result["queries"].setdefault(name, {})[f"x{factor}"] = best
            print(f"# {name} x{factor}: {best}", file=sys.stderr)
    for name, recs in result["queries"].items():
        a, b = recs["x1"], recs["x10"]
        result["queries"][name]["wall_ratio_10x"] = round(
            b["wall_s"] / max(a["wall_s"], 1e-9), 2
        )
        result["queries"][name]["rows_ratio_10x"] = round(
            b["rows"] / max(a["rows"], 1), 2
        )
    with open(OUT_PATH, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["queries"], indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
