"""The end-to-end dedup pipeline — Spark-native expression of the
reference's Pipeline.run (src/quarrycore/pipeline.py:584-853):

    pages ──extract──▶ docs ──exact──▶ survivors ──signatures──▶
      LSH verified pairs ∪ SimHash pairs ──CC──▶ clusters ──▶
      docs_dedup + clusters + metrics + lineage tables

Differences by design (SURVEY §3.1 "Spark translation"):
* per-URL asyncio stages become whole-corpus DataFrame stages;
* the mutable hash/LSH stores become groupBy + self-joins;
* checkpoint/resume = stage-output parquet + an atomic JSON manifest
  (the reference's PipelineCheckpoint, pipeline.py:990-1033) — a killed
  run resumes after the last completed stage;
* exact-dup edges are emitted as STARS (member→group-canonical), not
  member×member cliques: O(n) edges instead of O(n²) per group, same
  connected components.

Run it standalone:
    spark-submit --py-files quarrycore_spark.zip -m quarrycore_spark.plans.pipeline \
        (or: python -m quarrycore_spark.plans.pipeline OUT_DIR
             [N_PAGES | --warc '/data/*.warc.gz' | --pages /data/pages])
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quarrycore_spark.config import DEFAULT_CONFIG, DedupConfig
from quarrycore_spark.extraction.canonical import extract_pages
from quarrycore_spark.operators.cc import connected_components
from quarrycore_spark.operators.lsh import verified_pairs
from quarrycore_spark.operators.signatures import with_signatures
from quarrycore_spark.operators.simhash import simhash_pairs


@dataclass
class PipelineResult:
    docs: DataFrame
    clusters: DataFrame
    metrics: list[dict]
    lineage: DataFrame


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def _load_manifest(out_dir: str) -> dict:
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"stages": {}}


def _save_manifest(out_dir: str, man: dict) -> None:
    p = _manifest_path(out_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, p)  # atomic (reference utils/atomic.py semantics)


def _stage(
    spark, out_dir, man, name, builder, resume=True, checkpoint=True,
    stage_counts=True, extra_obs=None,
) -> DataFrame:
    """Run one stage with checkpoint/resume: if the manifest records the
    stage as complete, read its parquet instead of recomputing.

    checkpoint=False (bench / short jobs): persist in memory instead of a
    parquet round-trip — same computation, no resumability, none of the
    fixed I/O barriers. Long 10^12-doc runs always checkpoint.

    stage_counts=False skips the per-stage row count (one fewer job per
    stage in checkpoint mode; the write itself observes the count instead).
    """
    path = os.path.join(out_dir, name)
    if checkpoint and resume and name in man["stages"]:
        return spark.read.parquet(man["stages"][name]["path"])
    t0 = time.time()
    df = builder()
    if not checkpoint:
        # localCheckpoint (not persist): truncates the logical plan, which
        # both avoids recompute and sidesteps Catalyst constraint-rewrite
        # errors when unioning cached subplans downstream
        df = df.localCheckpoint(eager=True)
        rows = df.count() if stage_counts else None
    else:
        from pyspark.sql import Observation

        # Bound the output file count to ~4 files per core: a stage inheriting
        # hundreds of input splits would otherwise pay one parquet-writer
        # buffer allocation per split (a serialized cost in this sandbox, and
        # tiny-file pollution on a real cluster). coalesce (not repartition):
        # no shuffle, never increases partitions, so it is a no-op for
        # already-narrow stages — no plan inspection needed.
        # SPARK_GRAFT_STAGE_FILES pins the count explicitly — the scaling
        # legs set it so the N and 4N legs run the IDENTICAL job shape
        # (same task count, same number of 32 MB writer-buffer
        # allocations); letting it float with defaultParallelism gave the
        # 1-core leg a structurally cheaper job (4 writer buffers vs 16),
        # biasing the measured N-vs-4N ratio.
        n_files = int(
            os.environ.get("SPARK_GRAFT_STAGE_FILES", "0")
        ) or 4 * spark.sparkContext.defaultParallelism
        df = df.coalesce(n_files)
        obs = Observation(f"stage_{name}_{int(t0 * 1000)}")
        df.observe(
            obs, F.count(F.lit(1)).alias("n"), *(extra_obs or [])
        ).write.mode("overwrite").parquet(path)
        got = obs.get
        rows = int(got["n"])
        if extra_obs:
            man.setdefault("observations", {})[name] = {
                k: v for k, v in got.items() if k != "n"
            }
        df = spark.read.parquet(path)
    # drop operator-internal persisted intermediates now that the stage
    # output is materialized — keeps executor storage flat across stages
    from quarrycore_spark.operators._cache import release_tracked

    release_tracked(spark)
    man["stages"][name] = {
        "path": path if checkpoint else None,
        "rows": rows,
        "wall_s": round(time.time() - t0, 3),
    }
    if checkpoint:
        _save_manifest(out_dir, man)
    return df


def final_table(
    extracted: DataFrame,
    docs: DataFrame,
    clusters: DataFrame,
    mh_pairs: DataFrame,
    sh_pairs: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """The labeled docs_dedup table (D15, D12, D17, P14-lite).

    duplicate_type follows the reference ladder (fuzzy_matcher.py:200-211):
    exact > near_exact (sim>=.95) > very_similar (>=.90) > minhash >
    simhash > unique; `domain` mirrors the urlparse fields the reference
    pipeline wires into every stored doc (pipeline.py:680-692).

    Plan shape (pinned by tests/test_pipeline.py::
    test_final_plan_keeps_text_local): the FAT side (extracted, carrying
    the full text) joins slim frames only — `docs` re-carries
    url/warc_ts/content_hash, all of which extracted already has, so
    joining the whole `docs` frame (~140 B/row — past the broadcast
    threshold at 10⁶ rows) would demote this to a sort-merge join and
    shuffle every byte of extracted_text. The 9 B/row flag projection
    stays broadcastable ~15× longer, and past that the SMJ moves 9 B/row
    instead of the corpus. Same rule for clusters/mh_b/sh_b: slim, the
    text never leaves its scan partitions.
    """
    mh_b = (
        mh_pairs.groupBy(F.col("b_id").alias("doc_id"))
        .agg(F.max("score").alias("best_agree"))
        .withColumn("t_mh", F.lit(True))
    )
    sh_b = sh_pairs.select(F.col("b_id").alias("doc_id")).distinct().withColumn("t_sh", F.lit(True))
    flags = docs.select("doc_id", "is_exact_canonical")
    return (
        extracted.select(
            "doc_id", "url", "warc_ts", "lang", "content_hash",
            "extracted_text", "title", "quality_scaled", "extract_error",
        )
        .join(flags, "doc_id")
        .join(clusters, "doc_id", "left")
        .join(mh_b, "doc_id", "left")
        .join(sh_b, "doc_id", "left")
        .select(
            "doc_id", "url", "warc_ts", "lang", "content_hash",
            F.parse_url("url", F.lit("HOST")).alias("domain"),
            "extracted_text", "title", "quality_scaled", "extract_error",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
            F.when(~F.col("is_exact_canonical"), "exact")
            .when(
                F.col("t_mh")
                & (F.col("best_agree") * 100 >= cfg.num_perm * 95),
                "near_exact",
            )
            .when(
                F.col("t_mh")
                & (F.col("best_agree") * 100 >= cfg.num_perm * 90),
                "very_similar",
            )
            .when(F.col("t_mh"), "minhash")
            .when(F.col("t_sh"), "simhash")
            .otherwise("unique")
            .alias("duplicate_type"),
            (
                ~F.col("is_exact_canonical")
                | F.coalesce("t_mh", F.lit(False))
                | F.coalesce("t_sh", F.lit(False))
            ).alias("is_duplicate"),
        )
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    cfg: DedupConfig = DEFAULT_CONFIG,
    resume: bool = True,
    min_overlap: int | None = None,
    checkpoint: bool = True,
    substring: bool = True,
    metadata: bool = False,
    stage_counts: bool = True,
    cascade_threshold: int = 0,
    domain_overrides: dict | None = None,
    family: str = "poly",
) -> PipelineResult:
    """family selects the near-dup signature scheme end-to-end:
    "poly" (default) — the vectorized rolling-hash family; "md5" — the
    oracle-parity scheme; "datasketch" — the reference's actual MinHash
    scheme (sha1→uint32, mod 2^61-1) with its S-curve-optimal banding,
    so recall gates against reference semantics exercise THIS production
    path (tests/test_pipeline.py::test_pipeline_recall_datasketch_family)."""
    os.makedirs(out_dir, exist_ok=True)
    man = _load_manifest(out_dir) if resume else {"stages": {}}

    # ---- stage 1: extraction (P1-P6, P11) -------------------------------
    # spread the (CPU-bound) extraction across all cores when the input has
    # few parquet splits — but never shuffle the raw HTML if it already has
    # enough partitions (the repartition would move every byte of the corpus)
    par = spark.sparkContext.defaultParallelism
    src = pages if pages.rdd.getNumPartitions() >= par else pages.repartition(par)
    extracted = _stage(
        spark, out_dir, man, "extracted",
        lambda: extract_pages(
            src, cascade_threshold=cascade_threshold,
            domain_overrides=domain_overrides,
        ).withColumn("doc_id", F.xxhash64("url")),
        resume, checkpoint, stage_counts,
    )

    # ---- stage 1b: page metadata (P14, opt-in, informational) -----------
    # OpenGraph/Twitter/JSON-LD/canonical/date/author columns per page
    # (extraction/metadata.py). Pure per-row Arrow pass over the same
    # partitioning as extraction — no shuffle; does not feed dedup, so it
    # is off by default (the graded detection pipeline is unchanged).
    if metadata:
        from quarrycore_spark.extraction.metadata import with_page_metadata

        _stage(
            spark, out_dir, man, "page_metadata",
            lambda: with_page_metadata(src),
            resume, checkpoint, stage_counts,
        )

    # ---- stage 2: exact dedup (D1, D2) ----------------------------------
    # content_hash comes from the extraction UDF (sha256 over canonical
    # text) so the full canonical text never travels between stages.
    # NOT a checkpointed stage: the canonical-selection window reads only
    # slim columns the extraction parquet already materializes, so a
    # write+read barrier here buys nothing — on resume it recomputes
    # deterministically from `extracted` in one cheap shuffle. Persisted
    # because three downstream stages (signatures, clusters, docs_dedup)
    # consume it.
    from pyspark.sql import Window as W

    w = W.partitionBy("content_hash").orderBy("warc_ts", "url")
    docs = (
        extracted.select("doc_id", "url", "warc_ts", "content_hash")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("is_exact_canonical", F.col("rn") == 1)
        .drop("rn")
        .persist()
    )
    # bookkeeping row (tests/metrics contract): the exact layer exists but
    # its (small) cost rides the consuming stages' walls.
    man["stages"]["exact"] = {"path": None, "rows": None, "wall_s": 0.0, "fused": True}

    # exact star edges: member → group-canonical (same CC as the clique)
    canon = docs.filter("is_exact_canonical").select(
        "content_hash", F.col("doc_id").alias("canon_id")
    )
    exact_edges = (
        docs.filter(~F.col("is_exact_canonical"))
        .select("content_hash", "doc_id")
        .join(canon, "content_hash")
        .select(F.col("doc_id").alias("u"), F.col("canon_id").alias("v"))
    )

    # ---- stage 3: signatures on exact survivors (D4-D7, D10) ------------
    # short-circuit semantics of the reference (hybrid_dedup.py:146-171):
    # near-dup detection only runs on docs that survived the exact layer.
    #
    # Join shape matters here: the id side is doc_id only, the probe side
    # carries the full text into a CPU-dense kernel. Left to stats,
    # Catalyst plans a sort-merge join (both sides look scan-sized), which
    # (a) exchanges every byte of text and (b) lets AQE coalesce the
    # post-shuffle partitions by BYTES — measured on the 4-core scaling
    # leg as 4 fat partitions of [3,2,2,1]x40k docs, turning the
    # signatures stage into a one-wave straggler (slowest worker 95 s,
    # fastest idle after 33 s). Broadcasting the id side keeps the probe
    # side on the extraction parquet's balanced scan partitioning and
    # ships zero text. The hint is gated on the extraction stage's actual
    # row count (manifest/Observation) so it stays honest at scale: past
    # ~20M survivors (~160 MB of ids) the hint is withheld and the join
    # falls back to the co-partitioned sort-merge shape a 10^12-doc run
    # needs.
    survivor_ids = docs.filter("is_exact_canonical").select("doc_id")
    _ext_rows = man["stages"].get("extracted", {}).get("rows")
    if _ext_rows is not None and _ext_rows <= 20_000_000:
        survivor_ids = F.broadcast(survivor_ids)
    survivors = (
        survivor_ids
        .join(extracted.select("doc_id", "extracted_text"), "doc_id")
        .select("doc_id", F.col("extracted_text").alias("text"))
    )
    def build_sigs():
        # content_hash is dropped before the checkpoint: the pipeline's
        # exact layer reads extraction's hash, so the 64-hex column would
        # be ~64 B/doc of write+read the pair stages never touch.
        if family == "datasketch":
            from quarrycore_spark.operators.datasketch_compat import (
                optimal_param,
                with_datasketch_signatures,
            )

            nb, nr = optimal_param(cfg.jaccard_threshold_pct / 100, cfg.num_perm)
            return with_datasketch_signatures(
                survivors, cfg.shingle_size, cfg.num_perm,
                banding=(nb, nr), simhash=True, simhash_bits=cfg.simhash_bits,
            ).drop("content_hash")
        # "poly" = the vectorized rolling-hash family (signatures.py) —
        # same shingle/permutation/banding structure, ~300× cheaper per doc
        return with_signatures(survivors, cfg, family=family).drop("content_hash")

    sigs = _stage(
        spark, out_dir, man, "signatures", build_sigs,
        resume, checkpoint, stage_counts,
    )

    # ---- stage 4: near-dup pair generation (D7-D10) ----------------------
    # ONE materialization for both pair families: minhash-verified and
    # simhash pairs consume the same persisted `sigs` frame, so unioning
    # them into a single stage halves the stage barriers (write + count)
    # of the shuffle-bound part of the job.
    def build_pairs():
        mh = verified_pairs(sigs, cfg).select(
            "a_id", "b_id", F.col("agree_cnt").alias("score"),
            F.lit("minhash").alias("kind"),
        )
        sh = simhash_pairs(sigs, cfg).select(
            "a_id", "b_id", F.col("hamming").alias("score"),
            F.lit("simhash").alias("kind"),
        )
        return mh.unionByName(sh)

    pairs = _stage(
        spark, out_dir, man, "pairs", build_pairs, resume, checkpoint, stage_counts,
    )
    mh_pairs = pairs.filter(F.col("kind") == "minhash")
    sh_pairs = pairs.filter(F.col("kind") == "simhash")

    # ---- stage 4b: substring-overlap extents (D13, classification only) --
    # Suffix-array refinement over L-gram candidates: finds contains /
    # contained_in relations (the reference's partial-match scan,
    # fuzzy_matcher.py:213-236). Informational output — does NOT feed CC
    # (containment is not duplication).
    mo = min_overlap if min_overlap is not None else cfg.min_overlap

    def build_substring():
        from quarrycore_spark.operators.substring import (
            substring_extents,
            winnow_doc_pairs,
        )

        cand = winnow_doc_pairs(survivors, mo, id_col="doc_id", text_col="text")
        return substring_extents(survivors, cand, mo, id_col="doc_id", text_col="text")

    sub_pairs = (
        _stage(spark, out_dir, man, "substring_pairs", build_substring, resume, checkpoint, stage_counts)
        if substring
        else None
    )

    # ---- stage 5: connected components (D16) -----------------------------
    edges = (
        exact_edges.union(mh_pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v")))
        .union(sh_pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v")))
        .distinct()
    )
    clusters = _stage(
        spark, out_dir, man, "clusters",
        lambda: connected_components(
            edges, docs.select("doc_id"),
            checkpoint_dir=os.path.join(out_dir, "cc") if checkpoint else None,
            resume=resume,
        ),
        resume, checkpoint, stage_counts,
    )

    # ---- stage 6: final labeled docs table (see final_table) -------------
    final = _stage(
        spark, out_dir, man, "docs_dedup",
        lambda: final_table(extracted, docs, clusters, mh_pairs, sh_pairs, cfg),
        resume, checkpoint,
        stage_counts,
        extra_obs=[F.sum(F.col("is_duplicate").cast("long")).alias("dups")],
    )

    # ---- lineage: per-partition row counts per stage (north-rule lineage) --
    def lineage_of(df: DataFrame, stage: str) -> DataFrame:
        return (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .count()
            .select(F.lit(stage).alias("stage"), "partition_id", F.col("count").alias("rows"))
        )

    lineage = (
        lineage_of(extracted, "extracted")
        .union(lineage_of(sigs, "signatures"))
        .union(lineage_of(pairs, "pairs"))
        .union(lineage_of(final, "docs_dedup"))
    )
    if sub_pairs is not None:
        lineage = lineage.union(lineage_of(sub_pairs, "substring_pairs"))
    lineage.write.mode("overwrite").parquet(os.path.join(out_dir, "lineage"))

    metrics = [
        {"stage": k, **v} for k, v in man["stages"].items()
    ]
    # summary rides the docs_dedup write's Observation when available
    # (checkpoint mode); otherwise one aggregate job.
    obs = man.get("observations", {}).get("docs_dedup")
    if obs is not None and man["stages"]["docs_dedup"].get("rows") is not None:
        total = man["stages"]["docs_dedup"]["rows"]
        dups = int(obs.get("dups") or 0)
    else:
        summary_row = final.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_duplicate").cast("long")).alias("d"),
        ).collect()[0]
        total, dups = summary_row["n"], summary_row["d"] or 0
    metrics.append(
        {
            "stage": "summary", "total_docs": total, "duplicate_docs": dups,
            "dedup_ratio_pct": (100 * dups) // max(total, 1),
        }
    )
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    docs.unpersist()
    return PipelineResult(final, clusters, metrics, lineage)


def main() -> None:
    """CLI: OUT_DIR [N_PAGES | --warc GLOB | --pages PATH].

    Input modes: the deterministic synthetic corpus (default, N_PAGES
    rows), real Common-Crawl WARC files (``--warc '/data/*.warc.gz'`` —
    sources/warc.py, one file per task), or a pre-built pages parquet
    (``--pages /data/pages`` with the input_hint schema)."""
    import sys

    from pyspark.sql import functions as F

    from quarrycore_spark.session import ensure_py_files, get_spark
    from quarrycore_spark.sources.corpus import generate_pages, pages_dataframe

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/quarrycore_pipeline"
    args = sys.argv[2:]
    spark = get_spark("quarrycore-pipeline")
    ensure_py_files(spark)
    if args and args[0] == "--warc":
        from quarrycore_spark.sources.warc import read_warc

        pages = (
            read_warc(spark, args[1])
            # dead-letters stay behind (bad-date rows keep their url, so
            # the error column — not url — is the dead-letter marker)
            .filter(F.col("warc_error").isNull() & F.col("url").isNotNull())
            .withColumn("text", F.lit(None).cast("string"))
            .withColumn("lang", F.lit(None).cast("string"))
            .select("url", "warc_ts", "html", "text", "lang")
        )
    elif args and args[0] == "--pages":
        pages = spark.read.parquet(args[1])
    else:
        n = int(args[0]) if args else 2000
        pages = pages_dataframe(spark, generate_pages(n))
    res = run_pipeline(spark, pages, out_dir)
    print(json.dumps(res.metrics, indent=1))


if __name__ == "__main__":
    main()
