#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line, always.

Measures, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:

1. per-query wall seconds for the headline registry queries;
2. dedup-pipeline throughput (docs/sec) on a generated pages corpus;
3. N-vs-4N scaling: the same pipeline job on the same input at
   local[N] and local[4N] in separate JVMs, reporting both throughputs
   and efficiency = (T_N / T_4N) / 4  (>= 0.8 target, BASELINE.md).

Budget discipline (round-3 lesson: the driver's bench timed out, rc 124,
and recorded nothing): the whole run fits $SPARK_GRAFT_BENCH_BUDGET_S
seconds (default 3300). Every scaling leg is gated on a measured-estimate
fit check before it starts, and a SIGALRM/SIGTERM handler emits the final
JSON with whatever legs completed — the bench can degrade to fewer draws,
but it can never die output-less.

Draw plan (see BENCH.md "N vs 4N scaling" for the noise model): the
sandbox's machine-wide serialized page-fault handler inflates stage walls
one-sidedly (runs are slowed, never sped up), so min-over-draws estimates
each leg's true cost. Round-4 lesson: an asymmetric plan that gives the N
leg a single draw biases efficiency upward (a one-draw min overestimates
T_N more than a three-draw min overestimates T_4N), so the guaranteed
plan is symmetric — [4N, N, 4N, N] — guaranteeing ≥ 2 recorded draws per
side, and the corpus factor is auto-sized so BOTH N legs fit the budget.
Extra draws alternate 4N/N while they fit. The result JSON reports
draws_n / draws_4n so the per-leg sample counts are auditable. Each leg
also runs an UNTIMED warmup pipeline on the base corpus first
(bench_pipeline.py) so fresh-JVM setup cost leaves the timed window.

Set SPARK_GRAFT_BENCH_FAST=1 to skip the scaling subprocesses (CI smoke).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))
BUDGET_S = int(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "3300"))
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
# Corpus size for the scaling legs, as a replication factor over the
# BENCH_PAGES base corpus. Two forces pull in opposite directions:
# bigger corpora push the job deeper into the compute-bound regime
# (extraction + signatures dominate — a 100 TB corpus always is) and
# shrink the fixed-stage share, while SMALLER corpora buy MORE DRAWS
# per side inside the budget — and draws are what make the min
# estimator converge: the ambient-interference lottery inflates a draw
# roughly in proportion to its duration (observed +45…+167 s on
# 250–940 s legs, landing on a different stage each time), so P(one
# clean draw) is what the plan buys, and min over 4–5 draws beats min
# over 2 every time it matters. Factor 16 (320k docs, ≈ 135 s per 4N
# leg / ≈ 400 s per N leg) fits 4N×4 + N×3 inside the default budget
# with the preamble (≈ 350 s); an A/B at factor 8 measured the same
# code at 0.94 efficiency, so the smaller corpus does not understate
# the true ratio. Auto-size from the budget unless overridden.
_factor_env = os.environ.get("SPARK_GRAFT_SCALE_FACTOR")
if _factor_env is not None:
    SCALE_FACTOR = int(_factor_env)
elif BUDGET_S >= 2900:
    SCALE_FACTOR = 16
elif BUDGET_S >= 1500:
    SCALE_FACTOR = 12
else:
    SCALE_FACTOR = 8

HEADLINE = [
    "exact_dedup",
    "dedup_survivors",
    "minhash_signatures",
    "minhash_verified_pairs",
    "simhash_pairs",
    "substring_pairs",
    "trigram_jaccard_pairs",
    "dedup_clusters",
    "token_counts",
    "doc_fingerprints",
    "event_sessions",
    "embedding_dup_pairs",
    "ann_topk",
    "ann_lsh_pairs",
    "ivf_assignments",
    "ivf_topk",
    "content_metrics",
    "media_phash_pairs",
    "doc_link_stats",
    "page_metadata",
    "dom_stats",
    "pii_scan",
    "domain_classify",
    "medical_entities",
    "doc_repetition",
    "corpus_dup_lines",
    "clean_dup_lines",
    "pii_redact",
    "filter_funnel",
    "link_graph",
    "cluster_representatives",
    "two_hop_domains",
    "decontaminate",
    "word_rarity",
    "event_attribution",
    "event_rate_window",
    "pack_sequences",
    "url_dedup",
    "incremental_dedup",
    "heavy_hitter_ngrams",
    "source_dedup_stats",
    "event_props_metadata",
    "stratified_sample",
    "windowed_event_counts",
    "gopher_quality_flags",
    "c4_line_filter",
    "url_revisions",
    "source_token_budget",
    "url_blocklist_filter",
    "cdx_index",
    "robots_decisions",
    "anchor_text_stats",
    "domain_pagerank",
    "sitemap_entries",
    "crawl_schedule",
]

T0 = time.time()

# Filled incrementally; the signal handlers emit whatever is here.
RESULT: dict = {
    "metric": "dedup_bench_total",
    "value": None,
    "unit": "sec",
    "queries": {},
    "sf": float(SF_DIR.rstrip("/").split("sf")[-1]),
    "scaling": None,
}
# Full per-draw audit detail (per-stage walls of every draw). Round-5
# lesson (VERDICT r5 #1): this detail embedded in the final JSON pushed
# the line past the driver's ~2,000-char stdout tail and the round lost
# ALL parsed data. It now goes to stderr per-draw and to this side file;
# the one-line RESULT keeps only mins, counts, walls, and estimators.
DETAIL: dict = {"draws": []}
DETAIL_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
)
# Hard cap for the canonical line, comfortably under the driver's tail
# window. _emit() drops audit extras (never metric/value/queries/
# efficiency) until the line fits.
MAX_LINE_CHARS = 1800
_EMITTED = False
_CHILD: subprocess.Popen | None = None


def _emit() -> None:
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    RESULT["value"] = round(time.time() - T0, 3)
    line = json.dumps(RESULT)
    # Degrade gracefully rather than overflow: strip optional audit keys
    # in increasing order of importance until the line fits the tail.
    if len(line) > MAX_LINE_CHARS and isinstance(RESULT.get("scaling"), dict):
        for key in ("draw_walls_4n", "draw_walls_n", "stage_efficiency"):
            RESULT["scaling"].pop(key, None)
            line = json.dumps(RESULT)
            if len(line) <= MAX_LINE_CHARS:
                break
    sys.stdout.write(line + "\n")
    sys.stdout.flush()


def _write_detail() -> None:
    # fold in the 10x-scale pair-family probe (tools/scale_probe.py,
    # VERDICT r6 #6) when its side file exists — the probe runs out of
    # band (it is minutes of work that would blow the bench budget) but
    # its walls/rows/shuffle-bytes evidence belongs in the round's detail
    try:
        probe_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALE_PROBE.json"
        )
        if os.path.exists(probe_path):
            with open(probe_path) as f:
                DETAIL["scale_probe"] = json.load(f)
    except (OSError, ValueError):
        pass
    try:
        with open(DETAIL_PATH, "w") as f:
            json.dump(DETAIL, f, indent=1)
    except OSError:
        pass


def _on_signal(signum, frame) -> None:
    print(f"# signal {signum} after {time.time() - T0:.0f}s — emitting partial result",
          file=sys.stderr)
    if _CHILD is not None and _CHILD.poll() is None:
        try:
            _CHILD.kill()
        except OSError:
            pass
    _emit()
    os._exit(0)


def remaining() -> float:
    return BUDGET_S - (time.time() - T0)


def main() -> None:
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGALRM, _on_signal)
    # Hard stop 45 s before the budget: enough to flush the JSON even if a
    # Spark call is mid-flight when the alarm fires.
    signal.alarm(max(BUDGET_S - 45, 60))

    from quarrycore_spark.plans import registry
    from quarrycore_spark.session import ensure_py_files, get_spark

    spark = get_spark("qc-bench", cores=CPUS, shuffle_partitions=CPUS)
    ensure_py_files(spark)

    # warm the JVM / parquet reader / codegen once so the first measured
    # query isn't charged ~5 s of session warmup
    from quarrycore_spark.sources.tables import load

    load(spark, SF_DIR, "documents")["documents"].count()

    # Sub-10 s queries get best-of-2: the sandbox's serialized page-fault
    # handler inflates walls one-sidedly, and on short queries a single
    # unlucky draw whipsaws the record ±4× between rounds (VERDICT r4 #2).
    # min-over-draws is the same estimator the scaling legs use. Cost:
    # < 60 s over the whole headline set.
    # Timed action is a noop-format write, NOT count(): count() lets
    # Catalyst prune the final row-preserving joins and projections, so a
    # query whose tail is `_aug LEFT JOIN _hits` (decontaminate) timed as
    # a bare corpus scan — 0.2 s recorded for a 1.5 s query. The noop sink
    # materializes every row and column end-to-end with zero driver
    # transfer; the row count is taken untimed afterwards for the audit
    # line only.
    def _materialize(df):
        df.write.format("noop").mode("overwrite").save()

    for name in HEADLINE:
        q = registry.REGISTRY[name]
        t0 = time.time()
        df = q.run_spark(spark, SF_DIR)
        _materialize(df)
        wall = time.time() - t0
        if wall < 10.0:
            t1 = time.time()
            _materialize(q.run_spark(spark, SF_DIR))
            wall = min(wall, time.time() - t1)
        RESULT["queries"][name] = round(wall, 3)
        n = df.count()  # untimed, diagnostics only
        print(f"# {name}: {n} rows in {RESULT['queries'][name]}s", file=sys.stderr)

    # --- pipeline throughput on a deterministic pages corpus ----------------
    import shutil
    import tempfile

    from quarrycore_spark.plans.pipeline import run_pipeline
    from quarrycore_spark.sources.corpus import generate_pages, pages_dataframe

    pages_dir = tempfile.mkdtemp(prefix="qc_bench_pages_")
    out_dir = tempfile.mkdtemp(prefix="qc_bench_out_")
    pages_df = pages_dataframe(spark, generate_pages(BENCH_PAGES, seed=42))
    pages_path = os.path.join(pages_dir, "pages")
    pages_df.repartition(CPUS).write.mode("overwrite").parquet(pages_path)

    # Best-of-2, same estimator as every other number here: a single
    # 12–20 s draw whipsawed the recorded throughput ±75% between rounds
    # (994 vs 1,723 docs/s on the same code) purely on lottery weather.
    pipe_wall = float("inf")
    for _rep in range(2):
        t0 = time.time()
        run_pipeline(spark, spark.read.parquet(pages_path), out_dir, resume=False)
        pipe_wall = min(pipe_wall, time.time() - t0)
        shutil.rmtree(out_dir, ignore_errors=True)
    pipe_dps = BENCH_PAGES / pipe_wall
    RESULT["pipeline_docs_per_sec"] = round(pipe_dps, 2)
    RESULT["pipeline_docs"] = BENCH_PAGES
    RESULT["pipeline_wall_s"] = round(pipe_wall, 3)
    print(f"# pipeline: {BENCH_PAGES} docs in {pipe_wall:.1f}s = {pipe_dps:.1f} docs/s",
          file=sys.stderr)

    # scale corpus for the N-vs-4N runs (Spark-side replication)
    scale_path = os.path.join(pages_dir, "pages_scale")
    scale_docs = 0
    if os.environ.get("SPARK_GRAFT_BENCH_FAST") != "1":
        from quarrycore_spark.sources.corpus import replicate_pages

        scaled = replicate_pages(spark, spark.read.parquet(pages_path), SCALE_FACTOR)
        scaled.repartition(CPUS * 4).write.mode("overwrite").parquet(scale_path)
        scale_docs = spark.read.parquet(scale_path).count()
        print(f"# scale corpus: {scale_docs} docs (factor {SCALE_FACTOR}, "
              f"budget {BUDGET_S}s, {remaining():.0f}s left)", file=sys.stderr)
    spark.stop()

    # --- N vs 4N scaling (separate JVMs) ------------------------------------
    if os.environ.get("SPARK_GRAFT_BENCH_FAST") != "1":
        runs: dict[int, dict] = {}
        draws: list[dict] = []
        # First-leg estimates (seconds) from the base pipeline throughput;
        # replaced by measured walls after each draw. The N estimate chains
        # off the first measured 4N wall (≈ 3.5×: observed T_N/T_4N ratios
        # run 2.7–3.4) so a noisy initial guess can't veto the one N draw.
        est = {
            SCALE_N * 4: max(scale_docs / max(pipe_dps, 1.0) * 1.3, 120.0),
            SCALE_N: float("inf"),
        }

        def run_leg(cores: int, rep: int) -> bool:
            """Run one leg if it fits the remaining budget. Returns False
            when skipped (budget) or failed."""
            global _CHILD
            leg_budget = remaining() - 75  # leave room to emit + cleanup
            if est[cores] * 1.1 > leg_budget:
                print(f"# skip local[{cores}] rep{rep}: est {est[cores]:.0f}s "
                      f"> {leg_budget:.0f}s left", file=sys.stderr)
                return False
            _CHILD = subprocess.Popen(
                [sys.executable, "-m", "quarrycore_spark.plans.bench_pipeline",
                 str(cores), scale_path, pages_path],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                env={
                    **os.environ,
                    "PYTHONPATH": os.path.dirname(os.path.abspath(__file__)),
                    # both legs run the IDENTICAL job shape: stage-output
                    # file count pinned to the 4N leg's natural value, so
                    # the N leg doesn't get a structurally cheaper job
                    # (fewer writer-buffer allocations) than the 4N leg
                    "SPARK_GRAFT_STAGE_FILES": os.environ.get(
                        "SPARK_GRAFT_STAGE_FILES", str(4 * SCALE_N * 4)
                    ),
                },
            )
            try:
                out, err = _CHILD.communicate(timeout=leg_budget)
            except subprocess.TimeoutExpired:
                _CHILD.kill()
                _CHILD.communicate()
                print(f"# local[{cores}] rep{rep}: leg timeout after "
                      f"{leg_budget:.0f}s", file=sys.stderr)
                return False
            finally:
                _CHILD = None
            lines = [ln for ln in out.splitlines() if ln.startswith("{")]
            if not lines:
                tail = "\n".join(err.splitlines()[-8:])
                print(f"# local[{cores}] rep{rep}: no output; stderr tail:\n{tail}",
                      file=sys.stderr)
                return False
            r = json.loads(lines[-1])
            print(f"# scale local[{cores}] rep{rep}: {r}", file=sys.stderr)
            # stages ride along so the per-draw noise is auditable (which
            # stage the lottery hit, each draw) — in the SIDE FILE and on
            # stderr, never in the one-line RESULT (VERDICT r5 #1)
            draws.append({"cores": cores, "rep": rep, "wall_s": r["wall_s"],
                          "stages": r.get("stages", {}),
                          "steal_s": r.get("steal_s"),
                          "load1": r.get("load1")})
            DETAIL["draws"] = draws
            _write_detail()
            est[cores] = r["wall_s"]
            if cores == SCALE_N * 4:
                est[SCALE_N] = min(est[SCALE_N], r["wall_s"] * 3.5)
            best = runs.get(cores)
            if best is None or r["wall_s"] < best["wall_s"]:
                runs[cores] = r
            # update on EVERY draw, not only improving ones — draw counts
            # and the per-stage mins must reflect all recorded draws
            _update_scaling(runs, draws, scale_docs)
            return True

        def _update_scaling(runs, draws, docs) -> None:
            s: dict = {
                "docs": docs,
                "cores_n": SCALE_N,
                "cores_4n": SCALE_N * 4,
                # compact per-draw walls (audit trail that FITS the tail);
                # full per-stage detail lives in BENCH_DETAIL.json + stderr
                "draw_walls_n": [
                    round(d["wall_s"], 1) for d in draws if d["cores"] == SCALE_N
                ],
                "draw_walls_4n": [
                    round(d["wall_s"], 1) for d in draws if d["cores"] == SCALE_N * 4
                ],
            }
            n, n4 = runs.get(SCALE_N), runs.get(SCALE_N * 4)
            if n:
                s["wall_s_n"] = n["wall_s"]
                s["docs_per_sec_n"] = n["docs_per_sec"]
            if n4:
                s["wall_s_4n"] = n4["wall_s"]
                s["docs_per_sec_4n"] = n4["docs_per_sec"]
            s["draws_n"] = sum(1 for d in draws if d["cores"] == SCALE_N)
            s["draws_4n"] = sum(1 for d in draws if d["cores"] == SCALE_N * 4)
            if n and n4:
                s["efficiency"] = round((n["wall_s"] / n4["wall_s"]) / 4, 3)
                # Per-stage minima ACROSS draws of a side: under the
                # one-sided noise model every observed stage wall is an
                # overestimate of that stage's true wall, and the lottery
                # lands on a different stage each draw — so composing
                # stage mins converges to the true leg wall with far
                # fewer draws than the whole-leg min (which needs one
                # draw where NO stage was hit). Both estimators are
                # reported; every input to both is in `draws`.
                def _stage_mins(cores: int) -> dict:
                    walls: dict = {}
                    for d in draws:
                        if d["cores"] != cores:
                            continue
                        for k, v in d.get("stages", {}).items():
                            if v > 0 and (k not in walls or v < walls[k]):
                                walls[k] = v
                    return walls
                mn, m4 = _stage_mins(SCALE_N), _stage_mins(SCALE_N * 4)
                s["stage_efficiency"] = {
                    k: round((mn[k] / v) / 4, 3)
                    for k, v in m4.items() if v > 0 and k in mn
                }
                common = [k for k in m4 if k in mn]
                if common:
                    s["efficiency_stage_min"] = round(
                        (sum(mn[k] for k in common)
                         / sum(m4[k] for k in common)) / 4, 3)
            RESULT["scaling"] = s

        # Guaranteed plan — SYMMETRIC (VERDICT r4 #1, ADVICE r4): one 4N
        # draw to calibrate estimates, then alternate so BOTH legs get
        # ≥ 2 recorded draws; a min over one draw systematically
        # overestimates that leg under the one-sided noise model, and an
        # asymmetric plan biases the efficiency ratio.
        plan = [SCALE_N * 4, SCALE_N, SCALE_N * 4, SCALE_N]
        for rep, cores in enumerate(plan):
            if not run_leg(cores, rep) and cores == SCALE_N and SCALE_N not in runs:
                # no N draw completed yet — no efficiency possible,
                # stop burning budget on more 4N draws
                break

        # Extras: STRICT alternation, 4N first (it is the cheap leg, so
        # when the budget cuts the tail both sides keep equal-or-nearly
        # equal draw counts). An adaptive pick-the-noisier-side variant
        # was tried and rejected: the 4N leg's non-stage overhead keeps
        # its leg-min-vs-stage-floor gap permanently larger, so it
        # starved the N side of draws (observed 8-vs-2) — re-creating
        # the asymmetric-plan upward bias the symmetric plan exists to
        # prevent. When one side stops fitting the budget, the other
        # still gets its turn before the loop gives up.
        extras = [SCALE_N * 4, SCALE_N, SCALE_N * 4, SCALE_N,
                  SCALE_N * 4, SCALE_N * 4]
        for i, cores in enumerate(extras):
            rep = len(plan) + i
            other = SCALE_N * 4 if cores == SCALE_N else SCALE_N
            if not run_leg(cores, rep) and not run_leg(other, rep):
                break

    shutil.rmtree(pages_dir, ignore_errors=True)
    signal.alarm(0)
    _emit()


if __name__ == "__main__":
    main()
