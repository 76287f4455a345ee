"""End-to-end pipeline tests: byte-identical extraction, canonicalization
invariants (ported semantics of the reference's test_canonical_html.py and
test_deduplication.py), and dup-pair recall >= 0.99 against an
arrival-order reference simulator that mirrors QuarryCore's
HybridDeduplicator semantics (hybrid_dedup.py:131-226: exact-first
short-circuit, then LSH query-before-insert in arrival order)."""

from __future__ import annotations

import numpy as np
import pytest

from quarrycore_spark.config import DEFAULT_CONFIG as CFG
from quarrycore_spark.extraction.canonical import (
    canonicalize_html,
    extract_main_text,
    extract_title,
)
from quarrycore_spark.operators.signatures import doc_signature
from quarrycore_spark.plans.pipeline import run_pipeline
from quarrycore_spark.sources.corpus import generate_pages, pages_dataframe

N_PAGES = 400
SEED = 42


@pytest.fixture(scope="module")
def corpus():
    return generate_pages(N_PAGES, seed=SEED)


# ---------------------------------------------------------------------------
# extraction / canonicalization (pure functions — no Spark needed)
# ---------------------------------------------------------------------------


def test_extraction_byte_identical(corpus):
    """The input_hint per-row invariant: extracted text == ground truth,
    byte for byte, for every url."""
    for r in corpus:
        assert extract_main_text(r.html) == r.text, r.url


def test_canonicalization_group_equality(corpus):
    """Equivalent HTML (whitespace runs, comments, entities, attribute
    noise) must canonicalize identically (test_canonical_html.py:43-181)."""
    groups: dict[int, set] = {}
    for r in corpus:
        if r.population in ("exact", "canon"):
            groups.setdefault(r.group_id, set()).add(canonicalize_html(r.html))
    assert groups, "corpus should contain dup groups"
    for gid, canon_set in groups.items():
        assert len(canon_set) == 1, f"group {gid} canonicalized inconsistently"


def test_canonicalization_idempotent_and_entities():
    h = b"<html><body><p>a &amp; b &#97;nd   c</p><script>x</script></body></html>"
    once = canonicalize_html(h)
    assert once == "a & b and c"
    assert canonicalize_html(once) == once  # idempotency (canonical.py:110)
    assert canonicalize_html(b"<p>unclosed <b>tags") == "unclosed tags"
    assert extract_title(b"<title>T &amp; t</title>") == "T & t"
    # invalid utf-8 → errors='replace' rule (pipeline.py:638)
    assert canonicalize_html(b"<p>ok\xff</p>").startswith("ok")


# ---------------------------------------------------------------------------
# reference-semantics simulator (arrival-order, query-before-insert)
# ---------------------------------------------------------------------------


def simulate_reference(corpus):
    """Single-node mirror of the reference dedup kernel: exact sha256 layer
    with first-writer-wins, then MinHash-LSH query-then-insert per arrival,
    signature-agreement verify at threshold. Returns the dup pair set
    (earlier_url, later_url) ... as doc indexes in arrival order."""
    a = np.array([p[0] for p in CFG.minhash_perms], dtype=np.int64)
    b = np.array([p[1] for p in CFG.minhash_perms], dtype=np.int64)
    order = sorted(range(len(corpus)), key=lambda i: (corpus[i].warc_ts, corpus[i].url))
    hash_first: dict[str, int] = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    sigs: dict[int, np.ndarray] = {}
    pairs = set()
    for i in order:
        r = corpus[i]
        canon = canonicalize_html(r.html)
        ch, sig, bands, _ = doc_signature(canon, CFG, a, b, family="poly")
        if ch in hash_first:
            pairs.add((hash_first[ch], i, "exact"))
            continue
        hash_first[ch] = i
        # near-dup over extracted text (reference uses the text layer);
        # same signature family as the pipeline under test
        _, sig, bands, _ = doc_signature(r.text, CFG, a, b, family="poly")
        cands = set()
        for bi, bh in enumerate(bands):
            cands.update(buckets.get((bi, int(bh)), ()))
        for j in cands:
            agree = int((sigs[j] == sig).sum())
            if agree * 100 >= CFG.num_perm * CFG.jaccard_threshold_pct:
                pairs.add((j, i, "minhash"))
        sigs[i] = sig
        for bi, bh in enumerate(bands):
            buckets.setdefault((bi, int(bh)), []).append(i)
    return pairs


@pytest.fixture(scope="module")
def pipeline_result(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pipe"))
    pages = pages_dataframe(spark, corpus)
    return run_pipeline(spark, pages, out), out


def test_pipeline_recall_vs_reference(spark, corpus, pipeline_result):
    """North-rule gate: dup-pair recall >= 0.99 vs the reference semantics
    under identical shingle/permutation/threshold config."""
    res, _ = pipeline_result
    ref_pairs = simulate_reference(corpus)
    assert ref_pairs, "simulator should find duplicates in this corpus"

    clusters = {r["doc_id"]: r["cluster_id"] for r in res.clusters.collect()}
    import pyspark.sql.functions as F

    url_to_id = {
        r["url"]: r["doc_id"]
        for r in res.docs.select("url", "doc_id").collect()
    }
    found = 0
    for i, j, _stage in ref_pairs:
        di, dj = url_to_id[corpus[i].url], url_to_id[corpus[j].url]
        if clusters[di] == clusters[dj]:
            found += 1
    recall = found / len(ref_pairs)
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} < 0.99 ({found}/{len(ref_pairs)})"


def test_borderline_pairs_not_merged(corpus, pipeline_result, spark):
    """False-positive guard: 20-35%-substituted pairs must NOT share a
    cluster (FIXTURES population 5)."""
    res, _ = pipeline_result
    clusters = {r["doc_id"]: r["cluster_id"] for r in res.docs.select("doc_id", "cluster_id").collect()}
    url_to_id = {r["url"]: r["doc_id"] for r in res.docs.select("url", "doc_id").collect()}
    groups: dict[int, list] = {}
    for r in corpus:
        if r.population == "borderline":
            groups.setdefault(r.group_id, []).append(url_to_id[r.url])
    merged = sum(
        1 for ids in groups.values() if len(ids) == 2 and clusters[ids[0]] == clusters[ids[1]]
    )
    assert merged == 0, f"{merged}/{len(groups)} borderline pairs wrongly merged"


def test_pipeline_resume_identical(spark, corpus, pipeline_result):
    """Re-running with resume=True must reuse every stage (manifest) and
    produce the identical docs_dedup table."""
    res, out = pipeline_result
    first = sorted(map(tuple, res.docs.select("doc_id", "cluster_id", "duplicate_type").collect()))
    pages = pages_dataframe(spark, corpus)
    res2 = run_pipeline(spark, pages, out, resume=True)
    second = sorted(map(tuple, res2.docs.select("doc_id", "cluster_id", "duplicate_type").collect()))
    assert first == second


def test_containment_pairs_detected(spark, corpus, pipeline_result):
    """Population 6 (doc B = doc A + extra) must surface in the substring
    stage with the contains/contained_in classification
    (fuzzy_matcher.py:200-236 semantics)."""
    _, out = pipeline_result
    sub = spark.read.parquet(f"{out}/substring_pairs")
    rows = {(r.a_id, r.b_id): r.match_type for r in sub.collect()}
    docs = spark.read.parquet(f"{out}/docs_dedup")
    url_to_id = {r["url"]: r["doc_id"] for r in docs.select("url", "doc_id").collect()}
    groups: dict[int, list] = {}
    for idx, r in enumerate(corpus):
        if r.population == "contain":
            groups.setdefault(r.group_id, []).append((idx, r))
    assert groups
    found = 0
    for gid, members in groups.items():
        if len(members) != 2:
            continue
        (ia, ra), (ib, rb) = members  # ra = base, rb = base + extra
        da, db = url_to_id[ra.url], url_to_id[rb.url]
        key = (min(da, db), max(da, db))
        if key in rows:
            found += 1
            assert rows[key] in ("contains", "contained_in"), rows[key]
    assert found / len(groups) >= 0.9, f"only {found}/{len(groups)} containment pairs found"


def test_pipeline_lineage_and_metrics(pipeline_result):
    res, _ = pipeline_result
    stages = {m["stage"] for m in res.metrics}
    assert {"extracted", "exact", "signatures", "pairs",
            "clusters", "docs_dedup", "summary"} <= stages
    summary = next(m for m in res.metrics if m["stage"] == "summary")
    assert summary["total_docs"] == N_PAGES
    assert 0 < summary["duplicate_docs"] < N_PAGES
    lin = res.lineage.collect()
    assert sum(r["rows"] for r in lin if r["stage"] == "docs_dedup") == N_PAGES


def test_cascade_quality_gate_and_overrides():
    """P6 gating semantics (manager.py:119-237): accept the first tier whose
    quality >= threshold; fall through otherwise; per-domain cascade-order
    overrides resolve by exact then suffix match (manager.py:87-117)."""
    from quarrycore_spark.extraction.canonical import (
        REFERENCE_GATE_SCALED,
        cascade_extract,
        resolve_cascade_order,
    )

    filler = "lorem ipsum dolor sit amet " * 30  # > 400 chars of chrome text
    html = (
        f"<html><head><title>t</title></head><body>"
        f"<nav>{filler}</nav><p>short main body</p></body></html>"
    ).encode()

    # tier 1 (strict) drops the nav => short text => quality 57 < 60;
    # tier 2 (lenient) keeps it => len > 400 => quality 100 >= 60
    text, tier, q, accepted = cascade_extract(
        html, url="https://a.example.org/x", lang="en",
        threshold_scaled=REFERENCE_GATE_SCALED,
    )
    assert accepted and tier == "lenient" and q >= 60
    assert "lorem ipsum" in text

    # threshold 0: first non-empty tier (strict) wins
    text0, tier0, _, acc0 = cascade_extract(html, lang="en", threshold_scaled=0)
    assert acc0 and tier0 == "strict" and "lorem ipsum" not in text0

    # every tier below gate -> best attempt returned, accepted=False
    tiny = b"<body><p>tiny</p></body>"
    _, _, _, acc_tiny = cascade_extract(
        tiny, lang="de", threshold_scaled=REFERENCE_GATE_SCALED
    )
    assert not acc_tiny

    # per-domain override: exact and subdomain-suffix matches
    ov = {"example.com": ("lenient",)}
    assert resolve_cascade_order("https://example.com/a", ov) == ("lenient",)
    assert resolve_cascade_order("https://www.example.com/a", ov) == ("lenient",)
    assert resolve_cascade_order("https://other.net/a", ov) == (
        "selector", "strict", "lenient",
    )
    # override respected end-to-end
    _, tier_ov, _, _ = cascade_extract(
        html, url="https://www.example.com/a", lang="en",
        threshold_scaled=0, overrides=ov,
    )
    assert tier_ov == "lenient"


def test_pipeline_recall_datasketch_family(spark, corpus):
    """North-rule fidelity gate under the reference's ACTUAL signature
    scheme (datasketch: sha1→uint32, (a*h+b) mod 2^61-1, seed=1 —
    minhash_redis.py:186-202) with its S-curve-optimal banding, not just
    the repo's poly family: arrival-order simulator vs the PRODUCTION
    pipeline path (run_pipeline(family="datasketch")), dup-pair recall
    >= 0.99."""
    import hashlib

    from quarrycore_spark.operators.datasketch_compat import (
        band_hashes,
        minhash_signature,
        optimal_param,
        permutations,
    )
    from quarrycore_spark.operators.signatures import char_shingles, normalize_text

    nb, nr = optimal_param(CFG.jaccard_threshold_pct / 100, CFG.num_perm)
    a, b = permutations(CFG.num_perm)

    # exact layer (shared semantics): arrival-order first-writer-wins
    order = sorted(
        range(len(corpus)), key=lambda i: (corpus[i].warc_ts, corpus[i].url)
    )
    hash_first: dict[str, int] = {}
    survivors = []
    for i in order:
        ch = hashlib.sha256(
            canonicalize_html(corpus[i].html).encode("utf-8")
        ).hexdigest()
        if ch not in hash_first:
            hash_first[ch] = i
            survivors.append(i)

    # reference-semantics near-dup layer: query-before-insert, ds scheme
    buckets: dict[tuple[int, int], list[int]] = {}
    sigs: dict[int, np.ndarray] = {}
    ref_pairs = set()
    for i in survivors:
        sig = minhash_signature(
            char_shingles(normalize_text(corpus[i].text), CFG.shingle_size), a, b
        )
        bands = band_hashes(sig, nb, nr)
        cands = set()
        for bi, bh in enumerate(bands):
            cands.update(buckets.get((bi, int(bh)), ()))
        for j in cands:
            agree = int((sigs[j] == sig).sum())
            if agree * 100 >= CFG.num_perm * CFG.jaccard_threshold_pct:
                ref_pairs.add((j, i))
        sigs[i] = sig
        for bi, bh in enumerate(bands):
            buckets.setdefault((bi, int(bh)), []).append(i)
    assert ref_pairs, "simulator should find near-dups under the ds scheme"

    # The PRODUCTION pipeline with the ds family wired end-to-end: same
    # stages, same LSH operators, same checkpointed pair output.
    import tempfile

    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="qc_ds_pipeline_")
    run_pipeline(
        spark, pages_dataframe(spark, corpus), out,
        resume=False, checkpoint=True, substring=False, family="datasketch",
    )
    docs_dedup = spark.read.parquet(f"{out}/docs_dedup")
    url_to_id = {r["url"]: r["doc_id"] for r in docs_dedup.select("url", "doc_id").collect()}
    got = {
        (min(r.a_id, r.b_id), max(r.a_id, r.b_id))
        for r in spark.read.parquet(f"{out}/pairs")
        .filter(F.col("kind") == "minhash")
        .collect()
    }
    found = 0
    for j, i in ref_pairs:
        da, db = url_to_id[corpus[j].url], url_to_id[corpus[i].url]
        if (min(da, db), max(da, db)) in got:
            found += 1
    recall = found / len(ref_pairs)
    assert recall >= 0.99, f"ds-family recall {recall:.4f} ({found}/{len(ref_pairs)})"
    import shutil

    shutil.rmtree(out, ignore_errors=True)


def test_pipeline_with_reference_quality_gate(spark, corpus, tmp_path):
    """P6 end-to-end: running the pipeline with the reference's 0.6 gate
    keeps every row (dead-letter, not drop) and marks sub-gate docs with
    extract_error='quality_gate'; lenient-tier fallbacks appear."""
    from quarrycore_spark.extraction.canonical import REFERENCE_GATE_SCALED

    out = str(tmp_path / "gated")
    res = run_pipeline(
        spark, pages_dataframe(spark, corpus), out,
        resume=False, checkpoint=False, substring=False,
        cascade_threshold=REFERENCE_GATE_SCALED,
    )
    rows = res.docs.select("doc_id", "extract_error").collect()
    assert len(rows) == len(corpus)  # rows survive, never dropped
    extracted = spark.read.parquet if False else None  # noqa: F841
    import pyspark.sql.functions as F

    gated = res.docs.filter(F.col("extract_error") == "quality_gate").count()
    # the synthetic corpus has short/non-English docs that fail both tiers
    assert gated > 0


def test_final_plan_keeps_text_local(spark):
    """Plan-shape pin for final_table (pipeline.py): the text column must
    never enter an Exchange. The regression this guards: joining extracted
    against the full ~140 B/row docs frame pushed the slim side past the
    broadcast threshold at corpus scale, demoting the join to sort-merge —
    a full shuffle of extracted_text. In `formatted` explain every operator
    lists its Input/Output columns, so asserting no Exchange section
    mentions extracted_text pins "the text never leaves its scan
    partitions" directly."""
    import re

    from pyspark.sql import functions as F

    from quarrycore_spark.plans.pipeline import final_table

    extracted = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://x.test/"), F.col("id")).alias("url"),
        F.current_timestamp().alias("warc_ts"),
        F.lit("en").alias("lang"),
        F.sha2(F.col("id").cast("string"), 256).alias("content_hash"),
        F.repeat(F.lit("body text "), 50).alias("extracted_text"),
        F.lit("t").alias("title"),
        F.lit(100).alias("quality_scaled"),
        F.lit(None).cast("string").alias("extract_error"),
    )
    docs = extracted.select(
        "doc_id", "url", "warc_ts", "content_hash",
        (F.col("doc_id") % 7 != 0).alias("is_exact_canonical"),
    )
    clusters = extracted.select("doc_id", (F.col("doc_id") % 5).alias("cluster_id"))
    mh = spark.createDataFrame(
        [(1, 2, 120), (3, 4, 125)], "a_id long, b_id long, score long"
    ).select("a_id", "b_id", "score", F.lit("minhash").alias("kind"))
    sh = spark.createDataFrame(
        [(5, 6, 2)], "a_id long, b_id long, score long"
    ).select("a_id", "b_id", "score", F.lit("simhash").alias("kind"))

    final = final_table(extracted, docs, clusters, mh, sh)
    plan = final._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # formatted mode: a header tree, then one "(n) OperatorName" section per
    # node with Input/Output column lists. No Exchange section may mention
    # the text column.
    sections = re.split(r"\n\(\d+\) ", plan)
    for sec in sections[1:]:
        op = sec.splitlines()[0]
        if "Exchange" in op:
            assert "extracted_text" not in sec, (
                f"text column crosses an {op}:\n{sec[:500]}"
            )
    # sanity: the final output still carries the text, and rows survive
    assert "extracted_text" in final.columns
    assert final.count() == 100
