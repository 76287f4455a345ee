"""ANN operator scale-shape guards.

These tests pin the two executor-safety properties the round-2 review
flagged: (a) ivf_topk must stay correct AND bounded when the codebook is
pathologically skewed (every vector assigned to one hot centroid — exactly
what a near-dup-heavy corpus produces), and (b) the broadcast caps fail
loudly instead of melting the driver.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from quarrycore_spark.operators.ann import ann_topk, ivf_probes, ivf_topk

DIM = 64


def _skewed_embeddings(spark, n: int = 400, seed: int = 7):
    """One hot centroid: vec 0 (a centroid: 0 % 31 == 0) is the base
    direction and every non-centroid vector sits in a tight cone around it,
    while the other centroid vectors (31, 62, …) point in random far
    directions. Every non-centroid vector therefore assigns to centroid 0 —
    one IVF list holds ~the whole table, the worst-case rerank skew."""
    rng = np.random.default_rng(seed)
    base = np.zeros(DIM)
    base[0] = 1.0
    rows = []
    for i in range(n):
        if i % 31 == 0 and i != 0:
            v = rng.standard_normal(DIM)  # far random centroid
        else:
            v = base + 0.01 * rng.standard_normal(DIM)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_topk_skewed_codebook_matches_exact(spark):
    """With every vector in the hot centroid's list, the probe-and-rerank
    candidate set for each query is the whole table, so ivf_topk must equal
    the brute-force ann_topk exactly — and complete without any task
    receiving an unbounded group (the partial-top-k kernel streams batches;
    a groupBy(query_id) shape would pull ~n rows into one task here)."""
    emb = _skewed_embeddings(spark)
    exact = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["score_q"])
        for r in ann_topk(emb, stride=50).collect()
    }
    ivf = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["score_q"])
        for r in ivf_topk(emb, stride=50, cent_stride=31).collect()
    }
    assert set(ivf) == set(exact)
    assert ivf == exact


def test_ivf_probes_distributed_tiebreak(spark):
    """ivf_probes (the distributed probe kernel) reproduces the oracle's
    top-nprobe-by-(score desc, centroid id asc) rule."""
    emb = _skewed_embeddings(spark, n=200, seed=3)
    probes = ivf_probes(emb, stride=50, cent_stride=31, nprobe=4)
    got = {}
    for r in probes.collect():
        got.setdefault(r["query_id"], set()).add(r["centroid_id"])
    # reference computation in numpy over the same quantized integers
    rows = emb.collect()
    q = {
        r["vec_id"]: np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1000 + 0.5).astype(np.int64)
        for r in rows
    }
    cents = sorted(i for i in q if i % 31 == 0 and (q[i] ** 2).sum() > 0)
    queries = [i for i in q if i % 50 == 0 and (q[i] ** 2).sum() > 0]
    for qid in queries:
        scores = []
        for cid in cents:
            d = int(q[qid] @ q[cid])
            na, nb = int((q[qid] ** 2).sum()), int((q[cid] ** 2).sum())
            pos = (d * d * 100000) // (na * nb)
            scores.append((-(pos if d >= 0 else -pos), cid))
        want = {cid for _, cid in sorted(scores)[:4]}
        assert got[qid] == want, f"query {qid}: {got[qid]} != {want}"


def test_ann_topk_query_cap_raises(spark):
    emb = _skewed_embeddings(spark, n=30)
    with pytest.raises(RuntimeError, match="query vectors"):
        ann_topk(emb, stride=1, max_queries=10).count()


def test_ann_topk_handles_batch_smaller_than_k(spark):
    """Partial top-k per batch must cope with batches smaller than k and
    with the query row itself appearing in the batch."""
    emb = _skewed_embeddings(spark, n=6).repartition(6)  # ~1 row per batch
    out = ann_topk(emb, k=10, stride=1).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        ids = [r["neighbor_id"] for r in rows]
        assert qid not in ids  # self excluded
        assert len(ids) == 5  # n-1 neighbors, k larger than table
        assert [r["rnk"] for r in sorted(rows, key=lambda r: r["rnk"])] == list(
            range(1, 6)
        )
