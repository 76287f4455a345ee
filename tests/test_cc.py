"""Connected components: equivalence vs networkx + checkpoint/resume."""

from __future__ import annotations

import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from quarrycore_spark.operators.cc import connected_components


def _random_graph(seed: int, n: int, m: int):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(u, v) for u, v in edges if u != v]
    return n, edges


@pytest.mark.parametrize("seed,n,m", [(1, 50, 40), (2, 200, 150), (3, 300, 500)])
def test_cc_matches_networkx(spark, seed, n, m):
    n, edges = _random_graph(seed, n, m)
    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(edges)
    expected = {}
    for comp in nx.connected_components(g):
        root = min(comp)
        for node in comp:
            expected[node] = root

    edf = spark.createDataFrame(edges or [(0, 0)], "u long, v long")
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edf, vdf).collect()
    }
    assert got == expected


def test_cc_checkpoint_resume(spark, tmp_path):
    n, edges = _random_graph(7, 100, 80)
    edf = spark.createDataFrame(edges, "u long, v long")
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    ckpt = str(tmp_path / "cc")
    full = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edf, vdf, checkpoint_dir=ckpt).collect()
    }
    # Simulate a resumed run: manifest exists, should short-circuit/converge
    resumed = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edf, vdf, checkpoint_dir=ckpt).collect()
    }
    assert resumed == full

    # And a "killed mid-run" resume: rewind the manifest to iteration 0
    import json
    import os

    man_path = os.path.join(ckpt, "manifest.json")
    with open(man_path) as f:
        man = json.load(f)
    man["converged"] = False
    man["iteration"] = 0
    man["path"] = os.path.join(ckpt, "iter_0")
    with open(man_path, "w") as f:
        json.dump(man, f)
    rewound = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edf, vdf, checkpoint_dir=ckpt).collect()
    }
    assert rewound == full
