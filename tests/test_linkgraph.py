"""Link-graph operators (plans/linkgraph.py): the render/extract/classify
semantics pinned in pure Python + DuckDB. Spark-vs-DuckDB parity over the
real sf0.01 corpus is covered by test_oracle_parity's registry sweep."""

from __future__ import annotations

from collections import Counter

import duckdb
import pandas as pd

from quarrycore_spark.extraction.structured import extract_links
from quarrycore_spark.functions.dialect import DUCKDB
from quarrycore_spark.plans.linkgraph import (
    N_SITES,
    _domain_degrees,
    _link_graph,
    page_url,
    render_link_html,
)

# --- pure-Python reference of the href classification ------------------------


def ref_edges(doc_id: int) -> list[tuple[str, str]]:
    """(src_domain, dst_domain) per KEPT anchor of one rendered page."""
    src = f"site{doc_id % N_SITES}.example.com"
    out = []
    for link in extract_links(render_link_html(doc_id)):
        href = link["href"]
        if href.startswith("http"):
            out.append((src, href.split("/")[2]))
        elif href.startswith("/"):
            out.append((src, src))
        # mailto:/javascript:/#frag -> dropped
    return out


def test_render_and_extract_anchor_census():
    for i in (0, 1, 2, 3, 7, 23, 60):
        anchors = extract_links(render_link_html(i))
        # i%4 absolute + 1+i%3 relative + mailto + javascript + #frag;
        # the no-href anchor and the commented/script links never appear
        assert len(anchors) == (i % 4) + (1 + i % 3) + 3, i
        hrefs = [a["href"] for a in anchors]
        assert not any("fake" in h or "commented" in h for h in hrefs)


def test_edge_classification_semantics():
    for i in (0, 1, 5, 14, 33):
        edges = ref_edges(i)
        n_abs = i % 4
        n_self = 1 + i % 3
        assert len(edges) == n_abs + n_self, i
        src = f"site{i % N_SITES}.example.com"
        self_edges = [e for e in edges if e[0] == e[1]]
        # absolute links never self-loop (3j+1 != 0 mod 20 for j <= 2)
        assert len(self_edges) == n_self
        assert all(e[0] == src for e in edges)


def run_duck(sql: str, docs: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", docs)
    return con.sql(sql).fetchdf()


def docs_df(n: int = 80) -> pd.DataFrame:
    return pd.DataFrame({"doc_id": list(range(n)), "text": ["x"] * n})


def test_oracle_matches_extraction_reference():
    """The arithmetic oracle equals the real extractor + classifier run
    over every rendered page."""
    docs = docs_df()
    counted: Counter = Counter()
    docs_per_edge: dict[tuple, set] = {}
    for i in docs["doc_id"]:
        for e in ref_edges(int(i)):
            counted[e] += 1
            docs_per_edge.setdefault(e, set()).add(int(i))
    got = run_duck(_link_graph(DUCKDB), docs)
    assert len(got) == len(counted)
    for row in got.itertuples():
        e = (row.src_domain, row.dst_domain)
        assert row.n_links == counted[e], e
        assert row.n_src_docs == len(docs_per_edge[e]), e
    # self-edge multiplicity: n_links strictly exceeds n_src_docs
    selfs = got[got["src_domain"] == got["dst_domain"]]
    assert (selfs["n_links"] > selfs["n_src_docs"]).all()


def test_domain_degrees_consistent_with_edges():
    docs = docs_df()
    edges = run_duck(_link_graph(DUCKDB), docs)
    deg = run_duck(_domain_degrees(DUCKDB), docs).set_index("domain")
    out = edges.groupby("src_domain")
    for domain, grp in out:
        assert deg.loc[domain, "out_degree"] == grp["dst_domain"].nunique()
        assert deg.loc[domain, "n_outlinks"] == grp["n_links"].sum()
    inn = edges.groupby("dst_domain")
    for domain, grp in inn:
        assert deg.loc[domain, "in_degree"] == grp["src_domain"].nunique()
        assert deg.loc[domain, "n_inlinks"] == grp["n_links"].sum()
    # link volume conserved: total out == total in == total edge links
    assert deg["n_outlinks"].sum() == deg["n_inlinks"].sum() == edges["n_links"].sum()


def test_two_hop_reach_consistent_with_edges():
    from quarrycore_spark.plans.linkgraph import _two_hop_domains

    docs = docs_df()
    edges = run_duck(_link_graph(DUCKDB), docs)
    hop = run_duck(_two_hop_domains(DUCKDB), docs).set_index("domain")
    # python reference: BFS depth 2 over the distinct edge set
    adj: dict[str, set] = {}
    for r in edges.itertuples():
        adj.setdefault(r.src_domain, set()).add(r.dst_domain)
    for domain, nbrs in adj.items():
        one = nbrs - {domain}
        two = set(one)
        for m in nbrs:
            two |= adj.get(m, set())
        two -= {domain}
        assert hop.loc[domain, "n_one_hop"] == len(one), domain
        assert hop.loc[domain, "n_two_hop"] == len(two), domain
        assert hop.loc[domain, "n_two_hop"] >= hop.loc[domain, "n_one_hop"]
