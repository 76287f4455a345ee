"""Domain PageRank over the extracted link graph — iterative DataFrame
computation with an integer-exact fixed-iteration oracle.

The crawl-frontier/quality substrate the link-graph family exists to
feed (OPIC/PageRank domain scoring: which domains deserve crawl budget
and which are link-spam clusters). Computed here as the classic damped
power iteration, but in EXACT integer milli-arithmetic so the Spark
loop and the DuckDB oracle agree bit-for-bit (the repo no-floats rule):

    contrib(s)  = rank_t(s) // outdeg(s)            (floor division)
    rank_{t+1}(d) = BASE + (850 * Σ_{s→d} contrib(s)) // 1000
    BASE        = (150 * SCALE) // (1000 * N)        (teleport mass)

over the DISTINCT domain→domain edge set, ITERS fixed iterations from
a uniform SCALE//N start. Every domain in this graph has a self-edge
(render_link_html emits relative links on every page), so there are no
dangling nodes and no rank leaks — asserted in the Spark path.

Spark side: edges come from the REAL anchor extraction
(plans/linkgraph._edges); the iteration is a Python-side loop of
join + aggregate steps — the scale shape where each step is one
shuffle on the (tiny) domain-level frame, with the corpus-sized work
(extraction + first aggregation) done exactly once before the loop.
At web scale (10^8 domains) the same loop checkpoints every few
iterations like operators/cc.py; at THIS graph's size Catalyst folds
each step into a broadcast join.

Oracle side: the same ITERS steps textually unrolled as chained CTEs
over the closed-form edge list — no recursion (aggregates are not
allowed in a recursive CTE member), no floats, identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quarrycore_spark.plans.registry import Query, register

SCALE = 1_000_000
DAMP_MILLI = 850
ITERS = 8


def _spark_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quarrycore_spark.plans.linkgraph import _edges

    # localCheckpoint (eager) materializes the corpus-sized render +
    # extraction ONCE and truncates the lineage — a persist()/unpersist()
    # pair would be torn down before the caller materializes the
    # returned lazy plan, silently re-running the extraction under every
    # one of the loop's ~2·ITERS references. The checkpointed frame is
    # the tiny domain-level edge list.
    edges = (
        _edges(spark, sf_dir)
        .select("src_domain", "dst_domain")
        .distinct()
        .localCheckpoint(eager=True)
    )
    domains = edges.select(F.col("src_domain").alias("domain")).union(
        edges.select(F.col("dst_domain").alias("domain"))
    ).distinct()
    n_domains = domains.count()
    outdeg = edges.groupBy("src_domain").agg(
        F.count("*").alias("outdeg")
    )
    # No dangling nodes: every domain must emit at least one edge (the
    # self-edge guarantees it); BASE below assumes no teleport-only
    # mass. A raise (not assert) so `python -O` keeps the invariant.
    if outdeg.count() != n_domains:
        raise ValueError("dangling domains would leak rank mass")
    base = (150 * SCALE) // (1000 * n_domains)
    ranks = domains.select(
        "domain", F.lit(SCALE // n_domains).cast("long").alias("rank")
    )
    for _ in range(ITERS):
        # `div` is exact integer floor division — a double-division +
        # cast could round x.9999... up and drift from the oracle.
        contribs = (
            edges.join(ranks, edges.src_domain == ranks.domain)
            .join(outdeg, "src_domain")
            .select(
                F.col("dst_domain").alias("domain"),
                F.expr("cast(rank div outdeg as bigint)").alias("c"),
            )
        )
        ranks = contribs.groupBy("domain").agg(
            F.expr(
                f"cast({base} + ({DAMP_MILLI} * sum(c)) div 1000 as bigint)"
            ).alias("rank")
        )
    return ranks.select(
        "domain", F.col("rank").cast("long").alias("rank_micro")
    )


def _domain_pagerank_sql(dialect: str) -> str:
    """DuckDB oracle: the SHARED closed-form edge synthesis
    (linkgraph._oracle_edge_cte — one synthesis, four consumers, so a
    N_SITES/link-count change cannot diverge this oracle alone) +
    ITERS unrolled iterations (aggregates are not allowed in a
    recursive CTE member)."""
    from quarrycore_spark.plans.linkgraph import _oracle_edge_cte

    steps = []
    for t in range(ITERS):
        steps.append(f"""
_r{t + 1} AS (
  SELECT e.dst_domain AS domain,
         (SELECT base FROM _const)
           + (850 * sum(r.rank // o.outdeg)) // 1000 AS rank
  FROM _e e
  JOIN _r{t} r ON e.src_domain = r.domain
  JOIN _od o ON e.src_domain = o.src_domain
  GROUP BY e.dst_domain)""")
    return f"""
WITH {_oracle_edge_cte(dialect)},
_e AS (SELECT DISTINCT src_domain, dst_domain FROM _edges),
_d AS (SELECT DISTINCT src_domain AS domain FROM _e
       UNION SELECT DISTINCT dst_domain FROM _e),
_const AS (SELECT count(*) AS n,
                  (150 * {SCALE}) // (1000 * count(*)) AS base,
                  {SCALE} // count(*) AS r0
           FROM _d),
_od AS (SELECT src_domain, count(*) AS outdeg FROM _e GROUP BY src_domain),
_r0 AS (SELECT domain, (SELECT r0 FROM _const) AS rank FROM _d),{",".join(steps)}
SELECT domain, cast(rank AS BIGINT) AS rank_micro FROM _r{ITERS}
"""


register(
    Query(
        "domain_pagerank",
        f"Damped domain PageRank ({ITERS} exact-integer iterations) over "
        "the extracted link graph; unrolled-CTE arithmetic oracle",
        _domain_pagerank_sql,
        spark_fn=_spark_domain_pagerank,
        tables=("documents",),
    )
)
