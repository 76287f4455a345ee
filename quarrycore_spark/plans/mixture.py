"""Training-mixture source budget: per-source token census + sampling
weights, as a paired Spark/DuckDB query.

Every multi-source training corpus (The Pile, Llama, Dolma) publishes a
mixing table — tokens per source, its share of the corpus, and the
up-/down-sampling weight that maps the observed mix onto the target
mix — because the sampler that feeds the trainer consumes exactly that
table. `source_dedup_stats` reports dedup survival per source; this is
the complementary budget view the mixture designer reads. Target here
is the uniform-over-sources mix (the simplest published choice);
`weight_milli` > 1000 means the source must be up-sampled to reach it.

All ratios are exact integer milli-units (floor division — the
repo-wide no-floats rule): share_milli = tokens·1000 // total_tokens,
weight_milli = tokens·1000·n_sources⁻¹-target over actual =
(1000 · total_tokens) // (n_sources · tokens).

100-TB shape: ONE hash aggregation keyed by source (tokens counted by
a codegen-side split, no explode), then the 20-row result joins the
single-row corpus totals — Spark broadcasts the one-row side; nothing
else moves. The report is O(sources), the work is one corpus scan.
"""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.functions.textfrag import _size, _words
from quarrycore_spark.plans.registry import Query, register


def _source_token_budget(dialect: str) -> str:
    d = "div" if dialect == SPARK else "//"
    return f"""
WITH _t AS (SELECT source,
                   cast({_size(_words('text', dialect), dialect)} AS BIGINT)
                       AS n_tokens
            FROM documents),
_per AS (SELECT source,
                count(*) AS n_docs,
                sum(n_tokens) AS tokens
         FROM _t GROUP BY source),
_tot AS (SELECT sum(tokens) AS total_tokens,
                count(*) AS n_sources
         FROM _per)
SELECT p.source,
       cast(p.n_docs AS int) AS n_docs,
       cast(p.tokens AS BIGINT) AS tokens,
       cast(CASE WHEN t.total_tokens = 0 THEN 0
                 ELSE (p.tokens * 1000) {d} t.total_tokens END AS int)
           AS share_milli,
       cast(CASE WHEN p.tokens = 0 THEN 0
                 ELSE (1000 * t.total_tokens) {d} (t.n_sources * p.tokens)
            END AS int) AS weight_milli
FROM _per p CROSS JOIN _tot t
"""


register(Query(
    "source_token_budget",
    "Training-mixture table: per-source docs/tokens/corpus share and the "
    "uniform-target sampling weight — one source agg + one-row broadcast",
    _source_token_budget,
))
