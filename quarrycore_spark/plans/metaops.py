"""Metadata / lineage / sampling operators — the P14-lite, D17-by-key and
§2.7-sampler surface, as paired Spark/DuckDB queries.

Reference semantics covered:
* per-source dedup counters — the reference tracks failure/dup counters per
  domain (pipeline.py:66-110 DomainFailureTracker; hybrid_dedup.py:228-254
  stats); `documents.source` is this corpus's domain key;
* metadata field extraction from semi-structured payloads — the wired
  metadata stage stores urlparse/JSON-ish fields per doc
  (pipeline.py:680-692, metadata/metadata_extractor.py scope);
* deterministic stratified sampling — dataset/sampler.py:21-105 samples
  quality-weighted per stratum; the batch form is a per-stratum top-k over
  a deterministic md5 pseudo-random rank (seedable, engine-agnostic).

Everything is integer/string-typed column expressions in both dialects.
"""

from __future__ import annotations

from quarrycore_spark.config import DEFAULT_CONFIG as CFG
from quarrycore_spark.functions import dialect as D
from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.plans import prelude as P
from quarrycore_spark.plans.registry import Query, register

# --- D17 by key: per-source dedup counters -----------------------------------


def _source_dedup_stats(dialect: str) -> str:
    """Per-source corpus counters: docs, distinct hashes, exact-dup docs —
    the groupBy form of the reference's per-domain stats/backpressure
    tracking. At scale this is one hash aggregation keyed by a
    low-cardinality column (AQE handles the skew)."""
    # DuckDB sum() yields HUGEINT; cast so the typed value-hash matches Spark
    en = "sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)"
    en = en if dialect == SPARK else f"({en})::BIGINT"
    return f"""
WITH _d AS (
  SELECT source,
         {D.content_hash(D.norm_text('text', dialect), dialect)} AS content_hash,
         lang
  FROM documents
)
SELECT source,
       count(*) AS total_docs,
       count(DISTINCT content_hash) AS distinct_hashes,
       count(*) - count(DISTINCT content_hash) AS exact_dup_docs,
       {en} AS en_docs
FROM _d
GROUP BY source
"""


register(
    Query(
        "source_dedup_stats",
        "D17/P14-lite: per-source dedup + language counters",
        _source_dedup_stats,
    )
)


# --- P14-lite: JSON metadata extraction over events ---------------------------


def _event_props_metadata(dialect: str) -> str:
    """Metadata-field extraction from a semi-structured JSON column
    (events.props), aggregated per event_type — the batch analogue of the
    reference's metadata extraction stage storing parsed fields per doc.
    JSON parsing stays JVM-side (get_json_object) / native (json_extract)."""
    if dialect == SPARK:
        k = "cast(get_json_object(props, '$.k') as bigint)"
    else:
        k = "json_extract(props, '$.k')::BIGINT"
    ksum = "sum(k)" if dialect == SPARK else "sum(k)::BIGINT"
    return f"""
WITH _p AS (SELECT event_type, {k} AS k FROM events)
SELECT event_type,
       count(*) AS n_events,
       count(k) AS n_with_k,
       min(k) AS k_min,
       max(k) AS k_max,
       {ksum} AS k_sum
FROM _p
GROUP BY event_type
"""


register(
    Query(
        "event_props_metadata",
        "P14: JSON metadata field extraction + per-type aggregation",
        _event_props_metadata,
        tables=("events",),
    )
)


# --- §2.7 sampler: deterministic stratified top-k ------------------------------

SAMPLE_PER_STRATUM = 5


def _stratified_sample(dialect: str) -> str:
    """Deterministic stratified sample: per language stratum, the first
    SAMPLE_PER_STRATUM docs by an md5 pseudo-random rank — the
    engine-agnostic batch form of the reference's quality-weighted sampler
    (dataset/sampler.py:21-105). Window + integer rank, no RNG state."""
    rk = D.hex_int("cast(doc_id as varchar)", 12, dialect)
    if dialect == SPARK:
        rk = D.hex_int("cast(doc_id as string)", 12, dialect)
    return f"""
WITH _r AS (
  SELECT lang, doc_id, {rk} AS rnd,
         row_number() OVER (PARTITION BY lang ORDER BY {rk}, doc_id) AS rn
  FROM documents
)
SELECT lang, doc_id, rnd, rn FROM _r WHERE rn <= {SAMPLE_PER_STRATUM}
"""


register(
    Query(
        "stratified_sample",
        "§2.7: deterministic stratified sampler (md5 rank per stratum)",
        _stratified_sample,
    )
)
