"""Snapshot-incremental dedup: flag new-crawl documents whose content
already exists in the prior corpus, as a paired Spark/DuckDB query.

The dump-over-dump hygiene step every recurring web crawl needs
(CommonCrawl-style: dedup snapshot N against snapshots 1..N-1 before
it enters the corpus). Reference parity: the reference's HashDatabase
is exactly this — a persistent content-hash store probed per new
document (`storage/hash_db.py`, INSERT-or-fail) — re-expressed as one
set-membership join instead of per-doc point lookups.

Snapshot carve-out: `documents.source` is 'src{doc_id % 20}'; sources
src16..src19 are "the new snapshot", the rest are the prior corpus.
The shipped texts are corpus-unique, so cross-snapshot duplicates are
planted deterministically (the exact_dup_pairs_synth device): docs
with doc_id % 10 = 6 collapse onto shared text keyed by doc_id div 20
— each new-snapshot doc 20m+16 thereby duplicates prior-corpus doc
20m+6, and ONLY those ids. Both dialects run the identical
normalize → hash → anti-probe path, so the driver hashes real
incremental-dedup decisions.

100-TB shape: the prior corpus pre-aggregates to
(content_hash, first_seen_doc, n_prior) — its text never moves and the
agg dedups the hash set once; the probe side projects to
(doc_id, content_hash) before the exchange. One hash-partitioned join
on 8-byte-ish keys; neither side is assumed broadcastable (the prior
corpus is the big one). A bloom-filter pre-pass could cheapen misses
further; the join IS the correctness path.
"""

from __future__ import annotations

from quarrycore_spark.config import DEFAULT_CONFIG as CFG
from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.plans import prelude as P
from quarrycore_spark.plans.registry import Query, register

# New snapshot = source index >= NEW_SNAPSHOT_MIN (of the 20 sources).
NEW_SNAPSHOT_MIN = 16

# Planted cross-snapshot duplicates: doc_id % PLANT_MOD == PLANT_RESIDUE
# (hits one old source, src6, and one new source, src16).
PLANT_MOD = 10
PLANT_RESIDUE = 6


def _incremental_dedup_sql(dialect: str) -> str:
    d = "div" if dialect == SPARK else "//"
    return f"""
WITH _seed AS (
  SELECT doc_id,
         CASE WHEN doc_id % {PLANT_MOD} = {PLANT_RESIDUE}
              THEN concat('Snapshot shared text ',
                          cast(doc_id {d} 20 AS STRING), '. End.')
              ELSE text END AS text
  FROM documents),
{P.doc_norm(dialect, CFG, table="_seed")},
_old AS (
  SELECT content_hash, min(doc_id) AS first_doc, count(*) AS n_prior
  FROM _docs WHERE doc_id % 20 < {NEW_SNAPSHOT_MIN}
  GROUP BY content_hash)
SELECT d.doc_id,
       cast(CASE WHEN o.content_hash IS NULL THEN 0 ELSE 1 END AS int)
           AS seen_before,
       cast(coalesce(o.first_doc, -1) AS bigint) AS first_seen_doc,
       cast(coalesce(o.n_prior, 0) AS int) AS n_prior_copies
FROM _docs d LEFT JOIN _old o ON d.content_hash = o.content_hash
WHERE d.doc_id % 20 >= {NEW_SNAPSHOT_MIN}
"""


register(
    Query(
        "incremental_dedup",
        "Snapshot-incremental dedup: flag new-snapshot docs whose "
        "content hash already exists in the prior corpus — prior side "
        "pre-aggregated to a slim hash set, one hash-partitioned join, "
        "no text through the exchange",
        _incremental_dedup_sql,
    )
)
