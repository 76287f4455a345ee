"""Sequence-packing plan over the `documents` table, as a paired
Spark/DuckDB query.

The standard pre-training batching step (concat-and-chunk, as used by
GPT/Llama data loaders; graft addition beyond the reference
inventory): lay documents end-to-end in a deterministic order and cut
the stream into fixed token-budget context windows, so every document
knows which training sequence (bin) it starts in and at what offset.
Downstream, a loader can materialize bin b by reading exactly the
docs with bin_id in {b-1, b, b+1} — no global state.

Spark shape at 100 TB: packing is a running sum, so the only scalable
layout is one exchange on the stream key (`source`) + an in-partition
cumulative window ordered by doc_id. A single global stream would
serialize on one task; per-source streams parallelize across sources
while keeping each bin's contents deterministic. When one source
outgrows a task, the same query re-keys on (source, doc_id div S) —
packing then restarts per shard, which training loaders accept (each
shard is its own document stream); that constant is the only thing
that changes.

Integer contract: token counts are whitespace tokens (python
str.split parity, same as `token_counts`); bins are CONTEXT_TOKENS
wide; a document starting at stream position p gets bin_id = p div
CONTEXT_TOKENS and bin_offset = p mod CONTEXT_TOKENS. Documents wider
than a full window simply span several bins (the loader slices them),
exactly like a real packed dataset.
"""

from __future__ import annotations

from quarrycore_spark.functions.dialect import SPARK
from quarrycore_spark.plans.registry import Query, register
from quarrycore_spark.functions.textfrag import _size, _words

# Tokens per packed training sequence.
CONTEXT_TOKENS = 256


def _pack_sequences_sql(dialect: str) -> str:
    intdiv = "div" if dialect == SPARK else "//"
    return f"""
WITH _t AS (
  SELECT doc_id, source,
         {_size(_words('text', dialect), dialect)} AS n_tokens
  FROM documents),
_c AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS start_pos
  FROM _t)
SELECT doc_id, source,
       cast(n_tokens as int) AS n_tokens,
       cast(start_pos {intdiv} {CONTEXT_TOKENS} as int) AS bin_id,
       cast(start_pos % {CONTEXT_TOKENS} as int) AS bin_offset,
       cast(CASE WHEN (start_pos % {CONTEXT_TOKENS}) + n_tokens
                      > {CONTEXT_TOKENS} THEN 1 ELSE 0 END as int)
           AS spans_boundary
FROM _c
"""


register(
    Query(
        "pack_sequences",
        "Sequence packing (concat-and-chunk): deterministic per-source "
        "document streams cut into fixed token-budget context windows — "
        "one source exchange + in-partition cumulative window, no global "
        "state; each doc reports its bin id/offset/boundary-span flag",
        _pack_sequences_sql,
    )
)
