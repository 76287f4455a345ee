"""Long-common-substring overlap detection — stage 4 of the dedup cascade.

North-rule replacement for the reference's difflib partial-match scan
(fuzzy_matcher.py:213-236): two docs share a common substring of length
>= L iff they share an L-gram, so the scalable form is an equi-join on
hashed L-grams — all JVM-side column expressions, shuffle on gram hash.
A true per-group suffix-array refinement (maximal match *extent*) lives in
substring_extents() as an applyInPandas over candidate groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quarrycore_spark.config import DEFAULT_CONFIG, DedupConfig

DEFAULT_GRAM_CAP = 200

_NORM = "lower(trim(regexp_replace(text, '\\\\s+', ' ')))"


def _gram_hashes_expr(l_gram: int) -> str:
    """Distinct md5-prefix hashes of every L-gram of normalized text."""
    return (
        f"case when length(nt) < {l_gram} then array(cast(conv(substring(md5(nt), 1, 15), 16, 10) as bigint)) "
        f"else array_distinct(transform(sequence(0, length(nt) - {l_gram}), "
        f"i -> cast(conv(substring(md5(substring(nt, i + 1, {l_gram})), 1, 15), 16, 10) as bigint))) end"
    )


def gram_doc_pairs(
    docs: DataFrame,
    l_gram: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    cap: int = DEFAULT_GRAM_CAP,
) -> DataFrame:
    """(a_id, b_id, shared_grams): doc pairs sharing >=1 common substring of
    length >= l_gram. Grams occurring in more than `cap` docs are dropped
    (boilerplate guard, deterministic)."""
    grams = (
        docs.select(F.col(id_col).alias("doc_id"), F.expr(_NORM).alias("nt"))
        .select("doc_id", F.explode(F.expr(_gram_hashes_expr(l_gram))).alias("g"))
        .persist()  # referenced by the cap filter AND both join sides
    )
    keep = (
        grams.groupBy("g")
        .count()
        .filter((F.col("count") >= 2) & (F.col("count") <= cap))
        .drop("count")
    )
    gk = grams.join(keep, "g").persist()
    a = gk.alias("a")
    b = gk.alias("b")
    return (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("shared_grams"))
    )


# ---------------------------------------------------------------------------
# Suffix-array refinement: exact maximal-overlap extent per candidate pair
# ---------------------------------------------------------------------------


def _suffix_array(s: str) -> np.ndarray:
    """O(n log^2 n) suffix array via prefix-doubling on numpy argsort."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        sa = order
        tmp[sa[0]] = 0
        prev = sa[0]
        for idx in range(1, n):
            cur = sa[idx]
            tmp[cur] = tmp[prev] + (
                1 if (rank[cur] != rank[prev] or key2[cur] != key2[prev]) else 0
            )
            prev = cur
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def _lcp_array(s: str, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(sa[i-1], sa[i])."""
    n = len(s)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring_len(a: str, b: str) -> int:
    """Length of the longest common substring via suffix array + LCP over
    the sentinel-joined string (sentinel chr(1) cannot occur in normalized
    text)."""
    joined = a + "\x01" + b
    sa = _suffix_array(joined)
    lcp = _lcp_array(joined, sa)
    na = len(a)
    best = 0
    for i in range(1, len(joined)):
        x, y = sa[i - 1], sa[i]
        if (x < na) != (y < na):
            v = int(lcp[i])
            # cap at distance to the sentinel so matches never span it
            v = min(v, abs((na - x) if x < na else (na - y)))
            if v > best:
                best = v
    return best


def substring_extents(
    docs: DataFrame,
    cand: DataFrame,
    min_overlap: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Refine candidate pairs with the exact longest-common-substring length
    and the contains/contained_in/overlap classification
    (reference _classify_match fuzzy_matcher.py:200-211).

    Joins normalized texts onto the (small) candidate pair list, then
    computes per-pair suffix-array LCS in an Arrow-batched pass. Candidate
    lists are bounded by the gram join, so texts travel to pairs — at scale
    this is a broadcast-or-shuffle join on doc_id, never an all-pairs op.
    """
    nt = docs.select(F.col(id_col).alias("doc_id"), F.expr(_NORM).alias("nt"))
    joined = (
        cand.select("a_id", "b_id")
        .join(nt.withColumnRenamed("nt", "nt_a"), F.col("a_id") == F.col("doc_id"))
        .drop("doc_id")
        .join(
            nt.withColumnRenamed("nt", "nt_b").withColumnRenamed("doc_id", "doc_id_b"),
            F.col("b_id") == F.col("doc_id_b"),
        )
        .drop("doc_id_b")
    )

    def compute(it):
        for pdf in it:
            lcs = [
                longest_common_substring_len(a, b)
                for a, b in zip(pdf["nt_a"].astype(str), pdf["nt_b"].astype(str))
            ]
            out = pd.DataFrame(
                {
                    "a_id": pdf["a_id"].values,
                    "b_id": pdf["b_id"].values,
                    "lcs_len": pd.array(lcs, dtype="int64"),
                    "len_a": pdf["nt_a"].str.len().astype("int64"),
                    "len_b": pdf["nt_b"].str.len().astype("int64"),
                }
            )
            yield out

    ext = joined.mapInPandas(
        compute, schema="a_id bigint, b_id bigint, lcs_len bigint, len_a bigint, len_b bigint"
    ).filter(F.col("lcs_len") >= min_overlap)
    # classification per the reference's ladder, integer-exact:
    # contains: one text is (almost) fully inside the other
    return ext.withColumn(
        "match_type",
        F.when(F.col("lcs_len") == F.least("len_a", "len_b"),
               F.when(F.col("len_a") < F.col("len_b"), F.lit("contained_in")).otherwise(F.lit("contains")))
        .otherwise(F.lit("overlap")),
    )
