"""Suffix-array LCS: equivalence vs difflib-style brute force, plus the
Spark substring_extents operator end-to-end."""

from __future__ import annotations

import random

import pytest

from quarrycore_spark.operators.substring import (
    gram_doc_pairs,
    longest_common_substring_len,
    substring_extents,
)


def brute_lcs(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


@pytest.mark.parametrize("seed", range(5))
def test_lcs_random_parity(seed):
    rng = random.Random(seed)
    alpha = "abcab "
    for _ in range(20):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 60)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 60)))
        assert longest_common_substring_len(a, b) == brute_lcs(a, b), (a, b)


def test_lcs_containment():
    a = "the quick brown fox jumps over the lazy dog"
    b = "PREFIX " + a + " SUFFIX"
    assert longest_common_substring_len(a, b) == len(a)
    assert longest_common_substring_len("", "abc") == 0


def test_substring_extents_spark(spark):
    base = "the quick brown fox jumps over the lazy dog and keeps running far away " * 3
    rows = [
        (1, base),
        (2, base + " extra trailing content appended here beyond the shared part"),
        (3, "completely different text with no long overlap at all whatsoever xyz"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cand = gram_doc_pairs(docs, 30)
    pairs = {(r.a_id, r.b_id) for r in cand.collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs

    ext = substring_extents(docs, cand, min_overlap=30).collect()
    assert len(ext) == 1
    row = ext[0]
    assert (row.a_id, row.b_id) == (1, 2)
    assert row.match_type == "contained_in"  # doc1 fully inside doc2
    assert row.lcs_len == row.len_a


@pytest.mark.parametrize("seed", range(5))
def test_lcs_extent_reproduces_substring(seed):
    """The reported (start_a, start_b, lcs_len) extent must be a REAL common
    substring of maximal length (reference fuzzy_matcher.py:213-236 returns
    the overlap's position, not just its size)."""
    from quarrycore_spark.operators.substring import lcs_extent_hashed

    rng = random.Random(100 + seed)
    alpha = "abcde "
    for _ in range(20):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 80)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 80)))
        n, sa, sb = lcs_extent_hashed(a, b, lo=1)
        assert n == brute_lcs(a, b), (a, b)
        if n > 0:
            assert a[sa : sa + n] == b[sb : sb + n], (a, b, n, sa, sb)


def test_substring_extent_columns_spark(spark):
    """Pipeline-visible extent columns: the containment pair's extent spans
    the contained doc and aligns with the contained_in label."""
    base = "the quick brown fox jumps over the lazy dog and keeps running far away " * 3
    rows = [
        (1, base),
        (2, "PREFIX BLOCK " + base + " extra trailing content appended here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cand = gram_doc_pairs(docs, 30)
    row = substring_extents(docs, cand, min_overlap=30).collect()[0]
    assert row.match_type == "contained_in"
    assert row.lcs_len == row.len_a  # whole doc 1 is the overlap
    assert row.start_a == 0
    nt2 = " ".join(rows[1][1].split()).strip().lower()
    nt1 = " ".join(rows[0][1].split()).strip().lower()
    assert nt2[row.start_b : row.start_b + row.lcs_len] == nt1
