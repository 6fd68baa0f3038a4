"""Bucketing: pre-shuffled warehouse tables joined WITHOUT an exchange
(SURVEY.md §4 / partitioning & shuffle).

At 100 TB the recurring fact⋈fact join (lineitem⋈orders on orderkey)
is the dominant shuffle; bucketing both tables on the join key at write
time removes it from every downstream query. This test builds bucketed
tables in the session warehouse and asserts the sort-merge join plan
reads buckets directly — no Exchange on either join key. (Broadcast is
disabled for the assertion: at test scale AQE would broadcast the whole
table, which hides the property being tested.)"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from airline_data_pipeline_spark.io.readers import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    li = table(spark, SF, "lineitem")
    o = table(spark, SF, "orders")
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    yield spark.table("b_lineitem"), spark.table("b_orders")
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_shuffle(spark, bucketed, no_broadcast):
    bli, bo = bucketed
    joined = (
        bli.join(bo, bli.l_orderkey == bo.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE string includes both
    assert "Bucketed: true" in final
    assert "SortMergeJoin" in final
    # neither join input re-shuffles: bucket layout satisfies the
    # join's distribution requirement
    assert "Exchange hashpartitioning(l_orderkey" not in final
    assert "Exchange hashpartitioning(o_orderkey" not in final


def test_bucketed_join_matches_unbucketed(spark, bucketed):
    bli, bo = bucketed
    li, o = table(spark, SF, "lineitem"), table(spark, SF, "orders")
    a = {
        (r["o_orderstatus"], r["n"])
        for r in bli.join(bo, bli.l_orderkey == bo.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    b = {
        (r["o_orderstatus"], r["n"])
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert a == b
