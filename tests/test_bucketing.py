"""Bucketed co-located join demo: write both join sides bucketed by the
join key, and assert the join plan has NO shuffle (Exchange) — the 100 TB
pattern for repeated large-×-large joins (ARCHITECTURE.md).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .option("path", str(wh / "orders_b"))
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .option("path", str(wh / "lineitem_b"))
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")
    # disable broadcast so the join would otherwise be a shuffle join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select(
            "o_orderkey", "l_quantity", "o_totalprice"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        n = joined.count()
        assert n == spark.read.parquet(f"{SF}/lineitem.parquet").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_registered_bucketed_join_plan_and_cleanup(spark):
    """The q_join_bucketed registry query: its sort-merge join must read
    co-located buckets with no join-side Exchange (the only exchange is
    the final small aggregate)."""
    from mysqldump_to_parquet_spark.operators.relational import join_bucketed

    df = join_bucketed(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # exactly the aggregate's exchange — never one under the join
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange" not in join_part, join_part
    rows = {r.o_orderpriority: r.n_lines for r in df.collect()}
    assert sum(rows.values()) == spark.read.parquet(f"{SF}/lineitem.parquet").count()
