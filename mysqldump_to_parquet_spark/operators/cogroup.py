"""Cogrouped custom aggregation (``groupBy().cogroup().applyInPandas``).

The remaining Arrow-UDF API shape beside scalar pandas_udf / grouped
applyInPandas / UDTF (functions/udfs.py): two tables grouped on the same
key, each key's two row-sets handed to one Python function as a pair of
pandas DataFrames.  The escape hatch for per-key logic that genuinely
needs both sides at once (custom reconciliation, per-key model scoring);
anything expressible as join + aggregate should stay JVM-side.

Scale shape: both sides shuffle once on the cogroup key — identical
traffic to the equivalent join — then Arrow-batched Python runs per key
group.  No driver involvement, no collect; skew is bounded by the
largest single key's rows (same bound the join would have).

Grain choice matters for this API: the Python function is invoked once
per key, so per-call overhead (~ms) dominates when keys are tiny and
numerous.  The operator therefore cogroups at the *customer* grain
(≈ N/10 keys, each with a real row-set) rather than per order — the
honest guidance being: if your per-key group is a handful of rows, you
wanted a join + aggregate, not cogrouped Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..catalog import load_table

OUT_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("n_orders", T.LongType()),
        T.StructField("max_order_price", T.DoubleType()),
    ]
)


def cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_cogroup_pandas: per-customer reconciliation of the customer
    master against the order book — account balance beside order count
    and the largest order (MAX selects an element, so every output value
    is exact across engines)."""
    import pandas as pd

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")

    def reconcile(key, cust_pdf: "pd.DataFrame", orders_pdf: "pd.DataFrame"):
        if cust_pdf.empty:  # orders without a master row: surface nothing
            return pd.DataFrame(columns=[f.name for f in OUT_SCHEMA.fields])
        return pd.DataFrame(
            {
                "c_custkey": [key[0]],
                "c_acctbal": [float(cust_pdf["c_acctbal"].iloc[0])],
                "n_orders": [len(orders_pdf)],
                "max_order_price": [
                    float(orders_pdf["o_totalprice"].max())
                    if len(orders_pdf)
                    else 0.0
                ],
            }
        )

    return (
        c.groupBy("c_custkey")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(reconcile, OUT_SCHEMA)
    )


COGROUP_SQL = """
SELECT c.c_custkey,
       c.c_acctbal,
       CAST(COUNT(o.o_custkey) AS BIGINT)  AS n_orders,
       COALESCE(MAX(o.o_totalprice), 0.0)  AS max_order_price
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_acctbal
"""


QUERIES = {
    "q_cogroup_pandas": cogroup_reconcile,
}

ORACLE = {
    "q_cogroup_pandas": COGROUP_SQL,
}
