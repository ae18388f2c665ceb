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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table

OUT_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("n_lines", T.LongType()),
        T.StructField("total_qty", T.DoubleType()),
    ]
)


def cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_cogroup_pandas: per-order reconciliation of the order header
    against its line items — order key, header price, line count and
    quantity sum (whole numbers, so the float sum is order-independent
    and exact across engines)."""
    import pandas as pd

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")

    def reconcile(key, orders_pdf: "pd.DataFrame", lines_pdf: "pd.DataFrame"):
        if orders_pdf.empty:  # lines without a header: surface nothing
            return pd.DataFrame(columns=[f.name for f in OUT_SCHEMA.fields])
        return pd.DataFrame(
            {
                "o_orderkey": [key[0]],
                "o_totalprice": [float(orders_pdf["o_totalprice"].iloc[0])],
                "n_lines": [len(lines_pdf)],
                "total_qty": [float(lines_pdf["l_quantity"].sum())],
            }
        )

    return (
        o.groupBy("o_orderkey")
        .cogroup(l.groupBy("l_orderkey"))
        .applyInPandas(reconcile, OUT_SCHEMA)
    )


COGROUP_SQL = """
SELECT o.o_orderkey,
       o.o_totalprice,
       CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lines,
       COALESCE(SUM(l.l_quantity), 0.0)    AS total_qty
FROM orders o
LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderkey, o.o_totalprice
"""


QUERIES = {
    "q_cogroup_pandas": cogroup_reconcile,
}

ORACLE = {
    "q_cogroup_pandas": COGROUP_SQL,
}
