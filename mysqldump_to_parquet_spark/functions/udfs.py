"""Python UDF surface: vectorized scalar pandas UDF, grouped-map UDAF,
and a table function (UDTF shape via posexplode).

UDFs are the deliberate slow path (Arrow-batched, never row-at-a-time —
SNIPPETS.md patterns); each query here has a pure-SQL twin in the oracle to
prove the UDF computes exactly what the declarative form would.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def _net_price_udf():
    """Arrow-vectorized Series→Series UDF; built lazily because pandas_udf
    resolves its return type against the active SparkSession."""

    @F.pandas_udf("double")
    def _net_price(extended: pd.Series, discount: pd.Series) -> pd.Series:
        return extended * (1.0 - discount)

    return _net_price


def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    net_price = _net_price_udf()
    return l.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


UDF_PANDAS_SCALAR_SQL = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) AS net_price
FROM lineitem
"""


def _segment_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map UDAF body: per-segment account stats in pandas."""
    return pd.DataFrame(
        {
            "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
            "n_customers": [len(pdf)],
            "max_acctbal": [pdf["c_acctbal"].max()],
            "min_acctbal": [pdf["c_acctbal"].min()],
        }
    )


def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped aggregation (one group per market segment).

    Max/min are order-insensitive, so the pandas result matches SQL exactly
    — by design, since float sums would legitimately drift.
    """
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .applyInPandas(
            _segment_stats,
            "c_mktsegment string, n_customers long, max_acctbal double, min_acctbal double",
        )
        .orderBy("c_mktsegment")
    )


UDAF_GROUPED_SQL = """
SELECT c_mktsegment,
       COUNT(*)        AS n_customers,
       MAX(c_acctbal)  AS max_acctbal,
       MIN(c_acctbal)  AS min_acctbal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table function: 1 document row → N (pos, token) rows."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.where(F.col("doc_id") < 20)
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "token"),
        )
        .withColumn("pos", F.col("pos").cast("long"))
    )


UDTF_EXPLODE_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE doc_id < 20
), idx AS (
  SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i FROM toks
)
SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ts[i] AS token FROM idx
"""


def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Python UDTF (Spark 3.5+ ``@udtf``): splits a document into
    fixed-size token chunks — the LLM-pipeline "document chunker" shape
    (1 row in, N context-window rows out)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int, chunk string")
    class Chunker:
        CHUNK = 32

        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(0, len(toks), self.CHUNK):
                part = toks[i : i + self.CHUNK]
                yield i // self.CHUNK, len(part), " ".join(part)

    spark.udtf.register("chunker", Chunker)
    load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 20
    ).createOrReplaceTempView("docs_subset")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, CAST(c.n_tokens AS BIGINT) AS n_tokens, c.chunk
        FROM docs_subset d, LATERAL chunker(d.text) c
        """
    )


UDTF_PYTHON_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE doc_id < 20
), chunks AS (
  SELECT doc_id, unnest(generate_series(0, CAST(ceil(len(ts) / 32.0) AS BIGINT) - 1)) AS chunk_idx, ts
  FROM toks
)
SELECT doc_id,
       CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST(len(ts[chunk_idx * 32 + 1 : chunk_idx * 32 + 32]) AS BIGINT) AS n_tokens,
       array_to_string(ts[chunk_idx * 32 + 1 : chunk_idx * 32 + 32], ' ') AS chunk
FROM chunks
"""


QUERIES = {
    "q_udf_pandas_scalar": udf_pandas_scalar,
    "q_udaf_grouped": udaf_grouped,
    "q_udtf_explode": udtf_explode,
    "q_udtf_python": udtf_python,
}

ORACLE = {
    "q_udf_pandas_scalar": UDF_PANDAS_SCALAR_SQL,
    "q_udaf_grouped": UDAF_GROUPED_SQL,
    "q_udtf_explode": UDTF_EXPLODE_SQL,
    "q_udtf_python": UDTF_PYTHON_SQL,
}
