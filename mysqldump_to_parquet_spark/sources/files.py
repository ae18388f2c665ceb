"""CSV / JSON file sources (SURVEY.md §2.2 "also planned" row).

Both readers take explicit schemas — `inferSchema` costs a full extra pass
at 100 TB and is never used.  The queries round-trip a fixture table
through the format and aggregate the read-back, so the driver's oracle
(running on the original Parquet) checks the full write→read→compute path.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from .mysqldump import pin_result

CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)


def src_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_src_csv: Parquet → CSV (header, escaped) → schema'd read → agg."""
    c = load_table(spark, sf_dir, "customer")
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/customer_csv"
        c.write.mode("overwrite").option("header", True).csv(path)
        back = spark.read.schema(CUSTOMER_SCHEMA).option("header", True).csv(path)
        out = (
            back.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("c_acctbal").alias("min_bal"),
                F.max("c_acctbal").alias("max_bal"),
            )
            .orderBy("c_mktsegment")
        )
        return pin_result(out)


SRC_CSV_SQL = """
SELECT c_mktsegment,
       COUNT(*)       AS n_rows,
       MIN(c_acctbal) AS min_bal,
       MAX(c_acctbal) AS max_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def src_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_src_json: Parquet → JSON lines → schema'd read → agg (doubles are
    kept out of the JSON round-trip comparison: text serialization of
    floats is a formatting rabbit hole, min/max on longs is exact)."""
    d = load_table(spark, sf_dir, "documents")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/documents_json"
        d.select("doc_id", "lang", "source", "n_chars").write.mode(
            "overwrite"
        ).json(path)
        back = spark.read.schema(schema).json(path)
        out = (
            back.groupBy("lang", "source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
                F.max("doc_id").alias("max_doc_id"),
            )
            .orderBy("lang", "source")
        )
        return pin_result(out)


SRC_JSON_SQL = """
SELECT lang, source,
       COUNT(*)     AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MAX(doc_id)  AS max_doc_id
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


def src_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_src_orc: Parquet → ORC (zlib) → read → agg.  ORC is the second
    columnar format Spark ships natively; unlike the CSV/JSON text paths,
    doubles round-trip bit-exactly, so min/max on o_totalprice join the
    comparison.  The read back gets predicate pushdown and column pruning
    from the ORC reader exactly as Parquet does."""
    o = load_table(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/orders_orc"
        o.write.mode("overwrite").orc(path)
        back = spark.read.orc(path)
        out = (
            back.groupBy("o_orderstatus", "o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_totalprice").alias("min_price"),
                F.max("o_totalprice").alias("max_price"),
                F.max("o_orderdate").alias("last_order"),
            )
            .orderBy("o_orderstatus", "o_orderpriority")
        )
        return pin_result(out)


SRC_ORC_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*)         AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       MAX(o_orderdate)  AS last_order
FROM orders
GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority
"""


#: Marker for rows written before the schema gained o_orderpriority.
PRE_EVOLUTION = "<pre-evolution>"


def src_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_src_evolution: schema-evolution read — two dataset generations
    (the second adds a column) unioned by ``mergeSchema``.

    Real lakes accrete columns over years of writers; the reader must
    reconcile footers, not fail.  Generation 1 (even order keys) is
    written without ``o_orderpriority``; generation 2 carries it.
    ``mergeSchema=true`` unions the footers (an O(#files) driver
    operation — at 100 TB you pin the merged schema in a catalog and
    read with an explicit schema instead, which this read-back also
    demonstrates by aggregating over the NULL-filled gap).
    """
    o = load_table(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/orders_evolved"
        gen1 = o.where(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        gen2 = o.where(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
        )
        gen1.write.mode("overwrite").parquet(f"{path}/gen=1")
        gen2.write.mode("overwrite").parquet(f"{path}/gen=2")
        back = spark.read.option("mergeSchema", "true").parquet(
            f"{path}/gen=1", f"{path}/gen=2"
        )
        out = (
            back.groupBy(
                F.coalesce("o_orderpriority", F.lit(PRE_EVOLUTION)).alias(
                    "priority"
                )
            )
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                # rounded: cross-engine double-sum accumulation order
                F.round(F.sum("o_totalprice"), 6).alias("total_price"),
            )
            .orderBy("priority")
        )
        return pin_result(out)


SRC_EVOLUTION_SQL = f"""
SELECT CASE WHEN o_orderkey % 2 = 0 THEN '{PRE_EVOLUTION}'
            ELSE o_orderpriority END AS priority,
       COUNT(*)           AS n_orders,
       ROUND(SUM(o_totalprice), 6)  AS total_price
FROM orders
GROUP BY priority
ORDER BY priority
"""


def _nested_read_agg(spark: SparkSession, path: str) -> DataFrame:
    """Aggregate over two subfields of a nested struct column — the
    projection Catalyst must prune to ``meta.source, meta.n_chars``
    (nestedSchemaPruning), never the whole struct."""
    back = spark.read.parquet(path)
    return (
        back.groupBy(F.col("meta.source").alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("meta.n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


def src_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_src_nested: nested-struct round trip with schema pruning.

    Documents are re-written with their scalar attributes packed into a
    ``meta`` struct (the layout of every event/log lake), then the
    aggregate touches two subfields.  The scan's ReadSchema must contain
    only those subfields (asserted in tests/test_plans.py): at 100 TB
    reading ``meta.source`` must not drag ``meta.lang`` — or the text —
    off disk."""
    d = load_table(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/documents_nested"
        d.select(
            "doc_id",
            F.struct("lang", "source", "n_chars").alias("meta"),
        ).write.mode("overwrite").parquet(path)
        return pin_result(_nested_read_agg(spark, path))


SRC_NESTED_SQL = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY source
ORDER BY source
"""


QUERIES = {
    "q_src_csv": src_csv,
    "q_src_json": src_json,
    "q_src_orc": src_orc,
    "q_src_evolution": src_evolution,
    "q_src_nested": src_nested,
}

ORACLE = {
    "q_src_csv": SRC_CSV_SQL,
    "q_src_json": SRC_JSON_SQL,
    "q_src_orc": SRC_ORC_SQL,
    "q_src_evolution": SRC_EVOLUTION_SQL,
    "q_src_nested": SRC_NESTED_SQL,
}
