"""XML file source (Spark 4 native ``xml`` format, SURVEY §2.2 sources).

Spark 4 folded the ``spark-xml`` package into the core distribution, so
XML joins CSV/JSON/ORC (``files.py``) as a first-class round-trip
format.  Same design rules as the other text sources:

* **explicit schema** — ``rowTag`` inference costs a full extra pass at
  100 TB and is never used;
* the query round-trips a fixture table through the format and
  aggregates the read-back, so the driver's oracle (running on the
  original Parquet) checks the full write→read→compute path;
* **longs + strings only** cross the text boundary — float text
  serialization is a formatting rabbit hole (same rule as
  ``src_json``), and XML element text additionally passes through
  whitespace handling, so the round-tripped columns are exact types.

Scale note: XML is a line-unsplittable format (a record spans arbitrary
lines), so Spark parallelizes across *files*; a 100 TB XML drop must
arrive as many files — which it does, since any writer shards.  The
``rowTag`` reader streams record-at-a-time per file, memory bounded by
one record.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from .mysqldump import pin_result

SUPPLIER_XML_SCHEMA = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.LongType()),
    ]
)


def src_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_src_xml: Parquet → XML (``<supplier>`` row tag) → schema'd read
    → per-nation aggregate of the long/string columns."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", F.col("s_nationkey").cast("long")
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/supplier_xml"
        (
            s.write.mode("overwrite")
            .format("xml")
            .option("rowTag", "supplier")
            .save(path)
        )
        back = (
            spark.read.schema(SUPPLIER_XML_SCHEMA)
            .format("xml")
            .option("rowTag", "supplier")
            .load(path)
        )
        out = (
            back.groupBy("s_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n_suppliers"),
                F.min("s_suppkey").alias("min_suppkey"),
                F.max("s_suppkey").alias("max_suppkey"),
                F.min("s_name").alias("first_name"),
            )
            .orderBy("s_nationkey")
        )
        return pin_result(out)


SRC_XML_SQL = """
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
       COUNT(*)      AS n_suppliers,
       MIN(s_suppkey) AS min_suppkey,
       MAX(s_suppkey) AS max_suppkey,
       MIN(s_name)    AS first_name
FROM supplier
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


QUERIES = {
    "q_src_xml": src_xml,
}

ORACLE = {
    "q_src_xml": SRC_XML_SQL,
}
