"""XML source (Spark 4 native ``xml`` format): escaping round-trip and
schema'd read — q_src_xml's value parity vs DuckDB is covered by
tests/test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T


def test_xml_roundtrip_escapes_special_chars(spark, tmp_path):
    """Markup-significant characters (& < > " ') and leading/trailing
    token structure survive the XML write→read cycle."""
    rows = [
        Row(id=1, v="a & b < c > d"),
        Row(id=2, v='quotes " and \' inside'),
        Row(id=3, v="tag-looking <supplier> text </supplier>"),
        Row(id=4, v=None),
    ]
    path = str(tmp_path / "xmlrt")
    df = spark.createDataFrame(rows)
    df.write.mode("overwrite").format("xml").option("rowTag", "r").save(path)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", "r")
        .load(path)
    )
    assert {(r.id, r.v) for r in back.collect()} == {
        (r.id, r.v) for r in rows
    }


def test_xml_source_row_count(spark):
    """The registered query reproduces supplier's nation partition —
    one row per distinct nationkey, counts conserved."""
    from mysqldump_to_parquet_spark.sources.xmlsrc import src_xml

    sf = "/root/testdata/sf0.001"
    out = src_xml(spark, sf).collect()
    sup = spark.read.parquet(f"{sf}/supplier.parquet")
    assert sum(r.n_suppliers for r in out) == sup.count()
    assert len(out) == sup.select("s_nationkey").distinct().count()
