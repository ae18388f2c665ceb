"""format("mysqldump") Python DataSource: schema from DDL, split byte-range
reads that parse every row exactly once, value parity with the bulk
convert_dump pipeline, and loud errors on misuse."""

from __future__ import annotations

import gzip
from datetime import date, datetime
from decimal import Decimal

import pytest

from mysqldump_to_parquet_spark.sources.dump_datasource import (
    MysqldumpDataSource,
)
from mysqldump_to_parquet_spark.sources.mysqldump import DEMO_DUMP

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(MysqldumpDataSource)
    return spark


def _demo_df(spark, path):
    return (
        spark.read.format("mysqldump")
        .option("path", str(path))
        .option("table", "acct")
        .load()
    )


def test_schema_comes_from_ddl(registered, tmp_path):
    p = tmp_path / "demo.sql"
    p.write_text(DEMO_DUMP)
    df = _demo_df(registered, p)
    assert [f.name for f in df.schema.fields] == [
        "id", "name", "balance", "ratio", "active", "created", "birthday",
    ]
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds["balance"] == "decimal(12,2)"  # reference bug fix: not double
    assert kinds["active"] == "boolean"
    assert kinds["created"] == "timestamp"
    assert kinds["birthday"] == "date"


def test_values_match_reference_semantics(registered, tmp_path):
    p = tmp_path / "demo.sql"
    p.write_text(DEMO_DUMP)
    rows = {r.id: r for r in _demo_df(registered, p).collect()}
    assert rows[1].balance == Decimal("120.50")
    assert rows[1].ratio == 0.25
    assert rows[1].active is True
    assert rows[1].created == datetime(2024, 1, 2, 3, 4, 5)
    assert rows[1].birthday == date(1990, 5, 6)
    assert rows[2].balance is None and rows[2].ratio == -1.5
    assert rows[2].active is False
    assert rows[3].name == "carol's"


def test_split_ranges_parse_each_row_exactly_once(registered, tmp_path):
    """Many INSERT lines + a sub-line split size: every byte-range boundary
    lands mid-line somewhere, and the ownership rule must still parse each
    statement exactly once."""
    n = 30_000
    pad = "x" * 40  # ~100 B/line → ~3 MB file → 4 ranges at split_mb=1
    lines = [
        "CREATE TABLE `t` (`k` bigint NOT NULL, `v` varchar(80));",
    ]
    for i in range(n):
        lines.append(
            f"INSERT INTO `t` VALUES ({i},'{pad}'),({i + n},'{pad}');"
        )
    p = tmp_path / "many.sql"
    p.write_text("\n".join(lines) + "\n")
    df = (
        registered.read.format("mysqldump")
        .option("path", str(p))
        .option("table", "t")
        .option("split_mb", 1)
        .load()
    )
    assert df.rdd.getNumPartitions() > 1  # the file actually split
    got = sorted(r.k for r in df.collect())
    assert got == list(range(2 * n))  # every row exactly once


def test_gz_single_partition_still_correct(registered, tmp_path):
    p = tmp_path / "demo.sql.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(DEMO_DUMP)
    assert sorted(r.id for r in _demo_df(registered, p).collect()) == [1, 2, 3]


def test_missing_table_or_option_fails_loudly(registered, tmp_path):
    p = tmp_path / "demo.sql"
    p.write_text(DEMO_DUMP)
    with pytest.raises(Exception, match="no CREATE TABLE for 'absent'"):
        (
            registered.read.format("mysqldump")
            .option("path", str(p))
            .option("table", "absent")
            .load()
            .collect()
        )
    with pytest.raises(Exception, match="requires .option"):
        registered.read.format("mysqldump").option("path", str(p)).load().collect()


def test_write_then_read_round_trip(registered, tmp_path):
    """df → format('mysqldump') write → read back: identical rows,
    through every literal kind (decimal, double, bool, timestamp, date,
    NULL, quoted string)."""
    src = tmp_path / "demo.sql"
    src.write_text(DEMO_DUMP)
    orig = _demo_df(registered, src)
    out = str(tmp_path / "export")
    (
        orig.write.format("mysqldump")
        .option("path", out)
        .option("table", "acct")
        .mode("append")
        .save()
    )
    import os

    names = sorted(os.listdir(out))
    assert names[0] == "00-schema.sql"  # DDL first for the reader's scan
    assert any(n.startswith("part-") and n.endswith(".sql") for n in names)
    back = (
        registered.read.format("mysqldump")
        .option("path", f"{out}/*.sql")
        .option("table", "acct")
        .load()
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orig.collect()))


def test_write_real_table_round_trip(registered, tmp_path):
    """orders (bigint/string/double/timestamp) survives the dump export
    byte-exactly, across multiple writer tasks."""
    from mysqldump_to_parquet_spark.catalog import load_table

    orders = load_table(registered, "/root/testdata/sf0.001", "orders")
    out = str(tmp_path / "orders_dump")
    (
        orders.repartition(4)  # >1 writer task → >1 part file
        .write.format("mysqldump")
        .option("path", out)
        .option("table", "orders")
        .mode("append")
        .save()
    )
    back = (
        registered.read.format("mysqldump")
        .option("path", f"{out}/*.sql")
        .option("table", "orders")
        .load()
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, orders.collect())
    )


def test_write_escapes_hostile_strings(registered, tmp_path):
    """Strings with newlines / quotes / backslashes / tabs must survive
    the export round trip — an unescaped newline would break the
    one-statement-per-line contract the splittable reader depends on."""
    hostile = [
        (1, "line1\nline2"),
        (2, "quote'quote"),
        (3, "back\\slash"),
        (4, "cr\rlf\ntab\there"),
        (5, "plain"),
    ]
    df = registered.createDataFrame(hostile, "k long, v string")
    out = str(tmp_path / "hostile")
    (
        df.write.format("mysqldump")
        .option("path", out)
        .option("table", "h")
        .mode("append")
        .save()
    )
    back = (
        registered.read.format("mysqldump")
        .option("path", f"{out}/*.sql")
        .option("table", "h")
        .load()
    )
    assert sorted(map(tuple, back.collect())) == sorted(hostile)
