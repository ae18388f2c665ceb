"""Parquet dataset maintenance: small-file compaction and sort-on-write.

The two operational jobs every large Parquet lake runs continuously:

* **Compaction** — streaming ingest and fine-grained partitioning strand
  datasets as thousands of KB-sized files; scans then pay per-file open
  cost and lose columnar locality.  ``compact_dataset`` rewrites to a
  bounded file count sized near the HDFS-block sweet spot.
* **Sort-on-write** — Parquet row-group min/max statistics only prune
  scans when values are clustered; ``write_sorted`` repartitions by range
  and sorts within partitions so every row group covers a narrow value
  band (the single-column core of Z-ordering).  Predicate pushdown then
  skips whole row groups/files instead of scanning them.
* **Z-order clustering** — a single sort column leaves every *other*
  column's min/max spanning the full domain, so filters on a second
  dimension prune nothing.  ``write_zorder`` interleaves the bits of two
  columns into a Morton code and clusters on that: every file covers a
  small *rectangle* of the 2-D value space, so min/max pruning works for
  filters on either column (the layout job behind Delta/Iceberg
  ``OPTIMIZE ZORDER BY``).

None of these is a query — they are layout rewrites, registered as
library functions with tests that assert the physical outcome (file
counts, row-group statistic bands, per-dimension prunable fractions)
rather than row values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_dataset(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 128,
    compression: str = "snappy",
) -> int:
    """Rewrite ``path`` to ``out_path`` with files sized near
    ``target_file_mb``.  Returns the output file count.

    File count = ceil(dataset_bytes / target) — computed from the *input*
    size (file status only, no data read), so the rewrite is one shuffle-
    free coalesce when shrinking, or a round-robin repartition when the
    input is a single oversized file."""
    files = (
        spark.read.format("binaryFile").load(path).select("length").collect()
    )
    total = sum(r.length for r in files)
    n_out = max(1, -(-total // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    n_in = df.rdd.getNumPartitions()
    out = df.coalesce(n_out) if n_out <= n_in else df.repartition(n_out)
    out.write.mode("overwrite").parquet(out_path, compression=compression)
    import os

    return sum(
        1
        for f in os.listdir(out_path)
        if f.endswith(".parquet") and not f.startswith(".")
    )


def write_sorted(
    df: DataFrame,
    out_path: str,
    sort_col: str,
    n_files: int = 8,
    compression: str = "snappy",
) -> None:
    """Write ``df`` range-partitioned + sorted by ``sort_col`` so each
    output file (and each row group within it) covers a narrow, mostly
    disjoint value band — the layout Parquet min/max pruning needs.

    ``repartitionByRange`` samples the column to build balanced range
    bounds (skew-resistant); ``sortWithinPartitions`` orders rows inside
    each task so row-group statistics are tight."""
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(out_path, compression=compression)
    )


def _morton_expr(xg: str, yg: str, bits: int) -> str:
    """SQL expression interleaving the low ``bits`` bits of two BIGINT
    grid coordinates into a Morton code (x in even positions, y in odd).
    Pure bitwise arithmetic — codegen'd JVM-side, no UDF."""
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({xg}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({yg}, {i}) & 1, {2 * i + 1})")
    return " | ".join(terms)


def write_zorder(
    df: DataFrame,
    out_path: str,
    col_x: str,
    col_y: str,
    bits: int = 12,
    n_files: int = 8,
    compression: str = "snappy",
) -> None:
    """Write ``df`` clustered on the Morton (Z-order) code of two numeric
    columns, so row-group/file min-max statistics are tight on *both*.

    Steps, all engine-side:
    1. One tiny min/max aggregate per column (broadcast back as a 1-row
       cross join) scales each value to a ``2^bits`` integer grid.
       Min/max scaling keeps the oracle simple; a skewed production
       column would use rank boundaries from ``approxQuantile`` instead —
       same interleave, different grid assignment.
    2. The Morton code interleaves grid bits via shift/mask expressions
       (codegen'd; no Python, no UDF).
    3. ``repartitionByRange + sortWithinPartitions`` on the code cluster
       rows so each output file covers a compact rectangle of the
       (x, y) value space — contiguous Z ranges are unions of aligned
       quadrants, which is what makes per-file min/max selective in both
       dimensions.

    The Z column is dropped before the write: the layout benefit lives in
    the file statistics, not the schema."""
    span = df.agg(
        F.min(col_x).alias("__minx"),
        F.max(col_x).alias("__maxx"),
        F.min(col_y).alias("__miny"),
        F.max(col_y).alias("__maxy"),
    )
    grid = (1 << bits) - 1
    gx = (
        f"CAST(({col_x} - __minx) * {grid} / "
        f"greatest(__maxx - __minx, 1) AS BIGINT)"
    )
    gy = (
        f"CAST(({col_y} - __miny) * {grid} / "
        f"greatest(__maxy - __miny, 1) AS BIGINT)"
    )
    with_z = (
        df.crossJoin(F.broadcast(span))
        .withColumn("__zorder", F.expr(_morton_expr(gx, gy, bits)))
        .drop("__minx", "__maxx", "__miny", "__maxy")
    )
    (
        with_z.repartitionByRange(n_files, "__zorder")
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
        .write.mode("overwrite")
        .parquet(out_path, compression=compression)
    )


# ------------------------------------------------------- driver-visible key
#
# ``write_zorder`` is a layout rewrite (physical outcome asserted in
# tests/test_maintenance.py); ``q_zorder_cluster`` makes the Morton-code
# *computation* itself driver-hash-checkable: it grids two integer key
# columns, interleaves their bits, and summarizes the top-6-bit Z
# buckets.  Each bucket's (min, max) extent on BOTH dimensions is the
# rectangle-bounding property that makes z-clustered file statistics
# prunable — the oracle recomputes the identical integer arithmetic in
# DuckDB, so a hash match pins the interleave end-to-end.

ZORDER_BITS = 10  # per-dimension grid bits; Z code spans 2*bits


def _morton_terms(x: str, y: str, bits: int, spark_dialect: bool) -> str:
    """Bitwise-interleave expression in either engine's SQL dialect.
    Integer-only arithmetic → bit-identical across engines."""
    terms = []
    for i in range(bits):
        if spark_dialect:
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_zorder_cluster: Z-bucket summary of orders on
    (o_custkey, o_orderkey).

    One tiny min/max aggregate broadcasts the grid bounds; gridding is
    integer multiply + integer divide (exact in both engines — no float
    touches the key path); the Morton interleave is pure shift/mask
    codegen.  Scale shape: map-only until the final 64-group aggregate.
    """
    from ..catalog import load_table

    bits = ZORDER_BITS
    grid = (1 << bits) - 1
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    span = o.agg(
        F.min("o_custkey").alias("__minx"),
        F.max("o_custkey").alias("__maxx"),
        F.min("o_orderkey").alias("__miny"),
        F.max("o_orderkey").alias("__maxy"),
    )
    gx = f"((o_custkey - __minx) * {grid}) div greatest(__maxx - __minx, 1)"
    gy = f"((o_orderkey - __miny) * {grid}) div greatest(__maxy - __miny, 1)"
    z = _morton_terms(f"({gx})", f"({gy})", bits, spark_dialect=True)
    return (
        o.join(F.broadcast(span))
        .withColumn("z_bucket", F.expr(f"({z}) >> {2 * bits - 6}"))
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.min("o_orderkey").alias("min_orderkey"),
            F.max("o_orderkey").alias("max_orderkey"),
        )
        .orderBy("z_bucket")
    )


def _zorder_oracle_sql() -> str:
    bits = ZORDER_BITS
    grid = (1 << bits) - 1
    gx = f"((o_custkey - __minx) * {grid}) // greatest(__maxx - __minx, 1)"
    gy = f"((o_orderkey - __miny) * {grid}) // greatest(__maxy - __miny, 1)"
    z = _morton_terms(f"({gx})", f"({gy})", bits, spark_dialect=False)
    return f"""
WITH span AS (
  SELECT MIN(o_custkey)  AS __minx, MAX(o_custkey)  AS __maxx,
         MIN(o_orderkey) AS __miny, MAX(o_orderkey) AS __maxy
  FROM orders
),
coded AS (
  SELECT o_orderkey, o_custkey,
         (({z})) >> {2 * bits - 6} AS z_bucket
  FROM orders CROSS JOIN span
)
SELECT z_bucket,
       COUNT(*)        AS n_orders,
       MIN(o_custkey)  AS min_custkey,
       MAX(o_custkey)  AS max_custkey,
       MIN(o_orderkey) AS min_orderkey,
       MAX(o_orderkey) AS max_orderkey
FROM coded
GROUP BY z_bucket
ORDER BY z_bucket
"""


QUERIES = {
    "q_zorder_cluster": zorder_cluster,
}

ORACLE = {
    "q_zorder_cluster": _zorder_oracle_sql(),
}
