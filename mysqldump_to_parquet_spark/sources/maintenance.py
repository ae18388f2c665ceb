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
