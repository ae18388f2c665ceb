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

Neither is a query — they are layout rewrites, registered as library
functions with tests that assert the physical outcome (file counts,
row-group statistic bands) rather than row values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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
