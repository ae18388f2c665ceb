"""Layout-rewrite tests: compaction bounds file counts; sort-on-write
produces the narrow per-file/row-group statistic bands that make Parquet
min/max pruning effective.  Physical outcomes are asserted via pyarrow
parquet metadata, not row values (values are trivially preserved and
checked once per test)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mysqldump_to_parquet_spark.catalog import load_table
from mysqldump_to_parquet_spark.sources.maintenance import (
    compact_dataset,
    write_sorted,
)

SF = "/root/testdata/sf0.001"


def _parquet_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(".")
    )


def test_compaction_bounds_file_count(spark, tmp_path):
    frag = str(tmp_path / "fragmented")
    compacted = str(tmp_path / "compacted")
    orders = load_table(spark, SF, "orders")
    orders.repartition(64).write.parquet(frag)  # simulate small-file strand
    assert len(_parquet_files(frag)) == 64
    n = compact_dataset(spark, frag, compacted, target_file_mb=128)
    assert n == 1  # tiny dataset → one right-sized file
    # values preserved
    a = sorted(r.o_orderkey for r in spark.read.parquet(frag).collect())
    b = sorted(r.o_orderkey for r in spark.read.parquet(compacted).collect())
    assert a == b


def test_sorted_write_produces_disjoint_stat_bands(spark, tmp_path):
    out = str(tmp_path / "events_sorted")
    e = load_table(spark, SF, "events").select("event_id", "user_id", "ts")
    write_sorted(e, out, "event_id", n_files=4)

    # per-file min/max bands must be (near-)disjoint and ordered — the
    # precondition for row-group/file skipping on event_id predicates
    bands = []
    for f in _parquet_files(out):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("event_id")
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        bands.append((lo, hi))
    bands.sort()
    assert len(bands) == 4
    for (lo1, hi1), (lo2, _hi2) in zip(bands, bands[1:]):
        assert hi1 <= lo2, f"overlapping bands: {bands}"

    # and the rows themselves survived
    assert spark.read.parquet(out).count() == e.count()


def test_unsorted_write_has_overlapping_bands(spark, tmp_path):
    """Counter-case: a plain shuffled write interleaves values everywhere,
    so every file spans nearly the full domain — nothing can be pruned."""
    out = str(tmp_path / "events_unsorted")
    e = load_table(spark, SF, "events").select("event_id", "user_id", "ts")
    e.repartition(4).write.parquet(out)
    bands = []
    for f in _parquet_files(out):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("event_id")
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        bands.append((lo, hi))
    bands.sort()
    overlaps = sum(1 for (l1, h1), (l2, _h2) in zip(bands, bands[1:]) if h1 > l2)
    assert overlaps == len(bands) - 1  # every neighbor pair overlaps
