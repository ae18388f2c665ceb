"""Table catalog over the driver fixture layout.

Fixtures live at ``{sf_dir}/{table}.parquet`` (TESTDATA.md).  Every query
function takes ``(spark, sf_dir)`` and loads through :func:`load_table`, so
the scan always goes through ``spark.read.parquet`` — columnar, with
predicate pushdown and column pruning supplied by Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .session import configure_for_oracle

#: All fixture tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always be broadcast in joins.
SMALL_DIMS = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; pins the session confs needed for parity.

    ``events.ts`` has shipped as both Parquet TIMESTAMP(MICROS) (reads as
    TimestampType directly) and TIMESTAMP(NANOS), which the vectorized
    Spark reader rejects; the NANOS layout is read as raw nanos (legacy
    conf) and floored to microsecond TimestampType — matching DuckDB's own
    ns→µs truncation.  The branch keys off the *read* schema, so either
    fixture generation works unchanged.
    """
    configure_for_oracle(spark)
    if name == "events":
        # Deliberately left set for the session: tasks consult this conf at
        # execution time, so scoping/restoring it around the (lazy) read
        # would break later jobs over this DataFrame.  Side effect: other
        # TIMESTAMP(NANOS) parquet in the same session also reads as long.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = spark.read.parquet(table_path(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # MICROS isAdjustedToUTC=false reads as NTZ; session tz is
            # pinned UTC, so this cast is value-preserving and keeps the
            # r1 TimestampType schema downstream.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for the SQL API."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_table_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load + spread across all cores when the scan under-splits.  For
    CPU-heavy per-row work (regex, higher-order folds, vector math) over
    a corpus that arrives as few input splits: without this the whole
    computation runs in the scan's one task.  Adaptive: when the scan
    already yields ≥ cores partitions (any real multi-file / 100 TB
    input), this is a no-op — the repartition shuffle is paid only on
    under-split inputs, where it is strictly cheaper than serializing
    the downstream work onto one core."""
    df = load_table(spark, sf_dir, name)
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df
