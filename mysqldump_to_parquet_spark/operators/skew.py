"""Skew-mitigation utilities: salted joins and salted aggregation.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
every session here) handles most skew at runtime; explicit salting remains
the tool when (a) one key dominates so heavily that even split partitions
bottleneck a single task's build side, or (b) AQE is unavailable (streaming
joins).  These helpers implement the classic recipe:

* salted join: replicate the small side SALT_N times (one copy per salt),
  scatter the big side's hot keys uniformly with a random salt, join on
  (key, salt) — the hot key's rows now land on SALT_N tasks instead of 1.
* salted aggregation: two-phase manual partial — aggregate on (key, salt)
  first (spreads the hot key), then re-aggregate on key.  Only needed for
  non-algebraic aggregates; sums/counts already do this via partial agg.

Cost model: replication multiplies the small side by SALT_N — only worth
it when |small| · SALT_N ≪ |big-side hot partition|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

SALT_N = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_n: int = SALT_N,
) -> DataFrame:
    """Inner equi-join robust to hot keys on the big side.

    The salt column is derived from a uniform random; correctness does not
    depend on the random values (every salt value matches exactly one
    replica of the small side), so nondeterminism here is safe.
    """
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_n).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    return (
        salted_big.join(
            salted_small,
            (F.col(big_key) == F.col(small_key))
            & (salted_big["__salt"] == salted_small["__salt"]),
        )
        .drop("__salt")
    )


def salted_agg_distinct(
    df: DataFrame, key: str, value: str, salt_n: int = SALT_N
) -> DataFrame:
    """COUNT(DISTINCT value) per key with a salted two-phase plan.

    Phase 1 shuffles on (key, salt-of-value) — a hot key's distinct work
    spreads over ``salt_n`` tasks; because the salt is a deterministic hash
    of the value, each distinct value lands in exactly one salt bucket, so
    phase 2's per-key SUM of bucket counts is exact."""
    return (
        df.select(key, value)
        .withColumn("__salt", F.pmod(F.xxhash64(F.col(value)), F.lit(salt_n)))
        .groupBy(key, "__salt")
        .agg(F.countDistinct(value).alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").alias("n_distinct"))
    )


def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_join_salted: lineitem ⋈ orders with the big side salted — values
    must be identical to the plain join (oracle-checked)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(l, o, "l_orderkey", "o_orderkey")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_quantity").alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


JOIN_SALTED_SQL = """
SELECT o_orderpriority,
       COUNT(*)        AS n_lines,
       SUM(l_quantity) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = {"q_join_salted": join_salted}
ORACLE = {"q_join_salted": JOIN_SALTED_SQL}
