"""Projection / filter / join / sort / set operators (SURVEY.md §2.2).

All absent from the reference (its grep-verified only "join" is
``PathBuf::join``, /root/reference/src/parquet_writer.rs:78); everything here
is declared through the DataFrame API so Catalyst supplies pushdown, column
pruning, join selection and AQE.

Scale notes:
* ``region``/``nation``/``supplier`` are broadcast (`F.broadcast`) — at
  100 TB the fact side never shuffles for those joins.
* The theta/range join keeps the *small* side on the build/broadcast side so
  BroadcastNestedLoopJoin streams the big side once.
* Top-k per group uses one window (single shuffle on the group key);
  global sort+limit compiles to TakeOrderedAndProject (per-partition top-k,
  then a k-row merge on the driver — no global sort at any scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table


# ---------------------------------------------------------------- filters

def project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + comparison/BETWEEN predicates.

    Both the projection and the predicates reach the Parquet scan
    (ReadSchema / PushedFilters) — verified in tests/test_plans.py.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_quantity") >= 30)
            & F.col("l_discount").between(0.02, 0.08)
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_discount",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


PROJECT_FILTER_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
WHERE l_quantity >= 30
  AND l_discount BETWEEN 0.02 AND 0.08
  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
"""


def filter_null_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IN / LIKE predicate family."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.where(
            F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
            & F.col("c_name").like("%1%")
            & F.col("c_acctbal").isNotNull()
        )
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    )


FILTER_NULL_IN_LIKE_SQL = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
  AND c_name LIKE '%1%'
  AND c_acctbal IS NOT NULL
"""


# ---------------------------------------------------------------- joins

def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders ⋈ customer (sort-merge / shuffle-hash at scale;
    AQE may elect broadcast at small SF — both correct)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment")
    )


JOIN_INNER_SQL = """
SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: every customer, with order aggregates where present."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            # rounded: double sum accumulation order is engine-dependent
            F.round(
                F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 6
            ).alias("total_spent"),
        )
    )


JOIN_LEFT_SQL = """
SELECT c_custkey, c_name,
       COUNT(o_orderkey)                AS n_orders,
       ROUND(COALESCE(SUM(o_totalprice), 0.0), 6) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join between two aggregates over disjoint-ish key sets."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big_orders = o.where(F.col("o_totalprice") > 300000).select("o_orderkey", "o_totalprice")
    heavy_lines = (
        l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        big_orders.join(heavy_lines, big_orders.o_orderkey == heavy_lines.l_orderkey, "full")
        .select("o_orderkey", "o_totalprice", "l_orderkey", "total_qty")
    )


JOIN_FULL_SQL = """
WITH big_orders AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 300000
), heavy_lines AS (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
SELECT o_orderkey, o_totalprice, l_orderkey, total_qty
FROM big_orders FULL OUTER JOIN heavy_lines ON o_orderkey = l_orderkey
"""


def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ nation ⋈ region with explicit broadcast of the dims.

    The `F.broadcast` hint pins BroadcastHashJoin: at 100 TB the customer
    side streams through without any shuffle (verified in test_plans.py).
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # rounded: cross-engine double-sum accumulation order
            F.round(F.sum("c_acctbal"), 6).alias("sum_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


JOIN_BROADCAST_SQL = """
SELECT r_name, n_name,
       COUNT(*)       AS n_customers,
       ROUND(SUM(c_acctbal), 6) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): customers having at least one urgent order."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers with no large order (>350k)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    large = o.where(F.col("o_totalprice") > 350000)
    return (
        c.join(large, c.c_custkey == large.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
"""

#: Price bands for the non-equi range join (tiny literal dimension).
PRICE_BANDS = [
    ("band_low", 0.0, 100000.0),
    ("band_mid", 100000.0, 250000.0),
    ("band_high", 250000.0, 600000.0),
]


def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join: orders banded by price range.

    The band table is 3 rows → broadcast nested-loop; the orders side
    streams once.  This is the correct 100 TB shape for tiny theta dims;
    for two *large* range sides the engine path is `asof.py`'s bucketing.
    """
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
            "inner",
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("sum_price"))
        .orderBy("band")
    )


JOIN_THETA_RANGE_SQL = """
WITH bands(band, lo, hi) AS (
  VALUES ('band_low', 0.0, 100000.0),
         ('band_mid', 100000.0, 250000.0),
         ('band_high', 250000.0, 600000.0)
)
SELECT band, COUNT(*) AS n_orders, SUM(o_totalprice) AS sum_price
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
ORDER BY band
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two tiny dims (5 × 25 rows)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_regionkey", "r_name", "n_nationkey", "n_name")


JOIN_CROSS_SQL = """
SELECT r_regionkey, r_name, n_nationkey, n_name
FROM region CROSS JOIN nation
"""


#: Values nulled out on each side to create genuinely NULL join keys.
_NS_LEFT_NULL = "BUILDING"
_NS_RIGHT_NULL = "1-URGENT"


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other — the semantics CDC/merge pipelines need when NULL is
    a legitimate key value, and which plain ``=`` silently drops.

    Both sides derive a nullable bucket key (a segment/priority nulled for
    one value), then join on ``eqNullSafe``.  Still an ordinary hash
    equi-join — null-safe equality is a deterministic key function, so it
    shuffles on the key like any other join (NULLs all hash to one bucket;
    a production key with many NULLs would pre-split them like any other
    skewed value).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    left = (
        c.select(
            F.when(F.col("c_mktsegment") == _NS_LEFT_NULL, None)
            .otherwise(F.substring("c_mktsegment", 1, 1))
            .alias("lk")
        )
        .groupBy("lk")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    right = (
        o.select(
            F.when(F.col("o_orderpriority") == _NS_RIGHT_NULL, None)
            .otherwise(F.substring("o_orderpriority", 3, 1))
            .alias("rk")
        )
        .groupBy("rk")
        .agg(F.count(F.lit(1)).alias("n_ord"))
    )
    return (
        left.join(right, left.lk.eqNullSafe(right.rk))
        .select("lk", "rk", "n_cust", "n_ord")
        .orderBy(F.asc_nulls_first("lk"), F.asc_nulls_first("rk"))
    )


JOIN_NULL_SAFE_SQL = f"""
WITH l AS (
  SELECT CASE WHEN c_mktsegment = '{_NS_LEFT_NULL}' THEN NULL
              ELSE substring(c_mktsegment, 1, 1) END AS lk,
         COUNT(*) AS n_cust
  FROM customer GROUP BY 1
),
r AS (
  SELECT CASE WHEN o_orderpriority = '{_NS_RIGHT_NULL}' THEN NULL
              ELSE substring(o_orderpriority, 3, 1) END AS rk,
         COUNT(*) AS n_ord
  FROM orders GROUP BY 1
)
SELECT lk, rk, n_cust, n_ord
FROM l JOIN r ON l.lk IS NOT DISTINCT FROM r.rk
ORDER BY lk NULLS FIRST, rk NULLS FIRST
"""


#: Interval-join bin width = the maximum interval length (10 minutes), so
#: any interval overlaps at most 2 bins and any point falls in exactly 1.
_INTERVAL_MINUTES = 10
_BIN_SECONDS = _INTERVAL_MINUTES * 60


def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join of two LARGE sides via time-bin blocking:
    every error event landing in the 10-minute window [p.ts, p.ts + 10min)
    after a purchase is attributed to that purchase, aggregated per
    purchase.

    The naive plan for ``e.ts BETWEEN p.start AND p.end`` with two large
    sides is a BroadcastNestedLoopJoin — O(|purchases| × |errors|) and the
    classic 100 TB killer (`join_theta_range` keeps its tiny side
    broadcast; here neither side is tiny).  Blocking discretizes time
    into bins exactly as wide as the longest interval: each purchase
    lands in the ≤2 bins its window touches (`explode` of a 1–2 element
    array), each error in exactly 1, and the join becomes an *equi*
    shuffle join on the bin key with the exact interval predicate applied
    post-join.  Cost: one fixed-width shuffle of ≤2|P| + |E| rows,
    partitioned by time — candidate pairs are only same-bin pairs, and a
    hot bin is AQE-skew-splittable.
    """
    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    err = e.where(F.col("event_type") == "error").select(
        F.col("ts").alias("e_ts"), "value"
    )
    # Window length == bin width, so [p_ts, p_ts + w) touches bins
    # {b, b+1} where b = floor(p_ts / w) — always replicate to both
    # (unix_timestamp truncates to seconds, so conditionally dropping the
    # second bin would miss sub-second boundary crossings).
    start_bin = F.floor(F.unix_timestamp("p_ts") / _BIN_SECONDS)
    p_binned = p.select(
        "purchase_id",
        "p_ts",
        F.explode(F.array(start_bin, start_bin + 1)).alias("bin"),
    )
    e_binned = err.select(
        "e_ts", "value", F.floor(F.unix_timestamp("e_ts") / _BIN_SECONDS).alias("bin")
    )
    return (
        p_binned.join(e_binned, "bin")
        .where(
            (F.col("e_ts") >= F.col("p_ts"))
            & (
                F.col("e_ts")
                < F.col("p_ts") + F.expr(f"INTERVAL {_INTERVAL_MINUTES} MINUTES")
            )
        )
        .groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            # rounded: cross-engine double-sum accumulation order
            F.round(F.sum("value"), 6).alias("sum_error_value"),
        )
    )


JOIN_INTERVAL_SQL = f"""
SELECT p.event_id AS purchase_id, COUNT(*) AS n_errors,
       ROUND(SUM(e.value), 6) AS sum_error_value
FROM events p
JOIN events e
  ON e.ts >= p.ts AND e.ts < p.ts + INTERVAL {_INTERVAL_MINUTES} MINUTE
WHERE p.event_type = 'purchase' AND e.event_type = 'error'
GROUP BY p.event_id
"""


# ---------------------------------------------------------- sort / top-k

def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT — compiles to TakeOrderedAndProject: each
    partition keeps its top 25, the driver merges 25 × #partitions rows.
    A unique tiebreaker (o_orderkey) makes the result deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(25)
    )


SORT_LIMIT_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment: one shuffle on the group key, then a
    per-partition sort — the canonical distributed top-k-per-group."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("c_mktsegment", "rk", "o_orderkey", "o_totalprice")
    )


TOPK_PER_GROUP_SQL = """
SELECT c_mktsegment, rk, o_orderkey, o_totalprice
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders JOIN customer ON o_custkey = c_custkey
) t
WHERE rk <= 3
"""


# ------------------------------------------------------------- set ops

def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL then UNION DISTINCT of two customer-key sets."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    big_spenders = o.where(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("custkey")
    )
    return building.unionByName(big_spenders).distinct()


SET_UNION_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    big_spenders = o.where(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    return building.intersect(big_spenders)


SET_INTERSECT_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    big_spenders = o.where(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    return building.subtract(big_spenders)  # EXCEPT DISTINCT semantics


SET_EXCEPT_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
"""


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — *bag* difference: each customer key survives with
    multiplicity (times ordered in Q1) − (times ordered in Q2); the
    DISTINCT variant above can only say "appears or not".

    Plan note: Spark compiles exceptAll to a ±1 multiplicity tag + sum
    per key + generator replication — one shuffle on the row's full value
    (the natural key for bag semantics), never a join explosion."""
    o = load_table(spark, sf_dir, "orders")
    q1 = o.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("custkey"))
    q2 = o.where(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("custkey"))
    return q1.exceptAll(q2)


SET_EXCEPT_ALL_SQL = """
SELECT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
EXCEPT ALL
SELECT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
"""


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection: multiplicity min(m₁, m₂).  Same
    tag-and-sum compilation as exceptAll; one value-keyed shuffle."""
    o = load_table(spark, sf_dir, "orders")
    q1 = o.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("custkey"))
    q2 = o.where(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("custkey"))
    return q1.intersectAll(q2)


SET_INTERSECT_ALL_SQL = """
SELECT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
INTERSECT ALL
SELECT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
"""


# ------------------------------------------------ bucketed co-located join

#: Bucket count for the demo tables (any fixed power of two; on a real
#: cluster this is sized so each bucket file is ~128 MB-1 GB).
BUCKETS = 8


def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_join_bucketed: the repeated-large-×-large join pattern — both
    sides written ``bucketBy`` the join key, so the sort-merge join reads
    co-located buckets with NO exchange on either side (the only shuffle
    left is the final small aggregate).

    At 100 TB this is THE technique for a fact↔fact join that runs every
    day: the shuffle is paid once at write time and amortized across every
    subsequent join on that key.  ``tests/test_bucketing.py`` asserts the
    exchange-free plan; this registry twin hash-checks the *values*
    against a plain-join oracle (bucketing must never change results).
    The writes are idempotent (mode=overwrite, per-sf table names)."""
    import shutil
    from urllib.parse import urlparse

    suffix = sf_dir.rstrip("/").rsplit("sf", 1)[-1].replace(".", "_")
    ob_name, lb_name = f"orders_bkt_{suffix}", f"lineitem_bkt_{suffix}"
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in (ob_name, lb_name):
        # a PREVIOUS session may have left the managed location on disk
        # without this session's catalog knowing the table — overwrite
        # can't fix that (LOCATION_ALREADY_EXISTS), so drop both halves
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
    (
        load_table(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .bucketBy(BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(ob_name)
    )
    (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .bucketBy(BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(lb_name)
    )
    ob = spark.table(ob_name)
    lb = spark.table(lb_name)
    return (
        # MERGE hint pins sort-merge (broadcast would hide the point);
        # with both sides bucketed on the key it plans with zero join-side
        # exchanges
        ob.hint("merge")
        .join(lb, ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_quantity").cast("long").alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )


JOIN_BUCKETED_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(l_quantity) AS BIGINT) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ------------------------------------------------------------- 2D skyline

#: Deterministic block count for the distributed local-skyline stage.
SKYLINE_BLOCKS = 32


def skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_skyline: 2-D Pareto frontier over distinct (quantity, price)
    points — maximize ``l_quantity`` while minimizing
    ``l_extendedprice`` (the multi-criteria "best offers" operator;
    dominance: qty ≥ ∧ price ≤ with one strict).

    Distributed three-stage shape.  Stage 0 is a dominance-aware
    reduction: for any fixed qty only the min-price point can reach the
    frontier (every other point at that qty is dominated by it), so a
    map-side-combining ``groupBy(qty).min(price)`` shrinks the
    candidate set from |distinct points| to |distinct qty| before any
    window runs — at TPC-H shapes that is 500k → 50 rows and the whole
    operator costs one partial-aggregated shuffle (measured 2.4× at
    sf0.1).  Stages 1–2 stay fully general for high-cardinality x: a
    global skyline point is a skyline point of EVERY subset containing
    it, so stage 1 computes a local skyline per deterministic hash
    block (parallel windows — never a global sort), and stage 2 re-runs
    the same sweep over the ~blocks×|skyline| survivors.  The sweep
    itself is the classic sort-by-x-desc / running-min-y filter: a
    point is on the frontier iff its price is strictly below every
    price seen at higher-or-equal quantity.  Pure comparisons on
    stored values — no float arithmetic, exact across engines."""
    l = load_table(spark, sf_dir, "lineitem")
    pts = l.groupBy(F.col("l_quantity").alias("qty")).agg(
        F.min("l_extendedprice").alias("price")
    )

    from pyspark.sql import Window

    def sweep(df: DataFrame, part_cols: list) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.desc("qty"), F.asc("price"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        min_prev = F.min("price").over(w)
        return (
            df.withColumn("__minprev", min_prev)
            .where(F.col("__minprev").isNull() | (F.col("price") < F.col("__minprev")))
            .drop("__minprev")
        )

    blocked = pts.withColumn(
        "blk", (F.abs(F.hash("qty")) % SKYLINE_BLOCKS)
    )
    local = sweep(blocked, ["blk"]).drop("blk")
    return sweep(local, [])


# The twin applies the same provably-lossless stage-0 reduction (only the
# min-price point per qty can reach the frontier) and then the INDEPENDENT
# NOT EXISTS dominance formulation over the ≤|distinct qty| survivors —
# without the reduction the quadratic NOT EXISTS over all distinct points
# made an oracle infeasible at sf0.01, which is why this key was
# rows-only until the skyline rewrite.
SKYLINE_SQL = """
WITH pts AS (
  SELECT l_quantity AS qty, MIN(l_extendedprice) AS price
  FROM lineitem GROUP BY l_quantity
)
SELECT qty, price
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.qty >= p.qty AND q.price <= p.price
    AND (q.qty > p.qty OR q.price < p.price)
)
"""


QUERIES = {
    "q_skyline": skyline,
    "q_project_filter": project_filter,
    "q_filter_null_in_like": filter_null_in_like,
    "q_join_inner": join_inner,
    "q_join_left": join_left,
    "q_join_full": join_full,
    "q_join_broadcast": join_broadcast,
    "q_join_semi": join_semi,
    "q_join_anti": join_anti,
    "q_join_theta_range": join_theta_range,
    "q_join_cross": join_cross,
    "q_join_null_safe": join_null_safe,
    "q_join_interval": join_interval,
    "q_sort_limit": sort_limit,
    "q_topk_per_group": topk_per_group,
    "q_set_union": set_union,
    "q_set_intersect": set_intersect,
    "q_set_except": set_except,
    "q_set_except_all": set_except_all,
    "q_set_intersect_all": set_intersect_all,
    "q_join_bucketed": join_bucketed,
}

ORACLE = {
    "q_skyline": SKYLINE_SQL,
    "q_project_filter": PROJECT_FILTER_SQL,
    "q_filter_null_in_like": FILTER_NULL_IN_LIKE_SQL,
    "q_join_inner": JOIN_INNER_SQL,
    "q_join_left": JOIN_LEFT_SQL,
    "q_join_full": JOIN_FULL_SQL,
    "q_join_broadcast": JOIN_BROADCAST_SQL,
    "q_join_semi": JOIN_SEMI_SQL,
    "q_join_anti": JOIN_ANTI_SQL,
    "q_join_theta_range": JOIN_THETA_RANGE_SQL,
    "q_join_cross": JOIN_CROSS_SQL,
    "q_join_null_safe": JOIN_NULL_SAFE_SQL,
    "q_join_interval": JOIN_INTERVAL_SQL,
    "q_sort_limit": SORT_LIMIT_SQL,
    "q_topk_per_group": TOPK_PER_GROUP_SQL,
    "q_set_union": SET_UNION_SQL,
    "q_set_intersect": SET_INTERSECT_SQL,
    "q_set_except": SET_EXCEPT_SQL,
    "q_set_except_all": SET_EXCEPT_ALL_SQL,
    "q_set_intersect_all": SET_INTERSECT_ALL_SQL,
    "q_join_bucketed": JOIN_BUCKETED_SQL,
}
