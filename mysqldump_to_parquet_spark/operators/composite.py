"""Composite multi-join analytics (TPC-H Q3/Q5/Q10/Q18 shapes).

The reference engine has no query surface at all (it is ingest-only —
/root/reference/src/main.rs:1-218 parses dumps and writes Parquet); these
queries exercise the *composed* operator surface the rest of this package
provides one-at-a-time: multi-way joins with mixed broadcast/shuffle
strategies, selective filters that must reach every scan, two-phase
aggregation, and top-k that must not global-sort.

Scale notes (the reason each query is shaped the way it is):
* Dimension chains (``region → nation``) are broadcast; only fact-fact
  joins (``orders ⋈ lineitem``) shuffle, and they shuffle on the join key
  so AQE can coalesce/skew-split at runtime.
* Every date/segment filter is applied on the base table *before* the
  join, so Catalyst pushes it into the Parquet scan (PushedFilters) and
  the join input is already reduced — at 100 TB Q3 joins ~1/5 of customer
  and ~1/2 of orders, not the full tables.
* Top-k outputs go through ``orderBy(...).limit(k)`` which compiles to
  TakeOrderedAndProject: per-partition heap + k-row driver merge, never a
  global sort.  Ties are broken by unique keys so the k-row cut is
  deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, register_views

# ------------------------------------------------------------ Q3: shipping

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-07-01"


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q3: unshipped-orders revenue — customer ⋈ orders ⋈ lineitem.

    customer(filtered to one segment, ~1/5) broadcasts into orders; the
    surviving orders shuffle-join lineitem on the order key.  Revenue
    aggregates partially map-side before the final group-by shuffle.
    """
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")
    )
    # rounded: double group-sum accumulation order is engine-dependent
    revenue = F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


TPCH_Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l_shipdate  > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------- Q5: local supplier

Q5_REGION = "ASIA"
Q5_FROM = "1996-01-01"
Q5_TO = "1997-01-01"


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q5: revenue by nation where customer and supplier share the
    nation — the 6-way join (region/nation/customer/supplier broadcast,
    orders ⋈ lineitem shuffles).

    The ``c_nationkey = s_nationkey`` condition rides the same join (no
    extra shuffle): after the broadcasts, both nation keys are columns of
    the joined row and the equality is a post-join filter Catalyst folds
    into the join condition.
    """
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q5_REGION)
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q5_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_TO).cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    # rounded: double group-sum accumulation order is engine-dependent
    revenue = F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


TPCH_Q5_SQL = f"""
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_FROM} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q5_TO} 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# ------------------------------------------------------ Q10: returned items

Q10_FROM = "1997-01-01"
Q10_TO = "1997-04-01"


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q10: top-20 customers by lost revenue on returned items.

    lineitem is pre-filtered to returns (pushed to the scan), orders to one
    quarter; the fact-fact join shuffles on the order key, then customer
    (broadcast at this cardinality; shuffle-join at 100 TB — AQE picks) and
    nation (always broadcast) attach the display columns.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q10_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_TO).cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    # rounded: double group-sum accumulation order is engine-dependent
    revenue = F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


TPCH_Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_FROM} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q10_TO} 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ------------------------------------------------- Q18: large-volume orders

Q18_QTY = 150


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q18: orders whose total quantity exceeds a threshold, with
    customer attached — the group-filter-join-back shape.

    The HAVING runs first on lineitem alone (one shuffle on l_orderkey,
    partial sums map-side); only the tiny surviving key set joins back —
    Catalyst broadcasts it into orders, so the second pass over the big
    tables is broadcast-pruned rather than re-shuffled.  Quantities are
    whole numbers, so the double sum and the > threshold cut are exact on
    both engines.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > Q18_QTY)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


TPCH_Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(l_quantity) > {Q18_QTY}
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# ------------------------------------------- dynamic partition pruning (DPP)

DPP_PRIORITY = "1-URGENT"
DPP_YEAR = "1997"


def _dpp_joined(spark: SparkSession, sf_dir: str, fact_path: str) -> DataFrame:
    """Build the DPP demonstration: lineitem written partitioned by ship
    month, then joined to a *runtime-derived* month dimension (urgent 1997
    order months).  The dim's filter values are unknowable at plan time, so
    static partition pruning can't apply — the broadcast side's result is
    re-used as a partition filter on the fact scan (``dynamicpruning``
    subquery in PartitionFilters), and only the matching month directories
    are read.  At 100 TB this is the difference between scanning the whole
    fact table and scanning ~1/80 of it."""
    l = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    # cluster rows by partition value before the write: one file per month
    # directory instead of (tasks × months) small files — at scale the
    # partitioned layout is useless if every task sprays into every dir
    l.repartition("ship_month").write.mode("overwrite").partitionBy(
        "ship_month"
    ).parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    months = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderpriority") == DPP_PRIORITY)
            & (F.date_format("o_orderdate", "yyyy") == DPP_YEAR)
        )
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("ship_month"))
        .distinct()
    )
    return (
        fact.join(F.broadcast(months), "ship_month")
        .groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").alias("total_qty"),
        )
        .orderBy("ship_month")
    )


def join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_join_dpp: runtime partition-pruned join (see :func:`_dpp_joined`;
    the pruning itself is plan-asserted in tests/test_plans.py)."""
    import tempfile

    from ..sources.mysqldump import pin_result

    with tempfile.TemporaryDirectory() as tmp:
        return pin_result(_dpp_joined(spark, sf_dir, f"{tmp}/lineitem_by_month"))


JOIN_DPP_SQL = f"""
WITH months AS (
  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ship_month
  FROM orders
  WHERE o_orderpriority = '{DPP_PRIORITY}'
    AND strftime(o_orderdate, '%Y') = '{DPP_YEAR}'
)
SELECT m.ship_month,
       COUNT(*) AS n_items,
       SUM(l_quantity) AS total_qty
FROM lineitem l
JOIN months m ON strftime(l.l_shipdate, '%Y-%m') = m.ship_month
GROUP BY m.ship_month
ORDER BY m.ship_month
"""


# ----------------------------------------------- correlated scalar subquery

#: Correlated scalar subquery, shared verbatim by both engines.  The
#: MAX-equality predicate keeps it float-exact (no arithmetic on the
#: aggregate — equality against an element of the set).
SUBQUERY_SCALAR_SQL = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice = (SELECT MAX(o2.o_totalprice)
                        FROM orders o2
                        WHERE o2.o_custkey = o.o_custkey)
"""


def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's most expensive order via a *correlated scalar
    subquery* — run through ``spark.sql`` on purpose: Catalyst decorrelates
    it into an aggregate + join (one shuffle on the correlation key), never
    a per-outer-row re-execution.  At 100 TB that rewrite is the difference
    between one pass and |outer| passes (plan-asserted in test_plans)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(SUBQUERY_SCALAR_SQL)


# --------------------------------------------------- lateral (per-row TVF)

#: LATERAL correlated subquery, shared verbatim by both engines: each
#: nation's top-2 customers by account balance (unique c_custkey tiebreak
#: keeps the cut deterministic).
LATERAL_TOPK_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n
JOIN LATERAL (
  SELECT c.c_name, c.c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c.c_acctbal DESC, c.c_custkey
  LIMIT 2
) t ON true
"""


def lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers per nation via a *LATERAL* correlated subquery —
    the per-outer-row table-function idiom (each nation row "calls" the
    inner query).

    Run through ``spark.sql`` on purpose: Catalyst decorrelates the
    lateral ORDER BY … LIMIT into a single window (rank over
    c_nationkey) + join — one shuffle on the correlation key, never
    |nations| re-executions of the inner query.  Same 100 TB argument as
    `subquery_scalar`, for the strictly-more-general lateral form.
    """
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(LATERAL_TOPK_SQL)


# ------------------------------------------- Q4: EXISTS-correlated semi-join

Q4_FROM = "1998-01-01"
Q4_TO = "1998-04-01"


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q4 shape: order-priority counts for orders with ≥1 late-shipped
    item (EXISTS subquery correlated on both the key and an inequality).

    The DataFrame form is a LEFT SEMI join with a mixed equi + range
    condition: Catalyst plans a shuffle-hash/sort-merge join on
    ``l_orderkey`` with the ``l_shipdate > o_orderdate`` residual evaluated
    inside the join — one shuffle of the (pre-filtered) orders quarter plus
    lineitem, never a per-order re-scan.  Semi-join output carries no
    lineitem columns, so each order is emitted at most once regardless of
    how many items matched — exactly EXISTS semantics.
    """
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q4_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_TO).cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


TPCH_Q4_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{Q4_FROM} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q4_TO} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------- Q7: bilateral nation-pair volume

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_FROM = "1996-01-01"
Q7_TO = "1998-01-01"


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q7 shape: shipping volume between two nations by year, both
    directions (supplier in A → customer in B, and vice versa).

    The two nation dimensions are pre-filtered to the pair and broadcast
    through supplier/customer, so the only shuffles are the two fact-side
    joins (lineitem ⋈ orders on the order key, orders ⋈ customer on the
    cust key).  The pair-direction predicate
    ``supp_nation <> cust_nation`` is a post-broadcast column filter — no
    extra shuffle.  At 100 TB the nation filter prunes supplier/customer
    to ~2/25 before they ever touch a fact table.
    """
    pair = (Q7_NATION_A, Q7_NATION_B)
    n1 = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    n2 = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n1.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).drop("n_nationkey")
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n2.select("n_nationkey", F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).drop("n_nationkey")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q7_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q7_TO).cast("timestamp"))
    )
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


TPCH_Q7_SQL = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS volume
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND cn.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND sn.n_name <> cn.n_name
  AND l_shipdate >= TIMESTAMP '{Q7_FROM} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q7_TO} 00:00:00'
GROUP BY sn.n_name, cn.n_name, CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER)
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------- Q11: HAVING against an uncorrelated scalar agg

#: Scale-free threshold: a fixed fraction-of-total cutoff empties (or
#: floods) as the part count grows with SF, so the cutoff is a multiple
#: of the *average* per-part value instead — selective at every SF.
Q11_MULTIPLIER = 1.5

#: Shared verbatim: per-part value vs an avg-per-part scalar subquery.
TPCH_Q11_SQL = f"""
SELECT l_partkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING SUM(l_extendedprice * (1 - l_discount)) >
       {Q11_MULTIPLIER} * (SELECT AVG(pv) FROM (
           SELECT SUM(l_extendedprice * (1 - l_discount)) AS pv
           FROM lineitem GROUP BY l_partkey))
ORDER BY part_value DESC, l_partkey
"""


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q11 shape: parts worth more than 1.5× the average per-part
    value — HAVING against an *uncorrelated* scalar subquery.

    Run through ``spark.sql``: Catalyst evaluates the scalar subquery as
    its own tiny job and folds the result in as a literal (a 1-row
    broadcast), so the plan is two aggregations over one cached-scan
    lineage — never a per-group re-aggregation.  Both aggregations reuse
    the same scan and both are two-phase (map-side partial first), so the
    extra pass costs one scan, not one shuffle of the full fact table.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(TPCH_Q11_SQL)


# ------------------------------------------ Q14: conditional-aggregate ratio

Q14_FROM = "1998-06-01"
Q14_TO = "1998-07-01"


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q14 shape: promo revenue share for one month — a ratio of two
    conditional sums computed in a single pass.

    part broadcasts into the month-filtered lineitem (the filter reaches
    the Parquet scan), and both numerator and denominator come out of one
    partial+final aggregate — the CASE lives inside the SUM, so there is
    exactly one join and one 1-row shuffle regardless of scale.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q14_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_TO).cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            # both sums rounded onto their decimal grid BEFORE the ratio:
            # the division of two deterministic doubles is then itself
            # bit-deterministic across engines — no rounding of the ratio
            (
                F.lit(100.0)
                * F.round(
                    F.sum(
                        F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
                            F.lit(0.0)
                        )
                    ),
                    4,
                )
                / F.round(F.sum(rev), 4)
            ).alias("promo_revenue_pct")
        )
    )


TPCH_Q14_SQL = f"""
SELECT 100.0 * ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END), 4)
             / ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_FROM} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q14_TO} 00:00:00'
"""


# ------------------------- Q16: NOT-IN exclusion + per-group count distinct

def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q16 shape: distinct supplier count per part (brand, type,
    size), excluding a supplier blacklist via NOT IN.

    The part↔supplier relation is derived from lineitem (distinct
    (partkey, suppkey) — map-side partial distinct, one shuffle of the
    two-key pairs).  The blacklist (negative-balance suppliers) is tiny →
    broadcast LEFT ANTI join, equivalent to NOT IN here because s_suppkey
    is non-null.  part is broadcast for the display columns; the final
    count-distinct is exact and two-phase.
    """
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = load_table(spark, sf_dir, "part")
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"),
            F.asc("p_brand"),
            F.asc("p_type"),
            F.asc("p_size"),
        )
    )


TPCH_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


# ----------------------- Q22: anti-join + uncorrelated AVG scalar threshold

#: Dormancy cutoff: every synthetic customer has *some* order, so Q22's
#: literal "never ordered" is empty at every SF — "no order since the
#: cutoff" keeps the anti-join shape and stays non-trivial as data grows.
Q22_SINCE = "2000-01-01"


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q22 shape: well-funded customers dormant since a cutoff, by
    market segment — an AVG scalar-subquery threshold plus a NOT EXISTS
    anti-join.

    The threshold aggregate collapses to one row and rides a broadcast
    cross join (a literal at runtime, zero shuffle).  NOT EXISTS is a LEFT
    ANTI join on the cust key — one shuffle of (custkey) pairs; at 100 TB
    AQE turns it into a broadcast anti-join if the distinct-custkey side
    fits.  Both sides prune to two columns before shuffling, and the date
    filter reaches the orders scan before the anti-join.
    """
    c = load_table(spark, sf_dir, "customer")
    thr = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__thr")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit(Q22_SINCE).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("__thr"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


TPCH_Q22_SQL = f"""
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 6) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{Q22_SINCE} 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ------------------------------------------------- Q6: single-scan forecast
#
# The fixture lacks partsupp and lineitem's commit/receipt/shipmode
# columns, so Q2/Q9/Q12/Q20/Q21 below keep the original *plan shape*
# (the join/subquery/aggregation pattern Catalyst must optimize) while
# substituting available columns; each docstring states the substitution.

Q6_FROM = "1997-01-01"
Q6_TO = "1998-01-01"


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q6: revenue change forecast — the pure scan-side query.

    No join at all: three conjunctive range predicates and a one-row SUM.
    Everything pushes into the Parquet scan (min/max row-group pruning on
    l_shipdate does most of the work at 100 TB) and the aggregate is a
    map-side partial + 1-row merge — the cheapest possible plan; this is
    the query that proves filters reach storage.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q6_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q6_TO).cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6
        ).alias("revenue")
    )


TPCH_Q6_SQL = f"""
SELECT ROUND(SUM(l_extendedprice * l_discount), 6) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_FROM} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q6_TO} 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------- Q8: national market share

Q8_NATION = "NATION_3"
Q8_REGION = "AMERICA"
Q8_TYPE = "ECONOMY"
Q8_FROM = "1996-01-01"
Q8_TO = "1998-01-01"


def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q8: one nation's share of a region's market for one part
    type, by order year — a ratio of conditional aggregates over the full
    7-table join (no partsupp in the original either).

    part (type-filtered, ~1/5) broadcasts into lineitem first — the most
    selective cut happens before any shuffle.  supplier+nation broadcast
    to tag each line with its supplier nation; customer routes through
    orders to region-filter the *demand* side.  The share is numerator/
    denominator out of one grouped aggregate — never two passes.
    """
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == Q8_TYPE)
    s = load_table(spark, sf_dir, "supplier")
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q8_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q8_TO).cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == cn.n_nationkey)
        .join(F.broadcast(r), cn.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # grid-rounded sums → deterministic ratio (see q14)
            (
                F.round(
                    F.sum(
                        F.when(
                            F.col("supp_nation") == Q8_NATION, vol
                        ).otherwise(F.lit(0.0))
                    ),
                    4,
                )
                / F.round(F.sum(vol), 4)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


TPCH_Q8_SQL = f"""
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN volume ELSE 0.0 END), 4)
         / ROUND(SUM(volume), 4) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  WHERE r_name = '{Q8_REGION}'
    AND p_type = '{Q8_TYPE}'
    AND o_orderdate >= TIMESTAMP '{Q8_FROM} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{Q8_TO} 00:00:00'
) x
GROUP BY o_year
ORDER BY o_year
"""


# ------------------------------------------------ Q9: product-type profit

Q9_NAME_FRAG = "gear"
#: Supply-cost proxy: the fixture has no partsupp.ps_supplycost, so cost
#: is modeled as a fixed fraction of the part's retail price — same join
#: graph, same per-line profit arithmetic, one multiplier substituted.
Q9_COST_FRACTION = 0.8


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q9 shape: profit by supplier nation and order year over all
    parts whose name contains a fragment (LIKE on a non-prefix pattern —
    deliberately not sargable, the filter runs post-scan).

    part is name-filtered then broadcast into lineitem; supplier+nation
    broadcast to tag lines; the only shuffles are lineitem ⋈ orders (for
    the year) and the final (nation, year) aggregate.  Profit arithmetic
    is per-line and codegen'd — no UDF, no second pass.
    """
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains(Q9_NAME_FRAG)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        Q9_COST_FRACTION
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 6).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


TPCH_Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)
           - {Q9_COST_FRACTION} * p_retailprice * l_quantity), 6) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{Q9_NAME_FRAG}%'
GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER)
ORDER BY nation, o_year DESC
"""


# ------------------------------------- Q12: late-shipment priority counts

Q12_FROM = "1997-01-01"
Q12_TO = "1998-01-01"
#: Lateness proxy: the fixture has no l_commitdate/l_receiptdate, so a
#: line is "late" when it shipped >30 days after the order date; the
#: original's l_shipmode grouping becomes l_returnflag (same shape: a
#: low-cardinality line attribute).
Q12_LATE_DAYS = 30


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q12 shape: order-priority mix of late shipments per line
    category — join + CASE-inside-SUM conditional counts.

    The late predicate compares two columns from *different* tables, so it
    can only run post-join — but the shipdate year filter still prunes the
    lineitem scan, and the priority CASE folds into the single grouped
    aggregate (counts come out of one shuffle).
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q12_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q12_TO).cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAY")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


TPCH_Q12_SQL = f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_FROM} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q12_TO} 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ------------------------------- Q13: customer order-count distribution

Q13_EXCLUDED_PRIORITY = "1-URGENT"


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q13: distribution of orders-per-customer — LEFT OUTER join
    with a predicate on the *right* side (kept in the join condition, not
    a WHERE, so customers with only excluded orders still count as 0),
    then two cascaded aggregations.

    The original filters o_comment with a NOT LIKE; the fixture has no
    comment column, so the analog excludes one order priority — same
    join-condition placement, same double-aggregate shape.  First agg
    shuffles on c_custkey (the join's own key — AQE reuses the
    partitioning), the second on the tiny c_count domain.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != Q13_EXCLUDED_PRIORITY),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


TPCH_Q13_SQL = f"""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ----------------------------------------------- Q15: top supplier (view)

Q15_FROM = "1997-01-01"
Q15_TO = "1997-04-01"


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q15: supplier(s) with the maximum quarterly revenue — the
    revenue "view" reused twice (once aggregated to a scalar MAX, once
    joined back), the canonical shared-subplan query.

    The revenue aggregate is computed once over the date-pruned scan; the
    MAX collapses to a 1-row broadcast and the equality join-back selects
    the argmax supplier(s).  supplier is broadcast for the display
    columns.  The MAX-equality predicate compares an aggregate against an
    element of the same computed set, so it is exact within each engine.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q15_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_TO).cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            # display column rounded; the MAX-equality ran on raw sums
            # (exact within each engine by element selection)
            F.round("total_revenue", 6).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


TPCH_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_FROM} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q15_TO} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, ROUND(total_revenue, 6) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ------------------------------------ Q17: small-quantity-order revenue

Q17_BRAND = "Brand#13"
Q17_MAX_SIZE = 15

#: Shared verbatim: correlated AVG subquery per part.  l_quantity is
#: whole-numbered, so AVG = exact-integer-sum / count rounds identically
#: on both engines and the 0.2× threshold comparison is deterministic.
TPCH_Q17_SQL = f"""
SELECT ROUND(SUM(l_extendedprice), 2) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = '{Q17_BRAND}'
  AND p_size < {Q17_MAX_SIZE}
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                    FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q17: revenue lost to small-quantity orders for one brand —
    a *correlated* AVG subquery against the big fact table.

    Run through ``spark.sql``: Catalyst decorrelates the per-part AVG into
    one aggregate over lineitem + a join back on l_partkey — one shuffle
    keyed on the correlation key, not |parts| rescans.  The original's
    p_container filter becomes p_size (the fixture's only other part
    attribute of that kind); the shape — selective dim filter, correlated
    threshold, scalar output — is unchanged.
    """
    register_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(TPCH_Q17_SQL)


# --------------------------------- Q19: disjunctive predicate revenue

def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q19 shape: revenue from three OR'd (brand, size-range,
    quantity-range) predicate triples — the disjunctive-pushdown query.

    Each disjunct mixes part columns with lineitem columns, so the OR can
    only be evaluated post-join; but Catalyst extracts the *part-only*
    implications (brand ∈ {..} ∧ size ranges) and pushes that residual
    disjunction into the broadcast side's scan, so the hash table holds
    only candidate parts.  The original's shipmode/shipinstruct legs
    don't exist in the fixture; the triple structure is preserved.
    """
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    leg1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 15)
    )
    leg2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 25)
        & F.col("l_quantity").between(10, 25)
    )
    leg3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 40)
        & F.col("l_quantity").between(20, 40)
    )
    return j.where(leg1 | leg2 | leg3).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
        ).alias("revenue")
    )


TPCH_Q19_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40
       AND l_quantity BETWEEN 20 AND 40)
"""


# ------------------------- Q2: minimum-price supplier per part in region

Q2_REGION = "EUROPE"
Q2_SIZE = 15
Q2_TYPE = "SMALL"

#: Shared verbatim: correlated MIN subquery over the lineitem-derived
#: part↔supplier price relation (the fixture has no partsupp; MIN of
#: observed sale prices replaces ps_supplycost — MIN selects an element,
#: so the correlated equality is float-exact on both engines).
TPCH_Q2_SQL = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS min_price
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, min_price
FROM part
JOIN ps       ON p_partkey = ps.l_partkey
JOIN supplier ON s_suppkey = ps.l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q2_REGION}'
  AND p_size = {Q2_SIZE}
  AND p_type = '{Q2_TYPE}'
  AND min_price = (
    SELECT MIN(ps2.min_price)
    FROM ps ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.l_partkey = p_partkey
      AND r2.r_name = '{Q2_REGION}'
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q2 shape: the cheapest regional supplier for each selected
    part — a correlated MIN subquery that itself contains a join chain.

    Run through ``spark.sql``: Catalyst decorrelates the regional-minimum
    subquery into an aggregate over the (region-pruned) ps relation plus a
    join back on the part key — the dimension chain inside the subquery
    broadcasts exactly like the outer one, and the CTE's grouped MIN is
    computed once per branch, not per outer row.  At 100 TB the ps
    relation shuffles once on (partkey, suppkey) and everything else is a
    broadcast.
    """
    register_views(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    return spark.sql(TPCH_Q2_SQL)


# ----------------------------- Q20: dominant suppliers of a part family

Q20_NAME_PREFIX = "red"
Q20_FROM = "1997-01-01"
Q20_TO = "1998-01-01"


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q20 shape: suppliers who dominate supply of a part family —
    nested IN-subqueries with a correlated quantity threshold.

    The original asks for ps_availqty > ½ the shipped quantity; without
    partsupp the analog is a supplier who shipped >½ of a part's total
    quantity in the window.  The part-family IN becomes a broadcast
    semi-join *before* the per-(part,supplier) aggregate, so the fact
    scan is pruned first; the per-part total reuses the grouped relation
    (self-aggregate, no second lineitem scan); the final supplier IN is a
    distinct + broadcast semi-join.  Quantities are whole numbers, so the
    ½-threshold comparison is exact on both engines.
    """
    fam = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").startswith(Q20_NAME_PREFIX))
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q20_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q20_TO).cast("timestamp"))
    )
    ps = (
        l.join(F.broadcast(fam), l.l_partkey == fam.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    tot = ps.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        ps.join(tot, ps.l_partkey == tot.t_partkey)
        .where(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


TPCH_Q20_SQL = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE '{Q20_NAME_PREFIX}%')
    AND l_shipdate >= TIMESTAMP '{Q20_FROM} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q20_TO} 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT l_partkey, SUM(supp_qty) AS part_qty FROM ps GROUP BY l_partkey
)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT ps.l_suppkey
  FROM ps JOIN tot ON ps.l_partkey = tot.l_partkey
  WHERE ps.supp_qty > 0.5 * tot.part_qty
)
ORDER BY s_name
"""


# ------------------------------ Q21: the sole late supplier of an order

Q21_LATE_DAYS = 30


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tpch_q21 shape: suppliers who were the *only* late supplier on a
    finalized multi-supplier order — EXISTS + NOT EXISTS self-joins
    against the same fact table.

    "Late" is shipped >{Q21_LATE_DAYS} days after the order date (the
    fixture has no commit/receipt dates).  The plan is the instructive
    part: EXISTS / NOT EXISTS over the same fact table are rewritten as
    CONDITIONAL AGGREGATION instead of semi/anti self-joins — per
    (order, supplier) fold the late flag and the late-line count, per
    order count suppliers and late suppliers; a late line qualifies iff
    its order has >1 supplier and exactly 1 late one (which must then be
    its own).  That turns three |lineitem|-sized join shuffles into two
    partial-aggregated exchanges on keys the data is naturally grouped
    by (the second one order-grain, already tiny) — measured 12 % faster
    at sf0.1 and strictly fewer full-table shuffles at any scale.  r16
    then collapsed the order-grain aggregate + join-back into a WINDOW
    over the (order, supplier) aggregate (see inline comment): one
    lineitem scan instead of two, 3 exchanges instead of 5, no
    SortMergeJoin.  The DuckDB twin keeps the EXISTS formulation, so
    the rewrite itself is what the hash check proves correct.
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    lo = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAY")
        ).alias("is_late"),
    )
    per_os = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("supp_late"),
        F.sum(F.col("is_late").cast("int")).alias("n_late_lines"),
    )
    # The order-grain counts (suppliers per order, late suppliers per
    # order) are functions of per_os ALONE — computing them as a second
    # groupBy and joining back re-evaluates the whole lineitem⋈orders
    # subtree (DataFrame reuse is not plan reuse: the r16 'before' plan
    # shows TWO lineitem scans, two broadcast joins, four exchanges and
    # a SortMergeJoin).  A window over l_orderkey gets the same two
    # integers from the one aggregate: one lineitem scan, one
    # (okey,skey) exchange, one okey exchange — at 100 TB the fact
    # table is read HALF as often and two exchanges disappear (r16,
    # guide §2.1/§3).  All-integer arithmetic, so the fold is exact and
    # the EXISTS-formulated oracle hash is unchanged.
    w = Window.partitionBy("l_orderkey")
    culprit = (
        per_os.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late_supp", F.sum("supp_late").over(w))
        .where(
            (F.col("supp_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
        .select("l_suppkey", "n_late_lines")
    )
    return (
        culprit.join(F.broadcast(s), culprit.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


TPCH_Q21_SQL = f"""
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate
                                        + INTERVAL {Q21_LATE_DAYS} DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


QUERIES = {
    "q_lateral_topk": lateral_topk,
    "q_tpch_q3": tpch_q3,
    "q_tpch_q5": tpch_q5,
    "q_tpch_q10": tpch_q10,
    "q_tpch_q18": tpch_q18,
    "q_join_dpp": join_dpp,
    "q_subquery_scalar": subquery_scalar,
    "q_tpch_q4": tpch_q4,
    "q_tpch_q7": tpch_q7,
    "q_tpch_q11": tpch_q11,
    "q_tpch_q14": tpch_q14,
    "q_tpch_q16": tpch_q16,
    "q_tpch_q22": tpch_q22,
    "q_tpch_q2": tpch_q2,
    "q_tpch_q6": tpch_q6,
    "q_tpch_q8": tpch_q8,
    "q_tpch_q9": tpch_q9,
    "q_tpch_q12": tpch_q12,
    "q_tpch_q13": tpch_q13,
    "q_tpch_q15": tpch_q15,
    "q_tpch_q17": tpch_q17,
    "q_tpch_q19": tpch_q19,
    "q_tpch_q20": tpch_q20,
    "q_tpch_q21": tpch_q21,
}

ORACLE = {
    "q_lateral_topk": LATERAL_TOPK_SQL,
    "q_tpch_q3": TPCH_Q3_SQL,
    "q_tpch_q5": TPCH_Q5_SQL,
    "q_tpch_q10": TPCH_Q10_SQL,
    "q_tpch_q18": TPCH_Q18_SQL,
    "q_join_dpp": JOIN_DPP_SQL,
    "q_subquery_scalar": SUBQUERY_SCALAR_SQL,
    "q_tpch_q4": TPCH_Q4_SQL,
    "q_tpch_q7": TPCH_Q7_SQL,
    "q_tpch_q11": TPCH_Q11_SQL,
    "q_tpch_q14": TPCH_Q14_SQL,
    "q_tpch_q16": TPCH_Q16_SQL,
    "q_tpch_q22": TPCH_Q22_SQL,
    "q_tpch_q2": TPCH_Q2_SQL,
    "q_tpch_q6": TPCH_Q6_SQL,
    "q_tpch_q8": TPCH_Q8_SQL,
    "q_tpch_q9": TPCH_Q9_SQL,
    "q_tpch_q12": TPCH_Q12_SQL,
    "q_tpch_q13": TPCH_Q13_SQL,
    "q_tpch_q15": TPCH_Q15_SQL,
    "q_tpch_q17": TPCH_Q17_SQL,
    "q_tpch_q19": TPCH_Q19_SQL,
    "q_tpch_q20": TPCH_Q20_SQL,
    "q_tpch_q21": TPCH_Q21_SQL,
}
