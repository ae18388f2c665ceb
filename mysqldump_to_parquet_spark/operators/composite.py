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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

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
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
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
       SUM(l_extendedprice * (1 - l_discount)) AS revenue
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
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
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
SELECT n_name, SUM(l_extendedprice * (1 - l_discount)) AS revenue
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
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
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
       SUM(l_extendedprice * (1 - l_discount)) AS revenue
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
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


TPCH_Q7_SQL = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
       SUM(l_extendedprice * (1 - l_discount)) AS volume
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
       SUM(l_extendedprice * (1 - l_discount)) AS part_value
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
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0)))
                / F.sum(rev)
            ).alias("promo_revenue_pct")
        )
    )


TPCH_Q14_SQL = f"""
SELECT 100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)) AS promo_revenue_pct
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
            F.sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


TPCH_Q22_SQL = f"""
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       SUM(c_acctbal) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{Q22_SINCE} 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
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
}
