"""Iterative graph analytics: PageRank over the customer↔supplier
trade graph.

The third member of the engine's iterative-algorithm family (with
label-propagation connected components in ``llm/dedup.py`` and the
KMeans-style quantizer fit in ``llm/similarity.py``): a fixed number of
synchronous rounds, each one ordinary DataFrame join+aggregate work — the
pattern GraphX/Pregel compiles to, expressed directly so Catalyst/AQE
optimize every superstep.

Scale shape per iteration: contributions = edges ⋈ ranks (shuffle keyed
on the node — the same key every round, so the edge table is partitioned
once and ``persist()``-ed), then one two-phase aggregate on the
destination.  Ranks are re-persisted and the previous round unpersisted:
memory stays O(|V| + |E|) regardless of iteration count.  For deep
iteration counts the lineage is truncated with ``localCheckpoint`` every
K rounds (here the fixed 6 rounds keep plans shallow).  No collect, no
driver-side graph state — |V| and |E| only ever appear as distributed
tables.

No reference counterpart (ingest-only engine); net-new per SURVEY §2.2.
The DuckDB oracle unrolls the same 6 synchronous rounds as chained CTEs
— bit-for-bit the same arithmetic, so the result hash-checks within
float tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

#: Damping factor and synchronous round count (fixed — every engine runs
#: the identical computation).
PR_DAMPING = 0.85
PR_ITERS = 6


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected customer↔supplier trade edges: distinct (customer,
    supplier) pairs that traded, as both directions of a random walk.
    Node ids are disjoint by namespace prefix."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("a"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    return pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))


def pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_pagerank: 6 synchronous PageRank rounds over the trade graph;
    returns every node's rank (no top-k cut — the full vector hash-checks
    without boundary-tie sensitivity)."""
    edges = _edges(spark, sf_dir).persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # weighted edges: contribution fraction carried by each edge — joined
    # once, persisted once; every round reuses the same partitioning
    wedges = (
        edges.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .persist()
    )
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    n_nodes = nodes.count()  # one scalar the driver legitimately needs
    base = (1.0 - PR_DAMPING) / n_nodes

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank")).persist()
    for _ in range(PR_ITERS):
        contribs = (
            wedges.join(ranks, wedges.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("inflow"))
        )
        # every node has inflow (undirected edges ⇒ indegree ≥ 1), so the
        # update is a plain project over the aggregate — no outer join
        new_ranks = contribs.select(
            F.col("dst").alias("node"),
            (F.lit(base) + F.lit(PR_DAMPING) * F.col("inflow")).alias("rank"),
        ).persist()
        ranks.unpersist()
        ranks = new_ranks
    out = ranks.orderBy("node")
    edges.unpersist()
    wedges.unpersist()
    nodes.unpersist()
    return out


def _pagerank_sql() -> str:
    """The identical 6 rounds, unrolled as chained CTEs (recursive CTEs
    forbid aggregation in the recursive member)."""
    head = f"""
WITH pairs AS (
  SELECT DISTINCT 'c:' || o_custkey AS a, 's:' || l_suppkey AS b
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
wedges AS (
  SELECT e.src, e.dst, 1.0 / d.outdeg AS w
  FROM edges e JOIN deg d ON e.src = d.src
),
n AS (SELECT COUNT(DISTINCT src) AS n_nodes FROM edges),
pr0 AS (
  SELECT src AS node, 1.0 / (SELECT n_nodes FROM n) AS rank
  FROM (SELECT DISTINCT src FROM edges)
)"""
    steps = []
    for i in range(1, PR_ITERS + 1):
        steps.append(
            f""",
pr{i} AS (
  SELECT e.dst AS node,
         (1 - {PR_DAMPING}) / (SELECT n_nodes FROM n)
           + {PR_DAMPING} * SUM(p.rank * e.w) AS rank
  FROM pr{i - 1} p JOIN wedges e ON p.node = e.src
  GROUP BY e.dst
)"""
        )
    return (
        head
        + "".join(steps)
        + f"\nSELECT node, rank FROM pr{PR_ITERS} ORDER BY node"
    )


PAGERANK_SQL = _pagerank_sql()

QUERIES = {
    "q_pagerank": pagerank,
}

ORACLE = {
    "q_pagerank": PAGERANK_SQL,
}
