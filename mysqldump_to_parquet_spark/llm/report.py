"""Curation observability: quality-bucket × duplication cross-report
(SURVEY §2.2 extension surface — pipeline QA operators).

Before gating a corpus, a curation pipeline needs the joint picture the
individual signals don't give: *are the low-quality documents also the
duplicated ones?*  (If yes, a dedup pass does double duty; if no, the
quality gate and the dedup gate remove disjoint mass and both budgets
matter.)  This operator buckets every document by its heuristic quality
score and reports per-bucket exact-duplicate rates and token mass.

Scale shape: one shuffle on the text key (the same partitioning
q_dedup_exact uses) to count copies per identical text, one co-keyed
join back on doc_id, then a ≤10-group partial aggregate.  All counts are
exact integers; the two ratios are single deterministic double divisions
at the very end — hash-green, partition-stable.

Bucketing uses FIXED-WIDTH score buckets (floor(quality·10), clamped to
9), not ntile deciles: exact global ntile is a total order through one
consumer — the same reason q_agg_histogram_eq is the lone allowlisted
single-partition plan — while fixed buckets stay embarrassingly
parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .textstats import QUALITY_SCORE_SQL, quality_score


def curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_curation_report: per quality bucket — document count, exact-dup
    document count, dup rate, and mean whitespace-token count."""
    qs = quality_score(spark, sf_dir).select("doc_id", "n_tokens", "quality")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Copy counts via partial-aggregating groupBy + join back — NOT a
    # count window over text: the text key's skew IS the signal being
    # measured (duplicated boilerplate), so Window.partitionBy("text")
    # funnels every copy of the hottest text through one window
    # partition (VERDICT r6 #4).  groupBy combines map-side (each task
    # emits one row per distinct text it holds) and AQE's skew-join
    # handles the join side if one text dominates.
    # Null-safe join (ADVICE r7): groupBy and the oracle's COUNT(*) OVER
    # (PARTITION BY text) both treat NULL text as one group and keep the
    # rows, so the join back must not drop them — eqNullSafe is still an
    # equi-join key to Catalyst (hash/sort-merge, never cartesian).
    text_counts = d.groupBy("text").agg(F.count(F.lit(1)).alias("n_copies"))
    copies = d.join(
        text_counts, d["text"].eqNullSafe(text_counts["text"])
    ).select(d["doc_id"], "n_copies")
    joined = qs.join(copies, "doc_id")
    bucket = F.least(F.floor(F.col("quality") * 10).cast("int"), F.lit(9))
    is_dup = F.when(F.col("n_copies") > 1, 1).otherwise(0)
    n_docs = F.count(F.lit(1))
    n_dup = F.sum(is_dup)
    return (
        joined.groupBy(bucket.alias("q_bucket"))
        .agg(
            n_docs.alias("n_docs"),
            n_dup.cast("long").alias("n_dup_docs"),
            F.round(
                n_dup.cast("double") / n_docs.cast("double"), 4
            ).alias("dup_rate"),
            F.round(
                F.sum("n_tokens").cast("double") / n_docs.cast("double"), 2
            ).alias("mean_tokens"),
        )
        .orderBy("q_bucket")
    )


CURATION_REPORT_SQL = f"""
WITH q AS ({QUALITY_SCORE_SQL}),
c AS (
  SELECT doc_id, COUNT(*) OVER (PARTITION BY text) AS n_copies
  FROM documents
)
SELECT LEAST(CAST(FLOOR(quality * 10) AS INTEGER), 9) AS q_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       ROUND(CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 4) AS dup_rate,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 2) AS mean_tokens
FROM q JOIN c USING (doc_id)
GROUP BY 1
ORDER BY q_bucket
"""


QUERIES = {
    "q_curation_report": curation_report,
}

ORACLE = {
    "q_curation_report": CURATION_REPORT_SQL,
}
