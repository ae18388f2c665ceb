"""Vector aggregation and classification over the embeddings table.

Completes the embedding surface around :mod:`similarity` (ANN search):
per-class centroids (the quantizer-fitting / cluster-labeling primitive)
and k-NN classification of a probe vector (the eval-time counterpart of
the ANN index).

Scale shapes:
* ``embed_centroids``: posexplode to (label, pos, value) — a fixed 64×
  row expansion, *not* data-squared — then a (label, pos) average with
  map-side partial aggregation, emitted as scalar (label, pos, mean)
  rows.  The classic way to average vectors on an engine whose
  aggregates are scalar; no driver-side math, no collect.
* ``knn_classify``: one codegen'd cosine fold per row against the
  broadcast probe (same shape as q_sim_topk), TakeOrderedAndProject for
  the k-cut, then a tiny vote aggregate over k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .dedup import cosine_expr
from .similarity import PROBE, _probe_col, _probe_sql_list

# ---------------------------------------------------------------- centroids

DIM = 64


def embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_embed_centroids: per-label mean vector as scalar rows.

    Returns one row per (label, dimension position) — ``(label, pos,
    n_vecs, mean)`` — instead of reassembling an ``ArrayType`` column:
    differential harnesses canonicalize rows by sorting/hashing values,
    and an array cell is unhashable there.  A consumer wanting the array
    form pivots/collects downstream; the aggregation (posexplode → one
    (label, pos) partial-avg shuffle, never data-squared) is identical.
    ``mean`` is rounded to 6 decimals — cross-engine double-avg
    accumulation order is not bit-stable."""
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select("label", "pos", F.col("v").cast("double").alias("v"))
    return (
        exploded.groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("v"), 6).alias("mean"),
        )
        .orderBy("label", "pos")
    )


EMBED_CENTROIDS_SQL = f"""
WITH lists AS (
  SELECT label,
         list_transform(generate_series(1, {DIM}),
                        i -> struct_pack(pos := i - 1,
                                         v := CAST(embedding[i] AS DOUBLE))) AS l
  FROM embeddings
), unnested AS (
  SELECT label, unnest(l) AS b FROM lists
), exploded AS (
  SELECT label, CAST(b.pos AS INTEGER) AS pos, b.v AS v FROM unnested
)
SELECT label, pos,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(AVG(v), 6) AS mean
FROM exploded
GROUP BY label, pos
ORDER BY label, pos
"""


# ------------------------------------------------------------- kNN classify

KNN_K = 25


def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_knn_classify: label votes among the probe's K nearest neighbours
    (cosine, rounded to 6 decimals with vec_id tiebreak exactly as
    q_sim_topk, so the K-cut is deterministic across engines)."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    nn = (
        e.select(
            "vec_id",
            "label",
            F.round(cosine_expr(dbl, _probe_col()), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(KNN_K)
    )
    return (
        nn.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("votes"),
            F.max("cosine").alias("best_cosine"),
        )
        .orderBy(F.desc("votes"), F.asc("label"))
    )


KNN_CLASSIFY_SQL = f"""
WITH probe AS (SELECT {_probe_sql_list()}::DOUBLE[] AS p),
nn AS (
  SELECT vec_id, label,
         ROUND(
           list_reduce(list_prepend(0.0,
               list_transform(generate_series(1, {DIM}),
                              i -> CAST(embedding[i] AS DOUBLE) * p[i])),
             (s, x) -> s + x)
           / (sqrt(list_reduce(list_prepend(0.0,
                 list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (s, x) -> s + x))
              * sqrt(list_reduce(list_prepend(0.0,
                 list_transform(p, x -> x * x)), (s, x) -> s + x)))
         , 6) AS cosine
  FROM embeddings, probe
  ORDER BY cosine DESC, vec_id ASC
  LIMIT {KNN_K}
)
SELECT label, COUNT(*) AS votes, MAX(cosine) AS best_cosine
FROM nn
GROUP BY label
ORDER BY votes DESC, label ASC
"""


QUERIES = {
    "q_embed_centroids": embed_centroids,
    "q_knn_classify": knn_classify,
}

ORACLE = {
    "q_embed_centroids": EMBED_CENTROIDS_SQL,
    "q_knn_classify": KNN_CLASSIFY_SQL,
}
