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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .dedup import cosine_expr
from .similarity import PROBE, _probe_col, _probe_sql_list, _quantize_codes

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


# ---------------------------------------------------------------- k-means

#: Lloyd's algorithm: cluster count, refinement iterations.  Init is
#: deterministic (the K lowest vec_ids seed the centroids), so the whole
#: trajectory — and the DuckDB oracle's unrolled twin — is reproducible.
KMEANS_K = 8
KMEANS_ITERS = 2


#: mapInPandas output schema of :func:`_assign_fold_udf` — per-batch
#: partial sums, merged JVM-side into the exact per-cluster means.
_FOLD_SCHEMA = "cluster int, pos int, s double, c long"


def _assign_fold_udf(centroids):
    """Fused nearest-centroid assignment + per-batch partial sums
    (r16, guide §4): one NumPy broadcast per Arrow batch computes the
    argmin assignment ((n×1×D − 1×K×D)² summed over D → n×K), then the
    same batch folds straight into per-(cluster, pos) partial
    ``(sum, count)`` rows — K×D rows per batch instead of handing n
    assignments back for a JVM posexplode into n×D rows per pass.
    The update shuffle's input shrinks from |vectors|×D scalars to
    K×D×batches, and the JVM-side Generate+partial-HashAggregate over
    the exploded corpus disappears; the FINAL aggregation (merge of
    partials, the division, the round) stays in Spark, so the
    per-iteration driver contract is unchanged.

    Why a Python UDF at all: K×D per-centroid ``aggregate``/``zip_with``
    folds don't participate in whole-stage codegen — they evaluate as
    interpreted per-element lambdas (measured 21 s at sf0.1 for K=8,
    D=64 vs <2 s vectorized).  Determinism: the assignment is an
    *argmin*, robust to the ~1e-15 relative summation-order drift
    between NumPy's pairwise sums and the oracle's sequential fold —
    two different centroids are never that close, and exact ties
    (identical centroids) break to the lowest cluster id in both
    (``np.argmin`` first-index = the oracle's min-struct cid
    tiebreak).  The partial sums sit inside the same tolerance
    umbrella as the engine split itself: both twins round every
    iteration-boundary mean to 6 decimals, which is what absorbs
    summation-order ulps between ANY two evaluation orders
    (oracle-hash-verified at every fixture SF)."""
    cids = np.array([cid for cid, _ in centroids], dtype=np.int32)
    C = np.array([c for _, c in centroids], dtype=np.float64)  # K×D
    K, D = C.shape

    def fold(batches):
        pos = np.tile(np.arange(D, dtype=np.int32), K)
        cluster = np.repeat(cids, D)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)  # n — index into cids
            counts = np.bincount(a, minlength=K)
            sums = np.zeros((K, D))
            for k in np.flatnonzero(counts):
                sums[k] = X[a == k].sum(axis=0)
            live = counts > 0
            mask = np.repeat(live, D)
            yield pd.DataFrame(
                {
                    "cluster": cluster[mask],
                    "pos": pos[mask],
                    "s": sums.ravel()[mask],
                    "c": np.repeat(counts, D)[mask].astype(np.int64),
                }
            )

    return fold


def _fold_means(e: DataFrame, centroids) -> DataFrame:
    """One k-means pass: fused assign+fold over the embeddings, merged
    JVM-side into exact ``(cluster, pos, n_vecs, mean)`` rows — the
    identical arithmetic as the former posexplode + avg (avg IS
    sum/count), means rounded to 6 decimals at the boundary as both
    twins require."""
    parts = e.select("embedding").mapInPandas(
        _assign_fold_udf(centroids), _FOLD_SCHEMA
    )
    return parts.groupBy("cluster", "pos").agg(
        F.sum("c").alias("n_vecs"),
        F.round(F.sum("s") / F.sum("c"), 6).alias("mean"),
    )


def kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_kmeans: Lloyd k-means over the embeddings table, the MLlib
    shape hand-built on DataFrames: per iteration, ONE fused
    assign+fold pass (:func:`_assign_fold_udf`, r16) computes the
    zero-shuffle vectorized NumPy argmin against the K broadcast
    centroids AND the per-batch (cluster, pos, sum, count) partials in
    the same Arrow batch; the update shuffle then merges K×D×batches
    partial rows (not |vectors|×D posexploded scalars), and the K×DIM
    rounded means come back to the driver (4 KB — the same legitimate
    driver-side scalar traffic as MLlib's ``KMeans.fit`` pays every
    iteration; the *data* never moves).

    Determinism contract: init = K lowest vec_ids; the argmin assignment
    is drift-robust (see :func:`_assign_fold_udf`) with the same lowest-cid
    tiebreak as the oracle's min-struct; means are rounded to 6 decimals
    at every iteration boundary in both twins, so the trajectory is
    cross-engine exact.  Output: final centroids as scalar (cluster,
    pos, n_vecs, mean) rows — the :func:`embed_centroids` convention.
    """
    e = load_table(spark, sf_dir, "embeddings")

    # deterministic seed: the K lowest vec_ids, cluster id = rank
    seed_rows = (
        e.orderBy("vec_id")
        .limit(KMEANS_K)
        .select(F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .collect()
    )
    # (cid, centroid) pairs — an emptied cluster drops out but survivors
    # KEEP their ids (the oracle's unrolled CTEs never renumber)
    centroids = [(cid, list(r.v)) for cid, r in enumerate(seed_rows)]

    for _ in range(KMEANS_ITERS):
        # K×DIM rounded scalars — the per-iteration driver traffic every
        # distributed k-means pays (MLlib collects the same); never rows.
        rows = _fold_means(e, centroids).collect()
        by_cid: dict[int, list[float]] = {}
        for r in rows:
            by_cid.setdefault(r.cluster, [0.0] * DIM)[r.pos] = r.mean
        centroids = sorted(by_cid.items())

    return _fold_means(e, centroids).orderBy("cluster", "pos")


def _duck_d2(v: str, c: str) -> str:
    """DuckDB squared-distance fold, same left-to-right operand order as
    the Spark fold (explicit multiply, never ``^`` — pow() is not
    guaranteed exact for squaring)."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {DIM}),"
        f" j -> ({v}[j] - {c}[j]) * ({v}[j] - {c}[j]))), (s, x) -> s + x)"
    )


def _kmeans_round_sql(prev: str, n: int) -> str:
    """One unrolled Lloyd round: assignment vs ``{prev}`` + rounded
    per-(cluster, pos) means reassembled as list centroids ``c{n}``."""
    return f"""
d{n} AS (
  SELECT e.vec_id, p.cid, {_duck_d2('e.v', 'p.c')} AS d2
  FROM e CROSS JOIN {prev} p
),
a{n} AS (
  SELECT vec_id, (min(struct_pack(d2 := d2, cid := cid))).cid AS cluster
  FROM d{n} GROUP BY vec_id
),
u{n} AS (
  SELECT a.cluster, j - 1 AS pos, ROUND(AVG(e.v[j]), 6) AS m
  FROM a{n} a JOIN e USING (vec_id)
       CROSS JOIN generate_series(1, {DIM}) g(j)
  GROUP BY a.cluster, j
),
c{n} AS (
  SELECT cluster AS cid, list(m ORDER BY pos) AS c
  FROM u{n} GROUP BY cluster
)"""


KMEANS_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS c
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {KMEANS_K})
),{_kmeans_round_sql('c0', 1)},{_kmeans_round_sql('c1', 2)},
dF AS (
  SELECT e.vec_id, p.cid, {_duck_d2('e.v', 'p.c')} AS d2
  FROM e CROSS JOIN c2 p
),
aF AS (
  SELECT vec_id, (min(struct_pack(d2 := d2, cid := cid))).cid AS cluster
  FROM dF GROUP BY vec_id
)
SELECT a.cluster, CAST(j - 1 AS INTEGER) AS pos,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(AVG(e.v[j]), 6) AS mean
FROM aF a JOIN e USING (vec_id)
     CROSS JOIN generate_series(1, {DIM}) g(j)
GROUP BY a.cluster, j
ORDER BY a.cluster, pos
"""


# --------------------------------------------------------- int8 quantize

#: Symmetric int8 quantization: scale = max|v| / 127, q = round(v/scale).
Q_LEVELS = 127


def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_embed_quantize: per-vector symmetric int8 quantization — the
    4×-compression step vector stores apply before indexing — emitting
    the scale, an exact integer checksum of the quantized codes
    (Σ qᵢ·i, position-weighted so permutations don't collide), and the
    mean absolute dequantization error.

    Zero shuffle: one vectorized Arrow pass (``mapInPandas``) — the
    per-element JVM ``transform``/``aggregate`` folds this replaces run
    interpreted outside whole-stage codegen and measured 3× superlinear
    across the SF sweep.  Exactness: ``scale`` is a single division of
    an exact float32 max (bit-identical across engines); codes use
    explicit trunc(x + copysign(½, x)) — the same round-half-away the
    oracle's ``round()`` applies (NumPy's own ``round`` is half-even and
    would diverge); the checksum is exact int64; only the error mean
    crosses a summation-order boundary and is rounded to 6 per repo
    convention (its magnitude ~1e-3 sits 9 orders under the grid)."""
    e = load_table(spark, sf_dir, "embeddings")
    schema = (
        "vec_id long, label int, scale double, q_checksum long, "
        "mean_abs_err double"
    )

    def batches(it):
        weights = np.arange(1, DIM + 1, dtype=np.int64)
        for pdf in it:
            if not len(pdf):
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            # the ONE int8 quantizer implementation (shared with the
            # written IVF layout, similarity._quantize_codes) — a
            # divergence in scale/tie-break would silently split this
            # oracle-pinned key from the index codes (review r11)
            codes, scale = _quantize_codes(X)
            keep = scale > 0
            X, sub, scale = X[keep], pdf[keep], scale[keep]
            q = codes[keep].astype(np.int64)
            err = np.abs(X - q * scale[:, None]).sum(axis=1) / DIM
            yield pd.DataFrame(
                {
                    "vec_id": sub["vec_id"].to_numpy(),
                    "label": sub["label"].to_numpy(),
                    "scale": scale,
                    "q_checksum": (q * weights).sum(axis=1),
                    "mean_abs_err": np.round(err, 6),
                }
            )

    return e.mapInPandas(batches, schema)


EMBED_QUANTIZE_SQL = f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS d,
         CAST(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
              AS DOUBLE) / {Q_LEVELS} AS scale
  FROM embeddings
), q AS (
  SELECT vec_id, label, d, scale,
         list_transform(d, x -> CAST(round(x / scale) AS INTEGER)) AS codes
  FROM v
  WHERE scale > 0
)
SELECT vec_id, label, scale,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(generate_series(1, {DIM}),
                          j -> CAST(codes[j] AS BIGINT) * j)),
         (s, x) -> s + x) AS q_checksum,
       ROUND(
         list_reduce(list_prepend(0.0,
             list_transform(generate_series(1, {DIM}),
                            j -> abs(d[j] - CAST(codes[j] AS DOUBLE) * scale))),
           (s, x) -> s + x) / {DIM}, 6) AS mean_abs_err
FROM q
"""


QUERIES = {
    "q_embed_centroids": embed_centroids,
    "q_knn_classify": knn_classify,
    "q_kmeans": kmeans,
    "q_embed_quantize": embed_quantize,
}

ORACLE = {
    "q_embed_centroids": EMBED_CENTROIDS_SQL,
    "q_knn_classify": KNN_CLASSIFY_SQL,
    "q_kmeans": KMEANS_SQL,
    "q_embed_quantize": EMBED_QUANTIZE_SQL,
}
