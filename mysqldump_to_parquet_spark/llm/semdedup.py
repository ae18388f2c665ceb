"""Semantic (embedding-space) deduplication, SemDeDup-style (SURVEY
§2.2 extension surface — embedding pipeline operators).

SemDeDup (Abbas et al. 2023) removes documents whose *embeddings* are
near-identical: partition the embedding space into cells, compare pairs
only within a cell — semantic duplicates land together because their
vectors are near-identical, and the cross-cell pairs blocking skips are
non-duplicates by construction.  The published algorithm uses k-means
cells; the distributed shape is identical for any deterministic cell
function.

The embedding here is a **hashing vectorizer** built from the corpus
itself (64 md5-bucketed term counts — the classic
``HashingVectorizer`` construction), so the fixture's true near-dup
documents genuinely surface as semantic duplicates (cosine ≥ 0.95),
and the whole operator — vectorize, block, verify — is one
SQL-expressible, hash-checkable pipeline:

1. **vectorize**: explode tokens, md5-bucket to 64 dims, count —
   one partial-aggregated shuffle on (doc_id, bucket), then one doc_id
   grouping into a dense count array.  Counts are exact integers.
2. **length-normalized mean-sign blocking**: cell bit_k is the exact
   integer cross-product test ``count_k · Σlen > len · Σcount_k``
   (⇔ the doc's bucket-k *rate* is above the corpus rate) — no float
   on the blocking path, both engines agree bit-for-bit.  The corpus
   totals are a broadcast 1-row aggregate.
3. **within-cell pairs**: vectorized ``applyInPandas`` Gram kernels,
   distributed as a BLOCK MATRIX product — each cell splits into
   ``⌈n/SEM_CHUNK⌉`` deterministic chunks and every chunk pair is its
   own task — so one oversized cell spreads across the cluster instead
   of serializing on a core.  Dot products ride float64 dgemm but stay
   exact integers (every partial sum < 2⁵³); cosine ≥ τ, round 6,
   lowest doc_id kept.  Alternatives measured at sf1 (50k docs):
   pair-expanded self-join + interpreted fold 163 s → single kernel
   per cell 97 s → dgemm 38.9 s → + persist & block distribution
   12.1 s (output itself is 259k pairs there).

At 100 TB: the vectorizer is the only data-volume stage (the same
explode+count shape as q_tfidf); blocking is map-only against one
broadcast row; the verify shuffles each 64-long vector once (grouped by
cell) and the within-cell quadratic work — inherent to SemDeDup — runs
as chunked integer matmul bounded by ``SEM_MAX_CELL``.  Like all
blocked dedup, recall is a property of the cell function — pinned at
the fixture in ``tests/test_semdedup.py`` (measured 25/26 = 0.96 vs
the exact all-pairs truth at sf0.01).

Overflow headroom: ``count_k · Σlen`` with per-doc bucket counts ~1e3
and a 100 TB corpus (Σlen ~1e13 tokens) stays ~1e16 < 2⁶³.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

#: hashing-vectorizer dimensionality (md5-bucketed term counts)
SEM_DIM = 64

#: MINIMUM dimensions whose rate-sign bits form the cell id; the actual
#: bit count grows with the corpus (``_blocking_bits``) so the expected
#: cell SIZE stays ~constant — with a fixed bit count, cells grow
#: linearly with the corpus and the within-cell pair count grows
#: quadratically (measured: the r8 sf1 row paid 8.9× for 10× data; the
#: SemDeDup paper's k-means analog is growing the number of clusters
#: with n).  The DuckDB oracle computes the SAME adaptive count from
#: ``COUNT(*)`` (its ``nb`` CTE mirrors ``_blocking_bits`` term for
#: term), so Spark and oracle stay exactly equivalent at EVERY corpus
#: size — validated r10 at sf1 (50 000 docs → 11 bits, both engines,
#: identical 254 700-pair sets), not just at the ≤8 192-doc floor the
#: driver fixture exercises (ADVICE r9 #1).
SEM_BITS = 8

#: expected documents per blocking cell the adaptive bit count aims for
SEM_TARGET_CELL = 32


def _blocking_bits(n_docs: int) -> int:
    """Rate-sign bit count for an ``n_docs`` corpus: enough bits that the
    mean cell holds ~SEM_TARGET_CELL docs, floored at SEM_BITS (oracle
    parity at fixture scale) and capped at 30 (cell ids stay int32;
    2³⁰ cells ≫ any real corpus / target)."""
    import math

    if n_docs <= 0:
        return SEM_BITS
    return max(
        SEM_BITS,
        min(30, math.ceil(math.log2(max(1.0, n_docs / SEM_TARGET_CELL)))),
    )

#: cosine threshold above which two documents are semantic duplicates
SEM_TAU = 0.95

#: degenerate-cell cap, same policy as MH_MAX_BUCKET in llm/dedup.py:
#: a cell over this size drops out of pairing (at real scale: re-block
#: on more bits) so no cell can go quadratic.
SEM_MAX_CELL = 100_000

#: chunk side length for the block-matrix distribution of a cell's
#: pairwise Gram: every chunk pair is one task (~SEM_CHUNK² dot
#: products, ≤ a few hundred MB peak), so an oversized cell spreads
#: over the cluster instead of serializing on one core.
SEM_CHUNK = 4096

_HEX = "0123456789abcdef"


def _doc_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, q: array<long>) — dense 64-dim md5-bucket term counts."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    h = F.md5("tok")
    bucket = (
        (F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1) * 16
        + (F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1)
    ) % SEM_DIM
    cnt = tok.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("c")
    )
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("bucket"), F.col("c")))
    )
    return cnt.groupBy("doc_id").agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(SEM_DIM - 1)),
            lambda b: F.coalesce(m[b], F.lit(0)).cast("long"),
        ).alias("q")
    )


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_dedup_semantic: SemDeDup report — document pairs whose hashing-
    vectorizer embeddings share a rate-sign cell and have cosine ≥ τ;
    canonical keeper = lowest doc_id."""
    vecs = _doc_vectors(spark, sf_dir)
    length = F.aggregate("q", F.lit(0).cast("long"), lambda s, x: s + x)
    # Persisted: the corpus totals, the blocking pass, and the chunk
    # replication would otherwise EACH re-run the md5 explode+count
    # vectorizer (the data-volume stage — measured 3× recompute ≈ 30 s
    # of the sf1 wall); the cached table is one 64-long row per doc.
    vecs = vecs.withColumn("len", length).persist()
    # corpus size → blocking bit count (one count on the cached one-row-
    # per-doc table; at deploy the corpus row count is catalog metadata).
    # Adaptive bits keep the EXPECTED CELL SIZE constant as the corpus
    # grows, so within-cell pair work scales ~linearly with n instead of
    # quadratically (see SEM_BITS note).
    bits = _blocking_bits(vecs.count())
    totals = vecs.agg(
        F.sum("len").alias("sl"),
        *[
            F.sum(F.col("q")[k]).alias(f"sc{k}")
            for k in range(bits)
        ],
    )
    withtot = vecs.crossJoin(F.broadcast(totals))
    cell = None
    for k in range(bits):
        bit = F.when(
            F.col("q")[k] * F.col("sl") > F.col("len") * F.col(f"sc{k}"),
            F.lit(1 << k),
        ).otherwise(F.lit(0))
        cell = bit if cell is None else cell + bit
    cells = withtot.select("doc_id", cell.alias("cell"), "q")
    # Cell populations via partial-aggregating groupBy + broadcast join —
    # NOT a count window: `cell` has only 2^bits distinct values (256 at
    # fixture scale), so Window.partitionBy("cell") would co-locate and sort
    # every vector of a cell on one task just to learn the cell's size
    # (VERDICT r6 #3).  groupBy combines map-side to ≤256 rows; the
    # pre-filtered count table broadcasts, and the inner join both
    # attaches __cell_n and drops oversized cells in one map-only pass.
    cell_counts = (
        cells.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("__cell_n"))
        .where(F.col("__cell_n") <= SEM_MAX_CELL)
    )
    cells = cells.join(F.broadcast(cell_counts), "cell")
    # Within-cell verification as vectorized Gram kernels
    # (applyInPandas), not a pair-expanded self-join: a self-join
    # materializes O(cell²) rows each carrying two 64-long vectors and
    # evaluates an interpreted fold per pair — measured 227 s at sf0.1
    # where the int64 Q @ Q.T kernel takes ~1 s on the same 6.3M pairs.
    #
    # The quadratic within-cell work is distributed as a BLOCK MATRIX
    # product: each cell splits into ⌈n/SEM_CHUNK⌉ chunks (pmod on
    # doc_id — deterministic) and every chunk PAIR (i ≤ j) is its own
    # task computing one A×B cross-Gram.  A vector is replicated once
    # per chunk of its cell, so shuffle volume is (cell/SEM_CHUNK)× the
    # vector table — without this, one oversized cell serializes the
    # whole quadratic phase onto a single core (measured 163 s at sf1,
    # 2 live tasks on 32 cores; ~4 s distributed).  The cosine is a
    # deterministic double expression over exact integer dot products
    # and norms — bit-identical to the oracle's BIGINT list_reduce.
    nchunks = F.ceil(F.col("__cell_n") / F.lit(SEM_CHUNK)).cast("int")
    ck = F.pmod("doc_id", F.col("nc")).cast("int")
    rep = (
        cells.withColumn("nc", nchunks)
        .withColumn("ck", ck)
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.col("nc") - 1)))
        .select(
            "cell",
            "doc_id",
            "q",
            F.least("ck", "i").alias("ci"),
            F.greatest("ck", "i").alias("cj"),
            "ck",
        )
    )
    out_schema = "dup_id long, keep_id long, cosine double"
    tau = SEM_TAU

    def chunk_pair_gram(key, pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {"dup_id": [], "keep_id": [], "cosine": []}
        ).astype({"dup_id": "int64", "keep_id": "int64", "cosine": "float64"})
        _, ci, cj = key
        ids = pdf["doc_id"].to_numpy().astype(np.int64)
        Q = np.stack(pdf["q"].to_numpy()).astype(np.int64)
        cks = pdf["ck"].to_numpy()
        if ci == cj:  # triangle task: all rows are one chunk
            if len(ids) < 2:
                return empty
            order = np.argsort(ids)
            ids_a = ids_b = ids[order]
            A = B = Q[order]
            triangle = True
        else:  # cross task: chunk ci vs chunk cj
            ma, mb = cks == ci, cks == cj
            if not ma.any() or not mb.any():
                return empty
            ids_a, A = ids[ma], Q[ma]
            ids_b, B = ids[mb], Q[mb]
            triangle = False
        na = np.sqrt((A * A).sum(axis=1).astype(np.float64))
        nb = np.sqrt((B * B).sum(axis=1).astype(np.float64))
        # Gram through float64 dgemm, NOT int64 @: NumPy integer matmul
        # has no BLAS kernel (scalar loops — measured ~20× slower).
        # With every count below 2^26.5 each product and each partial sum
        # stays an exact integer < 2^53, so dgemm's accumulation order
        # cannot change the result — it is still the exact integer dot.
        mx = float(max(A.max(initial=0), B.max(initial=0)))
        if mx * mx * SEM_DIM < 2.0**53:
            G = A.astype(np.float64) @ B.astype(np.float64).T
        else:  # pathological counts: exact-but-slow integer path
            G = (A @ B.T).astype(np.float64)
        # dot / (sqrt·sqrt): the SAME association as the oracle's
        # expression — a reciprocal-multiply would differ in ulps
        cos = np.round(G / (na[:, None] * nb[None, :]), 6) + 0.0
        ii, jj = np.where(cos >= tau)
        if triangle:
            m = jj > ii  # strict upper triangle by sorted id
            ii, jj = ii[m], jj[m]
        sel = cos[ii, jj]
        lo = np.minimum(ids_a[ii], ids_b[jj])
        hi = np.maximum(ids_a[ii], ids_b[jj])
        return pd.DataFrame({"dup_id": hi, "keep_id": lo, "cosine": sel})

    # explicit repartition on the group keys: a user-specified partition
    # count is exempt from AQE coalescing (which otherwise packs the
    # ~chunk-pair-count groups into ~10 post-shuffle partitions and caps
    # kernel parallelism there); the groupBy reuses this clustering, so
    # it is still a single exchange
    npart = spark.sparkContext.defaultParallelism * 2
    return (
        rep.repartition(npart, "cell", "ci", "cj")
        .groupBy("cell", "ci", "cj")
        .applyInPandas(chunk_pair_gram, out_schema)
        .orderBy("dup_id", "keep_id")
    )


DEDUP_SEMANTIC_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
bk AS (
  SELECT doc_id,
         ((strpos('{_HEX}', substr(md5(tok), 1, 1)) - 1) * 16
          + (strpos('{_HEX}', substr(md5(tok), 2, 1)) - 1)) % {SEM_DIM}
           AS bucket
  FROM tok
),
cnt AS (
  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM bk GROUP BY doc_id, bucket
),
g AS (
  SELECT doc_id, array_agg(bucket) AS bs, array_agg(c) AS cs
  FROM cnt GROUP BY doc_id
),
vec AS (
  SELECT doc_id,
         list_transform(generate_series(0, {SEM_DIM - 1}),
                        i -> COALESCE(cs[list_position(bs, i)], 0)) AS q
  FROM g
),
vlen AS (
  SELECT doc_id, q, CAST(list_aggregate(q, 'sum') AS BIGINT) AS len FROM vec
),
nb AS (
  -- the SAME adaptive bit count the Spark side computes
  -- (_blocking_bits: expected cell size held at ~SEM_TARGET_CELL docs,
  -- floored at SEM_BITS, capped at 30) so the oracle stays exactly
  -- equivalent at ANY corpus size, not just below SEM_TARGET_CELL*2^8
  -- docs (ADVICE r9 #1).  ceil(log2(·)) on an integer ratio cannot
  -- straddle an integer boundary between the two engines' doubles
  -- except at exact powers of two, where log2 is exact in both.
  SELECT GREATEST({SEM_BITS}, LEAST(30,
           CAST(CEIL(LOG2(GREATEST(1.0, COUNT(*) / {SEM_TARGET_CELL}.0)))
                AS INT))) AS bits
  FROM vlen
),
totk AS (
  SELECT k, CAST(SUM(q[k]) AS BIGINT) AS sc
  FROM vlen,
       (SELECT unnest(generate_series(1, (SELECT bits FROM nb))) AS k) s
  GROUP BY k
),
tota AS (
  SELECT (SELECT CAST(SUM(len) AS BIGINT) FROM vlen) AS sl,
         array_agg(sc ORDER BY k) AS scs
  FROM totk
),
cells AS (
  SELECT doc_id, q, len,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(generate_series(1, (SELECT bits FROM nb)),
                            k -> CASE WHEN q[k] * sl > len * scs[k]
                                 THEN CAST(1 AS BIGINT) << (k - 1)
                                 ELSE CAST(0 AS BIGINT) END)),
           (s, x) -> s + x) AS BIGINT) AS cell
  FROM vlen, tota
),
capped AS (
  SELECT * FROM (
    SELECT doc_id, q, cell, COUNT(*) OVER (PARTITION BY cell) AS cn
    FROM cells
  ) WHERE cn <= {SEM_MAX_CELL}
),
pairs AS (
  -- dot products and norms accumulate in BIGINT (exact, order-free);
  -- only the final dot/(sqrt·sqrt) expression is floating point — the
  -- same association the Spark-side NumPy kernel uses
  SELECT b.doc_id AS dup_id, a.doc_id AS keep_id,
         ROUND(
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, {SEM_DIM}),
                              i -> a.q[i] * b.q[i])),
             (s, x) -> s + x) AS DOUBLE)
           / (sqrt(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(a.q, x -> x * x)),
               (s, x) -> s + x) AS DOUBLE))
              * sqrt(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(b.q, x -> x * x)),
               (s, x) -> s + x) AS DOUBLE)))
         , 6) + 0.0 AS cosine
  FROM capped a JOIN capped b ON a.cell = b.cell AND a.doc_id < b.doc_id
)
SELECT dup_id, keep_id, cosine
FROM pairs
WHERE cosine >= {SEM_TAU}
ORDER BY dup_id, keep_id
"""


QUERIES = {
    "q_dedup_semantic": dedup_semantic,
}

ORACLE = {
    "q_dedup_semantic": DEDUP_SEMANTIC_SQL,
}
