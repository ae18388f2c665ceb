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
3. **within-cell pairs**: self-join on the cell id (capped — see
   ``SEM_MAX_CELL``, same policy as MH_MAX_BUCKET), exact cosine ≥ τ
   on candidate pairs, round 6.  Keep the lowest doc_id as canonical.

At 100 TB: the vectorizer is the only data-volume stage (the same
explode+count shape as q_tfidf); blocking is map-only against one
broadcast row; the verify join moves 64-long fixed-width vectors for
same-cell candidates only.  Like all blocked dedup, recall is a
property of the cell function — pinned at the fixture in
``tests/test_semdedup.py`` (measured 25/26 = 0.96 vs the exact
all-pairs truth at sf0.01).

Overflow headroom: ``count_k · Σlen`` with per-doc bucket counts ~1e3
and a 100 TB corpus (Σlen ~1e13 tokens) stays ~1e16 < 2⁶³.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

#: hashing-vectorizer dimensionality (md5-bucketed term counts)
SEM_DIM = 64

#: dimensions whose rate-sign bits form the cell id
SEM_BITS = 8

#: cosine threshold above which two documents are semantic duplicates
SEM_TAU = 0.95

#: degenerate-cell cap, same policy as MH_MAX_BUCKET in llm/dedup.py:
#: a cell over this size drops out of pairing (at real scale: re-block
#: on more bits) so no cell can go quadratic.
SEM_MAX_CELL = 100_000

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
    vecs = vecs.withColumn("len", length)
    totals = vecs.agg(
        F.sum("len").alias("sl"),
        *[
            F.sum(F.col("q")[k]).alias(f"sc{k}")
            for k in range(SEM_BITS)
        ],
    )
    withtot = vecs.crossJoin(F.broadcast(totals))
    cell = None
    for k in range(SEM_BITS):
        bit = F.when(
            F.col("q")[k] * F.col("sl") > F.col("len") * F.col(f"sc{k}"),
            F.lit(1 << k),
        ).otherwise(F.lit(0))
        cell = bit if cell is None else cell + bit
    cells = withtot.select("doc_id", cell.alias("cell"), "q")
    w = Window.partitionBy("cell")
    cells = (
        cells.withColumn("__cell_n", F.count(F.lit(1)).over(w))
        .where(F.col("__cell_n") <= SEM_MAX_CELL)
        .drop("__cell_n")
    )
    dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    a = cells.select(
        F.col("doc_id").alias("keep_id"), "cell", dbl(F.col("q")).alias("va")
    )
    b = cells.select(
        F.col("doc_id").alias("dup_id"), "cell", dbl(F.col("q")).alias("vb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(c, c, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
        )
    )
    return (
        a.join(b, "cell")
        .where(F.col("keep_id") < F.col("dup_id"))
        .select(
            "dup_id",
            "keep_id",
            F.round(dot / (norm(F.col("va")) * norm(F.col("vb"))), 6).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= SEM_TAU)
        .orderBy("dup_id", "keep_id")
    )


def _bits_sql() -> str:
    return " + ".join(
        f"(CASE WHEN q[{k + 1}] * sl > len * scs[{k + 1}]"
        f" THEN {1 << k} ELSE 0 END)"
        for k in range(SEM_BITS)
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
totk AS (
  SELECT k, CAST(SUM(q[k]) AS BIGINT) AS sc
  FROM vlen, generate_series(1, {SEM_BITS}) s(k)
  GROUP BY k
),
tota AS (
  SELECT (SELECT CAST(SUM(len) AS BIGINT) FROM vlen) AS sl,
         array_agg(sc ORDER BY k) AS scs
  FROM totk
),
cells AS (
  SELECT doc_id, q, len, ({_bits_sql()}) AS cell
  FROM vlen, tota
),
capped AS (
  SELECT * FROM (
    SELECT doc_id, q, cell, COUNT(*) OVER (PARTITION BY cell) AS cn
    FROM cells
  ) WHERE cn <= {SEM_MAX_CELL}
),
pairs AS (
  SELECT b.doc_id AS dup_id, a.doc_id AS keep_id,
         ROUND(
           list_reduce(list_prepend(0.0,
               list_transform(generate_series(1, {SEM_DIM}),
                              i -> CAST(a.q[i] AS DOUBLE) * CAST(b.q[i] AS DOUBLE))),
             (s, x) -> s + x)
           / (sqrt(list_reduce(list_prepend(0.0,
                 list_transform(a.q, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (s, x) -> s + x))
              * sqrt(list_reduce(list_prepend(0.0,
                 list_transform(b.q, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (s, x) -> s + x)))
         , 6) AS cosine
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
