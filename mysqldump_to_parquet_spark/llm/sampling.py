"""Deterministic dataset splitting & sampling for training pipelines.

Random `df.sample()` is non-reproducible across runs/engines and reshuffles
membership when the corpus grows.  The standard fix — and the one that
scales — is *hash-based* assignment: a stable content key (here ``doc_id``)
is hashed, and split membership is a pure function of the hash.  Properties
that matter at 100 TB:

* **No shuffle, no state**: assignment is a per-row map; the split column
  can be computed at write time and used for partition pruning.
* **Stable under growth**: adding documents never moves an existing one
  across splits (no re-randomization drift between pipeline runs).
* **Cross-engine reproducible**: md5 is bit-identical everywhere, so the
  DuckDB oracle checks the exact assignment, not just the rates.

md5 (not xxhash64) keys the split: engine-neutral and uniformly
distributed; lexicographic comparison on the lowercase-hex digest is a
uniform threshold test ('00'…'ff' per byte).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

#: Hex-digest thresholds: md5 < 'c8' → train (~78.1%), < 'e1' → val
#: (~9.8%), rest → test (~12.1%).  Lowercase hex compares lexicographically
#: as an unsigned byte prefix in both engines.
TRAIN_MAX = "c8"
VAL_MAX = "e1"


def split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_split_hash: stable train/val/test assignment per document."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    split = (
        F.when(h < TRAIN_MAX, "train").when(h < VAL_MAX, "val").otherwise("test")
    )
    return d.select("doc_id", "lang", split.alias("split"))


SPLIT_HASH_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{TRAIN_MAX}' THEN 'train'
            WHEN md5(CAST(doc_id AS VARCHAR)) < '{VAL_MAX}'   THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""

#: Per-stratum keep-thresholds (first hex digit of md5(doc_id)): downsample
#: the dominant language to ~25% while keeping the rest — the deterministic
#: analog of ``df.sampleBy('lang', fractions)``.
STRATA_MAX = {"en": "4"}  # md5 < '4' → keep ≈ 4/16 of 'en'; others keep all


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_sample_stratified: deterministic per-stratum downsampling (class
    rebalancing for the over-represented language)."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    keep = F.lit(True)
    for lang, mx in sorted(STRATA_MAX.items()):
        keep = keep & ((F.col("lang") != lang) | (h < mx))
    return d.where(keep).select("doc_id", "lang", "source")


def _strata_pred_sql() -> str:
    clauses = [
        f"(lang <> '{lang}' OR md5(CAST(doc_id AS VARCHAR)) < '{mx}')"
        for lang, mx in sorted(STRATA_MAX.items())
    ]
    return " AND ".join(clauses)


SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_strata_pred_sql()}
"""


#: Token budget per packed training batch.
PACK_BUDGET = 2_000


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_pack_sequences: assign documents to fixed-token-budget training
    batches — batch id = (tokens preceding this doc) ÷ budget, over a
    per-language running sum ordered by doc_id (start-offset packing: a doc
    joins the batch its start offset falls in).

    Scale shape: the window partitions by ``lang`` (the shard key), so no
    global single-partition sort exists anywhere; at 100 TB the shard key
    is whatever the corpus is already bucketed by, and packing is one
    windowed pass per shard."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_doc = d.select("lang", "doc_id", n_tok.alias("n_tokens"))
    cum = F.sum("n_tokens").over(w)
    # integer DIV keeps batch ids exact at any corpus size (a double
    # quotient would wobble once cumulative tokens pass 2^53)
    return per_doc.withColumn("__start", (cum - F.col("n_tokens"))).withColumn(
        "batch_id", F.expr(f"__start DIV {PACK_BUDGET}")
    ).drop("__start")


PACK_SEQUENCES_SQL = f"""
SELECT lang, doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST((SUM(len(string_split(text, ' ')))
               OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING)
             - len(string_split(text, ' '))) // {PACK_BUDGET} AS BIGINT)
         AS batch_id
FROM documents
"""


#: Mixture-quota multiplier: source s keeps its ceil(K·√n_s) lowest-hash
#: documents.  √ is the τ=0.5 temperature reweighting (big sources are
#: downsampled toward the small ones — the standard flattening applied to
#: multi-source LLM training mixes); sqrt is IEEE-exact on both engines,
#: so the integer quota — and therefore the exact kept set — is
#: bit-reproducible, unlike a pow(n, τ) quota whose last-ulp rounding may
#: differ between libm implementations.
MIX_K = 3


def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_sample_mixture: temperature-balanced mixture sampling (τ=0.5) —
    each source keeps its ``ceil(K·√n_s)`` documents with the smallest
    md5(doc_id), giving large sources a sublinear share of the mix.

    Scale shape: one per-source count (tiny, broadcast back) + one
    window ranked by content hash, partitioned by source.  Membership is
    a pure function of (doc_id, per-source count): stable across runs and
    engines.  At 100 TB a single giant source makes its rank window the
    hot partition — there you'd compute the quota-th-smallest hash per
    source (approx quantile on a sample) and keep ``hash < threshold``
    instead, trading exact quota size for a shuffle-free filter; at
    driver-checkable scales the exact-rank form is the right baseline.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    quota = F.ceil(F.lit(MIX_K) * F.sqrt(F.col("n_src")))
    return (
        d.join(F.broadcast(counts), "source")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= quota)
        .select("doc_id", "source", "lang")
    )


SAMPLE_MIXTURE_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source
),
ranked AS (
  SELECT doc_id, d.source, lang, n_src,
         ROW_NUMBER() OVER (
           PARTITION BY d.source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents d JOIN counts ON d.source = counts.source
)
SELECT doc_id, source, lang
FROM ranked
WHERE rn <= CEIL({MIX_K} * sqrt(n_src))
"""


# ------------------------------------------ sliding-window chunking

#: Context-window chunking: window of CHUNK_W tokens advancing by
#: CHUNK_S (overlap = W - S carries context across boundaries — the
#: standard training-sample prep for documents longer than the model's
#: context; cf. non-overlapping sub-document dedup in dedup.py).
CHUNK_W = 32
CHUNK_S = 24


def chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_chunk_tokens: explode each document into overlapping token
    windows (start positions 0, S, 2S, … < n_tokens; the tail chunk may
    be short), each with its token count and an md5 fingerprint.

    Zero shuffles: the chunk transform and the posexplode are per-row
    JVM expression work — output rows ≈ tokens/S, the same linear factor
    any tokenizer pass pays.  Downstream stages (pack_sequences,
    dedup-by-fingerprint) consume the chunks without re-reading text."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    chunk_expr = F.expr(
        f"transform(sequence(0, (size(toks) - 1) DIV {CHUNK_S}),"
        f" i -> concat_ws(' ', slice(toks, i * {CHUNK_S} + 1, {CHUNK_W})))"
    )
    n_in_chunk = F.expr(
        f"size(slice(toks, chunk_idx * {CHUNK_S} + 1, {CHUNK_W}))"
    )
    return (
        d.select("doc_id", "toks", F.posexplode(chunk_expr).alias("chunk_idx", "chunk"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            n_in_chunk.cast("long").alias("n_chunk_tokens"),
            F.md5("chunk").alias("chunk_md5"),
        )
    )


CHUNK_TOKENS_SQL = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
idx AS (
  SELECT doc_id, toks,
         UNNEST(generate_series(0, (len(toks) - 1) // {CHUNK_S})) AS chunk_idx
  FROM d
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(toks[chunk_idx * {CHUNK_S} + 1 : chunk_idx * {CHUNK_S} + {CHUNK_W}])
            AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(
         toks[chunk_idx * {CHUNK_S} + 1 : chunk_idx * {CHUNK_S} + {CHUNK_W}], ' '))
         AS chunk_md5
FROM idx
"""


# ------------------------------------------ weighted Bernoulli sampling

#: Inclusion-probability scale: the longest document keeps with p = RATE,
#: everything else proportionally to its length.
WEIGHTED_RATE = 0.5


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_sample_weighted: length-proportional Bernoulli sampling —
    inclusion probability p ∝ n_chars (Poisson/PPS sampling, the
    standard upweighting of long documents in corpus mixing).

    Deterministic and engine-exact with NO float comparison against a
    random draw: the keep test compares the first 8 md5 hex digits of
    the doc_id (a uniform 32-bit integer in hex form) against
    ``hex(floor(p·2³²))`` — integer/string machinery end-to-end, so
    membership is a pure function of (doc_id, n_chars, max n_chars) and
    the oracle checks the exact kept set.  Scale shape: one tiny
    max-aggregate broadcast + a per-row filter; no shuffle of the data.
    """
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("n_chars").alias("max_chars"))
    p = (
        F.lit(WEIGHTED_RATE)
        * F.col("n_chars").cast("double")
        / F.col("max_chars").cast("double")
    )
    thresh = F.floor(p * F.lit(4294967296.0)).cast("long")
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < F.lpad(
        F.lower(F.hex(thresh)), 8, "0"
    )
    return (
        d.join(F.broadcast(mx))
        .where(keep)
        .select("doc_id", "n_chars", p.alias("keep_prob"))
    )


SAMPLE_WEIGHTED_SQL = f"""
WITH mx AS (SELECT MAX(n_chars) AS max_chars FROM documents)
SELECT doc_id, n_chars,
       {WEIGHTED_RATE} * CAST(n_chars AS DOUBLE) / CAST(max_chars AS DOUBLE)
         AS keep_prob
FROM documents, mx
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      < lpad(lower(to_hex(CAST(floor(
          {WEIGHTED_RATE} * CAST(n_chars AS DOUBLE)
          / CAST(max_chars AS DOUBLE) * 4294967296.0) AS BIGINT))), 8, '0')
"""


# -------------------------------------------- k examples per group

#: Examples kept per (lang, source) cell.
KPG_K = 5


def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_sample_k_per_group: a deterministic uniform k-sample per
    (lang, source) cell — the "show me K examples from every slice"
    primitive behind eval-set construction and data inspection UIs.

    Reservoir-sampling-equivalent without RNG state: rank by
    ``md5(doc_id)`` inside each cell and keep the first {KPG_K} — the
    hash order is uniform wrt content, stable across runs/partitions,
    and the rank window shuffles once on the (high-cardinality at
    scale) group key with WindowGroupLimit pruning map-side, exactly
    like q_topk_per_group.  Differs from lateral/topk ops by SEMANTICS:
    those pick extremes by a value; this picks a uniform sample."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang", "source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "lang", "source", h.alias("__h"))
        .withColumn("rank_in_cell", F.row_number().over(w).cast("long"))
        .where(F.col("rank_in_cell") <= KPG_K)
        .drop("__h")
    )


SAMPLE_K_PER_GROUP_SQL = f"""
SELECT doc_id, lang, source, rank_in_cell
FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (
           PARTITION BY lang, source
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS rank_in_cell
  FROM documents
) t
WHERE rank_in_cell <= {KPG_K}
"""


QUERIES = {
    "q_sample_k_per_group": sample_k_per_group,
    "q_split_hash": split_hash,
    "q_sample_weighted": sample_weighted,
    "q_sample_stratified": sample_stratified,
    "q_sample_mixture": sample_mixture,
    "q_pack_sequences": pack_sequences,
    "q_chunk_tokens": chunk_tokens,
}

ORACLE = {
    "q_sample_k_per_group": SAMPLE_K_PER_GROUP_SQL,
    "q_split_hash": SPLIT_HASH_SQL,
    "q_sample_weighted": SAMPLE_WEIGHTED_SQL,
    "q_sample_stratified": SAMPLE_STRATIFIED_SQL,
    "q_sample_mixture": SAMPLE_MIXTURE_SQL,
    "q_pack_sequences": PACK_SEQUENCES_SQL,
    "q_chunk_tokens": CHUNK_TOKENS_SQL,
}
