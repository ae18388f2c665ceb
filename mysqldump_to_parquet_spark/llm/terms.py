"""Term weighting and n-gram language-model estimation over documents.

The two classic corpus-statistics jobs between tokenization and training:
TF-IDF (retrieval weighting / keyword extraction) and bigram MLE (the
counting backbone of n-gram LMs and the perplexity-ish quality filters
built on them).

Scale shapes:
* ``tfidf``: one explode → (doc, term) TF counts (map-side partial agg);
  document frequency is a *second aggregation of the TF output* (one row
  per (doc, term) already), never a second pass over text; the corpus
  size N joins as a broadcast single-row aggregate; the final top-k per
  doc is one window on doc_id.  Three shuffles total, all key-partitioned
  and partial-aggregated, nothing proportional to corpus² anywhere.
* ``ngram_lm``: bigram counts via the transform/sequence shingle (no
  Python), conditioned on the first token by a second aggregation of the
  count table; the global top-k cut is TakeOrderedAndProject.  The
  conditional probability is an exact int/int division, so both engines
  produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

# ------------------------------------------------------------------ tf-idf

TFIDF_TOP_K = 3
MIN_TERM_LEN = 4


def tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_tfidf: top-K terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1))); ties broken by term so the cut is
    deterministic."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.length("term") >= MIN_TERM_LEN)
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.select(F.count(F.lit(1)).alias("n_docs"))
    weighted = (
        tf.join(df_counts, "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            # rounded to 9 BEFORE the rank window: libm ln differs in the
            # last ulp across engines, and the top-K cut must order both
            # engines identically (ties on the rounded value break by term)
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)),
                9,
            ).alias("weight"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("weight"), F.asc("term")
    )
    return (
        weighted.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "rank", "term", "tf", "df", "weight")
    )


TFIDF_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM tok WHERE length(term) >= {MIN_TERM_LEN}
  GROUP BY doc_id, term
), dfc AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), weighted AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
         ROUND(tf.tf * ln((n.n_docs + 1) / CAST(dfc.df + 1 AS DOUBLE)), 9) AS weight
  FROM tf JOIN dfc USING (term) CROSS JOIN n
)
SELECT doc_id, rank, term, tf, df, weight
FROM (
  SELECT doc_id, term, tf, df, weight,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY weight DESC, term ASC) AS BIGINT) AS rank
  FROM weighted
) t
WHERE rank <= {TFIDF_TOP_K}
"""


# ---------------------------------------------------------------- bigram LM

NGRAM_TOP_K = 20


def ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_ngram_lm: corpus bigram MLE — the top-K bigrams by count with
    their conditional probability p(w2 | w1) = c(w1,w2) / c(w1·).

    c(w1·) sums the bigram counts per first token (a reaggregation of the
    count table, not a new corpus pass), so the division is exact."""
    d = load_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("toks")  # bind split ONCE — element_at
        # inside the transform must index a materialized array, not
        # re-evaluate split per element (that would be O(tokens²)/doc)
    )
    bigrams = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> struct(element_at(toks, i) AS w1,"
        "             element_at(toks, i + 1) AS w2))"
    )
    pairs = d.select(F.explode(bigrams).alias("b")).select("b.w1", "b.w2")
    counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_cnt"))
    firsts = counts.groupBy("w1").agg(F.sum("pair_cnt").alias("first_cnt"))
    return (
        counts.join(firsts, "w1")
        .select(
            "w1",
            "w2",
            "pair_cnt",
            "first_cnt",
            (F.col("pair_cnt") / F.col("first_cnt")).alias("p_cond"),
        )
        .orderBy(F.desc("pair_cnt"), F.asc("w1"), F.asc("w2"))
        .limit(NGRAM_TOP_K)
    )


NGRAM_LM_SQL = f"""
WITH pairs AS (
  SELECT unnest(list_transform(
           generate_series(1, len(string_split(text, ' ')) - 1),
           i -> struct_pack(w1 := string_split(text, ' ')[i],
                            w2 := string_split(text, ' ')[i + 1])
         )) AS b
  FROM documents
), counts AS (
  SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*) AS pair_cnt
  FROM pairs GROUP BY b.w1, b.w2
), firsts AS (
  SELECT w1, CAST(SUM(pair_cnt) AS BIGINT) AS first_cnt
  FROM counts GROUP BY w1
)
SELECT w1, w2, pair_cnt, first_cnt,
       CAST(pair_cnt AS DOUBLE) / first_cnt AS p_cond
FROM counts JOIN firsts USING (w1)
ORDER BY pair_cnt DESC, w1 ASC, w2 ASC
LIMIT {NGRAM_TOP_K}
"""


# ------------------------------------------------- co-occurrence PMI

PMI_TOP_K = 50
PMI_MIN_PAIR = 5


def cooccur_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_cooccur_pmi: top-K within-document term-pair associations by
    pointwise mutual information over document frequencies.

    The pair table comes from a *self-join of the distinct (doc, term)
    set on doc_id* — co-partitioned on the join key, so each doc's pairs
    are generated locally after one shuffle; the ``t1 < t2`` predicate
    halves the output and canonicalizes pair order.  Pair counts and
    per-term doc counts are both two-phase aggregates; the corpus size
    joins as a broadcast single-row aggregate.  PMI's input ratio is a
    deterministic function of exact BIGINT counts; the LN itself is
    rounded to 9 (libm last-ulp divergence between engines).  Per-doc
    cost is quadratic in *distinct terms per doc* — at
    100 TB cap it with the same MIN_TERM_LEN/stopword pruning used here
    (vocabulary, not corpus, controls the blowup) before widening.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.length("term") >= MIN_TERM_LEN)
        .distinct()
    )
    df_counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n_term"))
    n_docs = d.select(F.count(F.lit(1)).alias("n_docs"))
    t1 = tok.select("doc_id", F.col("term").alias("w1"))
    t2 = tok.select("doc_id", F.col("term").alias("w2"))
    pairs = (
        t1.join(t2, "doc_id")
        .where(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= PMI_MIN_PAIR)
    )
    na = df_counts.select(F.col("term").alias("w1"), F.col("n_term").alias("n_w1"))
    nb = df_counts.select(F.col("term").alias("w2"), F.col("n_term").alias("n_w2"))
    return (
        pairs.join(F.broadcast(na), "w1")
        .join(F.broadcast(nb), "w2")
        .join(F.broadcast(n_docs))
        .select(
            "w1",
            "w2",
            "n_pair",
            # rounded to 9: libm ln last-ulp divergence (the argument is a
            # deterministic ratio of exact counts); ordering + LIMIT below
            # then cut both engines identically
            F.round(
                F.log(
                    (F.col("n_pair").cast("double") * F.col("n_docs"))
                    / (F.col("n_w1").cast("double") * F.col("n_w2"))
                ),
                9,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(PMI_TOP_K)
    )


COOCCUR_PMI_SQL = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents)
  WHERE LENGTH(term) >= {MIN_TERM_LEN}
),
df AS (SELECT term, COUNT(*) AS n_term FROM tok GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
pairs AS (
  SELECT a.term AS w1, b.term AS w2, COUNT(*) AS n_pair
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
  HAVING COUNT(*) >= {PMI_MIN_PAIR}
)
SELECT w1, w2, n_pair,
       ROUND(LN((CAST(n_pair AS DOUBLE) * n_docs) /
                (CAST(d1.n_term AS DOUBLE) * d2.n_term)), 9) AS pmi
FROM pairs
JOIN df d1 ON d1.term = w1
JOIN df d2 ON d2.term = w2
CROSS JOIN n
ORDER BY pmi DESC, w1 ASC, w2 ASC
LIMIT {PMI_TOP_K}
"""


# ------------------------------------------------ Zipf rank-frequency fit

ZIPF_MIN_LEN = 2


def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_zipf_slope: per-language Zipf exponent — the OLS slope of
    ln(term frequency) on ln(frequency rank).

    Natural-corpus token frequencies follow freq ∝ rank^(-s) with s≈1;
    a fitted slope far from -1 is a corpus-level quality signal (boiler-
    plate, spam, synthetic text).  Plan: explode → two-phase term counts
    per language → one window (row_number on count desc) to assign ranks
    → ``regr_slope``/``regr_r2``-style mergeable regression state per
    language.  The window partitions by language, so rank assignment
    shuffles each language's *vocabulary* (not its corpus) — vocabulary
    grows sublinearly in corpus size, which is what makes this viable at
    100 TB.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(F.split("text", " ")).alias("term"))
        .where(F.length("term") >= ZIPF_MIN_LEN)
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("term"))
    ranked = counts.withColumn("rnk", F.row_number().over(w))
    return (
        ranked.groupBy("lang")
        .agg(
            # rounded to 9: the regression state accumulates doubles in
            # engine-dependent order (plus libm ln last-ulps)
            F.round(
                F.regr_slope(
                    F.log(F.col("cnt").cast("double")),
                    F.log(F.col("rnk").cast("double")),
                ),
                9,
            ).alias("zipf_slope"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .orderBy("lang")
    )


ZIPF_SLOPE_SQL = f"""
WITH counts AS (
  SELECT lang, term, COUNT(*) AS cnt
  FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS term FROM documents)
  WHERE LENGTH(term) >= {ZIPF_MIN_LEN}
  GROUP BY lang, term
),
ranked AS (
  SELECT lang, cnt,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, term ASC) AS rnk
  FROM counts
)
SELECT lang,
       ROUND(regr_slope(LN(CAST(cnt AS DOUBLE)), LN(CAST(rnk AS DOUBLE))), 9) AS zipf_slope,
       COUNT(*) AS n_terms
FROM ranked
GROUP BY lang
ORDER BY lang
"""


# -------------------------------------- cross-source n-gram overlap matrix

OVERLAP_N = 5


def source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_source_overlap: pairwise n-gram Jaccard between corpus *sources*
    — the dataset-governance matrix behind "which crawls/feeds duplicate
    each other" decisions (what to drop wholesale before per-document
    dedup even runs).

    Scale shape: ONE shuffle of the exploded gram table —
    ``groupBy(gram).collect_set(source)`` (partial sets merge map-side,
    and dedup happens inside the aggregate, so no separate DISTINCT
    pass) — then each gram's pair contributions expand *locally* from
    its sorted source-set (≤ C(|sources|, 2) rows per gram, a constant:
    sources number dozens, not millions).  The old shape — DISTINCT then
    a gram-keyed self-join — paid three full shuffles of the gram table
    for the same answer.  Per-source set sizes reaggregate the already-
    deduped per-gram sets (vocabulary-sized, sublinear in corpus);
    Jaccard is exact integer arithmetic.  Grams group as strings here so
    the DuckDB twin is byte-identical; at 100 TB you'd key on
    xxhash64(gram) exactly as q_decontaminate does (fixed-width rows).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.split("text", " ").alias("toks")
    )
    grams_expr = F.expr(
        f"transform(sequence(0, greatest(size(toks) - {OVERLAP_N}, 0)),"
        f" i -> concat_ws(' ', slice(toks, i + 1, {OVERLAP_N})))"
    )
    per_gram = (
        d.select("source", F.explode(grams_expr).alias("g"))
        .groupBy("g")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
        # vocabulary-sized (sublinear in corpus) — persisted so the two
        # consumers below don't re-run the corpus shingle + shuffle
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = (
        per_gram.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )
    pair_expr = F.expr(
        "flatten(transform(ss, (a, i) ->"
        " transform(slice(ss, i + 2, size(ss)),"
        " b -> struct(a AS source_a, b AS source_b))))"
    )
    shared = (
        per_gram.select(F.explode(pair_expr).alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sz_a = sizes.select(F.col("source").alias("source_a"), F.col("n_grams").alias("n_a"))
    sz_b = sizes.select(F.col("source").alias("source_b"), F.col("n_grams").alias("n_b"))
    return (
        shared.join(F.broadcast(sz_a), "source_a")
        .join(F.broadcast(sz_b), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared",
            (
                F.col("shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("source_a"), F.asc("source_b"))
    )


SOURCE_OVERLAP_SQL = f"""
WITH per_gram AS (
  SELECT g, list_sort(list_distinct(list(source))) AS ss
  FROM (
    SELECT source,
           UNNEST(list_transform(
             generate_series(0, greatest(len(string_split(text, ' ')) - {OVERLAP_N}, 0)),
             i -> array_to_string(string_split(text, ' ')[i + 1 : i + {OVERLAP_N}], ' ')
           )) AS g
    FROM documents
  )
  GROUP BY g
),
sizes AS (
  SELECT s AS source, COUNT(*) AS n_grams
  FROM (SELECT UNNEST(ss) AS s FROM per_gram)
  GROUP BY s
),
shared AS (
  SELECT ss[i.i] AS source_a, ss[j.j] AS source_b, COUNT(*) AS shared
  FROM per_gram,
       LATERAL (SELECT UNNEST(generate_series(1, len(ss))) AS i) i,
       LATERAL (SELECT UNNEST(generate_series(1, len(ss))) AS j) j
  WHERE i.i < j.j
  GROUP BY 1, 2
)
SELECT source_a, source_b, shared,
       CAST(shared AS DOUBLE)
         / CAST(sa.n_grams + sb.n_grams - shared AS DOUBLE) AS jaccard
FROM shared
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
ORDER BY jaccard DESC, source_a ASC, source_b ASC
"""


# ----------------------------------------------------------------- BM25

#: Fixed retrieval query + standard BM25 constants.
BM25_QUERY = ("spark", "table", "hash")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20


def bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_bm25: Okapi BM25 ranking of the corpus against a fixed query —
    the retrieval-scoring counterpart of q_tfidf (length-normalized,
    saturating term frequency).

    score(d) = Σₜ idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf = ln(1 + (N−df+0.5)/(df+0.5)).

    Scale shape: explode → filter to the query's terms (the filter cuts
    the exploded stream to |query|·N rows BEFORE any shuffle) → one
    (doc, term) count, a broadcast join of the |query|-row df table, and
    one per-doc sum + top-k.  Exactness: ``avgdl`` is exact (integer sum
    / count, one division); per-term scores are rounded to 9 before the
    per-doc sum (libm ln last-ulp), the sum to 6 before the rank cut;
    ties break by doc_id."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.select(
        F.count(F.lit(1)).alias("n_docs"),
        # token sum is integer-exact in a double; ONE division → exact
        (
            F.sum(F.size(F.split("text", " "))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    terms = F.array(*[F.lit(t) for t in BM25_QUERY])
    tok = (
        d.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("double").alias("dl"),
            F.explode(F.split("text", " ")).alias("term"),
        )
        .where(F.array_contains(terms, F.col("term")))
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"), F.first("dl").alias("dl")
    )
    df_counts = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + BM25_K1 * (
        1 - BM25_B + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
    )
    comp = F.round(idf * F.col("tf") * (BM25_K1 + 1) / denom, 9)
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .join(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(F.round(F.sum(comp), 6).alias("bm25"))
    )
    # k-cut FIRST (TakeOrderedAndProject — per-partition heaps, never a
    # global sort of the scored set), then rank the k survivors; the
    # remaining single-partition window is bounded by k, not data
    top = scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(BM25_TOP)
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def _bm25_terms_sql() -> str:
    return ", ".join(f"'{t}'" for t in BM25_QUERY)


BM25_SQL = f"""
WITH stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM documents
), tok AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl,
         unnest(string_split(text, ' ')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf, ANY_VALUE(dl) AS dl
  FROM tok WHERE term IN ({_bm25_terms_sql()})
  GROUP BY doc_id, term
), dfc AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
), scored AS (
  SELECT doc_id,
         ROUND(SUM(ROUND(
           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * tf * ({BM25_K1} + 1)
           / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl))
         , 9)), 6) AS bm25
  FROM tf JOIN dfc USING (term) CROSS JOIN stats
  GROUP BY doc_id
)
SELECT doc_id, bm25,
       CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT)
         AS rank
FROM scored
QUALIFY rank <= {BM25_TOP}
"""


# ------------------------------------------------------------ OOV rate

#: Vocabulary size: the corpus's top-K terms by occurrence count.
VOCAB_K = 100


def oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_oov_rate: per-source out-of-vocabulary rate against the
    corpus's own top-K vocabulary — the tokenizer-fit diagnostic every
    training mix tracks (a source whose OOV rate spikes is drifting
    away from the tokenizer's training distribution).

    Scale shape: one two-phase term count builds the vocabulary (k-cut
    via TakeOrderedAndProject, deterministic count-then-term tiebreak);
    the token stream left-joins the broadcast K-row vocab and one
    (source) aggregate folds match flags into rates.  The token stream
    never shuffles on the term — only on the tiny source key.
    ``oov_rate`` is an exact-integer ratio."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("term"))
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(VOCAB_K)
        .select("term", F.lit(True).alias("in_vocab"))
    )
    joined = tok.join(F.broadcast(vocab), "term", "left")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias(
            "n_oov"
        ),
        (
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("oov_rate"),
    )


OOV_RATE_SQL = f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
), vocab AS (
  SELECT term FROM tok
  GROUP BY term
  ORDER BY COUNT(*) DESC, term ASC
  LIMIT {VOCAB_K}
)
SELECT t.source,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS oov_rate
FROM tok t LEFT JOIN vocab v USING (term)
GROUP BY t.source
"""


# ------------------------------------------------------- heavy hitters

#: Frequency threshold as an inverse: a heavy hitter is a token with
#: count · THETA_INV ≥ total token count (θ = 1/500 = 0.2 %).  Kept as
#: integer math — the threshold test is exact in both engines, no
#: float division anywhere.
HH_THETA_INV = 500


def _mg_candidates(batches):
    """Per-partition Misra-Gries summary over whitespace tokens.

    Exact Counter per Arrow batch (C-speed), merged into a running
    ≤k-counter summary with the Misra-Gries subtraction step: when the
    merged summary exceeds k entries, subtract the (k+1)-th largest
    count from every entry and keep the positive ones.  Mergeable-
    summaries bound (Agarwal et al., PODS'12): the retained count of
    any token underestimates its true partition count by at most
    N_p/(k+1), so every token with partition frequency > N_p/(k+1)
    survives — and a globally-θ-heavy token is ≥ N_p/k-frequent in at
    least one partition by pigeonhole, hence always emitted."""
    from collections import Counter

    import pandas as pd

    k = HH_THETA_INV
    summary: Counter = Counter()
    for pdf in batches:
        batch = Counter()
        for text in pdf["text"]:
            if text is not None:
                batch.update(text.split(" "))
        summary.update(batch)
        if len(summary) > k:
            cut = sorted(summary.values(), reverse=True)[k]
            summary = Counter(
                {t: c - cut for t, c in summary.items() if c > cut}
            )
    yield pd.DataFrame({"term": list(summary.keys()) or []}, dtype="object")


def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_heavy_hitters: every token making up ≥ 1/{HH_THETA_INV} of the
    corpus, with its EXACT count — the two-pass Misra-Gries frequent-
    items operator.

    Naive groupBy-count works until the vocabulary explodes (URLs, ids,
    typos: token cardinality grows with corpus size, and the count
    shuffle carries one row per distinct token).  The sketch path
    bounds memory AND shuffle by construction:

    * Pass 1 (``mapInPandas``): a ≤k-counter Misra-Gries summary per
      partition — O(k) state regardless of partition vocabulary; emits
      at most k candidate tokens per partition (P·k rows total, data-
      size-independent).
    * Pass 2: exact counts for the candidate set only — the token
      stream semi-joins a broadcast of the candidates, so the count
      shuffle carries ≤ P·k distinct keys instead of the vocabulary.
    * The final filter ``cnt · θ⁻¹ ≥ N`` (integer compare, N joins as
      a broadcast 1-row total) makes the output EXACT: MG guarantees
      every θ-heavy token is a candidate, and exact recounting removes
      the false positives — so the result is identical to the full
      groupBy, at bounded memory.  That determinism is what lets an
      approximation-shaped operator carry a hash-exact SQL oracle."""
    d = load_table(spark, sf_dir, "documents")
    candidates = (
        d.select("text")
        .mapInPandas(_mg_candidates, "term string")
        .distinct()
    )
    tok = d.select(F.explode(F.split("text", " ")).alias("term"))
    total = tok.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        tok.join(F.broadcast(candidates), "term", "semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_term"))
        .join(F.broadcast(total))
        .where(F.col("n_term") * HH_THETA_INV >= F.col("n_total"))
        .select("term", "n_term", "n_total")
    )


HEAVY_HITTERS_SQL = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
), tot AS (
  SELECT COUNT(*) AS n_total FROM tok
)
SELECT term,
       CAST(COUNT(*) AS BIGINT)   AS n_term,
       CAST(MIN(n_total) AS BIGINT) AS n_total
FROM tok CROSS JOIN tot
GROUP BY term
HAVING COUNT(*) * {HH_THETA_INV} >= MIN(n_total)
"""


QUERIES = {
    "q_heavy_hitters": heavy_hitters,
    "q_tfidf": tfidf,
    "q_oov_rate": oov_rate,
    "q_bm25": bm25,
    "q_ngram_lm": ngram_lm,
    "q_cooccur_pmi": cooccur_pmi,
    "q_zipf_slope": zipf_slope,
    "q_source_overlap": source_overlap,
}

ORACLE = {
    "q_heavy_hitters": HEAVY_HITTERS_SQL,
    "q_tfidf": TFIDF_SQL,
    "q_oov_rate": OOV_RATE_SQL,
    "q_bm25": BM25_SQL,
    "q_ngram_lm": NGRAM_LM_SQL,
    "q_cooccur_pmi": COOCCUR_PMI_SQL,
    "q_zipf_slope": ZIPF_SLOPE_SQL,
    "q_source_overlap": SOURCE_OVERLAP_SQL,
}
