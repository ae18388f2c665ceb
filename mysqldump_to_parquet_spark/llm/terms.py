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
            (
                F.col("tf")
                * F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
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
         tf.tf * ln((n.n_docs + 1) / CAST(dfc.df + 1 AS DOUBLE)) AS weight
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


QUERIES = {
    "q_tfidf": tfidf,
    "q_ngram_lm": ngram_lm,
}

ORACLE = {
    "q_tfidf": TFIDF_SQL,
    "q_ngram_lm": NGRAM_LM_SQL,
}
