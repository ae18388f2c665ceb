"""Repetition metrics and rule-based document filtering (Gopher-style).

Training-corpus curation filters beyond the single quality score in
:mod:`textstats`: per-document *repetition* (most-frequent unigram/bigram
mass — the signature of boilerplate, keyword stuffing, and generation
loops) and a conjunction of hard *rules* (word count, word shape,
stopword evidence) each exposed as its own flag so downstream pipelines
can tune which rules gate.

Scale shapes:
* ``repetition`` is the wordcount shape: explode → (doc_id, gram) count
  with map-side partial aggregation → one window per doc_id for the
  argmax.  Both shuffles key on doc_id/(doc_id, gram) — no global sort,
  no skew beyond document length itself (bounded by the corpus's max doc
  length, not corpus size).
* ``gopher_rules`` is pure per-row JVM expressions (split + higher-order
  filter) — codegen'd, zero shuffle, runs inside whatever stage consumes
  the keep/drop decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

# ------------------------------------------------------------- repetition

#: Keep/drop thresholds: a document whose single most frequent unigram
#: (bigram) carries more than this fraction of all unigrams (bigrams) is
#: flagged repetitive.
TOP_UNIGRAM_MAX = 0.20
TOP_BIGRAM_MAX = 0.10


def repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_repetition: most-frequent-n-gram mass per document.

    Emits, per doc: token totals, the modal unigram and bigram (ties
    broken lexicographically so the argmax is deterministic across
    engines), their counts and fractions, and the repetitive flag.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bigrams = F.expr(
        "transform(sequence(1, size(split(text, ' ')) - 1),"
        " i -> concat(element_at(split(text, ' '), i), ' ',"
        "             element_at(split(text, ' '), i + 1)))"
    )

    def modal(grams_col, kind: str) -> DataFrame:
        g = d.select("doc_id", F.explode(grams_col).alias("gram"))
        counts = g.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.partitionBy("doc_id")
        ranked = counts.select(
            "doc_id",
            "gram",
            "cnt",
            F.sum("cnt").over(w).alias("total"),
            F.row_number()
            .over(w.orderBy(F.desc("cnt"), F.asc("gram")))
            .alias("rn"),
        ).where(F.col("rn") == 1)
        return ranked.select(
            "doc_id",
            F.col("gram").alias(f"top_{kind}"),
            F.col("cnt").alias(f"top_{kind}_cnt"),
            (F.col("cnt") / F.col("total")).alias(f"top_{kind}_frac"),
        )

    uni = modal(toks, "unigram")
    bi = modal(bigrams, "bigram")
    return (
        uni.join(bi, "doc_id")
        .select(
            "doc_id",
            "top_unigram",
            "top_unigram_cnt",
            "top_unigram_frac",
            "top_bigram",
            "top_bigram_cnt",
            "top_bigram_frac",
            (
                (F.col("top_unigram_frac") > TOP_UNIGRAM_MAX)
                | (F.col("top_bigram_frac") > TOP_BIGRAM_MAX)
            ).alias("is_repetitive"),
        )
    )


REPETITION_SQL = f"""
WITH uni AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS gram FROM documents
), uni_counts AS (
  SELECT doc_id, gram, COUNT(*) AS cnt FROM uni GROUP BY doc_id, gram
), uni_top AS (
  SELECT doc_id, gram AS top_unigram, cnt AS top_unigram_cnt,
         CAST(cnt AS DOUBLE) / SUM(cnt) OVER (PARTITION BY doc_id) AS top_unigram_frac,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
  FROM uni_counts
), bi AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, len(string_split(text, ' ')) - 1),
           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]
         )) AS gram
  FROM documents
), bi_counts AS (
  SELECT doc_id, gram, COUNT(*) AS cnt FROM bi GROUP BY doc_id, gram
), bi_top AS (
  SELECT doc_id, gram AS top_bigram, cnt AS top_bigram_cnt,
         CAST(cnt AS DOUBLE) / SUM(cnt) OVER (PARTITION BY doc_id) AS top_bigram_frac,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
  FROM bi_counts
)
SELECT u.doc_id, u.top_unigram, u.top_unigram_cnt, u.top_unigram_frac,
       b.top_bigram, b.top_bigram_cnt, b.top_bigram_frac,
       (u.top_unigram_frac > {TOP_UNIGRAM_MAX} OR b.top_bigram_frac > {TOP_BIGRAM_MAX})
         AS is_repetitive
FROM (SELECT * FROM uni_top WHERE rn = 1) u
JOIN (SELECT * FROM bi_top WHERE rn = 1) b USING (doc_id)
"""


# ------------------------------------------------------------ gopher rules

MIN_WORDS = 10
MAX_WORDS = 1000
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 10.0
MIN_ALPHA_WORD_FRAC = 0.80
STOPWORDS = ["the", "and", "of", "to", "a", "in"]
MIN_STOPWORD_HITS = 2


def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_gopher_rules: hard curation rules, one flag per rule + the
    conjunction.  Word-shape rules use higher-order ``filter`` over the
    token array (JVM lambda, not Python); the stopword rule counts how
    many distinct markers from a tiny lexicon appear."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_words = F.size(toks).cast("long")
    mean_len = (F.length("text") - (n_words - 1)) / n_words
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = alpha_words / n_words
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(s) for s in STOPWORDS])
        )
    ).cast("long")
    ok_words = (n_words >= MIN_WORDS) & (n_words <= MAX_WORDS)
    ok_mean = (mean_len >= MIN_MEAN_WORD_LEN) & (mean_len <= MAX_MEAN_WORD_LEN)
    ok_alpha = alpha_frac >= MIN_ALPHA_WORD_FRAC
    ok_stop = stop_hits >= MIN_STOPWORD_HITS
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
        ok_words.alias("ok_word_count"),
        ok_mean.alias("ok_mean_word_len"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_mean & ok_alpha & ok_stop).alias("keep"),
    )


GOPHER_RULES_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(length(text) AS DOUBLE)                 AS n_chars,
         CAST(len(list_filter(string_split(text, ' '),
                              t -> regexp_matches(t, '[A-Za-z]')))
              AS DOUBLE)                              AS alpha_words,
         CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                 {STOPWORDS})) AS BIGINT) AS stop_hits
  FROM documents
), m AS (
  SELECT doc_id, n_words,
         (n_chars - (n_words - 1)) / n_words AS mean_word_len,
         alpha_words / n_words               AS alpha_word_frac,
         stop_hits
  FROM base
)
SELECT doc_id, n_words, mean_word_len, alpha_word_frac,
       stop_hits AS stopword_hits,
       n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}              AS ok_word_count,
       mean_word_len BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN}
                                                                AS ok_mean_word_len,
       alpha_word_frac >= {MIN_ALPHA_WORD_FRAC}                 AS ok_alpha_words,
       stop_hits >= {MIN_STOPWORD_HITS}                         AS ok_stopwords,
       (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS})
         AND (mean_word_len BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN})
         AND alpha_word_frac >= {MIN_ALPHA_WORD_FRAC}
         AND stop_hits >= {MIN_STOPWORD_HITS}                   AS keep
FROM m
"""


QUERIES = {
    "q_repetition": repetition,
    "q_gopher_rules": gopher_rules,
}

ORACLE = {
    "q_repetition": REPETITION_SQL,
    "q_gopher_rules": GOPHER_RULES_SQL,
}
