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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

# ------------------------------------------------------------- repetition

#: Keep/drop thresholds: a document whose single most frequent unigram
#: (bigram) carries more than this fraction of all unigrams (bigrams) is
#: flagged repetitive.
TOP_UNIGRAM_MAX = 0.20
TOP_BIGRAM_MAX = 0.10


def _modal_fold(sorted_arr):
    """Modal element of a sorted array via a single left-to-right run-length
    fold — strict ``>`` keeps the FIRST maximal run, which in a sorted array
    is the lexicographically smallest modal gram (same tiebreak as
    ``ORDER BY cnt DESC, gram ASC``).  Entirely JVM-side expression work."""
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit("").alias("bestg"),
    )

    def step(acc, x):
        run2 = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("long"))
        better = run2 > acc.best
        return F.struct(
            x.alias("prev"),
            run2.alias("run"),
            F.when(better, run2).otherwise(acc.best).alias("best"),
            F.when(better, x).otherwise(acc.bestg).alias("bestg"),
        )

    return F.aggregate(sorted_arr, init, step)


def repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_repetition: most-frequent-n-gram mass per document.

    Emits, per doc: the modal unigram and bigram (ties broken
    lexicographically so the argmax is deterministic across engines),
    their counts and fractions, and the repetitive flag.

    Modal counts come from a run-length fold over the *sorted* gram array
    (see :func:`_modal_fold`) — per-row expression work with ZERO
    shuffles, where the naive explode → (doc, gram) count → per-doc
    window shape costs two key shuffles of every gram in the corpus.
    The gram arrays are bounded by document length, so the fold's cost is
    the same O(tokens log tokens) the shuffle pipeline paid just to
    serialize.  (The DuckDB oracle keeps the relational formulation —
    same result, independently derived.)
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    d = d.select("doc_id", toks.alias("toks"))  # bind split ONCE
    bigrams = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
    )
    d = d.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_uni"),
        _modal_fold(F.array_sort("toks")).alias("u"),
        (F.size("toks") - 1).cast("long").alias("n_bi"),
        _modal_fold(F.array_sort(bigrams)).alias("b"),
    )
    return d.select(
        "doc_id",
        F.col("u.bestg").alias("top_unigram"),
        F.col("u.best").alias("top_unigram_cnt"),
        (F.col("u.best") / F.col("n_uni")).alias("top_unigram_frac"),
        F.col("b.bestg").alias("top_bigram"),
        F.col("b.best").alias("top_bigram_cnt"),
        (F.col("b.best") / F.col("n_bi")).alias("top_bigram_frac"),
        (
            ((F.col("u.best") / F.col("n_uni")) > TOP_UNIGRAM_MAX)
            | ((F.col("b.best") / F.col("n_bi")) > TOP_BIGRAM_MAX)
        ).alias("is_repetitive"),
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


# ---------------------------------------------------------------- entropy

def _runlen_entropy_fold(sorted_arr):
    """Σ c·ln(c) over the run lengths of a sorted array, plus the number of
    runs — the sufficient statistics for Shannon entropy, via one
    left-to-right fold (same zero-shuffle trick as :func:`_modal_fold`).
    Emits struct(sumcln double, n_distinct long)."""
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0.0).alias("sumcln"),
        F.lit(0).cast("long").alias("nd"),
    )

    def close_run(acc):
        # ln(run) with run >= 1; ln(1) = 0 so singleton runs add nothing.
        return F.when(
            acc.run > 0, acc.sumcln + acc.run * F.log(acc.run.cast("double"))
        ).otherwise(acc.sumcln)

    def step(acc, x):
        same = x == acc.prev
        return F.struct(
            x.alias("prev"),
            F.when(same, acc.run + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc.sumcln).otherwise(close_run(acc)).alias("sumcln"),
            F.when(same, acc.nd).otherwise(acc.nd + 1).alias("nd"),
        )

    def finish(acc):
        return F.struct(close_run(acc).alias("sumcln"), acc.nd.alias("nd"))

    return F.aggregate(sorted_arr, init, step, finish)


def entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_entropy: per-document token Shannon entropy — the standard
    gibberish/boilerplate signal (low entropy = repetitive filler, high =
    random noise; both are curation drops).

    H = ln(n) − (Σ_g c_g·ln c_g)/n needs only n and Σ c·ln c, both read
    off a run-length fold over the SORTED token array: per-row JVM
    expression work with ZERO shuffles, vs. the relational explode →
    (doc, token) count → per-doc re-agg that shuffles every token in the
    corpus twice.  Normalized entropy divides by the ln(n) maximum
    (NULL for single-token docs where the maximum is 0).
    """
    d = load_table(spark, sf_dir, "documents")
    d = d.select(
        "doc_id", F.array_sort(F.split("text", " ")).alias("toks")
    )
    n = F.size("toks").cast("long")
    d = d.select(
        "doc_id",
        n.alias("n_tokens"),
        _runlen_entropy_fold(F.col("toks")).alias("s"),
    )
    ent = F.log(F.col("n_tokens").cast("double")) - F.col("s.sumcln") / F.col("n_tokens")
    max_ent = F.log(F.col("n_tokens").cast("double"))
    # rounded to 9: Σ c·ln c accumulation order and libm ln last-ulps are
    # engine-dependent (values O(1-10), drift ~1e-14 ≪ the 5e-10 boundary)
    return d.select(
        "doc_id",
        "n_tokens",
        F.col("s.nd").alias("n_distinct"),
        F.round(ent, 9).alias("entropy"),
        F.round(ent / F.nullif(max_ent, F.lit(0.0)), 9).alias("norm_entropy"),
    )


ENTROPY_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), c AS (
  SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok
), s AS (
  SELECT doc_id,
         CAST(SUM(cnt) AS BIGINT)      AS n_tokens,
         COUNT(*)                      AS n_distinct,
         SUM(cnt * ln(cnt))            AS sumcln
  FROM c GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
       ROUND(ln(n_tokens) - sumcln / n_tokens, 9) AS entropy,
       ROUND((ln(n_tokens) - sumcln / n_tokens) / NULLIF(ln(n_tokens), 0.0), 9)
         AS norm_entropy
FROM s
"""


# ------------------------------------------------------------ MAD outliers

#: Robust z-score threshold; 1.4826 scales MAD to the σ of a normal.
MAD_SIGMA = 1.4826
MAD_K = 3.0


def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_anomaly_mad: per-group robust outlier flags for a numeric column
    (median absolute deviation), the numeric-field analog of the text
    quality gates — corrupt sensor/price/score values survive mean±kσ
    (outliers drag the mean) but not median±k·MAD.

    Two tiny aggregate passes (median, then MAD around it) produce a
    #groups-row stats table that is *broadcast* back — the events side
    streams once per pass and never shuffles for the final flagging join.
    Exact `percentile` sorts per group (matches DuckDB quantile_cont
    bit-for-bit, same as `q_agg_quantile`); at 100 TB swap in
    `percentile_approx` / KLL sketches, same plan shape.
    """
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad"),
        )
    )
    robust_z = F.abs(F.col("value") - F.col("med")) / (MAD_SIGMA * F.col("mad"))
    return e.join(F.broadcast(dev), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        "mad",
        robust_z.alias("robust_z"),
        (robust_z > MAD_K).alias("is_outlier"),
    )


ANOMALY_MAD_SQL = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, ANY_VALUE(m.med) AS med,
         quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_id, e.event_type, e.value, d.med, d.mad,
       abs(e.value - d.med) / ({MAD_SIGMA} * d.mad) AS robust_z,
       abs(e.value - d.med) / ({MAD_SIGMA} * d.mad) > {MAD_K} AS is_outlier
FROM events e JOIN dev d USING (event_type)
"""


# -------------------------------------------- unigram-LM perplexity proxy


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_unigram_logprob: per-document mean log-probability (and a
    perplexity proxy) under the corpus's own add-one-smoothed unigram
    LM — the cheapest LM-based quality score: documents far from the
    corpus distribution (gibberish, wrong language, binary junk) score
    low without training an actual model.

    p(tok) = (count(tok) + 1) / (N + V).  Scale shape: one two-phase
    count shuffle builds the vocabulary (sublinear in corpus size); the
    token stream joins it on the term key (AQE broadcasts the vocab
    while it fits; co-partitioned shuffle join beyond that) and
    reaggregates per document — two data-sized shuffles total.

    Determinism: each token's ln p is rounded to 9 (libm last-ulps);
    the per-doc sum of those on-grid values is rounded to 6; mean and
    exp derive from the rounded sum, so every float column is
    engine-identical (see tests/test_oracle_parity.py conventions)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    nv = vocab.agg(
        F.sum("cnt").alias("n_total"), F.count(F.lit(1)).alias("v_size")
    )
    lnp = F.round(
        F.log(
            (F.col("cnt") + 1)
            / (F.col("n_total") + F.col("v_size")).cast("double")
        ),
        9,
    )
    per_tok = (
        tok.join(vocab, "term")
        .crossJoin(F.broadcast(nv))
        .select("doc_id", lnp.alias("lnp"))
    )
    sum_lnp = F.round(F.sum("lnp"), 6)
    return (
        per_tok.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            sum_lnp.alias("sum_lnp"),
            (sum_lnp / F.count(F.lit(1))).alias("mean_lnp"),
            F.round(F.exp(-(sum_lnp / F.count(F.lit(1)))), 6).alias(
                "ppl_proxy"
            ),
        )
    )


UNIGRAM_LOGPROB_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), vocab AS (
  SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term
), nv AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_total, COUNT(*) AS v_size FROM vocab
), per_tok AS (
  SELECT t.doc_id,
         ROUND(LN((vocab.cnt + 1) / CAST(nv.n_total + nv.v_size AS DOUBLE)), 9)
           AS lnp
  FROM tok t JOIN vocab USING (term) CROSS JOIN nv
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(SUM(lnp), 6) AS sum_lnp,
       ROUND(SUM(lnp), 6) / COUNT(*) AS mean_lnp,
       ROUND(EXP(-(ROUND(SUM(lnp), 6) / COUNT(*))), 6) AS ppl_proxy
FROM per_tok
GROUP BY doc_id
"""


# ------------------------------------------------ distribution drift (PSI)

#: Fixed-width length bins; split membership reuses sampling.py's
#: md5 thresholds so 'train'/'test' is the engine's standard
#: deterministic assignment.
PSI_BIN = 50

from .sampling import TRAIN_MAX, VAL_MAX  # noqa: E402


def split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_split_drift: population stability index of the document-length
    distribution between the train and test splits — the drift monitor
    every production split/refresh pipeline runs (PSI > 0.25 = the
    splits no longer come from the same distribution).

    Per fixed-width length bin: train share p, test share q,
    contribution (p−q)·ln(p/q), summed over bins populated on BOTH
    sides (the standard PSI convention; one-sided bins are reported in
    the dropped counts so the truncation is visible, per the no-silent-
    caps rule).  Scale shape: one (bin, split) two-phase count → tiny
    pivot — the data is read once and reduced immediately.  Shares are
    exact single divisions; only ln's last ulp drifts → per-bin
    contributions rounded to 9, the sum to 6."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    split = (
        F.when(h < TRAIN_MAX, "train").when(h < VAL_MAX, "val").otherwise("test")
    )
    binned = d.select(
        # integer DIV in both twins: a double-divide-then-cast would
        # diverge (Spark casts by truncation, DuckDB by rounding)
        F.expr(f"n_chars DIV {PSI_BIN}").cast("int").alias("bin"),
        split.alias("split"),
    ).where(F.col("split") != "val")
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("n_tr"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("n_te"),
    )
    tot = counts.agg(
        F.sum("n_tr").alias("t_tr"), F.sum("n_te").alias("t_te")
    )
    both = counts.join(F.broadcast(tot)).where(
        (F.col("n_tr") > 0) & (F.col("n_te") > 0)
    )
    p = F.col("n_tr").cast("double") / F.col("t_tr").cast("double")
    q = F.col("n_te").cast("double") / F.col("t_te").cast("double")
    contrib = F.round((p - q) * F.log(p / q), 9)
    one_sided = counts.where(
        ((F.col("n_tr") > 0) & (F.col("n_te") == 0))
        | ((F.col("n_tr") == 0) & (F.col("n_te") > 0))
    )
    return both.agg(
        F.count(F.lit(1)).alias("n_bins_common"),
        F.round(F.sum(contrib), 6).alias("psi"),
    ).crossJoin(
        F.broadcast(
            one_sided.agg(F.count(F.lit(1)).alias("n_bins_one_sided"))
        )
    )


SPLIT_DRIFT_SQL = f"""
WITH binned AS (
  SELECT CAST(n_chars // {PSI_BIN} AS INTEGER) AS bin,
         CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{TRAIN_MAX}' THEN 'train'
              WHEN md5(CAST(doc_id AS VARCHAR)) < '{VAL_MAX}' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), counts AS (
  SELECT bin,
         SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_tr,
         SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END)  AS n_te
  FROM binned WHERE split <> 'val'
  GROUP BY bin
), tot AS (
  SELECT SUM(n_tr) AS t_tr, SUM(n_te) AS t_te FROM counts
), common_bins AS (
  SELECT ROUND(
           (CAST(n_tr AS DOUBLE) / CAST(t_tr AS DOUBLE)
            - CAST(n_te AS DOUBLE) / CAST(t_te AS DOUBLE))
           * ln((CAST(n_tr AS DOUBLE) / CAST(t_tr AS DOUBLE))
                / (CAST(n_te AS DOUBLE) / CAST(t_te AS DOUBLE))), 9)
           AS contrib
  FROM counts, tot
  WHERE n_tr > 0 AND n_te > 0
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM common_bins)  AS n_bins_common,
       (SELECT ROUND(SUM(contrib), 6) FROM common_bins)    AS psi,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM counts
        WHERE (n_tr > 0 AND n_te = 0) OR (n_tr = 0 AND n_te > 0))
         AS n_bins_one_sided
"""


QUERIES = {
    "q_split_drift": split_drift,
    "q_repetition": repetition,
    "q_gopher_rules": gopher_rules,
    "q_entropy": entropy,
    "q_anomaly_mad": anomaly_mad,
    "q_unigram_logprob": unigram_logprob,
}

ORACLE = {
    "q_split_drift": SPLIT_DRIFT_SQL,
    "q_repetition": REPETITION_SQL,
    "q_gopher_rules": GOPHER_RULES_SQL,
    "q_entropy": ENTROPY_SQL,
    "q_anomaly_mad": ANOMALY_MAD_SQL,
    "q_unigram_logprob": UNIGRAM_LOGPROB_SQL,
}
