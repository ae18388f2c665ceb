"""Text analysis over the documents table: corpus stats, language ID,
quality scoring, token counting, document fingerprinting.

Everything is built-in-function only (JVM codegen, no Python in the hot
path): at 100 TB these run as a single scan + one small aggregate shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_parallel
from .sampling import TRAIN_MAX, VAL_MAX

# --------------------------------------------------------------- corpus stats


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics (token/char distributions)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    per_doc = d.select(
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


TEXT_STATS_SQL = """
SELECT lang,
       COUNT(*)                                   AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       MIN(len(string_split(text, ' ')))                 AS min_tokens,
       MAX(len(string_split(text, ' ')))                 AS max_tokens,
       CAST(SUM(length(text)) AS BIGINT)                 AS total_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------- language ID

#: Tiny per-language marker lexicons (n-gram-heuristic language ID; real
#: deployments plug in fastText/CLD3 via a pandas UDF — see multimodal.py for
#: the gated-dependency pattern).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with"],
    "es": ["el", "la", "de", "que", "los", "una"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "des", "est", "une"],
    "zh": ["的", "是", "不", "了", "在", "人"],
}


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID: score = |tokens ∩ markers| per language,
    predict the argmax (ties → lexicographic first), 'und' when all zero."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split("text", " "))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        .cast("long")
        .alias(f"score_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    scored = d.select("doc_id", "lang", *scores.values())
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best == 0, "und")
    for l in langs:  # lexicographic-first argmax
        pred = pred.when(F.col(f"score_{l}") == best, l)
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[F.col(f"score_{l}") for l in langs],
        pred.alias("predicted_lang"),
    )


_SCORE = (
    "CAST(len(list_intersect(list_distinct(string_split(text, ' ')), {markers}))"
    " AS BIGINT)"
)


def _lang_id_sql() -> str:
    langs = sorted(LANG_MARKERS)
    score_cols = ",\n       ".join(
        _SCORE.format(markers=str(LANG_MARKERS[l])) + f" AS score_{l}" for l in langs
    )
    best = "GREATEST(" + ", ".join(f"score_{l}" for l in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und'\n"
    for l in langs:
        case += f"            WHEN score_{l} = {best} THEN '{l}'\n"
    case += "       END"
    return f"""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
       {score_cols}
  FROM documents
)
SELECT doc_id, labeled_lang, {", ".join(f"score_{l}" for l in langs)},
       {case} AS predicted_lang
FROM scored
"""


def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_lang_confusion: confusion matrix of the language-ID heuristic
    against the labeled ``lang`` column — the classifier-evaluation loop
    every filtering heuristic needs before it gates a corpus (how much
    labeled-en is predicted 'und'? which pairs confuse?).

    Shape: the per-document prediction is the zero-shuffle scoring pass
    of :func:`lang_id`; the matrix is one tiny (labels × labels)
    aggregate on top.  Exact counts, so the evaluation itself is
    hash-checkable — no sampled metrics."""
    pred = lang_id(spark, sf_dir)
    return (
        pred.groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("labeled_lang", "predicted_lang")
    )


def _lang_confusion_sql() -> str:
    return f"""
WITH pred AS ({_lang_id_sql()})
SELECT labeled_lang, predicted_lang, COUNT(*) AS n_docs
FROM pred
GROUP BY labeled_lang, predicted_lang
ORDER BY labeled_lang, predicted_lang
"""


# ------------------------------------------------------------- quality score


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals: length, mean token length, punctuation
    ratio, digit ratio, repetition (distinct/total tokens) — composited into
    one double score.  Pure per-row arithmetic ⇒ exact cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks).cast("double")
    n_chars = F.length("text").cast("double")
    n_punct = (
        n_chars - F.length(F.regexp_replace("text", r"[^A-Za-z0-9 ]", ""))
    )
    n_digit = n_chars - F.length(F.regexp_replace("text", r"[0-9]", ""))
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok
    mean_tok_len = (n_chars - (n_tok - 1)) / n_tok
    score = (
        F.when(n_tok >= 20, 0.25).otherwise(0.0)
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), 0.25).otherwise(0.0)
        + F.when(n_punct / n_chars <= 0.2, 0.25).otherwise(0.0)
        + distinct_ratio * 0.25
    )
    return d.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        (n_punct / n_chars).alias("punct_ratio"),
        (n_digit / n_chars).alias("digit_ratio"),
        score.alias("quality"),
    )


QUALITY_SCORE_SQL = r"""
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS DOUBLE)  AS n_tok,
         CAST(length(text) AS DOUBLE)                  AS n_chars,
         CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
              AS DOUBLE)                               AS n_punct,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS DOUBLE)                               AS n_digit,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_distinct
  FROM documents
)
SELECT doc_id,
       CAST(n_tok AS BIGINT)        AS n_tokens,
       n_distinct / n_tok           AS distinct_ratio,
       n_punct / n_chars            AS punct_ratio,
       n_digit / n_chars            AS digit_ratio,
       (CASE WHEN n_tok >= 20 THEN 0.25 ELSE 0.0 END
        + CASE WHEN (n_chars - (n_tok - 1)) / n_tok BETWEEN 3 AND 12
               THEN 0.25 ELSE 0.0 END
        + CASE WHEN n_punct / n_chars <= 0.2 THEN 0.25 ELSE 0.0 END
        + (n_distinct / n_tok) * 0.25) AS quality
FROM base
"""


# -------------------------------------------------------------- token count


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish regex segmentation (letter runs, digit
    runs, individual symbols) — the ~token-budget estimator."""
    d = load_table(spark, sf_dir, "documents")
    bpeish = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(bpeish), 0)).cast("long").alias(
            "bpeish_tokens"
        ),
        F.ceil(F.length("text") / 4).cast("long").alias("chars_div4"),
    )


TOKEN_COUNT_SQL = r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT)  AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
            AS BIGINT)                               AS bpeish_tokens,
       CAST(CEIL(CAST(length(text) AS DOUBLE) / 4) AS BIGINT) AS chars_div4
FROM documents
"""


# ------------------------------------------------------------- fingerprint


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set (md5 is identical across engines, unlike xxhash64) — catches
    token-permuted duplicates that exact hashing misses."""
    d = load_table(spark, sf_dir, "documents")
    canon = F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
    return d.select(
        "doc_id",
        F.md5(canon).alias("fingerprint"),
        F.md5("text").alias("exact_hash"),
    )


FINGERPRINT_SQL = """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
         AS fingerprint,
       md5(text) AS exact_hash
FROM documents
"""


# --------------------------------------------------------------- top terms

TOP_TERMS_K = 5


def top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K terms per language by document frequency — the
    explode → partial-agg → shuffle-agg → windowed top-k shape every corpus
    vocabulary/TF-IDF job takes.  Document frequency (distinct docs
    containing the term), not raw term count, so repeated words in one doc
    don't dominate.  At 100 TB: the explode is map-side, the (lang, token)
    aggregate combines partially before the shuffle, and the final top-k
    window only sees one row per distinct term."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select("lang", "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token"))
        .where(F.length("token") >= 4)  # skip stop-word-ish short tokens
    )
    df_counts = tok.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("doc_freq")  # distinct per doc via array_distinct
    )
    w = Window.partitionBy("lang").orderBy(F.desc("doc_freq"), F.asc("token"))
    return (
        df_counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_TERMS_K)
        .select("lang", "rank", "token", "doc_freq")
    )


TOP_TERMS_SQL = f"""
WITH tok AS (
  SELECT lang, doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
), counts AS (
  SELECT lang, token, COUNT(*) AS doc_freq
  FROM tok
  WHERE length(token) >= 4
  GROUP BY lang, token
)
SELECT lang, rank, token, doc_freq
FROM (
  SELECT lang, token, doc_freq,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY doc_freq DESC, token ASC) AS rank
  FROM counts
) t
WHERE rank <= {TOP_TERMS_K}
"""


# ------------------------------------------------------------ text cleaning

#: Cleaning patterns shared verbatim by both engines (portable regex
#: subset: no lookbehind, no engine-specific classes).
RE_URL = r"https?://[^\s]+"
RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
RE_MULTISPACE = r"  +"


def text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_text_clean: normalization + PII scrubbing — URLs/emails replaced
    with typed placeholder tokens, whitespace collapsed, edges trimmed.
    Pure per-row regexp_replace chain: codegen'd, no shuffle, and the
    cleaning runs in the same stage as whatever consumes it."""
    d = load_table(spark, sf_dir, "documents")
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", RE_URL, "<URL>"),
                RE_EMAIL,
                "<EMAIL>",
            ),
            RE_MULTISPACE,
            " ",
        )
    )
    return d.select(
        "doc_id",
        cleaned.alias("clean_text"),
        (F.length("text") - F.length(cleaned)).cast("long").alias("chars_removed"),
        (cleaned != F.col("text")).alias("was_modified"),
    )


TEXT_CLEAN_SQL = rf"""
WITH c AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(regexp_replace(
           text, '{RE_URL}', '<URL>', 'g'),
           '{RE_EMAIL}', '<EMAIL>', 'g'),
           '{RE_MULTISPACE}', ' ', 'g')) AS clean_text
  FROM documents
)
SELECT doc_id, clean_text,
       CAST(length(text) - length(clean_text) AS BIGINT) AS chars_removed,
       clean_text <> text AS was_modified
FROM c
"""


# --------------------------------------------------------- decontamination

#: n-gram order for contamination detection (long enough that chance
#: collisions are negligible, short enough to catch partial inclusion).
DECON_N = 8

#: An 8-gram appearing in more eval documents than this is boilerplate
#: (license headers, prompt templates) — it cannot witness contamination
#: *uniquely*, and it is precisely the row whose train-side join fanout
#: explodes, so it is dropped on the small side before the broadcast.
DECON_MAX_EVAL_DF = 50


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_decontaminate: find train-split documents sharing ≥1 8-gram with
    any eval-split document — benchmark-leakage detection, the dedup-shaped
    join every training pipeline runs before release.

    Shape: both sides shingle JVM-side into distinct 8-gram xxhash64 arrays
    (fixed-width int64 rows after explode).  The eval side is benchmark-
    sized by construction, so it is DF-pruned (grams in > DECON_MAX_EVAL_DF
    eval docs are boilerplate that cannot witness contamination uniquely —
    and are exactly the rows whose train-side fanout explodes) and then
    BROADCAST: the train gram table — the 100 TB side — never shuffles at
    all.  Only the matches reach the final (train, eval) two-phase count.
    Uses the q_split_hash assignment, so 'eval' is deterministic."""
    # parallel load: the shingle fold is the dominant cost and must not
    # serialize onto a single under-split scan task (no-op at real scale)
    d = load_table_parallel(spark, sf_dir, "documents").select(
        "doc_id",
        # bind split ONCE — slicing a materialized array per shingle is
        # O(tokens·N); re-evaluating split inside the lambda would be
        # O(tokens²) per document
        F.split("text", " ").alias("toks"),
    )
    h = F.md5(F.col("doc_id").cast("string"))
    grams = F.expr(
        f"array_distinct(transform(sequence(0, greatest(size(toks) - {DECON_N}, 0)),"
        f" i -> xxhash64(concat_ws(' ', slice(toks, i + 1, {DECON_N})))))"
    )
    with_split = d.select(
        "doc_id",
        grams.alias("grams"),
        F.when(h < TRAIN_MAX, "train").when(h < VAL_MAX, "val").otherwise("test").alias("split"),
    )
    # explode_OUTER, deliberately: plain explode makes Catalyst infer a
    # ``size(grams) > 0`` constraint and push it below the spreading
    # repartition — the ENTIRE shingle fold then re-runs serially inside
    # the one-task scan stage (measured 2-9 s of the query's wall at
    # sf0.1).  grams is never empty (the sequence() lower bound is 0),
    # so outer-explode is result-identical and keeps the scan filter to
    # the cheap md5 split test.
    train = with_split.where(F.col("split") == "train").select(
        F.col("doc_id").alias("train_id"), F.explode_outer("grams").alias("g")
    )
    test = with_split.where(F.col("split") == "test").select(
        F.col("doc_id").alias("eval_id"), F.explode_outer("grams").alias("g")
    )
    # one aggregation pass over the small side does the DF-prune AND
    # produces the broadcast payload (no separate hot-list + anti-join
    # jobs, no second shingle of the eval docs)
    pruned = (
        test.groupBy("g")
        .agg(F.collect_list("eval_id").alias("ids"))
        .where(F.size("ids") <= DECON_MAX_EVAL_DF)
        .select("g", F.explode("ids").alias("eval_id"))
    )
    return (
        train.join(F.broadcast(pruned), "g")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )


DECONTAMINATE_SQL = f"""
WITH with_split AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(0, greatest(len(string_split(text, ' ')) - {DECON_N}, 0)),
           i -> array_to_string(string_split(text, ' ')[i + 1 : i + {DECON_N}], ' ')
         )) AS grams,
         CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{TRAIN_MAX}' THEN 'train'
              WHEN md5(CAST(doc_id AS VARCHAR)) < '{VAL_MAX}' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), train AS (
  SELECT doc_id AS train_id, unnest(grams) AS g FROM with_split WHERE split = 'train'
), test AS (
  SELECT doc_id AS eval_id, unnest(grams) AS g FROM with_split WHERE split = 'test'
), hot AS (
  SELECT g FROM test GROUP BY g HAVING COUNT(*) > {DECON_MAX_EVAL_DF}
)
SELECT t.train_id, e.eval_id, COUNT(*) AS shared_ngrams
FROM train t JOIN test e USING (g)
WHERE g NOT IN (SELECT g FROM hot)
GROUP BY t.train_id, e.eval_id
"""


QUERIES = {
    "q_text_stats": text_stats,
    "q_lang_id": lang_id,
    "q_lang_confusion": lang_confusion,
    "q_quality_score": quality_score,
    "q_token_count": token_count,
    "q_fingerprint": fingerprint,
    "q_top_terms": top_terms,
    "q_text_clean": text_clean,
    "q_decontaminate": decontaminate,
}

ORACLE = {
    "q_text_stats": TEXT_STATS_SQL,
    "q_lang_id": _lang_id_sql(),
    "q_lang_confusion": _lang_confusion_sql(),
    "q_quality_score": QUALITY_SCORE_SQL,
    "q_token_count": TOKEN_COUNT_SQL,
    "q_fingerprint": FINGERPRINT_SQL,
    "q_top_terms": TOP_TERMS_SQL,
    "q_text_clean": TEXT_CLEAN_SQL,
    "q_decontaminate": DECONTAMINATE_SQL,
}
