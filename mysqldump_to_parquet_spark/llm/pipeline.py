"""End-to-end corpus curation: the pipeline the individual operators exist
for, composed.

    raw documents
      → clean (URL/email scrub, whitespace normalize)      q_text_clean
      → quality gate (heuristic score ≥ threshold)         q_quality_score
      → exact dedup (keep lowest doc_id per content hash)  q_dedup_exact
      → near dedup (MinHash+LSH pairs; keep lower doc_id)  q_dedup_near
      → decontaminate (drop train docs sharing n-grams
        with the eval split)                               q_decontaminate
      → optional span-level cut (duplicated K-gram spans
        excised from surviving text, Lee et al. 2022)      q_dedup_substring
      → deterministic split (train/val/test)               q_split_hash
      → sharded JSONL export, partitioned by split

Everything stays one lazy DataFrame graph until the final write — filters
are anti-joins on small id sets, so Catalyst pushes the document scan
through the whole chain and the full text is read exactly once for the
export.  Every stage reports row accounting so a 100 TB run can audit
what each gate removed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .dedup import JACCARD_THRESHOLD, dedup_near_minhash
from .sampling import TRAIN_MAX, VAL_MAX
from .textstats import DECON_N, decontaminate, quality_score, text_clean


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    quality_min: float = 0.5,
    cut_dup_spans: bool = False,
) -> dict:
    """Run the full curation chain; optionally export sharded JSONL to
    ``out_dir`` (a directory per split).  Returns the accounting dict:
    input/output counts and per-gate drop counts.

    ``cut_dup_spans=True`` adds the span-level pass (Lee et al. 2022,
    ``substring.cut_duplicated_spans``) AFTER the document-level gates:
    duplicated K-token spans among the *surviving* docs' cleaned text
    are excised in place (doc count unchanged; the accounting reports
    ``dup_span_tokens_removed``).  Document-level near-dedup first,
    span-level second — whole-doc twins are gone before span counting,
    so boilerplate shared across surviving docs is what gets cut."""
    docs = load_table(spark, sf_dir, "documents")
    n_input = docs.count()

    # 1. clean — replaces text, keeps every row
    cleaned = text_clean(spark, sf_dir).select("doc_id", "clean_text")

    # 2. quality gate
    low_q = (
        quality_score(spark, sf_dir)
        .where(F.col("quality") < quality_min)
        .select("doc_id")
    )

    # 3. exact dedup: every doc whose content hash has a lower-id twin
    exact_dupes = (
        docs.select("doc_id", F.sha2("text", 256).alias("h"))
        .withColumn("keep_id", F.min("doc_id").over(Window.partitionBy("h")))
        .where(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )

    # 4. near dedup: drop the higher id of each LSH-verified pair
    near_dupes = (
        dedup_near_minhash(spark, sf_dir)
        .where(F.col("jaccard_sim") >= JACCARD_THRESHOLD)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )

    # 5. decontamination: train docs sharing ≥1 8-gram with eval docs
    contaminated = decontaminate(spark, sf_dir).select(
        F.col("train_id").alias("doc_id")
    ).distinct()

    # 6. split assignment (pure per-row map)
    h = F.md5(F.col("doc_id").cast("string"))
    split = (
        F.when(h < TRAIN_MAX, "train").when(h < VAL_MAX, "val").otherwise("test")
    )

    # Single-pass accounting: one left join per gate tags each doc with
    # the gates that fired; `coalesce` picks the FIRST in gate order, so
    # the per-reason counts equal the old sequential anti-join chain
    # (a doc failing quality AND near-dup counts once, as low_quality)
    # while ONE job replaces the 2-actions-per-gate count ladder — at
    # 100 TB that is 1 scan of the id column instead of 8.  The gate id
    # sets are unique per doc_id by construction (groupBy/first-occur/
    # DISTINCT upstream), so the joins cannot multiply rows.
    gates = (
        ("low_quality", low_q),
        ("exact_dup", exact_dupes),
        ("near_dup", near_dupes),
        ("contaminated", contaminated),
    )
    tagged = docs.select("doc_id", "lang", "source")
    for reason, bad in gates:
        tagged = tagged.join(
            bad.withColumn(f"_g_{reason}", F.lit(reason)), "doc_id", "left"
        )
    reason_col = F.coalesce(*[F.col(f"_g_{r}") for r, _ in gates])
    tagged = tagged.withColumn("_drop_reason", reason_col)
    counts_by_reason = {
        r["_drop_reason"]: r["n"]
        for r in tagged.groupBy("_drop_reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    drops = {r: int(counts_by_reason.get(r, 0)) for r, _ in gates}
    kept = tagged.where(F.col("_drop_reason").isNull()).select(
        "doc_id", "lang", "source"
    )

    final = (
        kept.join(cleaned, "doc_id")
        .withColumn("split", split)
        .select("doc_id", "lang", "source", "split", F.col("clean_text").alias("text"))
    )

    span_tokens_removed = None
    cut = None
    if cut_dup_spans:
        from .substring import cut_duplicated_spans

        # persist: the span frame (two corpus-wide exchanges + a join) is
        # consumed three times below — the accounting agg, the output
        # count, and the export — and must not be recomputed per action
        cut = cut_duplicated_spans(final.select("doc_id", "text")).persist()
        span_tokens_removed = (
            cut.agg(F.sum("n_tokens_removed")).first()[0] or 0
        )
        final = final.drop("text").join(cut.drop("n_tokens_removed"), "doc_id")

    try:
        n_output = final.count()

        if out_dir is not None:
            final.write.mode("overwrite").partitionBy("split").json(out_dir)
    finally:
        if cut is not None:
            cut.unpersist()

    report = {
        "input_docs": n_input,
        "dropped": drops,
        "output_docs": n_output,
        "ngram_order": DECON_N,
        "quality_min": quality_min,
    }
    if span_tokens_removed is not None:
        report["dup_span_tokens_removed"] = int(span_tokens_removed)
    return report
