"""Accounting invariants for llm/report.py (q_curation_report)."""

from __future__ import annotations

import pyarrow.parquet as pq

from mysqldump_to_parquet_spark.llm.report import curation_report

SF = "/root/testdata/sf0.001"


def test_report_accounting_balances(spark):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    texts = t.column("text").to_pylist()
    rows = curation_report(spark, SF).collect()
    # every document lands in exactly one bucket
    assert sum(r.n_docs for r in rows) == len(texts)
    # dup mass matches a direct exact-dup count over the same corpus
    from collections import Counter

    copies = Counter(texts)
    n_dup = sum(1 for s in texts if copies[s] > 1)
    assert sum(r.n_dup_docs for r in rows) == n_dup
    for r in rows:
        assert 0 <= r.q_bucket <= 9
        assert 0 <= r.n_dup_docs <= r.n_docs
        assert abs(r.dup_rate - r.n_dup_docs / r.n_docs) < 1e-4


def test_report_null_text_retained(spark, tmp_path):
    """ADVICE r7: the groupBy + join-back on text must be null-safe — a
    NULL-text document is one group (like the oracle's COUNT(*) OVER
    (PARTITION BY text)) and must not be dropped by the equi-join."""
    df = spark.createDataFrame(
        [
            (0, "hello world foo bar", "en", "s0", 19),
            (1, "hello world foo bar", "en", "s0", 19),
            (2, None, "en", "s0", 0),
            (3, None, "en", "s0", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    rows = curation_report(spark, str(tmp_path)).collect()
    # all four docs accounted for — NULL-text rows survive the join-back,
    # and the two NULL-text docs count each other as copies (one group)
    assert sum(r.n_docs for r in rows) == 4
    assert sum(r.n_dup_docs for r in rows) == 4


def test_report_buckets_fixed_width(spark):
    """Buckets are fixed score ranges (scale-stable), not data-relative
    deciles: a doc's bucket is a pure function of its own score."""
    from mysqldump_to_parquet_spark.llm.textstats import quality_score

    qs = {r.doc_id: r.quality for r in quality_score(spark, SF).collect()}
    rows = curation_report(spark, SF).collect()
    buckets = {r.q_bucket for r in rows}
    expect = {min(int(q * 10), 9) for q in qs.values()}
    assert buckets == expect
