"""q_dedup_substring differential tests: the Spark two-phase rolling-
window span dedup vs an independent pure-Python reference, on both a
constructed edge-case corpus and the real fixture."""

from __future__ import annotations

import os

from pyspark.sql import Row

from mysqldump_to_parquet_spark.llm.substring import (
    DUP_WINDOW,
    dedup_substring,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _ref_substring(docs: dict[int, str], k: int) -> dict[int, tuple]:
    """Independent reference: corpus-wide K-gram counts, then per-doc
    interval merge with a plain loop.  Returns
    doc_id -> (n_tokens, n_dup_spans, dup_tokens)."""
    from collections import Counter

    toks = {d: t.split(" ") for d, t in docs.items()}
    counts: Counter = Counter()
    for t in toks.values():
        for i in range(len(t) - k + 1):
            counts[" ".join(t[i : i + k])] += 1
    out = {}
    for d, t in toks.items():
        pos = [
            i
            for i in range(len(t) - k + 1)
            if counts[" ".join(t[i : i + k])] >= 2
        ]
        if not pos:
            continue
        spans: list[list[int]] = []  # [start_pos, last_pos]
        for p in pos:
            if spans and p <= spans[-1][1] + k:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        dup_tokens = sum(last + k - 1 - start + 1 for start, last in spans)
        out[d] = (len(t), len(spans), dup_tokens)
    return out


def _run(spark, docs: dict[int, str], tmp_path) -> dict[int, tuple]:
    sf = str(tmp_path)
    spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs.items()]
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    rows = dedup_substring(spark, sf).collect()
    return {
        r.doc_id: (r.n_tokens, r.n_dup_spans, r.dup_tokens) for r in rows
    }


def test_substring_edge_cases(spark, tmp_path):
    """Cross-doc shared run (overlapping windows merge to ONE span),
    self-repetition inside a single doc, a doc shorter than K, and a
    dup-free doc (absent from output)."""
    k = DUP_WINDOW
    shared = " ".join(f"s{i}" for i in range(k + 2))  # k+2 tokens → 3 windows
    phrase = " ".join(f"p{i}" for i in range(k))
    docs = {
        1: f"a1 a2 {shared} a3 a4",
        2: f"b1 {shared} b2 b3 b4 b5",
        3: f"{phrase} x1 x2 {phrase}",  # self-repeat, two disjoint spans
        4: "tiny doc below window",  # < k tokens: excluded
        5: " ".join(f"u{i}" for i in range(3 * k)),  # unique: no output row
    }
    got = _run(spark, docs, tmp_path)
    ref = _ref_substring(docs, k)
    assert got == ref
    # the shared (k+2)-token run = 3 overlapping windows → exactly one
    # merged span covering k+2 tokens in each doc
    assert got[1] == (k + 6, 1, k + 2)
    assert got[2] == (k + 7, 1, k + 2)
    # self-repetition: both phrase occurrences flagged, disjoint spans
    assert got[3][1] == 2 and got[3][2] == 2 * k
    assert 4 not in got and 5 not in got


def test_substring_adjacent_spans_merge(spark, tmp_path):
    """Duplicated windows at positions p and p + K (adjacent coverage,
    zero overlap) merge into one contiguous span — the boundary case of
    the `pos > prev_max + K` rule."""
    k = DUP_WINDOW
    a = " ".join(f"a{i}" for i in range(k))
    b = " ".join(f"b{i}" for i in range(k))
    # doc 1: [a][b] back-to-back — both duplicated, adjacent → 1 span
    docs = {
        1: f"{a} {b}",
        2: f"x1 x2 {a} y1 y2",
        3: f"z1 {b} z2 z3",
    }
    got = _run(spark, docs, tmp_path)
    assert got[1] == (2 * k, 1, 2 * k)
    assert got == _ref_substring(docs, k)


def test_substring_differential_on_fixture(spark):
    """Full differential vs the independent reference on the real
    sf0.001 documents fixture."""
    import duckdb

    con = duckdb.connect()
    docs = dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        ).fetchall()
    )
    ref = _ref_substring(docs, DUP_WINDOW)
    rows = dedup_substring(spark, SF_SMOKE).collect()
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_spans, r.dup_tokens) for r in rows
    }
    assert got == ref
    assert got, "fixture should contain at least one duplicated span"


def test_substring_randomized_corpora_match_reference(spark, tmp_path, monkeypatch):
    """Property-style sweep: 150 seeded random corpora (tiny alphabets →
    dense duplication, adjacency, and self-repeats), batched into ONE
    Spark run via disjoint per-corpus token prefixes and doc_id ranges,
    compared against the independent Python reference.  K=3 makes
    single-token-gap and exact-adjacency layouts common."""
    import random

    from mysqldump_to_parquet_spark.llm import substring as mod

    monkeypatch.setattr(mod, "DUP_WINDOW", 3)
    rng = random.Random(20260814)
    docs: dict[int, str] = {}
    base = 0
    for corpus in range(150):
        alpha = [f"c{corpus}_t{i}" for i in range(rng.randint(2, 5))]
        for d in range(rng.randint(1, 4)):
            n = rng.randint(0, 12)
            docs[base + d] = " ".join(rng.choice(alpha) for _ in range(n))
        base += 10
    # disjoint alphabets → per-corpus references union to the global one
    ref = _ref_substring(docs, 3)
    got = _run(spark, docs, tmp_path)
    assert got == ref


def _ref_cut(docs: dict[int, str], k: int) -> dict[int, tuple]:
    """Reference cutting pass: doc_id -> (cut_text, n_removed)."""
    from collections import Counter

    toks = {d: t.split(" ") for d, t in docs.items()}
    counts: Counter = Counter()
    for t in toks.values():
        for i in range(len(t) - k + 1):
            counts[" ".join(t[i : i + k])] += 1
    out = {}
    for d, t in toks.items():
        covered = set()
        for i in range(len(t) - k + 1):
            if counts[" ".join(t[i : i + k])] >= 2:
                covered.update(range(i, i + k))
        kept = [tok for i, tok in enumerate(t) if i not in covered]
        out[d] = (" ".join(kept), len(t) - len(kept))
    return out


def test_cut_duplicated_spans_matches_reference(spark, tmp_path, monkeypatch):
    """The cutting pass excises exactly the covered token indices —
    checked against an independent reference on edge cases (cut-to-empty,
    pass-through short docs, self-repeats) and on seeded random corpora."""
    import random

    from mysqldump_to_parquet_spark.llm import substring as mod
    from mysqldump_to_parquet_spark.llm.substring import cut_duplicated_spans

    k = 3
    rng = random.Random(7)
    docs = {
        1: "a b c d e tail1 x",       # shares 'a b c d e' with doc 2
        2: "pre a b c d e",
        3: "s s s s s s",             # self-repeat: cut to empty
        4: "too short",               # < k tokens: untouched
        5: "u1 u2 u3 u4 u5",          # unique: untouched
    }
    base = 100
    for corpus in range(60):
        alpha = [f"c{corpus}_t{i}" for i in range(rng.randint(2, 4))]
        for d in range(rng.randint(1, 3)):
            docs[base + d] = " ".join(
                rng.choice(alpha) for _ in range(rng.randint(0, 10))
            )
        base += 10

    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs.items()]
    )
    got = {
        r.doc_id: (r.text, r.n_tokens_removed)
        for r in cut_duplicated_spans(df, k=k).collect()
    }
    ref = _ref_cut(docs, k)
    assert got == ref
    assert got[3] == ("", 6)          # fully duplicated doc → empty
    assert got[4] == ("too short", 0)
    assert got[5] == ("u1 u2 u3 u4 u5", 0)
