"""Property-based tests (Hypothesis) for the ingest literal pipeline:
arbitrary values survive dump-format serialization → parse → coercion.
Mirrors the reference's literal subset (number/string/bool/NULL + unary
minus, /root/reference/src/line_parser.rs:229–258) but proves it over the
whole space instead of one fixture."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mysqldump_to_parquet_spark.sources.mysqldump import (
    iter_statements,
    parse_insert,
)


def _sql_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "''")


texts = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\x00", exclude_categories=("Cs",)
    ),
    max_size=60,
)
values = st.one_of(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    texts,
    st.booleans(),
    st.none(),
)


def _to_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + _sql_escape(v) + "'"
    return repr(v)


@given(st.lists(st.lists(values, min_size=1, max_size=8), min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_insert_roundtrip(rows):
    # all rows padded to the widest row so it's a well-formed INSERT
    width = max(len(r) for r in rows)
    rows = [r + [None] * (width - len(r)) for r in rows]
    stmt = "INSERT INTO `t` VALUES " + ", ".join(
        "(" + ", ".join(_to_literal(v) for v in r) + ")" for r in rows
    ) + ";"
    table, parsed = parse_insert(stmt)
    assert table == "t"
    assert len(parsed) == len(rows)
    for got, want in zip(parsed, rows):
        for g, w in zip(got, want):
            if isinstance(w, float):
                assert isinstance(g, float) and (g == w or abs(g - w) < 1e-300)
            else:
                assert g == w, (g, w)


@given(texts)
@settings(max_examples=100, deadline=None)
def test_statement_reassembly_single_insert(s):
    stmt = f"INSERT INTO `t` VALUES ('{_sql_escape(s)}');"
    # newlines inside literals are escaped in real dumps; feed as one line
    out = list(iter_statements([stmt]))
    if "\n" not in stmt:
        assert out == [stmt]


# ------------------------------------------- multiline range ownership


@st.composite
def _random_dump(draw):
    """A synthetic multi-line dump: statements with random line breaks,
    noise lines, string values containing ';' and ')' at line ends."""
    parts = ["-- header comment", "/*!40101 SET NAMES utf8mb4 */;"]
    n = draw(st.integers(1, 12))
    for i in range(n):
        kind = draw(st.sampled_from(["create", "insert", "noise"]))
        if kind == "noise":
            parts.append(draw(st.sampled_from(["", "-- a comment", "  "])))
            continue
        if kind == "create":
            parts += [f"CREATE TABLE `t{i}` (", "  `id` bigint NOT NULL,",
                      "  `v` varchar(32)", ");"]
            continue
        vals = draw(st.lists(st.sampled_from(
            ["'a;'", "'b)'", "'c,('", "42", "NULL", "'x'"]
        ), min_size=1, max_size=4))
        tuples = [f"({j},{v})" for j, v in enumerate(vals)]
        layout = draw(st.sampled_from(["oneline", "tuple_lines", "ragged"]))
        if layout == "oneline":
            parts.append(f"INSERT INTO `t{i % 3}` VALUES {','.join(tuples)};")
        elif layout == "tuple_lines":
            parts.append(f"INSERT INTO `t{i % 3}` VALUES")
            parts += [t + "," for t in tuples[:-1]]
            parts.append(tuples[-1] + ";")
        else:  # ragged: break after commas inside the VALUES list
            text = f"INSERT INTO `t{i % 3}` VALUES {', '.join(tuples)};"
            cut = draw(st.integers(10, max(11, len(text) - 2)))
            at = text.rfind(",", 0, cut)
            if at > 0:
                parts += [text[: at + 1], text[at + 1 :].strip()]
            else:
                parts.append(text)
    return "\n".join(parts) + "\n"


@given(_random_dump(), st.integers(3, 200))
@settings(max_examples=60, deadline=None)
def test_range_ownership_partitions_any_dump(tmp_path_factory, dump, step):
    """For ANY dump layout and ANY split size, concatenating each
    range's owned statements in offset order reproduces the sequential
    reassembly exactly — no statement lost, duplicated, or reordered."""
    from mysqldump_to_parquet_spark.sources.mysqldump import (
        _iter_range_statements,
        iter_statements,
    )

    d = tmp_path_factory.mktemp("rng")
    f = d / "dump.sql"
    f.write_text(dump)
    size = f.stat().st_size
    got: list[str] = []
    for off in range(0, max(size, 1), step):
        got.extend(
            _iter_range_statements(str(f), off, min(off + step, size))
        )
    assert got == list(iter_statements(dump.splitlines()))


# --------------------------------------------------------- DDL fuzzing

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
_nasty_literal = st.text(
    alphabet=st.sampled_from(list("abc()',\\ null NOT NULL unsigned")),
    max_size=12,
)


@st.composite
def _column_defs(draw):
    """(ddl_fragment, expected_type_kind, expected_nullable)"""
    from pyspark.sql import types as T

    name = draw(_ident)
    kind = draw(st.sampled_from(["int", "varchar", "decimal", "enum", "double"]))
    if kind == "int":
        type_sql, expect = "bigint", T.LongType()
    elif kind == "varchar":
        type_sql, expect = "varchar(32)", T.StringType()
    elif kind == "double":
        type_sql, expect = "double", T.DoubleType()
    elif kind == "decimal":
        p = draw(st.integers(2, 30))
        s = draw(st.integers(0, min(p, 10)))
        type_sql, expect = f"decimal({p},{s})", T.DecimalType(p, s)
    else:
        vals = draw(st.lists(_nasty_literal, min_size=1, max_size=3))
        quoted = ",".join("'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
                          for v in vals)
        type_sql, expect = f"enum({quoted})", T.StringType()
    opt = draw(st.sampled_from(["", "NOT NULL", "NULL", "DEFAULT NULL"]))
    comment = draw(st.sampled_from(["", "COMMENT 'not null ) stuff'"]))
    nullable = opt != "NOT NULL"
    frag = " ".join(x for x in (f"`{name}`", type_sql, opt, comment) if x)
    return name, frag, expect, nullable


@given(st.lists(_column_defs(), min_size=1, max_size=6, unique_by=lambda c: c[0]))
@settings(max_examples=150, deadline=None)
def test_create_table_fuzz(cols):
    from mysqldump_to_parquet_spark.sources.mysqldump import parse_create_table

    ddl = "CREATE TABLE `t` (" + ", ".join(f for _, f, _, _ in cols) + ");"
    ts = parse_create_table(ddl)
    got = [(f.name, f.dataType, f.nullable) for f in ts.schema.fields]
    want = [(n, t, nl) for n, _, t, nl in cols]
    assert got == want, f"\nddl={ddl}\ngot={got}\nwant={want}"


@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=6),
    st.binary(min_size=0, max_size=0),  # seed placeholder keeps signature clear
    st.randoms(use_true_random=False),
)
@settings(max_examples=100, deadline=None)
def test_bmp_codec_roundtrip_fuzz(w, h, _seed, rnd):
    """encode_bmp → decode_bmp is identity for arbitrary pixel data at
    arbitrary (padded and unpadded) widths."""
    from mysqldump_to_parquet_spark.llm.multimodal import decode_bmp, encode_bmp

    rgb = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)


def test_arrow_fast_path_matches_exhaustive_on_hostile_strings():
    """Randomized differential for the escape-resolving Arrow fast path:
    strings mixing both quote-escape forms (\\' and ''), backslash runs,
    semantic escapes, unknown escapes, multibyte UTF-8, and top-level
    lookalike bytes (commas/parens) must decode identically to the
    exhaustive tokenizer — and must never silently fall back en masse."""
    import random

    from pyspark.sql import types as T

    from mysqldump_to_parquet_spark.sources.mysqldump import (
        _arrow_fast_types,
        _arrow_read_values,
        _values_csv_bytes,
        parse_insert_full,
    )

    rng = random.Random(42)
    chars = ["a", "b", "é", "中", " ", ",", "(", ")", "'", "\\", "\n", "\t",
             "%", "_", "0", "x"]

    def mk_string():
        out = []
        for _ in range(rng.randint(0, 12)):
            c = rng.choice(chars)
            if c == "'":
                out.append(rng.choice(["''", "\\'"]))
            elif c == "\\":
                out.append(rng.choice(["\\\\", "\\n", "\\t", "\\0", "\\Z",
                                       "\\b", "\\r", "\\%", "\\_", "\\q"]))
            elif c == "\n":
                out.append("\\n")
            elif c == "\t":
                out.append("\\t")
            else:
                out.append(c)
        return "".join(out)

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("d", T.DoubleType()),
        ]
    )
    ft = _arrow_fast_types(schema)
    names = [f.name for f in schema.fields]
    fallbacks = 0
    for _ in range(150):
        body = ",".join(
            f"({i},'{mk_string()}',{rng.choice(['NULL', '1.5', '-2.25', '3'])})"
            for i in range(rng.randint(1, 8))
        )
        stmt = f"INSERT INTO `t` VALUES {body};"
        _, _, slow = parse_insert_full(stmt)
        fb = _values_csv_bytes(stmt)
        if fb is None:
            fallbacks += 1
            continue
        tbl = _arrow_read_values(fb[0], names, ft)
        fast = [tuple(d.values()) for d in tbl.to_pylist()]
        conv = [
            tuple(float(v) if isinstance(v, float) else v for v in r)
            for r in slow
        ]
        assert fast == conv, stmt[:200]
    assert fallbacks == 0  # every generated statement is fast-path-eligible


def test_glued_introducers_always_fall_back_and_parse(spark=None):
    """Randomized guard check (round-3 ADVICE, high): any statement with
    a charset introducer glued to a quoted literal must be REJECTED by
    the fast path's quote-boundary scan (never silently kept as literal
    bytes) and parse introducer-free through the exhaustive grammar."""
    import random

    from mysqldump_to_parquet_spark.sources.mysqldump import (
        _values_csv_bytes,
        parse_insert_full,
    )

    rng = random.Random(7)
    intros = ["_utf8mb4", "_utf8", "_latin1", "_binary"]
    for _ in range(100):
        n = rng.randint(1, 5)
        vals, want, intro_at = [], [], rng.randrange(n)
        for i in range(n):
            s = "".join(rng.choice("abxyz") for _ in range(rng.randint(1, 6)))
            if i == intro_at:
                vals.append(f"{rng.choice(intros)}'{s}'")
            else:
                vals.append(f"'{s}'")
            want.append(s)
        stmt = (
            "INSERT INTO `t` VALUES ("
            + "),(".join(f"{i},{v}" for i, v in enumerate(vals))
            + ");"
        )
        assert _values_csv_bytes(stmt) is None, stmt
        _, _, rows = parse_insert_full(stmt)
        assert [r[1] for r in rows] == want, stmt


# ---------------------------------------------------------------------------
# JPEG codec properties (r13): Hypothesis explores MCU-grid geometries,
# color extremes, restart intervals, and truncation points the fixed
# fixture can't.  Pure Python — no Spark jobs per example.
# ---------------------------------------------------------------------------


@given(
    mw=st.integers(min_value=1, max_value=4),
    mh=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    ri=st.sampled_from([0, 1, 2, 5]),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_roundtrip_property(mw, mh, seed, ri):
    """encode → decode is EXACT for any constant-MCU image at any grid
    size, color content, and restart interval — the DC-only × flat-q
    exactness argument (multimodal._JPEG_Q) holds everywhere, not just
    on the fixture formula."""
    import random as _random

    from mysqldump_to_parquet_spark.llm.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = _random.Random(seed)
    colors = [
        [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(mw)
        ]
        for _ in range(mh)
    ]
    w, h = 16 * mw, 16 * mh
    gw, gh, (py, pcb, pcr) = decode_jpeg(
        encode_jpeg(w, h, colors, restart_interval=ri)
    )
    assert (gw, gh) == (w, h)
    for my in range(mh):
        for mx in range(mw):
            yv, cbv, crv = colors[my][mx]
            assert py[(my * 16 + 7) * w + mx * 16 + 7] == yv
            assert pcb[(my * 8 + 3) * (w // 2) + mx * 8 + 3] == cbv
            assert pcr[(my * 8 + 4) * (w // 2) + mx * 8 + 4] == crv
    assert sum(py) == 256 * sum(c[0] for row in colors for c in row)


@given(
    cut=st.integers(min_value=2, max_value=400),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_truncation_never_escapes_valueerror(cut, seed):
    """Truncating a valid stream at ANY byte offset either still
    decodes fully and correctly (cut past the entropy data — the
    decoder does not require trailing EOI) or raises ValueError — never
    IndexError/KeyError/struct.error (the PNG r12 error-contract
    standard, fuzzed instead of enumerated)."""
    import random as _random

    from mysqldump_to_parquet_spark.llm.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = _random.Random(seed)
    colors = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
               for _ in range(2)] for _ in range(1)]
    data = encode_jpeg(32, 16, colors)
    cut = min(cut, len(data) - 1)
    try:
        w, h, planes = decode_jpeg(data[:cut])
    except ValueError:
        return  # the contract
    # decoded without error: must be the complete, correct image
    assert (w, h) == (32, 16)
    assert planes[0][7 * 32 + 7] == colors[0][0][0]
    assert planes[0][7 * 32 + 16 + 7] == colors[0][1][0]
