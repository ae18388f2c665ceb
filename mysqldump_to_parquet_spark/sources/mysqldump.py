"""MySQL logical-dump → Parquet ingest — the reference's entire job,
re-expressed Spark-first.

Reference behavior being matched (SURVEY.md §2.1, /root/reference/src/):

* statement grammar: lines accumulate until a trailing ``;``; ``--``
  comments, one-line ``/* … */;`` blocks and blank lines dropped; only
  ``CREATE TABLE`` / ``INSERT INTO`` statements survive (main.rs:110–145).
* ``cleanup_key``: MySQL index prefix lengths (``KEY k (col(144))``) are
  stripped inside CREATE TABLE via a paren-depth scan (main.rs:158–181).
* DDL type mapping (line_parser.rs:122–174) with the reference's semantic
  bugs *fixed*, per SURVEY.md §1.2: DECIMAL → DecimalType (reference: lossy
  Int64), BOOLEAN → BooleanType (reference: panics), DATE → DateType
  (reference: panics on 10-char literals), TIME → StringType (no Spark
  time-of-day type on this line).
* nullability: default nullable; NOT NULL → False; NULL → True; inline or
  table-level PRIMARY KEY → False (line_parser.rs:176–193).
* column names lowercased (line_parser.rs:39); timestamps parsed as UTC
  (parquet_writer.rs:186–191); Integer→Float widening (parquet_writer.rs:162);
  any other value/column mismatch is an error (C3).
* sink: one Snappy Parquet dataset per table (parquet_writer.rs:69–91) —
  a *directory* per table here (multi-part output is the scale story).

Execution model (replaces the reference's 3-thread pipeline, main.rs:88–108):

* ``spark.read.text`` splits on line boundaries, so every ``INSERT`` row of
  a mysqldump (one statement per line under the default --extended-insert)
  is a complete record — INSERT parsing is embarrassingly parallel across
  executors with no cross-partition state.
* DDL + noise lines (everything that is not an INSERT) are a few KB even in
  a 100 TB dump; they are collected to the driver once and reassembled with
  the reference grammar.  This two-pass split also removes the reference's
  "CREATE TABLE must precede its INSERTs, no interleaving" restriction
  (README.md:13–17).
* Per table, INSERT lines are filtered (predicate prunes at the scan),
  tokenized in ``mapPartitions`` (pure Python, no driver involvement),
  coerced to carrier types, and written as Parquet.  Gzip dumps are
  unsplittable → one task per *file*; parallelism at scale comes from many
  dump files, which is how mysqldump output ships in practice.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# statement grammar (pure Python — no Spark needed, unit-tested directly)
# --------------------------------------------------------------------------


def cleanup_key(line: str) -> str:
    """Strip MySQL index prefix lengths: ``KEY k (col(144))`` → ``KEY k (col)``.

    Same paren-depth semantics as the reference (main.rs:158–181): content at
    depth ≥ 2 is dropped, including the depth-2 closing paren.
    """
    if "KEY " not in line:
        return line
    out: list[str] = []
    depth = 0
    for ch in line:
        if ch == "(":
            depth += 1
        if ch == ")":
            depth -= 1
            if depth == 1:
                continue
        if depth >= 2:
            continue
        out.append(ch)
    return "".join(out)


def _is_noise(line: str) -> bool:
    """Comment/blank filter (main.rs:123–128)."""
    return (
        not line
        or line.startswith("--")
        or (line.startswith("/*") and line.endswith("*/;"))
    )


def iter_statements(lines: Iterable[str]) -> Iterator[str]:
    """Reassemble trimmed lines into SQL statements; yield only
    CREATE TABLE / INSERT INTO statements (main.rs:110–145)."""
    current: list[str] = []
    in_create = False
    for raw in lines:
        line = raw.strip()
        if _is_noise(line):
            continue
        if in_create:
            current.append(cleanup_key(line))
        else:
            current.append(line)
            if not in_create and line.startswith("CREATE TABLE"):
                in_create = True
        if line.endswith(";"):
            stmt = " ".join(current).strip()
            # USE statements ride along solely as database context for the
            # duplicate-table guard (build_schemas); every downstream
            # consumer filters by CREATE/DML prefix.
            if (
                stmt.startswith("CREATE TABLE")
                or stmt.startswith(DML_PREFIXES)
                or stmt.upper().startswith("USE ")
                or stmt.upper().startswith("USE`")
            ):
                yield stmt
            current.clear()
            in_create = False


# --------------------------------------------------------------------------
# DDL → StructType
# --------------------------------------------------------------------------

#: MySQL type name → Spark type factory.  args = the parenthesized ints.
#: Mapping mirrors line_parser.rs:122–174 with SURVEY §1.2 fixes.
_STRING_TYPES = {
    "char", "varchar", "tinytext", "text", "mediumtext", "longtext",
    "enum", "set", "string", "json",
}
_INT_TYPES = {
    "tinyint", "smallint", "mediumint", "int", "integer", "bigint",
    "int2", "int4", "int8", "int64", "serial", "year", "bit",
}
_FLOAT_TYPES = {"float", "float4", "float8", "float64", "real", "double"}
_DECIMAL_TYPES = {"decimal", "numeric", "dec", "bignumeric", "bigdecimal", "fixed"}
_BINARY_TYPES = {
    "binary", "varbinary", "tinyblob", "blob", "mediumblob", "longblob",
    # spatial types: mysqldump emits their values as binary payloads
    # (SRID-prefixed WKB, via _binary '…' or --hex-blob 0x…) — the
    # faithful conversion is the opaque bytes, decoded downstream by
    # whatever geometry library consumes the parquet
    "geometry", "point", "linestring", "polygon", "multipoint",
    "multilinestring", "multipolygon", "geomcollection",
    "geometrycollection",
}

_COL_RE = re.compile(r"^`(?P<q>[^`]+)`|^(?P<b>[A-Za-z_][A-Za-z0-9_]*)")
_TYPE_NAME_RE = re.compile(r"^\s*(?P<name>[A-Za-z][A-Za-z0-9_]*)")


def _split_type_args(s: str) -> tuple[str, str, str] | None:
    """Split a column-def remainder into (type_name, args_text, rest) with
    a quote-aware paren scan — ``enum('a)','null')`` must not cut the arg
    list at the ``)`` inside the first literal (a naive ``[^)]*`` match
    leaks literal text into the option scan, where a stray 'null' would
    flip inferred nullability)."""
    m = _TYPE_NAME_RE.match(s)
    if not m:
        return None
    i = m.end()
    n = len(s)
    while i < n and s[i] in " \t":
        i += 1
    if i >= n or s[i] != "(":
        return m.group("name"), "", s[m.end():]
    depth = 0
    quote: str | None = None
    j = i
    while j < n:
        ch = s[j]
        if quote:
            if ch == "\\" and quote == "'":
                j += 2
                continue
            if ch == quote:
                if quote == "'" and j + 1 < n and s[j + 1] == "'":
                    j += 2
                    continue
                quote = None
        elif ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return m.group("name"), s[i + 1 : j], s[j + 1 :]
        j += 1
    return None  # unterminated arg list
_TABLE_NAME_RE = re.compile(
    r"^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?[`\"]?(?P<name>[A-Za-z0-9_$]+)[`\"]?\s*\(",
    re.I,
)
#: Table-constraint openers (word-bounded so columns named `checksum`,
#: `constraint_id`, `keys`, … still parse as columns).
_NON_COLUMN_RE = re.compile(
    r"^(?:primary\s+key|unique\s+key|unique\s+index|unique|key|index|"
    r"constraint|foreign\s+key|fulltext|spatial|check)\b"
    r"|^(?:key|index|unique|check)\(",
    re.I,
)


class DumpParseError(ValueError):
    """Parse failure with table/column context (replaces the reference's
    bail!/panic, line_parser.rs:170–173)."""


class MultilineDumpError(DumpParseError):
    """The dump spreads INSERT statements over multiple lines (no
    --extended-insert / reformatted).  Not an error for ``convert_dump``
    with ``multiline='auto'`` — it switches to the whole-file reassembly
    path (reference parity: main.rs:110–145 accumulates lines until ';')."""


class OnepassStagingInvisible(RuntimeError):
    """The one-pass strategy's staging probe failed: an executor wrote a
    marker file under the staging directory but the driver cannot see it
    — driver and executors do not share the output filesystem, so the
    task-side parquet writers could never be committed by the driver's
    final move.  ``convert_dump(strategy='auto')`` catches this and falls
    back to the per-table JVM writers; ``strategy='onepass'`` propagates
    it (the caller asked for a layout the cluster cannot honour)."""


def _split_top_level(body: str) -> list[str]:
    """Split a CREATE TABLE body on commas at paren depth 0, quote-aware."""
    parts: list[str] = []
    depth = 0
    quote: str | None = None
    start = 0
    i = 0
    while i < len(body):
        ch = body[i]
        if quote:
            if ch == "\\" and quote == "'":
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i].strip())
            start = i + 1
        i += 1
    tail = body[start:].strip()
    if tail:
        parts.append(tail)
    return parts


def _strip_quoted(s: str) -> str:
    """Remove quoted literals (``'…'`` with backslash escapes and ``''``
    doubling, plus ``"…"``) so option scans over a column-def remainder
    can't be fooled by literal text — e.g. ``DEFAULT 'null'`` or
    ``COMMENT 'not null here'`` must not flip inferred nullability."""
    out: list[str] = []
    quote: str | None = None
    i = 0
    n = len(s)
    while i < n:
        ch = s[i]
        if quote:
            if ch == "\\" and quote == "'":
                i += 2
                continue
            if ch == quote:
                if quote == "'" and i + 1 < n and s[i + 1] == "'":
                    i += 2  # '' doubling stays inside the literal
                    continue
                quote = None
        elif ch in ("'", '"'):
            quote = ch
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def _map_type(table: str, col: str, type_name: str, args: list[int], unsigned: bool):
    tn = type_name.lower()
    if tn in _DECIMAL_TYPES:
        p = args[0] if args else 10
        s = args[1] if len(args) > 1 else 0
        return T.DecimalType(min(p, 38), min(s, 37))
    if tn in ("bool", "boolean"):
        return T.BooleanType()
    if tn == "date":
        return T.DateType()
    if tn in ("datetime", "timestamp"):
        return T.TimestampType()
    if tn == "time":
        return T.StringType()  # no time-of-day type; documented divergence
    if tn in _INT_TYPES:
        # BIGINT UNSIGNED can exceed int64 (auto-increment ids near 2^64);
        # DECIMAL(20,0) holds the full range losslessly.  Same for
        # BIT(64): the value range is [0, 2^64), so the top bit set
        # overflows a signed long.
        if unsigned and tn in ("bigint", "int8", "int64", "serial"):
            return T.DecimalType(20, 0)
        if tn == "bit" and args and args[0] >= 64:
            return T.DecimalType(20, 0)
        return T.LongType()
    if tn in _FLOAT_TYPES:
        return T.DoubleType()
    if tn in _STRING_TYPES:
        return T.StringType()
    if tn in _BINARY_TYPES:
        return T.BinaryType()
    raise DumpParseError(f"unsupported column type {type_name!r} for {table}.{col}")


@dataclass(frozen=True)
class TableSchema:
    table: str
    schema: T.StructType


def parse_create_table(stmt: str) -> TableSchema:
    """CREATE TABLE statement → (table, StructType).

    Nullability rules per line_parser.rs:176–193 (first matching option
    wins; table-level PRIMARY KEY forces its columns NOT NULL); names
    lowercased per line_parser.rs:39.
    """
    m = _TABLE_NAME_RE.match(stmt)
    if not m:
        raise DumpParseError(f"cannot find table name in: {stmt[:120]!r}")
    table = m.group("name").lower()
    body_start = m.end() - 1
    # Find the ')' matching the body's '(' with a quote-aware depth scan —
    # rfind(')') would be fooled by parens in table options
    # (e.g. COMMENT='see (note)').  Index-based so a backslash escape can
    # skip the NEXT character too (DEFAULT 'don\\'t)' must not close the
    # quote early), mirroring _split_top_level.
    depth = 0
    quote: str | None = None
    body_end = -1
    i = body_start
    while i < len(stmt):
        ch = stmt[i]
        if quote:
            if ch == "\\" and quote == "'":
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                body_end = i
                break
        i += 1
    if body_end <= body_start:
        raise DumpParseError(f"unterminated CREATE TABLE body for {table}")
    body = stmt[body_start + 1 : body_end]

    fields: list[tuple[str, object, bool]] = []
    pk_cols: set[str] = set()
    for part in _split_top_level(body):
        low = part.lower()
        if _NON_COLUMN_RE.match(low):
            if low.startswith("primary key") and "(" in part:
                cols_blob = re.findall(r"\(([^)]*)\)", part)[0]
                pk_cols.update(c.strip(" `\"").lower() for c in cols_blob.split(","))
            continue
        cm = _COL_RE.match(part)
        if not cm:
            raise DumpParseError(f"cannot parse column def in {table}: {part[:80]!r}")
        col = (cm.group("q") or cm.group("b")).lower()
        split = _split_type_args(part[cm.end() :])
        if split is None:
            raise DumpParseError(f"cannot parse type for {table}.{col}")
        type_name, args_text, rest_raw = split
        args = [
            int(a) for a in args_text.replace("'", "").split(",")
            if a.strip().isdigit()
        ]
        rest = _strip_quoted(rest_raw)
        rest_low = " " + " ".join(rest.split()).lower() + " "
        unsigned = " unsigned " in rest_low
        dtype = _map_type(table, col, type_name, args, unsigned)

        # first matching option wins (line_parser.rs:176–193)
        nullable = True
        for opt_m in re.finditer(r"not\s+null|null|primary\s+key|unique", rest_low):
            opt = " ".join(opt_m.group(0).split())
            if opt == "not null" or opt == "primary key":
                nullable = False
                break
            if opt == "null":
                nullable = True
                break
            # bare "unique" alone does not imply NOT NULL
        fields.append((col, dtype, nullable))

    struct = T.StructType(
        [
            T.StructField(name, dtype, nullable and name not in pk_cols)
            for name, dtype, nullable in fields
        ]
    )
    if not struct.fields:
        raise DumpParseError(f"CREATE TABLE {table} has no columns")
    return TableSchema(table, struct)


# --------------------------------------------------------------------------
# INSERT → rows (value tokenizer — the P3 analog, line_parser.rs:200–272)
# --------------------------------------------------------------------------

#: DML statement prefixes a mysqldump can emit: plain, ``--insert-ignore``
#: (INSERT IGNORE), and ``--replace`` (REPLACE INTO).  For a whole-table
#: conversion the three are row-identical — IGNORE/REPLACE semantics only
#: matter when loading into a table that already has rows, and a dump is
#: self-consistent — so all three parse through the same path.
DML_PREFIXES = ("INSERT INTO", "INSERT IGNORE INTO", "REPLACE INTO")

def _dml_line_pred():
    """JVM-side predicate: line starts with any DML prefix (scan-level
    pre-filter; the Python parser stays the correctness guard)."""
    pred = F.col("value").startswith(DML_PREFIXES[0])
    for p in DML_PREFIXES[1:]:
        pred = pred | F.col("value").startswith(p)
    return pred


_DML_HEAD = r"^(?:INSERT\s+(?:IGNORE\s+)?|REPLACE\s+)INTO"

_INSERT_TABLE_RE = re.compile(
    _DML_HEAD + r"\s+[`\"]?(?P<name>[A-Za-z0-9_$]+)[`\"]?", re.I
)
_INSERT_COLS_RE = re.compile(
    _DML_HEAD + r"\s+[`\"]?[A-Za-z0-9_$]+[`\"]?\s*\((?P<cols>[^)]*)\)\s*VALUES",
    re.I,
)

#: MySQL backslash escapes (https://dev.mysql.com/doc/refman/8.0/en/string-literals.html)
_ESCAPES = {
    "0": "\0", "'": "'", '"': '"', "b": "\b", "n": "\n", "r": "\r",
    "t": "\t", "Z": "\x1a", "\\": "\\", "%": "\\%", "_": "\\_",
}

_NUM_CHARS = set("0123456789+-.eE")
#: C-speed membership test: tok.translate(_NUM_DEL) == "" ⇔ every char of
#: tok is numeric-shaped (same predicate as set(tok) <= _NUM_CHARS, minus
#: the per-char hashing).
_NUM_DEL = str.maketrans("", "", "0123456789+-.eE")


class FloatLit(float):
    """A float literal that remembers its source text, so DECIMAL-typed
    columns can be cast from the exact dump digits instead of the nearest
    binary double (floats silently truncate past ~17 significant digits)."""

    __slots__ = ("raw",)

    def __new__(cls, raw: str):
        obj = super().__new__(cls, raw)
        obj.raw = raw
        return obj


class BitLit(int):
    """A b'…' bit-literal value that remembers its bit LENGTH: MySQL
    gives bit literals the integer value in numeric context but a
    length-preserving byte string in binary-string context (b'11' →
    0x03 one byte; a 12-bit literal → two bytes)."""

    def __new__(cls, bits: str):
        obj = super().__new__(cls, int(bits, 2) if bits else 0)
        obj.nbits = len(bits)
        return obj

    def __getnewargs__(self):
        # int's default feeds the VALUE back into __new__, which expects
        # the bit string — reconstruct it so pickling round-trips
        return (format(self, f"0{self.nbits}b") if self.nbits else "",)


def insert_table_name(stmt: str) -> str | None:
    m = _INSERT_TABLE_RE.match(stmt)
    return m.group("name").lower() if m else None


def parse_insert(stmt: str) -> tuple[str, list[tuple]]:
    """INSERT INTO t VALUES (...),(...) → (table, rows).  See
    :func:`parse_insert_full` for the column-list-aware form."""
    table, _cols, rows = parse_insert_full(stmt)
    return table, rows


def parse_insert_full(stmt: str) -> tuple[str, list[str] | None, list[tuple]]:
    """INSERT INTO t [(col, ...)] VALUES (...),(...) → (table, columns|None,
    rows of Python literals).

    Supports both plain mysqldump output and ``--complete-insert`` dumps
    (explicit column lists — which the reference rejects, line_parser.rs:
    220–223).  Literal typing matches the reference (line_parser.rs:
    229–258): numbers are int unless they contain '.'/exponent, strings
    stay strings, TRUE/FALSE → bool, NULL → None, unary minus folds into
    the number.  A malformed or truncated statement raises
    :class:`DumpParseError` with the table name — never a bare
    IndexError/ValueError.
    """
    tmatch = _INSERT_TABLE_RE.match(stmt)
    if tmatch is None:
        raise DumpParseError(f"cannot find table in INSERT: {stmt[:80]!r}")
    table = tmatch.group("name").lower()
    columns: list[str] | None = None
    cm = _INSERT_COLS_RE.match(stmt)
    if cm:
        columns = [
            c.strip(" `\"").lower() for c in cm.group("cols").split(",") if c.strip()
        ]
        vpos = cm.end() - len("VALUES")
    else:
        # search from the end of the table name, not position 0 — a table
        # named `values_log` must not match its own name as the keyword
        vpos = stmt.upper().find("VALUES", tmatch.end())
        if vpos < 0:
            raise DumpParseError(f"INSERT without VALUES for {table}")
    s = stmt
    i = vpos + len("VALUES")
    rows = _parse_values(s, i, table)
    if not rows:
        # header-only lines happen when a dump spreads one INSERT over
        # multiple lines — fail loudly rather than silently writing 0 rows
        # (the one-statement-per-line contract is documented in the module).
        raise DumpParseError(
            f"INSERT for {table} has no VALUES tuples on its line — "
            "multi-line INSERT statements are not supported"
        )
    return table, columns, rows


def _parse_values(s: str, i: int, table: str) -> list[tuple]:
    """Per-character VALUES tokenizer — the reference grammar
    (line_parser.rs:224–267) with full escape handling and contextual
    errors.  Benchmarked against a C-regex token lexer (single-pass
    finditer over string/number/keyword/punct alternation): the regex was
    0.8× — per-token match-object overhead exceeds this loop's cost — so
    the simple exhaustive form is also the fastest."""
    n = len(s)
    rows: list[tuple] = []
    row: list = []

    while i < n:
        ch = s[i]
        if ch in " \t\r\n,":
            i += 1
            continue
        if ch == ";":
            break
        if ch != "(":
            raise DumpParseError(f"expected '(' at {i} in INSERT for {table}")
        i += 1
        row = []
        # C3 fail-loud separator contract: between '(' and ')', values and
        # commas must strictly alternate.  Adjacent values (``2 .5``),
        # empty fields (``(1,,2)`` / ``(,1)`` / ``(1,)``) and the empty
        # row ``()`` all raise instead of silently fusing or dropping
        # tokens — a fused row that happens to match the table arity
        # would otherwise write corrupt values without any error.
        expect_value = True
        while True:
            while i < n and s[i] in " \t\r\n":
                i += 1
            if i >= n:
                raise DumpParseError(f"truncated INSERT for {table}: unterminated row")
            ch = s[i]
            if ch == ")":
                if expect_value:
                    raise DumpParseError(
                        f"empty {'row' if not row else 'field'} in INSERT "
                        f"for {table}"
                    )
                i += 1
                break
            if ch == ",":
                if expect_value:
                    raise DumpParseError(f"empty field in INSERT for {table}")
                expect_value = True
                i += 1
                continue
            if not expect_value:
                raise DumpParseError(
                    f"adjacent values without ',' in INSERT for {table}"
                )
            if ch == "'":
                # Fast path: most string literals contain no backslash and
                # no doubled quote — one C-speed find() + slice instead of
                # the per-char loop (≥2× on string-heavy dumps).  Any
                # escape in the span (or a '' doubling at its end) falls
                # back to the exhaustive scanner below, unchanged.
                k = s.find("'", i + 1)
                if k < 0:
                    raise DumpParseError(
                        f"unterminated string in INSERT for {table}"
                    )
                seg = s[i + 1 : k]
                if "\\" not in seg and (k + 1 >= n or s[k + 1] != "'"):
                    row.append(seg)
                    expect_value = False
                    i = k + 1
                    continue
                # string literal: backslash escapes + '' doubling
                buf: list[str] = []
                i += 1
                while i < n:
                    c = s[i]
                    if c == "\\" and i + 1 < n:
                        buf.append(_ESCAPES.get(s[i + 1], s[i + 1]))
                        i += 2
                        continue
                    if c == "'":
                        if i + 1 < n and s[i + 1] == "'":
                            buf.append("'")
                            i += 2
                            continue
                        i += 1
                        break
                    buf.append(c)
                    i += 1
                row.append("".join(buf))
                expect_value = False
                continue
            # unquoted token: number / NULL / TRUE / FALSE
            j = i
            while j < n and s[j] not in ",) \t\r\n":
                j += 1
            tok = s[i:j]
            i = j
            # introducer tokens start with "_", which _NUM_DEL keeps, so
            # they can never take the numeric branch — the glued-quote
            # rewind check safely moves below it (off the hot path)
            if tok[0] == "_" and "'" in tok:
                # charset introducer glued to its string (_utf8mb4'x'):
                # rewind to the quote; the next iteration parses the string.
                q = tok.index("'")
                if q > 1 and tok[1:q].replace("_", "").isalnum():
                    i -= len(tok) - q
                    continue
            # numeric check first (numbers dominate real dumps) via the
            # translate trick — no per-token set() build or upper() alloc
            if not tok.translate(_NUM_DEL):
                try:
                    if "." in tok or "e" in tok or "E" in tok:
                        row.append(FloatLit(tok))
                    else:
                        row.append(int(tok))
                except ValueError as exc:
                    raise DumpParseError(
                        f"bad numeric literal {tok[:40]!r} in INSERT for {table}"
                    ) from exc
            elif (up := tok.upper()) == "NULL":
                row.append(None)
            elif up == "TRUE":
                row.append(True)
            elif up == "FALSE":
                row.append(False)
            elif up.startswith("0X"):
                try:
                    row.append(bytes.fromhex(tok[2:]))
                except ValueError as exc:
                    raise DumpParseError(
                        f"bad hex literal {tok[:40]!r} in INSERT for {table}"
                    ) from exc
            elif up[0] == "B" and len(tok) >= 2 and tok[1] == "'":
                # BIT column literal (b'101') — numeric context, matching
                # the BIT→integer DDL mapping.  The Arrow-CSV fast path
                # never sees these: its quote-boundary guard routes any
                # statement with a non-delimiter-adjacent quote here.
                if len(tok) < 3 or tok[-1] != "'" or tok[2:-1].strip("01"):
                    raise DumpParseError(
                        f"bad bit literal {tok[:40]!r} in INSERT for {table}"
                    )
                row.append(BitLit(tok[2:-1]))
            elif up[0] == "X" and len(tok) >= 2 and tok[1] == "'":
                # standard-SQL hex string literal (X'41') — byte string,
                # same value class as 0x41
                if len(tok) < 3 or tok[-1] != "'":
                    raise DumpParseError(
                        f"bad hex literal {tok[:40]!r} in INSERT for {table}"
                    )
                try:
                    row.append(bytes.fromhex(tok[2:-1]))
                except ValueError as exc:
                    raise DumpParseError(
                        f"bad hex literal {tok[:40]!r} in INSERT for {table}"
                    ) from exc
            elif (
                tok.startswith("_")
                and tok[1:].replace("_", "").isalnum()
                and _next_is_literal(s, i, n)
            ):
                # charset introducer (_binary 'x', _utf8mb4'x', _binary 0x..):
                # skip it — the following literal is the value (a str value
                # landing in a BinaryType column goes through the existing
                # byte-fidelity guard in coerce_row).
                continue
            else:
                raise DumpParseError(
                    f"unsupported literal {tok[:40]!r} in INSERT for {table}"
                )
            expect_value = False
        rows.append(tuple(row))
    return rows


def _next_is_literal(s: str, i: int, n: int) -> bool:
    """True when the next non-space char starts a string, hex, or bit
    literal — the things a charset introducer may precede (``_binary
    '…'``, ``_binary 0x…``, ``_binary X'…'``, ``_binary b'…'``)."""
    while i < n and s[i] in " \t":
        i += 1
    if i >= n:
        return False
    c = s[i]
    if c == "'" or c == "0":
        return True
    return c in "xXbB" and i + 1 < n and s[i + 1] == "'"


# --------------------------------------------------------------------------
# Arrow-CSV fast path for canonical extended-INSERT statements
# --------------------------------------------------------------------------
#
# The per-character tokenizer above is the COMPLETE grammar (escapes, hex
# blobs, b'…' bit literals, X'…' hex strings, charset introducers,
# arbitrary whitespace).  The overwhelming bulk
# of a real mysqldump, though, is the canonical layout mysqldump itself
# emits: ``INSERT INTO `t` VALUES (a,b,...),(a,b,...);`` with no backslash
# escapes in sight.  For those statements the VALUES text IS a CSV dialect
# (comma delimiter, single-quote quoting, '' doubling), so the parse can be
# handed to pyarrow.csv's C++ reader: a vectorized numpy scan validates the
# structure and rewrites top-level ``),(`` separators to newlines, and one
# ``read_csv`` call per Arrow batch converts every literal straight into
# typed Arrow columns — measured 4.8× per core over the Python tokenizer
# (8 → 39 MB/s/core on the ingest-bench shape).
#
# Safety model: the fast path never guesses.  Any structural surprise —
# a backslash anywhere in the statement, quote imbalance, a top-level paren
# that is not exactly a row boundary, an Arrow conversion error (type
# mismatch, int64 overflow, ragged row), a non-finite parsed double or a
# NaN literal, a quote byte off a field boundary (glued charset
# introducers, half-quoted junk) — drops the statement (or the whole Arrow
# batch) back to the exhaustive tokenizer, which either parses it
# correctly or raises the proper contextual DumpParseError.  Fail-loud
# (C3) is therefore preserved for every input the exhaustive grammar
# rejects with a *typed* mismatch; the documented acceptance-widenings —
# all only reachable from hand-crafted dumps mysqldump never emits — are
# QUOTED literals that Arrow CSV converts where coerce_row would raise:
# '7' in a BIGINT column, '1.5' in a DOUBLE column, '1'/'TRUE' in a
# BOOLEAN column, and a bare unquoted junk token in a StringType column.

_ARROW_SENTINEL = object()


def _carrier_pa_type(dt: T.DataType):
    """Arrow type of one CARRIER column (see :func:`carrier_field` — the
    carrier StructType has already rewritten temporal/decimal to string)."""
    import pyarrow as pa

    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.DoubleType):
        return pa.float64()
    if isinstance(dt, T.FloatType):
        return pa.float32()
    if isinstance(dt, T.BooleanType):
        return pa.bool_()
    if isinstance(dt, T.BinaryType):
        return pa.binary()
    if isinstance(dt, T.StringType):
        return pa.string()
    raise DumpParseError(f"no carrier Arrow type for {dt.simpleString()}")


def _arrow_fast_types(schema: T.StructType):
    """Arrow CSV target types in CARRIER representation, or None when the
    schema has a column the fast path does not handle (BinaryType: hex
    literals need the exhaustive path)."""
    import pyarrow as pa

    out = {}
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, T.LongType):
            out[f.name] = pa.int64()
        elif isinstance(dt, T.DoubleType):
            out[f.name] = pa.float64()
        elif isinstance(dt, T.BooleanType):
            out[f.name] = pa.bool_()
        elif isinstance(
            dt, (T.TimestampType, T.DateType, T.DecimalType, T.StringType)
        ):
            out[f.name] = pa.string()  # temporal/decimal ride as strings (C1)
        else:
            return None
    return out


#: Byte-level MySQL escape substitutions for the fast path — mirrors
#: ``_ESCAPES`` exactly, except ``\'`` becomes CSV ``''`` doubling so the
#: result stays parseable under single-quote quoting.
_ESC_BYTES = {
    39: b"''",  # \'  → '' (CSV-doubled)
    34: b'"',
    48: b"\x00",
    98: b"\x08",
    110: b"\n",
    114: b"\r",
    116: b"\t",
    90: b"\x1a",
    92: b"\\",
    37: b"\\%",
    95: b"\\_",
}


def _unescape_bytes(data: bytes) -> bytes | None:
    """Resolve MySQL backslash escapes byte-level, BEFORE the structural
    scan (escaped quotes must not count toward quote parity).

    A backslash starts an escape iff it is preceded by an even number of
    consecutive backslashes — computed vectorized (run starts via a
    shifted mask + searchsorted offsets), then the sparse escape sites
    are spliced with C-speed byte slices.  ``\\'`` becomes ``''`` so the
    output stays CSV-quotable; every other mapping mirrors ``_ESCAPES``
    (default: drop the backslash, keep the byte — multibyte UTF-8 chars
    work because only their lead byte follows the backslash and the
    continuation bytes copy verbatim).  Returns None for a trailing lone
    backslash (truncated statement — exhaustive path raises properly)."""
    import numpy as np

    arr = np.frombuffer(data, dtype=np.uint8)
    bs = arr == 92
    pos = np.nonzero(bs)[0]
    if pos.size == 0:
        return data
    prev = np.zeros_like(bs)
    prev[1:] = bs[:-1]
    run_starts = np.nonzero(bs & ~prev)[0]
    idx = np.searchsorted(run_starts, pos, side="right") - 1
    starts = pos[((pos - run_starts[idx]) % 2) == 0]
    if starts.size and int(starts[-1]) + 1 >= len(data):
        return None
    parts = []
    prev_end = 0
    for p in starts.tolist():
        parts.append(data[prev_end:p])
        nxt = data[p + 1]
        parts.append(_ESC_BYTES.get(nxt, data[p + 1 : p + 2]))
        prev_end = p + 2
    parts.append(data[prev_end:])
    return b"".join(parts)


def _values_csv_bytes(stmt: str) -> tuple[bytes, int] | None:
    """Rewrite one canonical extended-INSERT statement's VALUES text into
    CSV bytes (one line per row, outer parens stripped), or None when any
    structural guard trips.

    Backslash escapes are resolved first by :func:`_unescape_bytes` (so
    text-corpus dumps full of ``\\'`` stay on the fast path), and
    insignificant top-level whitespace is stripped (delimiter-adjacent
    runs only — pretty-printed / reassembled multiline statements then
    ride the fast path; a run between two value tokens is malformed and
    rejects).  The numpy scan then proves three invariants before any
    byte is moved: quote parity is balanced, every top-level ``(`` is
    exactly a row opener, and every top-level ``)`` is exactly a row
    closer — so a ``),(`` inside a quoted string can never split a row,
    and any stray top-level paren (nested tuples, truncated statements)
    routes to the exhaustive parser instead.  Returns the CSV payload
    and the row count the caller must see back from Arrow."""
    import numpy as np

    tm = _INSERT_TABLE_RE.match(stmt)
    # search from the table-name end: a table named `values_log` must not
    # match its own name as the keyword (same rule as parse_insert_full).
    # The keyword sits within a few bytes of the table name (the caller
    # already excluded column-list statements), so case-fold only a small
    # window — upper() of the WHOLE statement measured ~6% of the scan on
    # a 76 KB extended INSERT; fall back to the full fold only if the
    # window misses (pathological spacing).
    start = tm.end() if tm else 0
    vpos = stmt[start : start + 96].upper().find("VALUES")
    vpos = (
        vpos + start if vpos >= 0 else stmt.upper().find("VALUES", start)
    )
    if vpos < 0:
        return None
    seg = stmt[vpos + 6 :].strip(" \t\r\n")
    if seg.endswith(";"):
        seg = seg[:-1].rstrip(" \t\r\n")
    if len(seg) < 2 or not (seg.startswith("(") and seg.endswith(")")):
        return None
    data = seg[1:-1].encode("utf-8")
    if b"\\" in data:
        data = _unescape_bytes(data)
        if data is None:
            return None
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        return None
    # inclusive quote count; a position is inside a string iff the count of
    # quotes STRICTLY BEFORE it is odd — for non-quote bytes that equals
    # parity[pos] (UTF-8 continuation bytes are ≥ 0x80, so multibyte text
    # can never alias the ASCII quote/paren/comma bytes tested here)
    # int32 accumulator: the default int64 cumsum doubles the memory
    # traffic of the scan's largest intermediate, and at 32 concurrent
    # parse workers this whole routine is memory-bandwidth-bound (a
    # statement is at most a few MB — far under the int32 range)
    parity = np.cumsum(arr == 39, dtype=np.int32)
    if int(parity[-1]) % 2 != 0:
        return None
    # Top-level whitespace (space/tab/CR/LF outside quotes) is
    # insignificant in a VALUES list but would reach Arrow as part of an
    # unquoted field (" '...'" after a comma keeps the quotes literal) —
    # so STRIP it and rescan once: pretty-printed / reassembled
    # multiline dumps then ride the same fast path as canonical
    # mysqldump output (measured 6.4 → 17.5 MB/s on the multiline
    # ingest shape).  Whitespace inside quoted strings (odd parity) is
    # data and stays.  Deletion cannot create new top-level whitespace,
    # so the rescan terminates after one pass.
    ws = (arr == 32) | (arr == 9) | (arr == 13) | (arr == 10)
    top_ws = ws & ((parity & 1) == 0)
    if bool(top_ws.any()):
        # Safety: a run may only be stripped when it touches a
        # STRUCTURAL byte — ',' '(' ')' or the data boundary.  A run
        # between two value bytes (``2 3``) or between two quotes
        # (``'a' 'b'``) is malformed SQL the exhaustive tokenizer
        # rejects loudly; stripping would instead silently fuse tokens.
        idx = np.nonzero(top_ws)[0]
        run_break = np.diff(idx) > 1
        starts = idx[np.concatenate(([True], run_break))]
        ends = idx[np.concatenate((run_break, [True]))]
        # neighbors with the stripped outer parens as boundary sentinels
        prev_b = np.where(starts == 0, 40, arr[np.maximum(starts - 1, 0)])
        next_b = np.where(
            ends == arr.size - 1, 41, arr[np.minimum(ends + 1, arr.size - 1)]
        )
        structural = (40, 41, 44)
        if not bool(
            (np.isin(prev_b, structural) | np.isin(next_b, structural)).all()
        ):
            return None
        # empty-field guard (fail-loud C3): stripping must never CREATE
        # an empty field — '( ,' ', )' ', ,' '( )' would reach Arrow as
        # NULL where the exhaustive parser raises an empty-field error.
        # The only legal structural adjacencies a strip may create are
        # the row boundary's '),', ',(' (and ')(' is rejected by the
        # paren-structure check downstream).
        empty = (
            ((prev_b == 40) & (next_b == 44))
            | ((prev_b == 44) & (next_b == 41))
            | ((prev_b == 44) & (next_b == 44))
            | ((prev_b == 40) & (next_b == 41))
        )
        if bool(empty.any()):
            return None
        arr = arr[~top_ws]
        if arr.size == 0:
            return None
        data = arr.tobytes()
        parity = np.cumsum(arr == 39, dtype=np.int32)
    # every quote must sit on a field boundary: an opening quote (odd
    # inclusive parity) only after '(' ',' or another quote ('' doubling),
    # a closing quote (even parity) only before ',' ')' or another quote.
    # This rejects glued charset introducers (``_utf8mb4'abc'``) and
    # half-quoted junk (``1.5'x'``) that Arrow CSV would keep as literal
    # mid-field quote bytes — silently diverging from the exhaustive
    # tokenizer, which resolves introducers via its rewind path.
    qpos = np.nonzero(arr == 39)[0]
    if qpos.size:
        opening = qpos[(parity[qpos] % 2) == 1]
        closing = qpos[(parity[qpos] % 2) == 0]
        # direct compares instead of np.isin: in1d's sort/unique machinery
        # measured ~15% of the scan on quote-heavy statements
        before = arr[opening[opening > 0] - 1]
        if not ((before == 40) | (before == 44) | (before == 39)).all():
            return None
        after = arr[closing[closing < arr.size - 1] + 1]
        if not ((after == 44) | (after == 41) | (after == 39)).all():
            return None
    cand = np.nonzero(
        (arr[:-2] == 41) & (arr[1:-1] == 44) & (arr[2:] == 40)
    )[0]
    top = cand[(parity[cand] % 2) == 0]
    po = np.nonzero(arr == 40)[0]
    pc = np.nonzero(arr == 41)[0]
    po_top = po[(parity[po] % 2) == 0]
    pc_top = pc[(parity[pc] % 2) == 0]
    if not (
        np.array_equal(po_top, top + 2) and np.array_equal(pc_top, top)
    ):
        return None
    if top.size == cand.size:
        csv = data.replace(b"),(", b"\n")
    else:  # some ),( live inside quoted strings — splice only the real ones
        parts = []
        prev = 0
        for p in top.tolist():
            parts.append(data[prev:p])
            prev = p + 3
        parts.append(data[prev:])
        csv = b"\n".join(parts)
    return csv, int(top.size) + 1


def _arrow_read_values(
    csv_payload: bytes, names: list[str], col_types
) -> "object":
    """One pyarrow.csv read over the concatenated row lines of a batch of
    statements.  Raises on any conversion surprise — the caller falls back
    statement-by-statement.

    Non-finite floats are rejected HERE, centrally: Arrow parses a bare
    ``NaN``/``Inf`` literal into a float value the exhaustive parser
    would refuse (``unsupported literal``), and a NaN is indistinguishable
    from a null once it reaches a numpy view (nulls also surface as NaN)
    — so the check compares Arrow-side valid-value NaN/inf counts, where
    nulls are still tracked separately."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyarrow import csv as pacsv

    tbl = _arrow_csv_read(csv_payload, names, col_types, pacsv)
    for name, col in zip(tbl.column_names, tbl.columns):
        if pa.types.is_floating(col.type):
            bad = (pc.sum(pc.is_nan(col)).as_py() or 0) + (
                pc.sum(pc.is_inf(col)).as_py() or 0
            )
            if bad:
                raise DumpParseError(
                    f"{name}: non-finite literal on fast path"
                )
    return tbl


def _arrow_csv_read(csv_payload: bytes, names: list[str], col_types, pacsv):
    import io

    return pacsv.read_csv(
        io.BytesIO(csv_payload),
        read_options=pacsv.ReadOptions(column_names=names, encoding="utf8"),
        parse_options=pacsv.ParseOptions(
            delimiter=",",
            quote_char="'",
            double_quote=True,  # '' doubling inside quoted literals
            newlines_in_values=True,
        ),
        convert_options=pacsv.ConvertOptions(
            column_types=col_types,
            null_values=["NULL"],
            strings_can_be_null=True,
            quoted_strings_can_be_null=False,  # 'NULL' the string stays
            true_values=["TRUE", "true", "1"],
            false_values=["FALSE", "false", "0"],
        ),
    )


def align_row(
    row: tuple, columns: list[str], schema: T.StructType, table: str
) -> tuple:
    """Reorder a --complete-insert row (positional in ``columns``) to the
    schema's column order; columns absent from the INSERT become NULL."""
    if len(row) != len(columns):
        raise DumpParseError(
            f"{table}: row has {len(row)} values for {len(columns)} columns"
        )
    by_name = dict(zip(columns, row))
    unknown = set(columns) - {f.name for f in schema.fields}
    if unknown:
        raise DumpParseError(f"{table}: INSERT names unknown columns {unknown}")
    return tuple(by_name.get(f.name) for f in schema.fields)


# --------------------------------------------------------------------------
# schema-directed coercion (C1–C3 analogs) and the Spark pipeline
# --------------------------------------------------------------------------


def carrier_field(f: T.StructField) -> T.StructField:
    """Executor-side carrier type for a target field: temporal/decimal ride
    as strings and are cast JVM-side (C1); the rest carry their own type."""
    if isinstance(f.dataType, (T.TimestampType, T.DateType, T.DecimalType)):
        return T.StructField(f.name, T.StringType(), True)
    return T.StructField(f.name, f.dataType, True)


def coerce_row(row: tuple, target: T.StructType, table: str) -> tuple:
    """Python-side value coercion mirroring the reference's write-time rules:
    Integer→Float widening (C2, parquet_writer.rs:162), everything else must
    already match (C3 — mismatch raises with column context)."""
    if len(row) != len(target.fields):
        raise DumpParseError(
            f"{table}: row has {len(row)} values, schema has {len(target.fields)}"
        )
    out = []
    for v, f in zip(row, target.fields):
        if v is None:
            out.append(None)
        elif isinstance(f.dataType, T.DoubleType):
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                raise DumpParseError(f"{table}.{f.name}: {v!r} is not numeric")
            out.append(float(v))  # C2 widening
        elif isinstance(f.dataType, T.LongType):
            if isinstance(v, (bytes, bytearray)):
                # BIT column dumped with --hex-blob (0x05): MySQL numeric
                # context — big-endian bytes are the integer value
                if len(v) > 8:
                    raise DumpParseError(
                        f"{table}.{f.name}: {len(v)}-byte value overflows BIGINT"
                    )
                v = int.from_bytes(v, "big")
            if isinstance(v, bool) or not isinstance(v, int):
                raise DumpParseError(f"{table}.{f.name}: {v!r} is not an integer")
            if not (-(2**63) <= v < 2**63):
                raise DumpParseError(
                    f"{table}.{f.name}: {v} overflows BIGINT (declare the "
                    "column UNSIGNED to map it to DECIMAL(20,0))"
                )
            out.append(v)
        elif isinstance(f.dataType, T.BooleanType):
            if isinstance(v, bool):
                out.append(v)
            elif isinstance(v, int) and v in (0, 1):
                out.append(bool(v))  # MySQL dumps booleans as 0/1
            else:
                raise DumpParseError(f"{table}.{f.name}: {v!r} is not boolean")
        elif isinstance(
            f.dataType, (T.TimestampType, T.DateType, T.DecimalType)
        ):
            # ride as string; JVM-side casts finish C1.  FloatLit keeps the
            # dump's exact digits — repr(float) would truncate DECIMALs
            # beyond ~17 significant digits.
            if isinstance(v, FloatLit):
                v = v.raw
            elif isinstance(v, (bytes, bytearray)) and isinstance(
                f.dataType, T.DecimalType
            ):
                # BIT(64) dumped with --hex-blob: numeric context, full
                # unsigned range rides the DECIMAL(20,0) carrier
                if len(v) > 8:
                    raise DumpParseError(
                        f"{table}.{f.name}: {len(v)}-byte value overflows "
                        "the BIT range"
                    )
                v = str(int.from_bytes(v, "big"))
            elif isinstance(v, (int, float)):
                v = repr(v)
            if not isinstance(v, str):
                raise DumpParseError(f"{table}.{f.name}: {v!r} not castable")
            out.append(v)
        elif isinstance(f.dataType, T.BinaryType):
            if isinstance(v, BitLit):
                # MySQL string-context bit literal: length-preserving bytes
                # (b'' is a ZERO-length string — LENGTH(b'') = 0)
                out.append(v.to_bytes((v.nbits + 7) // 8, "big"))
            elif isinstance(v, (bytes, bytearray)):
                out.append(bytes(v))  # 0x… hex literal (--hex-blob dumps)
            elif isinstance(v, str):
                # A quoted literal destined for a binary column came through
                # spark.read.text's UTF-8 decode.  Valid UTF-8 round-trips
                # byte-faithfully; invalid bytes were already replaced with
                # U+FFFD and the original is unrecoverable — fail loudly
                # (C3 contract; the reference errors on invalid UTF-8 too,
                # via BufRead::read_line).  Dump binary columns with
                # mysqldump --hex-blob to avoid this entirely.
                if "�" in v:
                    raise DumpParseError(
                        f"{table}.{f.name}: binary value contains bytes that "
                        "did not survive UTF-8 line decoding; re-export with "
                        "mysqldump --hex-blob"
                    )
                out.append(v.encode("utf-8"))
            else:
                raise DumpParseError(f"{table}.{f.name}: {v!r} is not binary")
        else:  # StringType
            if not isinstance(v, str):
                raise DumpParseError(
                    f"{table}.{f.name}: expected string, got {v!r}"
                )
            out.append(v)
    return tuple(out)


def finish_casts(df: DataFrame, target: T.StructType) -> DataFrame:
    """JVM-side schema-directed casts from carrier columns to target types.

    Timestamps use the reference's 'YYYY-mm-DD HH:mm:ss' layout (optional
    fractional seconds — datetime(6) columns) under the UTC session zone
    (C1, parquet_writer.rs:167–197).  A non-NULL value that fails its cast
    raises with column context, preserving the reference's C3
    mismatch-is-an-error contract (try_* alone would silently NULL it).
    """
    cols = []
    for f in target.fields:
        if isinstance(f.dataType, T.TimestampType):
            cast = F.expr(
                f"try_to_timestamp(`{f.name}`, 'yyyy-MM-dd HH:mm:ss[.SSSSSS]')"
            )
        elif isinstance(f.dataType, T.DateType):
            cast = F.expr(f"try_cast(`{f.name}` AS date)")
        elif isinstance(f.dataType, T.DecimalType):
            cast = F.expr(f"try_cast(`{f.name}` AS {f.dataType.simpleString()})")
        else:
            cols.append(F.col(f.name).alias(f.name))
            continue
        guarded = F.when(
            F.col(f.name).isNotNull() & cast.isNull(),
            F.raise_error(
                F.concat(
                    F.lit(f"cannot cast {f.name} value '"),
                    F.col(f.name),
                    F.lit(f"' to {f.dataType.simpleString()}"),
                )
            ),
        ).otherwise(cast)
        cols.append(guarded.alias(f.name))
    return df.select(*cols)


#: Upper bound on non-INSERT lines collected to the driver in pass 1 —
#: real dumps have a few hundred; blowing past this means the dump violates
#: the one-INSERT-per-line layout and pass 1 would otherwise OOM the driver.
MAX_DDL_LINES = 2_000_000


#: DDL-pass scan granularity.  ``convert_dump`` scopes the session's
#: ``maxPartitionBytes`` to PARSE_TASK_BYTES (2 MB) for the *parse*
#: stages, but the DDL probe is a pure JVM predicate scan whose per-task
#: cost is dominated by scheduling: at 16 GB, 2 MB splits = 8k tasks =
#: 6.8 s where 128 MB splits = 129 tasks = 0.7 s (measured, idle host).
_DDL_SCAN_SPLIT_BYTES = 128 * 1024 * 1024


def collect_schemas(
    spark: SparkSession, dump_path: str, return_stats: bool = False
):
    """Pass 1: reassemble DDL from the (tiny) non-INSERT line set.

    The collected set also includes INSERT lines *not* terminated by ';' —
    for a one-line-INSERT dump that set is empty, so detection of a
    multi-line layout costs nothing on the fast path; when such lines (or
    orphan '(' continuation lines) appear, :class:`MultilineDumpError` is
    raised and ``convert_dump(multiline='auto')`` switches to byte-range
    reassembly.

    Two single-stage scans, never a ``limit``: a ``limit(N)`` probe on a
    one-line dump can never reach N matching rows, so Spark's incremental
    CollectLimit escalates round by round through EVERY partition — at
    16 GB that measured 49 s of the 110 s convert (sequential barrier
    rounds over 8k 2 MB tasks).  Scan 1 is a map-side aggregate (a few
    scalars to the driver: ddl-line count, multiline-marker count, one
    sample marker, mean INSERT-line bytes) that decides the layout and
    bounds the collect; scan 2 collects the proven-tiny DDL line set.
    Both run at ``_DDL_SCAN_SPLIT_BYTES`` splits: 16 GB ≈ 1.4 s total
    (was 49 s).

    ``return_stats=True`` → ``(schemas, mean_dml_bytes)`` where
    ``mean_dml_bytes`` (None when the dump has no INSERT lines) sizes the
    Arrow statement-crossing batches downstream — the aggregate rides the
    layout scan for free."""
    _require_jvm_text_decodable(dump_path, spark)
    prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(_DDL_SCAN_SPLIT_BYTES)
    )
    try:
        lines_df = spark.read.text(dump_path)
        is_insert = _dml_line_pred()
        terminated = F.rtrim(F.col("value")).endswith(";")
        is_ddl = ~is_insert | ~terminated
        # the multiline-layout markers: tuple-continuation lines and
        # unterminated INSERTs
        is_marker = F.ltrim(F.col("value")).startswith("(") | (
            is_insert & ~terminated
        )
        # the quoted example is the FIRST marker in scan order (min over
        # an (ordinal, line) struct — F.min skips the non-marker nulls),
        # not F.max's lexicographically-largest arbitrary mid-dump line;
        # monotonically_increasing_id is deterministic for a fixed plan
        ordinal = F.monotonically_increasing_id()
        stats = lines_df.select(
            F.when(is_ddl, 1).otherwise(0).alias("d"),
            F.when(is_marker, 1).otherwise(0).alias("m"),
            F.when(is_marker, F.struct(ordinal, F.col("value"))).alias(
                "sample"
            ),
            F.when(is_insert, F.octet_length("value")).alias("ib"),
        ).agg(
            F.sum("d").alias("d"),
            F.sum("m").alias("m"),
            F.min("sample").alias("sample"),
            F.avg("ib").alias("mean_dml"),
        ).collect()[0]
        if stats.m:
            raise MultilineDumpError(
                f"multi-line INSERT statement detected (e.g. "
                f"{str(stats.sample.value)[:60]!r}) — dump lacks one-line "
                "--extended-insert layout"
            )
        if (stats.d or 0) > MAX_DDL_LINES:
            raise MultilineDumpError(
                f"more than {MAX_DDL_LINES:,} non-INSERT lines — this dump "
                "does not use one-line INSERT statements (mysqldump "
                "--extended-insert)"
            )
        # marker-free and ≤ MAX_DDL_LINES: the filtered set is tiny and
        # safe to collect whole (partition order — same ordering contract
        # the CollectLimit path had)
        ddl_lines = [r[0] for r in lines_df.where(is_ddl).collect()]
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
    schemas = build_schemas(iter_statements(ddl_lines))
    _require_tables(schemas, dump_path)
    if return_stats:
        return schemas, stats.mean_dml
    return schemas


def build_schemas(stmts: Iterable[str]) -> dict[str, T.StructType]:
    """CREATE TABLE statements → ``{table: schema}``, fail-loud on
    duplicate table names.

    ``mysqldump --databases`` dumps define tables under a ``USE`` context
    that INSERT statements do not carry, so two databases with a
    same-named table cannot be attributed in a distributed parse.  The
    reference silently *overwrites* the first table's parquet file on
    writer rotation (src/parquet_writer.rs:82–91 keyed by bare table
    name) — data loss; per the C3 fail-loud contract we raise with the
    database context instead and point at the per-database workaround.
    """
    schemas: dict[str, T.StructType] = {}
    table_db: dict[str, str | None] = {}
    current_db: str | None = None
    for stmt in stmts:
        if stmt.upper().startswith("USE ") or stmt.upper().startswith("USE`"):
            current_db = stmt[3:].strip(" `\";") or None
            continue
        if not stmt.startswith("CREATE TABLE"):
            continue
        ts = parse_create_table(stmt)
        if ts.table in schemas:
            first_db = table_db[ts.table]
            ctx = (
                f" (databases {first_db!r} and {current_db!r})"
                if first_db != current_db
                else ""
            )
            raise DumpParseError(
                f"table `{ts.table}` defined twice{ctx} — a multi-database "
                "dump with colliding table names cannot convert to a flat "
                "per-table layout (INSERT statements carry no database "
                "qualifier); dump each database separately: "
                "mysqldump <db> > <db>.sql"
            )
        schemas[ts.table] = ts.schema
        table_db[ts.table] = current_db
    return schemas


# --------------------------------------------------------------------------
# multi-line dump fallback (byte-range-splittable statement reassembly —
# reference parity for dumps without --extended-insert, main.rs:110–145)
# --------------------------------------------------------------------------


#: Byte-range size for splitting a plain multi-line .sql file across
#: reassembly tasks.  Small enough that a single 68 MB file fans out
#: across the cores (~17 ranges); single-table dumps then parse on the
#: same partitions shuffle-free, and multi-table parse stages are sized
#: separately by :func:`parse_partition_counts`.
MULTILINE_SPLIT_BYTES = 4 * 1024 * 1024

#: Statement-batch flush threshold inside a reassembly task (bounds task
#: memory when streaming an unsplittable .gz member).
_STMT_FLUSH_BYTES = 32 * 1024 * 1024



def _is_terminator_line(raw: bytes) -> bool:
    """Byte-level twin of the grammar :func:`iter_statements` applies per
    line: a statement terminates at a NON-noise line whose stripped text
    ends with ';' (noise — blank, ``--`` comment, one-line ``/*...*/;``
    conditional — is skipped there, so it must not anchor a range
    boundary either).  Both neighbors of every split boundary use this
    same classifier, so each statement is owned by exactly one range."""
    s = raw.strip()
    if not s or s.startswith(b"--") or (s.startswith(b"/*") and s.endswith(b"*/;")):
        return False
    return s.endswith(b";")


def _iter_range_statements(path: str, start: int, end: int) -> Iterator[str]:
    """Reassembled statements owned by byte range ``[start, end)`` of a
    plain-text dump file.

    Ownership rule (the multi-line analogue of Hadoop's line ownership,
    which ``dump_datasource.MysqldumpReader`` uses for the one-line
    layout): define A(x) = the end offset of the first terminator line
    whose first byte is ≥ the newline-aligned position of x (A(0) = 0).
    Range [start, end) owns exactly the lines in (A(start), A(end)] —
    region boundaries are statement-terminator line ends, so every
    statement's lines fall in exactly one region, each region reads at
    most one statement past its nominal end, and concatenating regions
    in offset order reproduces the sequential single-stream reassembly
    byte for byte.

    The range body is read in ONE ``fh.read`` and line-split in C (a
    per-line ``readline`` loop measured ~4× slower — it held the whole
    68 MB single-file bench ~1 s behind the one-line layout); only the
    handful of lines past ``end`` stream via ``readline``."""
    lines = _range_owned_lines(path, start, end)
    if not lines:
        return
    text = b"\n".join(lines).decode("utf-8", errors="replace")
    yield from iter_statements(text.split("\n"))


def _range_owned_lines(path: str, start: int, end: int) -> list[bytes]:
    """The raw line set owned by byte range ``[start, end)`` under the
    ownership rule of :func:`_iter_range_statements`."""
    with open(path, "rb") as fh:
        a = 0
        if start > 0:
            # newline-align (LineRecordReader convention: back up one
            # byte so a line starting exactly at `start` is kept)
            fh.seek(start - 1)
            fh.readline()
            a = fh.tell()
        body = fh.read(end - a) if a < end else b""
        if body and not body.endswith(b"\n"):
            # complete the line straddling `end`: it starts before `end`,
            # so it is never a boundary-stop candidate (the next range's
            # alignment consumes it) — no terminator check here
            body += fh.readline()
        # forward scan: every further line starts ≥ end; consume through
        # the first terminator (A(end)), the next range's boundary
        tail: list[bytes] = []
        while True:
            raw = fh.readline()
            if not raw:
                break
            tail.append(raw)
            if _is_terminator_line(raw):
                break
    lines = body.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    lines.extend(ln.rstrip(b"\n") for ln in tail)
    if start > 0:
        # discard through the first terminator line — it ends a statement
        # the PREVIOUS range owns and reads forward to finish.  If that
        # boundary terminator already starts at/after `end`, the region
        # (A(start), A(end)] is empty (range smaller than one statement).
        off = a
        keep = None
        for i, ln in enumerate(lines):
            if _is_terminator_line(ln):
                if off >= end:
                    return []
                keep = i + 1
                break
            off += len(ln) + 1
        if keep is None:
            return []  # no terminator at/after start: own nothing
        lines = lines[keep:]
    return lines


#: Compressed dump-member extensions (reference parity is .gz only,
#: src/main.rs:41–47; ``mysqldump | zstd`` / ``| bzip2`` / ``| xz`` are
#: the common modern pipes).  All are UNSPLITTABLE on the Python decode
#: paths — one task per member file, parallelism per file exactly like
#: the reference's .gz handling.
COMPRESSED_DUMP_EXTS = (".gz", ".bz2", ".xz", ".zst")

#: The subset Spark's JVM text scan decodes transparently (probed r12:
#: Hadoop's GzipCodec handles concatenated members, BZip2Codec is pure
#: Java AND splittable, ZStandardCodec rides the bundled zstd-jni).
#: ``.xz`` has NO Hadoop codec — ``spark.read.text`` would hand the raw
#: compressed bytes back as garbage "lines", so .xz inputs are routed
#: through the Python-decoded reassembly path (``convert_dump``) and
#: fail loudly everywhere else (:func:`_require_jvm_text_decodable`).
JVM_TEXT_DECODABLE_EXTS = (".gz", ".bz2", ".zst")


class _ZstdTextStream:
    """Streamed text over ``zstd -dc`` (context manager + line iterator).

    There is no zstd module in the Python stdlib (3.11) and executors
    cannot call into the JVM, so Python-side member decode shells out to
    the ``zstd`` CLI and streams its stdout — the same one-member-one-
    task shape as the gzip path, decode running in a separate process
    (free decode/parse overlap).  Fails loudly if the binary is missing
    or exits nonzero after a fully-drained stream; an early consumer
    close (SIGPIPE) is not an input error."""

    def __init__(self, path: str):
        import io
        import shutil
        import subprocess

        exe = shutil.which("zstd") or shutil.which("unzstd")
        if exe is None:
            raise DumpParseError(
                f"{path}: reading .zst dumps on this code path needs the "
                "zstd CLI on PATH (Python has no stdlib zstd codec); "
                "install zstd or recompress with gzip/bzip2"
            )
        self._path = path
        self._proc = subprocess.Popen(
            [exe, "-dc", "-q", "--", path],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        self._text = io.TextIOWrapper(
            self._proc.stdout, encoding="utf-8", errors="replace"
        )
        self._drained = False

    def __iter__(self):
        for line in self._text:
            yield line
        self._drained = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def close(self):
        self._text.close()
        err = self._proc.stderr.read() if self._proc.stderr else b""
        if self._proc.stderr:
            self._proc.stderr.close()
        rc = self._proc.wait()
        if rc != 0 and self._drained:
            raise DumpParseError(
                f"{self._path}: zstd decompression failed (exit {rc}): "
                f"{err.decode(errors='replace').strip()}"
            )


def _open_dump_text(path: str):
    """Streamed text handle for a possibly-compressed dump member —
    extension-dispatched, stdlib codecs where they exist (.gz/.bz2/.xz),
    the zstd CLI for .zst.  Memory stays bounded by one line."""
    kw = dict(encoding="utf-8", errors="replace")
    if path.endswith(".gz"):
        import gzip

        return gzip.open(path, "rt", **kw)
    if path.endswith(".bz2"):
        import bz2

        return bz2.open(path, "rt", **kw)
    if path.endswith(".xz"):
        import lzma

        return lzma.open(path, "rt", **kw)
    if path.endswith(".zst"):
        return _ZstdTextStream(path)
    return open(path, "r", **kw)


def _iter_member_statements(path: str) -> Iterator[str]:
    """Statements from an unsplittable compressed member, streamed
    line-by-line (no whole-file string: memory is bounded by one
    statement, not one file — arbitrarily large members are fine, just
    single-task)."""
    with _open_dump_text(path) as fh:
        yield from iter_statements(fh)


def _require_jvm_text_decodable(
    dump_path: str, spark: SparkSession | None = None
) -> None:
    """Loud guard for ``spark.read.text`` call sites: .xz has no Hadoop
    codec, so the JVM scan would hand the raw compressed bytes back as
    garbage "lines" and the parse would fail confusingly downstream (or
    worse).  Without ``spark`` this is a string-suffix check only (no
    listing job), which a glob/directory pattern matching .xz members
    slips past (ADVICE r12) — pass ``spark`` to pay one file-status
    listing on non-decisive patterns and close that hole.
    ``convert_dump`` instead routes .xz members found by its own listing
    through the Python-decoded reassembly path, which handles them."""
    p = str(dump_path)
    is_xz = p.endswith(".xz")
    if not is_xz and spark is not None and not p.endswith(
        (".sql", ".gz", ".bz2", ".zst")
    ):
        is_xz = _has_xz_members(spark, dump_path)
    if is_xz:
        raise DumpParseError(
            f"{dump_path}: .xz is not JVM-decodable (Hadoop has no xz "
            "codec); use convert_dump (routes .xz through Python-side "
            "reassembly decode) or recompress with zstd/gzip/bzip2"
        )


def _has_xz_members(spark: SparkSession, dump_path: str) -> bool:
    """Does ``dump_path`` (path or glob) match any .xz member?  Decided
    WITHOUT a listing job when the pattern itself is decisive (a glob
    ending in .sql/.gz/.bz2/.zst cannot match .xz); ambiguous patterns
    pay one file-status listing.

    Only a no-files-matched listing answers False — any OTHER listing
    failure (permissions, transient FS fault) re-raises: swallowing it
    would silently route a glob that DOES contain .xz onto the JVM text
    scan, resurfacing the garbage-lines failure this guard exists to
    prevent one layer deeper (VERDICT r12 nit #1)."""
    p = str(dump_path)
    if p.endswith(".xz"):
        return True
    if p.endswith((".sql", ".gz", ".bz2", ".zst")):
        return False
    from pyspark.errors import AnalysisException

    try:
        files = (
            spark.read.format("binaryFile")
            .load(dump_path)
            .select("path")
            .collect()
        )
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            # no files: let the caller's own scan raise its own error
            return False
        raise
    return any(r.path.endswith(".xz") for r in files)


def _local_path(uri: str) -> str:
    """Hadoop file-status URI → OS path for Python ``open``."""
    from urllib.parse import unquote, urlparse

    p = urlparse(uri)
    if p.scheme in ("", "file"):
        return unquote(p.path) or uri
    raise DumpParseError(
        f"{uri}: multi-line reassembly reads byte ranges through the "
        "local filesystem (file:// or a mounted path); stage the dump "
        "locally or re-export with mysqldump --extended-insert for the "
        "fully splittable one-line layout"
    )


def _multiline_ranges(
    spark: SparkSession, dump_path: str, split_bytes: int | None = None
) -> list[tuple[str, int, int]]:
    """(path, start, end) reassembly ranges for a multi-line dump; end=-1
    marks an unsplittable compressed member streamed whole."""
    step = split_bytes or MULTILINE_SPLIT_BYTES
    files = (
        spark.read.format("binaryFile")
        .load(dump_path)
        .select("path", "length")  # file status only; content column is
        .collect()                 # never materialized
    )
    ranges: list[tuple[str, int, int]] = []
    for r in files:
        p = _local_path(r.path)
        if p.endswith(COMPRESSED_DUMP_EXTS):
            ranges.append((p, 0, -1))  # -1 → stream whole member
        else:
            for off in range(0, max(int(r.length), 1), step):
                ranges.append((p, off, min(off + step, int(r.length))))
    if not ranges:
        raise DumpParseError(f"{dump_path}: no dump files found")
    return ranges


def _range_statements(path: str, lo: int, hi: int) -> Iterator[str]:
    """Statements owned by one reassembly range (gz-aware dispatch)."""
    if hi < 0:
        return _iter_member_statements(path)
    return _iter_range_statements(path, lo, hi)


def _range_ddl_statements(path: str, lo: int, hi: int) -> Iterator[str]:
    """CREATE TABLE / USE statements owned by one range, skipping INSERT
    bodies at the bytes level (no decode, no join): a multi-line dump's
    bytes are overwhelmingly tuple-continuation lines, and pass 1 only
    needs the DDL.  Candidate statements are re-assembled through the
    SAME grammar (:func:`iter_statements`) so cleanup/noise semantics
    cannot drift; overcollection (e.g. a ``USES...`` statement) is
    filtered there, and undercollection is impossible because every
    statement start is prefix-tested."""
    if hi < 0:
        yield from (
            s
            for s in _iter_member_statements(path)
            if not s.startswith(DML_PREFIXES)
        )
        return
    buf: list[bytes] = []
    in_stmt = False
    collecting = False
    for ln in _range_owned_lines(path, lo, hi):
        s = ln.strip()
        if (
            not s
            or s.startswith(b"--")
            or (s.startswith(b"/*") and s.endswith(b"*/;"))
        ):
            continue
        if not in_stmt:
            in_stmt = True
            collecting = s.startswith(b"CREATE TABLE") or s[:3].upper() == b"USE"
        if collecting:
            buf.append(ln)
        if s.endswith(b";"):
            in_stmt = False
            collecting = False
    if buf:
        text = b"\n".join(buf).decode("utf-8", errors="replace")
        yield from (
            s
            for s in iter_statements(text.split("\n"))
            if not s.startswith(DML_PREFIXES)
        )


def _ranges_df(spark: SparkSession, ranges) -> DataFrame:
    """Ranges → one-row-per-range DataFrame at one range per task (the
    reassembly is the scan stage; ranges are uniform-size by
    construction).  ``parallelize(·, numSlices)`` pins the layout in a
    single stage — a ``repartition`` achieves the same spread through an
    extra shuffle stage that measured ~0.4 s of pure scheduling on the
    68 MB bench."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(ranges, len(ranges)),
        "path string, start long, end long",
    )


def multiline_stmts_df(
    spark: SparkSession, dump_path: str, split_bytes: int | None = None
) -> DataFrame:
    """One-statement-per-row DataFrame (column ``value``) for a dump
    whose INSERT statements span lines (no ``--extended-insert``).

    Plain ``.sql`` files are carved into ``MULTILINE_SPLIT_BYTES`` ranges
    and reassembled in parallel under the ownership rule of
    :func:`_iter_range_statements` — a 68 MB single file fans out across
    the cores instead of occupying one task (the round-4 wholetext path's
    ceiling, 9.1 MB/s).  ``.gz`` members are not seekable → one task per
    member.  The result feeds the SAME downstream machinery as the
    one-line layout (:func:`insert_rows_df` with ``lines_df=``): JVM-side
    per-table prefix filter, byte-share parse sizing, Arrow-CSV fast
    path."""
    import pandas as pd

    ranges = _multiline_ranges(spark, dump_path, split_bytes)

    def reassemble(batches):
        for pdf in batches:
            for path, lo, hi in pdf.itertuples(index=False):
                it = _range_statements(path, int(lo), int(hi))
                out: list[str] = []
                size = 0
                for stmt in it:
                    out.append(stmt)
                    size += len(stmt)
                    if size >= _STMT_FLUSH_BYTES:
                        yield pd.DataFrame(
                            {"value": pd.Series(out, dtype="object")}
                        )
                        out, size = [], 0
                if out:
                    yield pd.DataFrame(
                        {"value": pd.Series(out, dtype="object")}
                    )

    return _ranges_df(spark, ranges).mapInPandas(reassemble, "value string")


def collect_schemas_multiline(
    spark: SparkSession, dump_path: str, stmts_df: DataFrame | None = None
) -> dict[str, T.StructType]:
    """Pass 1 for multi-line dumps: parallel range reassembly, then the
    (tiny) CREATE TABLE / USE statement set collected to the driver.
    Pass the persisted ``stmts_df`` to share one reassembly with the
    per-table parse passes; without one, a map-only DDL scan filters
    Python-side so INSERT text never crosses to the JVM."""
    import pandas as pd

    if stmts_df is not None:
        # iter_statements yields only CREATE TABLE / DML / USE, so the
        # non-DML remainder is exactly the DDL+context set.
        stmts = [r.value for r in stmts_df.where(~_dml_line_pred()).collect()]
        schemas = build_schemas(stmts)
        _require_tables(schemas, dump_path)
        return schemas

    def ddl_only(batches):
        for pdf in batches:
            out = []
            for path, lo, hi in pdf.itertuples(index=False):
                out.extend(_range_ddl_statements(path, int(lo), int(hi)))
            yield pd.DataFrame({"value": pd.Series(out, dtype="object")})

    rdf = _ranges_df(spark, _multiline_ranges(spark, dump_path))
    stmts = [r.value for r in rdf.mapInPandas(ddl_only, "value string").collect()]
    schemas = build_schemas(stmts)
    _require_tables(schemas, dump_path)
    return schemas


def insert_rows_df_multiline_fused(
    spark: SparkSession,
    dump_path: str,
    table: str,
    schema: T.StructType,
    split_bytes: int | None = None,
) -> DataFrame:
    """Pass 2 for a multi-line dump table: range reassembly and
    statement parse fused into one ``mapInArrow`` stage.

    The statements-DataFrame route (``multiline_stmts_df`` →
    :func:`insert_rows_df`) crosses the full statement text
    Python→JVM→Python around the persisted cache — measured ~1.3 s of a
    3.5 s wall on the 68 MB single-file bench.  Fusing keeps the text
    inside one Python worker per range; only parsed CARRIER batches
    cross, exactly like the one-line layout's scan→parse stage.  For
    multi-table dumps each table's job re-reads the raw ranges
    (Python-side skip of foreign statements is cheap relative to the
    cache's Arrow crossing: 2× end-to-end at 68 MB/8–32 tables); the
    shared statements cache takes over once ``tables × corpus`` exceeds
    MULTILINE_FUSED_SCAN_BUDGET — see ``convert_dump``."""
    carrier = T.StructType([carrier_field(f) for f in schema.fields])
    ranges = _multiline_ranges(spark, dump_path, split_bytes)

    def fused(arrow_batches):
        def grouped(it):
            # flush in bounded statement groups: a plain range is ~one
            # group; an unsplittable .gz member streams without ever
            # holding its whole decompressed text
            buf: list[str] = []
            size = 0
            for s in it:
                buf.append(s)
                size += len(s)
                if size >= _STMT_FLUSH_BYTES:
                    yield buf
                    buf, size = [], 0
            if buf:
                yield buf

        for batch in arrow_batches:
            for i in range(batch.num_rows):
                path = batch.column(0)[i].as_py()
                lo = batch.column(1)[i].as_py()
                hi = batch.column(2)[i].as_py()
                for group in grouped(_range_statements(path, lo, hi)):
                    yield from _parse_stmts_to_arrow(
                        group, table, schema, carrier
                    )

    raw = _ranges_df(spark, ranges).mapInArrow(fused, carrier)
    return finish_casts(raw, schema)


#: Parse-stage task granularity: ~2 MB of INSERT text per task keeps the
#: Python tokenizer busy for ~0.5 s — large against the per-task Arrow
#: round-trip, small enough to smooth skew across cores.
PARSE_TASK_BYTES = 2 * 1024 * 1024

#: Target bytes per Arrow batch when statement text crosses JVM→Python
#: (the mapInArrow line scans).  Spark's only knob is rows per batch
#: (no byte cap exists in 4.1), so the row count is derived from the
#: dump's measured mean statement size — see :func:`_stmt_cross_rows`.
_STMT_CROSS_BATCH_BYTES = 32 * 1024 * 1024


def _mean_dml_bytes(spark: SparkSession, dump_path: str):
    """Mean INSERT-line byte length — one single-stage map-side aggregate
    (None when the dump has no INSERT lines).  Used by direct
    :func:`convert_dump_onepass` callers that pass precomputed schemas;
    ``convert_dump`` gets the same number for free from the DDL pass."""
    _require_jvm_text_decodable(dump_path, spark)  # before the conf
    # save/set pair: a raised guard must not leak the 2 MB DDL-scan
    # split size into the session (ADVICE r12)
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(_DDL_SCAN_SPLIT_BYTES)
    )
    try:
        return (
            spark.read.text(dump_path)
            .select(
                F.when(_dml_line_pred(), F.octet_length("value")).alias("ib")
            )
            .agg(F.avg("ib"))
            .collect()[0][0]
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def _stmt_cross_rows(mean_stmt_bytes, session_rows: int = 10_000) -> int:
    """Rows per Arrow crossing batch targeting ~_STMT_CROSS_BATCH_BYTES.

    Floor 16 (a degenerate dump of giant statements still amortizes the
    per-batch crossing); never RAISED above ``session_rows`` (the
    session's configured ``arrow.maxRecordsPerBatch``) — a user who
    lowered the conf to bound executor memory keeps their bound; the
    sizing only ever tightens it, so the floor itself is clamped to the
    session value when the user set it below 16.  Spark documents zero
    or negative as "no limit" — that sentinel means NO user bound (the
    byte-targeted sizing applies freely), not a 1-row bound."""
    if session_rows <= 0:  # Spark's unlimited sentinel
        if not mean_stmt_bytes:
            return 10_000  # no stats: fall back to Spark's default bound
        return max(16, int(_STMT_CROSS_BATCH_BYTES / mean_stmt_bytes))
    cap = session_rows
    floor = min(16, cap)
    if not mean_stmt_bytes:
        return cap
    return max(floor, min(cap, int(_STMT_CROSS_BATCH_BYTES / mean_stmt_bytes)))


def parse_partition_counts(
    lines_df: DataFrame, cores: int, n_tables: int
) -> dict[str, int]:
    """Per-table parse-stage partition counts from each table's actual
    byte share of the dump.

    One lightweight aggregate over the (cached) INSERT lines replaces the
    old one-size-fits-all ``repartition(2 × cores)``: with T tables that
    scheme launches ``T × 2 × cores`` tasks no matter how small each
    table is, and the per-task overhead (Arrow round-trip, scheduling)
    dwarfs the parse work — measured 5× end-to-end slowdown at 8 tables.
    Sizing by bytes keeps every task ≥ ~PARSE_TASK_BYTES while still
    fanning wide enough to fill the cores across concurrent table jobs.
    """
    # regexp over a 96-byte prefix, not the full (multi-KB) statement:
    # halves this aggregate's cost at 2 GB (2.8 → 1.5 s measured).  96
    # covers the longest prefix + a 64-char table name (MySQL's limit).
    tbl = F.regexp_extract(
        F.substring("value", 1, 96),
        r'^(?:INSERT\s+(?:IGNORE\s+)?|REPLACE\s+)INTO\s+[`"]?([^`"\s(]+)',
        1,
    )
    rows = (
        lines_df.select(tbl.alias("tbl"), F.length("value").alias("len"))
        .groupBy("tbl")
        .agg(F.sum("len").alias("bytes"))
        .collect()
    )
    # Fill the machine: aim for ~2×cores concurrently runnable tasks
    # across all table jobs, but never tasks smaller than ~1/8 of the
    # target chunk.  Parse tasks target 4×PARSE_TASK_BYTES (~8 MB): the
    # mapInArrow worker round-trip dominates 2 MB tasks (single-table
    # sweep: 2 MB tasks 1.77 s vs 8 MB tasks 1.07 s on 256 MB), and
    # with T tables running concurrently the per-table fan-out only
    # needs to fill its slice of the cores, not all of them.
    fair_share = max(1, (2 * cores) // max(1, n_tables))
    chunk = 4 * PARSE_TASK_BYTES
    out = {}
    for r in rows:
        by_bytes = -(-int(r["bytes"]) // chunk)  # ceil
        cap = max(1, -(-int(r["bytes"]) // (PARSE_TASK_BYTES // 8)))
        out[r["tbl"]] = max(1, min(max(by_bytes, min(fair_share, cap)), 2 * cores))
    return out


def insert_rows_df(
    spark: SparkSession,
    dump_path: str,
    table: str,
    schema: T.StructType,
    lines_df: DataFrame | None = None,
    parse_partitions: int | None = None,
) -> DataFrame:
    """Pass 2 (per table): parallel parse of that table's INSERT lines.

    The parse runs inside ``mapInArrow`` — statement batches arrive as
    Arrow and parsed CARRIER columns leave as Arrow, so the fast path's
    ``read_csv`` output crosses into the JVM with no pandas round-trip
    and no per-row Python objects (the row-at-a-time pickle path of an
    RDD ``createDataFrame`` measured ~5× slower end-to-end even via
    pandas; dropping pandas removed the nullable-dtype hop too).  Lines
    are spread across all cores first: a dump file yields few input
    splits relative to the CPU cost of parsing."""
    carrier = T.StructType([carrier_field(f) for f in schema.fields])
    if lines_df is None:
        _require_jvm_text_decodable(dump_path, spark)
        lines_df = spark.read.text(dump_path).where(_dml_line_pred())
    # JVM-side per-table prefilter: without it, every table's pass would
    # repartition and Python-tokenize ALL tables' INSERT lines (O(tables ×
    # dump) parse work) with only the per-statement name check discarding
    # foreign rows.  mysqldump writes the table name back-quoted, but cover
    # the bare/double-quoted spellings too; the Python-side name check stays
    # as the correctness guard.
    tbl_prefixes = [
        kw + spelling
        for kw in DML_PREFIXES
        for spelling in (f" `{table}`", f' "{table}"', f" {table} ", f" {table}(")
    ]
    pred = F.col("value").startswith(tbl_prefixes[0])
    for p in tbl_prefixes[1:]:
        pred = pred | F.col("value").startswith(p)
    lines_df = lines_df.where(pred)
    # Spread lines across cores before the CPU-heavy parse — but only when
    # the input itself is under-split (a single .sql/.sql.gz file → 1-few
    # scan tasks).  A many-file dump already provides the parallelism, and
    # a full shuffle of raw dump text at 100 TB would dwarf the parse cost.
    # ``parse_partitions`` (from :func:`parse_partition_counts`) sizes the
    # stage to the table's byte share; the 2×cores fallback covers direct
    # single-table calls.
    cores = spark.sparkContext.defaultParallelism
    target = parse_partitions if parse_partitions is not None else 2 * cores
    cur = lines_df.rdd.getNumPartitions()
    # Without a byte-share target, "under-split" keeps its conservative
    # meaning (fewer splits than cores) so a well-split many-file dump
    # never shuffles its raw text.
    threshold = cores if parse_partitions is None else target
    if cur < threshold:
        # Under-split input (single .sql/.sql.gz → few scan tasks): balance
        # with a shuffle of just this table's bytes.
        if cur != target:
            lines_df = lines_df.repartition(target)
    elif parse_partitions is not None and cur > 4 * target:
        # Grossly over-split for this table's share (many-file dump, small
        # table): merge WITHOUT a shuffle — scheduling thousands of
        # near-empty Arrow tasks costs more than the parse itself.
        lines_df = lines_df.coalesce(target)
    elif parse_partitions is None and cur > cores:
        # Direct-call over-split (large single file at the 2 MB scan
        # granularity): merge to one task per core, still shuffle-free.
        # The mapInArrow worker round-trip dominates 2 MB tasks —
        # measured on a 256 MB single-table dump: 129×2 MB tasks 1.77 s,
        # 64 tasks 1.40 s, 32 tasks (= cores, one wave) 1.07 s.  Splits
        # stay 2 MB on disk, so coalesced tasks read contiguous ranges
        # of uniform byte size — no straggler risk from the merge.
        lines_df = lines_df.coalesce(cores)
    def parse_batches(arrow_batches):
        """Statement batches in, CARRIER-typed Arrow batches out — via
        ``mapInArrow``, so the fast path's ``read_csv`` output crosses
        into the JVM with no pandas round-trip and no per-row Python
        objects; only fallback statements materialize Python values."""
        for batch in arrow_batches:
            yield from _parse_stmts_to_arrow(
                batch.column(0).to_pylist(), table, schema, carrier
            )

    raw = lines_df.mapInArrow(parse_batches, carrier)
    return finish_casts(raw, schema)


def _parse_stmts_to_arrow(stmts, table: str, schema: T.StructType, carrier):
    """One group of INSERT statements → CARRIER-typed Arrow batches (the
    shared parse core of the line path and the fused multi-line path).

    Statements for other tables are skipped; fast-path-eligible ones
    accumulate into a single Arrow-CSV read; the rest (and any fast
    group whose typed cast fails) go through the exhaustive tokenizer —
    identical C1–C3 error semantics on both paths."""
    import pyarrow as pa

    names = [f.name for f in schema.fields]
    fast_types = _arrow_fast_types(schema)
    has_col_list_re = _INSERT_COLS_RE
    carrier_pa = pa.schema(
        [
            pa.field(f.name, _carrier_pa_type(f.dataType), True)
            for f in carrier.fields
        ]
    )

    def slow_batches(group):
        rows: list[dict] = []
        for stmt in group:
            _, ins_cols, tuples = parse_insert_full(stmt)
            for tup in tuples:
                if ins_cols is not None:  # --complete-insert dumps
                    tup = align_row(tup, ins_cols, schema, table)
                rows.append(dict(zip(names, coerce_row(tup, schema, table))))
        return pa.Table.from_pylist(rows, schema=carrier_pa).to_batches()

    slow_stmts: list[str] = []
    fast_stmts: list[str] = []
    fast_chunks: list[bytes] = []
    fast_rows = 0
    for stmt in stmts:
        stmt = stmt.strip().rstrip(";") + ";"
        if insert_table_name(stmt) != table:
            continue
        if fast_types is not None and not has_col_list_re.match(stmt):
            fb = _values_csv_bytes(stmt)
            if fb is not None:
                fast_stmts.append(stmt)
                fast_chunks.append(fb[0])
                fast_rows += fb[1]
                continue
        slow_stmts.append(stmt)
    if fast_chunks:
        try:
            tbl = _arrow_read_values(b"\n".join(fast_chunks), names, fast_types)
            if tbl.num_rows != fast_rows:
                raise DumpParseError("fast-path row-count drift")
            # non-finite literal rejection lives inside
            # _arrow_read_values (NaN must be counted Arrow-side,
            # before nulls blur into NaN in a numpy view)
            yield from tbl.to_batches()
        except Exception:
            # any conversion surprise: re-parse those statements
            # through the exhaustive grammar, which parses them
            # correctly or raises the contextual DumpParseError
            slow_stmts = fast_stmts + slow_stmts
    if slow_stmts or not fast_chunks:
        yield from slow_batches(slow_stmts)


#: Per-table statement-buffer flush threshold inside a one-pass task
#: (one Arrow parse + one parquet row group per flush).
_ONEPASS_FLUSH_BYTES = 32 * 1024 * 1024

#: Input split size for the one-pass scan: big enough that a task's
#: per-table row groups stay healthy even when tables interleave.
_ONEPASS_SPLIT_BYTES = 64 * 1024 * 1024


#: Orphaned staging directories older than this are swept at the start
#: of the next one-pass convert into the same output dir.  A hard
#: driver crash is the only way to orphan one (every in-process failure
#: removes staging in the ``finally``); readers never see them anyway
#: (the ``_`` prefix is hidden from Hadoop/Spark listings), so the sweep
#: is purely a storage-reclaim courtesy.  24 h >> any convert, so a
#: concurrent live convert's staging is never at risk.  The object-store
#: analog is a lifecycle rule on the ``_staging_`` prefix —
#: ARCHITECTURE.md "One-pass commit on object stores".
_STAGING_GC_AGE_S = 24 * 3600


def _staging_newest_mtime(root: str) -> float:
    """Newest mtime anywhere under ``root`` (the root itself included).

    Liveness must be judged on the TREE, not the root directory: tasks
    write into nested per-table subdirectories, which never refresh the
    root's mtime, so a legitimately long convert (>24 h is plausible at
    the tens-of-TB single-node point the ingest curve reaches) would
    look stale at the root while its leaves are seconds old
    (VERDICT r12 nit #2 / ADVICE r12)."""
    try:
        newest = os.path.getmtime(root)
    except OSError:
        return 0.0
    for dirpath, dirnames, filenames in os.walk(root):
        for name in dirnames + filenames:
            try:
                m = os.path.getmtime(os.path.join(dirpath, name))
            except OSError:
                continue  # raced with its own cleanup — fine
            if m > newest:
                newest = m
    return newest


def _gc_orphaned_staging(out_abs: str) -> None:
    """Remove ``_staging_*`` leftovers from crashed runs (see
    ``_STAGING_GC_AGE_S``).  A tree counts as orphaned only when its
    NEWEST member is past the age cutoff — a fresh leaf under a stale
    root marks a live concurrent convert and is left alone.  The root
    check short-circuits the walk for the common fresh case."""
    import shutil as _shutil
    import time as _time

    try:
        entries = os.listdir(out_abs)
    except OSError:
        return
    cutoff = _time.time() - _STAGING_GC_AGE_S
    for name in entries:
        if not name.startswith("_staging_"):
            continue
        p = os.path.join(out_abs, name)
        try:
            if os.path.getmtime(p) >= cutoff:
                continue  # root itself fresh — certainly live
        except OSError:
            continue  # raced with its own cleanup — fine
        if _staging_newest_mtime(p) < cutoff:
            _shutil.rmtree(p, ignore_errors=True)


def _probe_staging_visibility(spark: SparkSession, staging: str) -> None:
    """One executor task writes a marker under ``staging``; the driver
    must be able to stat it, or the one-pass commit protocol (task-side
    pyarrow writers + driver-side move) cannot work on this cluster.

    The task creates the marker's directory itself and reports OSErrors
    as data instead of raising: on a node-local-disk cluster the
    driver-side ``makedirs`` did not happen on the executor's node, so
    a bare ``open`` would die as an opaque 4×-retried task failure
    (Py4JJavaError) rather than the diagnostic this probe exists to
    give (ADVICE r6 review)."""
    marker = os.path.join(staging, "_driver_visibility_probe")

    def _write(_):
        try:
            os.makedirs(os.path.dirname(marker), exist_ok=True)
            with open(marker, "w") as fh:
                fh.write("ok")
            return []
        except OSError as e:  # unwritable path on the executor's node
            return [repr(e)]

    errs = spark.sparkContext.parallelize([0], 1).flatMap(_write).collect()
    if errs or not os.path.exists(marker):
        detail = f" (executor error: {errs[0]})" if errs else ""
        raise OnepassStagingInvisible(
            f"an executor wrote {marker!r} but the driver cannot see it"
            f"{detail} — output filesystem is not shared between driver "
            "and executors; use strategy='per_table' or point output_dir "
            "at a shared mount"
        )
    os.unlink(marker)


def parse_compression(spec: str) -> tuple[str, int | None]:
    """Split a ``codec[:level]`` compression spec — e.g. ``snappy``,
    ``zstd``, ``zstd:3``, ``lz4`` — into (codec, level).  Levels only
    make sense for level-bearing codecs (zstd, gzip, brotli); a level on
    anything else is rejected loudly rather than silently dropped."""
    codec, sep, level = spec.partition(":")
    codec = codec.strip().lower()
    if not sep:
        return codec, None
    if codec not in ("zstd", "gzip", "brotli"):
        raise ValueError(
            f"compression codec {codec!r} does not take a level "
            f"(got {spec!r})"
        )
    try:
        return codec, int(level)
    except ValueError:
        raise ValueError(f"bad compression level in {spec!r}") from None


def convert_dump_onepass(
    spark: SparkSession,
    dump_path: str,
    output_dir: str,
    compression: str = "snappy",
    schemas: dict[str, T.StructType] | None = None,
    multiline: bool = False,
    stmt_batch_rows: int | None = None,
) -> dict[str, int]:
    """ONE-pass multi-table conversion: each task parses its byte range
    of the dump and writes EVERY table it sees straight to parquet.

    The classic per-table design persists the statement text and runs
    one job per table — the JVM prefix filter then re-reads the whole
    cache T times (T × corpus of storage traffic: measured the dominant
    cost at 2 GB / 16 tables).  Here the dump text is read exactly once,
    statements group by table inside the task, and per-table
    ``pyarrow.parquet`` writers emit final-typed row groups (the same
    carrier→target Arrow casts the DataSource reader uses — identical
    C1–C3 semantics, fast-path fallbacks included).

    Commit protocol (v1-style, speculation-safe): tasks write to
    ``{output_dir}/_staging_{job}/`` under attempt-unique filenames and
    RETURN (table, path, rows) rows; only files reported by the one
    successful attempt per partition are moved into place by the
    driver, then staging is deleted — an orphaned duplicate attempt can
    never surface.  Executors must share the output filesystem with the
    driver (local / NFS / fuse-mounted DFS — same contract as the
    DataSource writer); ``convert_dump`` falls back to the per-table
    path otherwise.

    ``multiline=True`` swaps the statement source from JVM text lines to
    the byte-range reassembly (:func:`_range_statements`) — the same
    single-scan/commit machinery then serves the no---extended-insert
    layout, with no per-table re-read at any table count."""
    import shutil as _shutil
    import uuid

    from .dump_datasource import _carrier_to_target, _pa_schema

    if not multiline:
        _require_jvm_text_decodable(dump_path, spark)
    if "://" in output_dir:
        # os.path.abspath('s3://bucket/out') would silently mangle the
        # URI into '<cwd>/s3:/bucket/out' and "succeed" locally while
        # the caller believes the data went to the object store
        # (ADVICE r5, medium).  The per-table strategy's JVM DataFrame
        # writers are the remote-output path.
        raise ValueError(
            "onepass writes through driver-side filesystem moves; "
            f"output_dir {output_dir!r} has a scheme os.path cannot "
            "address — use strategy='per_table' (or 'auto') for "
            "object-store output"
        )
    session_rows = int(
        spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    )
    stmt_rows = stmt_batch_rows
    if schemas is None:
        if multiline:
            schemas = collect_schemas_multiline(spark, dump_path)
        else:
            schemas, mean_dml = collect_schemas(
                spark, dump_path, return_stats=True
            )
            if stmt_rows is None:
                stmt_rows = _stmt_cross_rows(mean_dml, session_rows)
    elif stmt_rows is None and not multiline:
        # Precomputed schemas skip the stats-bearing DDL pass, but the
        # line crossing still needs byte-sized batches — the session
        # default of 10,000 rows × real extended-INSERT statements
        # (~100 KB–1 MB) accumulates ~1–8 GB of JVM Arrow buffers per
        # in-flight task (the 90 vs 314 MB/s pathology documented in
        # convert_dump).  One cheap single-stage aggregate recovers the
        # mean; convert_dump avoids it by passing stmt_batch_rows.
        stmt_rows = _stmt_cross_rows(
            _mean_dml_bytes(spark, dump_path), session_rows
        )
    pa_schemas = {t: _pa_schema(s) for t, s in schemas.items()}
    if any(v is None for v in pa_schemas.values()):
        raise DumpParseError(
            "onepass: a table has a column type with no Arrow mapping"
        )
    carriers = {
        t: T.StructType([carrier_field(f) for f in s.fields])
        for t, s in schemas.items()
    }
    out_abs = os.path.abspath(output_dir)
    _gc_orphaned_staging(out_abs)
    staging = os.path.join(out_abs, f"_staging_{uuid.uuid4().hex}")
    os.makedirs(staging, exist_ok=True)
    # A scheme-less path on a multi-node cluster may still be plain
    # node-local disk — tasks would write staging files on their own
    # nodes and the failure would only surface as FileNotFoundError at
    # the driver's final move, after the entire parse (ADVICE r5, low).
    # Probe once in milliseconds instead.  local[...] / local-cluster
    # masters run on this machine by construction — skip the job.
    # On probe failure, remove the just-created staging dir: the main
    # try/finally cleanup starts later, and a stray _staging_<uuid>
    # would otherwise accumulate in the user's output dir per retry.
    if not spark.sparkContext.master.startswith("local"):
        try:
            _probe_staging_visibility(spark, staging)
        except BaseException:
            _shutil.rmtree(staging, ignore_errors=True)
            raise

    def run_task(stmt_iter):
        """Shared task body: statements (any table, any source) →
        per-table parquet files in staging + one report RecordBatch."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        bufs: dict[str, list] = {}  # table -> [stmts, byte_size]
        writers: dict[str, list] = {}  # table -> [writer, path, rows]

        def flush(table: str) -> None:
            stmts, _n = bufs.pop(table)
            schema = schemas[table]
            try:
                batches = list(
                    _parse_stmts_to_arrow(stmts, table, schema, carriers[table])
                )
                if not batches:
                    return
                final = _carrier_to_target(
                    pa.Table.from_batches(batches), schema, pa_schemas[table]
                )
            except DumpParseError:
                raise
            except Exception:
                # carrier→target cast surprise: exhaustive re-parse —
                # values the slow path can represent still convert, and
                # a genuinely bad value raises the contextual C1/C3
                # error (same fallback contract as the DataSource reader)
                from .dump_datasource import _finalize_row

                names = [f.name for f in schema.fields]
                rows = []
                for stmt in stmts:
                    _t, cols, tuples = parse_insert_full(stmt)
                    for tup in tuples:
                        if cols is not None:
                            tup = align_row(tup, cols, schema, table)
                        rows.append(
                            dict(
                                zip(
                                    names,
                                    _finalize_row(
                                        coerce_row(tup, schema, table),
                                        schema,
                                        table,
                                    ),
                                )
                            )
                        )
                if not rows:
                    return
                final = pa.Table.from_pylist(rows, schema=pa_schemas[table])
            if table not in writers:
                d = os.path.join(staging, table)
                os.makedirs(d, exist_ok=True)
                path = os.path.join(
                    d, f"part-{pid:05d}-{uuid.uuid4().hex}.parquet"
                )
                codec, level = parse_compression(compression)
                writers[table] = [
                    pq.ParquetWriter(
                        path,
                        final.schema,
                        compression=codec,
                        compression_level=level,
                    ),
                    path,
                    0,
                ]
            w = writers[table]
            w[0].write_table(final)
            w[2] += final.num_rows

        for stmt in stmt_iter:
            table = insert_table_name(stmt.strip())
            if table not in schemas:
                continue  # orphan INSERT: no CREATE TABLE (W3 parity)
            buf = bufs.setdefault(table, [[], 0])
            buf[0].append(stmt)
            buf[1] += len(stmt)
            if buf[1] >= _ONEPASS_FLUSH_BYTES:
                flush(table)
        for table in list(bufs):
            flush(table)
        report = [(t, w[1], w[2]) for t, w in writers.items()]
        for w in writers.values():
            w[0].close()
        return pa.RecordBatch.from_arrays(
            [
                pa.array([r[0] for r in report], pa.string()),
                pa.array([r[1] for r in report], pa.string()),
                pa.array([r[2] for r in report], pa.int64()),
            ],
            names=["table", "path", "nrows"],
        )

    def parse_lines(arrow_batches):
        yield run_task(
            s
            for batch in arrow_batches
            for s in batch.column(0).to_pylist()
        )

    def parse_ranges(arrow_batches):
        def stmts():
            for batch in arrow_batches:
                for i in range(batch.num_rows):
                    yield from _range_statements(
                        batch.column(0)[i].as_py(),
                        batch.column(1)[i].as_py(),
                        batch.column(2)[i].as_py(),
                    )

        yield run_task(stmts())

    prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(_ONEPASS_SPLIT_BYTES)
    )
    prev_arb = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    if stmt_rows is not None:  # direct call: size the crossing ourselves
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(stmt_rows)
        )
    try:
        if multiline:
            # reassembly range size: fill ~2 waves of cores, but keep
            # ranges large enough for healthy per-table row groups
            ranges = _multiline_ranges(spark, dump_path)
            total = sum(hi - lo for _p, lo, hi in ranges if hi > 0)
            cores = spark.sparkContext.defaultParallelism
            split = min(
                _ONEPASS_SPLIT_BYTES,
                max(8 * 1024 * 1024, total // max(1, 2 * cores)),
            )
            ranges = _multiline_ranges(spark, dump_path, split)
            src = _ranges_df(spark, ranges)
            rep = src.mapInArrow(
                parse_ranges, "table string, path string, nrows long"
            ).collect()
        else:
            lines = spark.read.text(dump_path).where(_dml_line_pred())
            rep = lines.mapInArrow(
                parse_lines, "table string, path string, nrows long"
            ).collect()
        counts = {t: 0 for t in schemas}
        for t in schemas:
            d = os.path.join(out_abs, t)
            _shutil.rmtree(d, ignore_errors=True)
            os.makedirs(d, exist_ok=True)
        for r in rep:
            _shutil.move(
                r.path, os.path.join(out_abs, r.table, os.path.basename(r.path))
            )
            counts[r.table] += int(r.nrows)
        for t, n in counts.items():
            if n == 0:  # schema-only dataset, same as the per-table path
                spark.createDataFrame([], schemas[t]).write.mode(
                    "overwrite"
                ).parquet(os.path.join(out_abs, t))
        return counts
    finally:
        _shutil.rmtree(staging, ignore_errors=True)
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev_arb
        )


def _require_tables(schemas: dict, dump_path: str) -> None:
    """Fail loud when the DDL pass found nothing to convert — a silent
    empty output directory hides input problems.  Lives at the shared
    collect_schemas/collect_schemas_multiline layer so every entry
    point (convert_dump, convert_dump_onepass called directly, the
    fused paths) is covered.  The common causes: the
    path matched no dump content, or the dump uses non-canonical
    lowercase keywords (statement classification matches the exact
    ``CREATE TABLE`` / ``INSERT INTO`` prefixes mysqldump emits — the
    hot line filters stay byte-literal on purpose; per-line case folding
    measured as a real cost at scale)."""
    if not schemas:
        raise DumpParseError(
            f"no CREATE TABLE statements found in {dump_path!r} — nothing "
            "to convert.  Keyword matching is byte-exact against canonical "
            "mysqldump output (uppercase 'CREATE TABLE' / 'INSERT INTO'); "
            "re-export with mysqldump, or uppercase the statement keywords."
        )


def _onepass_or_fallback(
    spark: SparkSession,
    dump_path: str,
    output_dir: str,
    compression: str,
    schemas: dict,
    *,
    multiline: bool,
    forced: bool,
    progress: bool,
    stmt_batch_rows: int | None = None,
) -> dict[str, int] | None:
    """Run :func:`convert_dump_onepass`; on a staging-visibility failure
    return ``None`` so an ``auto`` caller falls through to the per-table
    writers (a ``forced`` caller re-raises).  Shared by the one-line and
    multiline branches of :func:`convert_dump` so the fallback policy
    cannot drift between them."""
    import contextlib
    import sys

    from ..progress import ProgressReporter

    live = (
        ProgressReporter(spark, "ingest") if progress else contextlib.nullcontext()
    )
    try:
        with live:
            return convert_dump_onepass(
                spark,
                dump_path,
                output_dir,
                compression,
                schemas=schemas,
                multiline=multiline,
                stmt_batch_rows=stmt_batch_rows,
            )
    except OnepassStagingInvisible:
        if forced:
            raise
        print(
            "[ingest] one-pass staging not driver-visible — "
            "falling back to per-table writers",
            file=sys.stderr,
        )
        return None


def convert_dump(
    spark: SparkSession,
    dump_path: str,
    output_dir: str,
    compression: str = "snappy",
    progress: bool = False,
    max_concurrency: int = 8,
    multiline: str = "auto",
    strategy: str = "auto",
) -> dict[str, int]:
    """Full reference pipeline: dump → one Snappy Parquet dataset per table.

    Returns {table: row_count}.  ``strategy`` (default 'auto'): multi-table
    dumps with driver-reachable output convert ONE-PASS — each task parses
    its byte range once and writes every table it sees (see
    :func:`convert_dump_onepass`; 86 → 359 MB/s at 2 GB/16 tables).
    'per_table' forces the classic design: driver-side DDL pass, then a
    parallel INSERT parse per table over a shared statement cache, write
    jobs submitted from a thread pool with row counts from an ``observe``
    metric on the write itself — still the path for single-table dumps
    (Spark's committer, already single-scan) and object-store output.

    Design note (measured, round 4): a staged alternative — one pass
    writing the lines ``partitionBy(table)`` to parquet, per-table jobs
    reading only their pruned partition — was benchmarked at 1 GB / 16
    tables and LOST to this shared cache (24.0 s vs 20.5 s; naive 2 MB-
    split staging was 5× worse from small-file explosion).  The cache's
    per-table re-scan is cheap relative to the extra full write+read the
    staging pass costs at this table count; staging only pays when
    |tables| is large enough that O(tables × corpus) cache scanning
    dominates — worth revisiting for 1000-table dumps, not 16.

    ``multiline``: 'auto' (default) detects dumps whose INSERT statements
    span lines (no --extended-insert) and switches to byte-range
    statement reassembly (reference parity with main.rs:110–145, but
    parallel WITHIN a file: ranges align on statement-terminator lines,
    see :func:`_iter_range_statements`); 'never' raises
    :class:`MultilineDumpError` instead — the one-line layout remains
    preferable at 100 TB (no reassembly stage at all), but a multi-line
    dump no longer serializes onto one task per file.

    ``progress=True`` reports per-table rows to stderr AND renders live
    task-level progress while jobs run (``progress.ProgressReporter``
    polling the driver's StatusTracker) — the analogue of the
    reference's three spinners (src/main.rs:63–86).
    """
    import contextlib
    import sys
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import Observation

    from ..progress import ProgressReporter

    if multiline not in ("auto", "never"):
        raise ValueError(f"multiline must be 'auto' or 'never', got {multiline!r}")
    if strategy not in ("auto", "onepass", "per_table"):
        raise ValueError(
            f"strategy must be 'auto', 'onepass' or 'per_table', got {strategy!r}"
        )
    if strategy == "onepass" and "://" in output_dir:
        # fail before any work: forced onepass cannot address a
        # scheme'd URI (ADVICE r5, medium) — and must not silently
        # convert into <cwd>/s3:/bucket/out
        raise ValueError(
            "strategy='onepass' requires a driver-addressable "
            f"(scheme-less) output_dir; got {output_dir!r} — use "
            "strategy='auto' or 'per_table' for object-store output"
        )
    # Scope the file-split size to the parse-task granularity for the
    # duration of the convert (restored in the ``finally`` below): the
    # per-table parse scans yield ~bytes/2MB native splits, and the
    # spreading ``repartition`` in insert_rows_df becomes a no-op
    # (cur ≥ threshold), so the raw dump text is never shuffled:
    # parallelism comes from parallel file reads.  The DDL pass and the
    # one-pass scan carve their own granularity (collect_schemas scopes
    # _DDL_SCAN_SPLIT_BYTES — 2 MB tasks measured 10× pure scheduling
    # overhead on its JVM predicate scan — and convert_dump_onepass
    # scopes _ONEPASS_SPLIT_BYTES).  Gzip members stay unsplittable
    # regardless (their parallelism is per file); the multi-line
    # reassembly path carves its own byte ranges (MULTILINE_SPLIT_BYTES)
    # and ignores this setting.
    prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(PARSE_TASK_BYTES))
    prev_arb = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    use_multiline = False
    cached = None  # the persisted multi-table line set, if any
    try:
        try:
            if _has_xz_members(spark, dump_path):
                # .xz has no Hadoop codec, so the one-line JVM text scan
                # cannot decode it — route through the Python-decoded
                # reassembly path, which handles BOTH layouts (one-line
                # statements are single lines to it) at one task per
                # member, exactly like .gz members.
                if multiline == "never":
                    raise DumpParseError(
                        f"{dump_path}: .xz members need Python-side "
                        "decode (the reassembly path), which "
                        "multiline='never' forbids; recompress with "
                        "zstd/gzip/bzip2 for the JVM-decoded layout"
                    )
                raise MultilineDumpError(
                    f"{dump_path}: .xz member routed to Python-side decode"
                )
            schemas, mean_dml = collect_schemas(
                spark, dump_path, return_stats=True
            )
            # Size the Arrow statement-crossing batches in BYTES, not
            # rows: extended-insert statements run ~100 KB–1 MB each, and
            # the session's 10,000-row default let the JVM accumulate
            # ~800 MB Arrow buffers per in-flight task before anything
            # crossed to Python — 32 concurrent tasks thrashed allocation
            # and measured 90 MB/s where a ~32 MB batch target measures
            # 314 MB/s on the same 2 GB dump.  The mean statement size
            # rides the DDL pass's aggregate scan for free.
            stmt_rows = _stmt_cross_rows(mean_dml, int(prev_arb))
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch",
                str(stmt_rows),
            )
        except MultilineDumpError:
            if multiline == "never":
                raise
            use_multiline = True
            # map-only parallel DDL scan first (INSERT text never crosses
            # to the JVM).  Multi-table multiline dumps then convert
            # ONE-PASS (range reassembly feeding the same single-scan
            # task-writer machinery as the one-line layout — no per-table
            # re-read at any table count); single-table dumps use the
            # fused range parse (Spark's own parquet committer, one scan
            # anyway); the statements cache remains for non-shared-FS
            # output where task-side writers can't commit.
            schemas = collect_schemas_multiline(spark, dump_path)
            if strategy != "per_table" and "://" not in output_dir:
                # one-pass for ANY table count (single-table measured
                # 96 vs 39 MB/s against the fused+Spark-sink path at
                # 68 MB); fused remains the object-store-output fallback
                counts = _onepass_or_fallback(
                    spark,
                    dump_path,
                    output_dir,
                    compression,
                    schemas,
                    multiline=True,
                    forced=strategy == "onepass",
                    progress=progress,
                )
                if counts is not None:
                    if progress:
                        for t in schemas:
                            print(
                                f"[ingest] {t}: {counts[t]:,} rows "
                                "(multiline one-pass)",
                                file=sys.stderr,
                            )
                    return {t: counts[t] for t in schemas}
            if len(schemas) > 1:
                lines = cached = multiline_stmts_df(spark, dump_path).persist()
                # Reassembled statements are statement-sized rows (up to
                # ~1 MB at mysqldump's net_buffer default) crossing
                # JVM→Python in the per-table parse: cap the Arrow batch
                # like the one-line branch, statically (no mean-size
                # stats exist before the reassembly scan) — 64 × ~1 MB
                # bounds JVM buffers at ~64 MB per in-flight task.  Only
                # ever TIGHTEN the session conf: a user bound below 64
                # stays exactly as configured, and Spark's zero/negative
                # "no limit" sentinel means no user bound (we impose 64).
                spark.conf.set(
                    "spark.sql.execution.arrow.maxRecordsPerBatch",
                    str(
                        64
                        if int(prev_arb) <= 0
                        else min(64, int(prev_arb))
                    ),
                )
            if progress:
                print(
                    "[ingest] multi-line INSERT layout detected — "
                    "byte-range statement reassembly (parallel within "
                    "files)",
                    file=sys.stderr,
                )
        if progress:
            print(
                f"[ingest] {len(schemas)} table(s): {sorted(schemas)}",
                file=sys.stderr,
            )
        # one-pass strategy: one-line dumps with a driver-reachable
        # output filesystem read the text exactly once and write from
        # the tasks (see convert_dump_onepass).  Multi-table: removes
        # the T× cache re-reads (dominant cost at ≥2 GB).  Single-table:
        # the pyarrow writers beat the JVM cast+sink stage 434 vs
        # 112 MB/s at 1 GB, so auto uses one-pass there too.
        if not use_multiline and (
            strategy == "onepass"
            or (strategy == "auto" and "://" not in output_dir)
        ):
            t0 = _time.perf_counter()
            counts = _onepass_or_fallback(
                spark,
                dump_path,
                output_dir,
                compression,
                schemas,
                multiline=False,
                forced=strategy == "onepass",
                progress=progress,
                stmt_batch_rows=stmt_rows,
            )
            if counts is not None:
                if progress:
                    dt = _time.perf_counter() - t0
                    for t in schemas:
                        print(
                            f"[ingest] {t}: {counts[t]:,} rows (one-pass, "
                            f"{dt:.1f}s total)",
                            file=sys.stderr,
                        )
                return {t: counts[t] for t in schemas}
        if not use_multiline:
            lines = spark.read.text(dump_path).where(_dml_line_pred())
            if len(schemas) > 1:
                lines = cached = lines.persist()
        elif cached is None:
            lines = None  # multiline fused range parse (per-table jobs)
        parse_parts: dict[str, int] = {}
        if len(schemas) > 1 and lines is not None:
            # One cheap aggregate over the cached lines sizes each table's
            # parse stage to its byte share (see parse_partition_counts);
            # the fused multiline path (lines is None) sizes itself by
            # range instead.
            cores = spark.sparkContext.defaultParallelism
            parse_parts = {
                t.lower(): n
                for t, n in parse_partition_counts(
                    lines, cores, len(schemas)
                ).items()
            }

        def _one_table(item: tuple[str, T.StructType]) -> tuple[str, int]:
            table, schema = item
            t0 = _time.perf_counter()
            if lines is None:
                # single-table multiline: reassembly+parse fused in one
                # stage, statement text never crosses to the JVM
                df = insert_rows_df_multiline_fused(
                    spark, dump_path, table, schema
                )
            else:
                # both layouts otherwise converge on insert_rows_df:
                # ``lines`` holds one-line INSERT statements either way
                # (native lines for --extended-insert dumps,
                # range-reassembled statements for multi-line dumps)
                df = insert_rows_df(
                    spark,
                    dump_path,
                    table,
                    schema,
                    lines_df=lines,
                    parse_partitions=parse_parts.get(table),
                )
            obs = Observation(f"ingest_{table}")
            df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            codec, level = parse_compression(compression)
            writer = df.write.mode("overwrite")
            if level is not None:
                # parquet-mr reads the level from the JOB's Hadoop conf,
                # and Spark's file sinks copy writer options into that
                # conf (newHadoopConfWithOptions), so the level rides
                # the write instead of mutating the session-global conf
                # — two convert_dump calls racing on one SparkSession
                # can no longer cross-apply levels (ADVICE r11; the
                # override-wins behavior is probed in
                # tests/test_ingest.py).  ONLY zstd has that knob; a
                # gzip/brotli level this path cannot honor fails loudly
                # instead of silently writing at the default level
                # (review r11; the pyarrow one-pass path honors those
                # levels fine).
                if codec != "zstd":
                    raise ValueError(
                        f"the per-table Spark writer cannot honor a "
                        f"{codec} level ({compression!r}); use zstd:N "
                        f"or a plain codec on this path"
                    )
                writer = writer.option(
                    "parquet.compression.codec.zstd.level", str(level)
                )
            writer.parquet(f"{output_dir}/{table}", compression=codec)
            n = int(obs.get["rows"])
            if progress:
                dt = _time.perf_counter() - t0
                print(f"[ingest] {table}: {n:,} rows in {dt:.1f}s", file=sys.stderr)
            return table, n

        items = list(schemas.items())
        live = (
            ProgressReporter(spark, "ingest")
            if progress
            else contextlib.nullcontext()
        )
        with live:
            if len(items) == 1:
                counts = dict([_one_table(items[0])])
            else:
                with ThreadPoolExecutor(
                    max_workers=min(max_concurrency, len(items))
                ) as pool:
                    counts = dict(pool.map(_one_table, items))
        return {t: counts[t] for t in schemas}  # deterministic table order
    finally:
        try:
            if cached is not None:
                cached.unpersist()
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", prev_arb
            )


# --------------------------------------------------------------------------
# queries() registrations
# --------------------------------------------------------------------------

#: A miniature dump exercising the full grammar, incl. the three semantic
#: fixes (DECIMAL, BOOLEAN, DATE) the reference gets wrong (SURVEY §1.2).
DEMO_DUMP = """-- MySQL dump 10.13  Distrib 8.0
/*!40101 SET NAMES utf8mb4 */;
DROP TABLE IF EXISTS `acct`;
CREATE TABLE `acct` (
  `id` bigint NOT NULL,
  `name` varchar(255) CHARACTER SET utf8mb4 NOT NULL,
  `balance` decimal(12,2) DEFAULT NULL,
  `ratio` double DEFAULT NULL,
  `active` boolean NOT NULL,
  `created` timestamp NULL DEFAULT NULL,
  `birthday` date DEFAULT NULL,
  PRIMARY KEY (`id`),
  KEY `name_index` (`name`(64))
) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4;
LOCK TABLES `acct` WRITE;
INSERT INTO `acct` VALUES (1,'alice',120.50,0.25,1,'2024-01-02 03:04:05','1990-05-06'),(2,'bob',NULL,-1.5,0,'2024-02-03 04:05:06',NULL),(3,'carol''s',3.14,2,1,NULL,'2001-12-31');
UNLOCK TABLES;
"""


def pin_result(df: DataFrame) -> DataFrame:
    """Materialize a *small* result whose backing files are about to
    vanish (tempdir outputs): collect and rebuild as a local DataFrame —
    unlike ``cache()``, immune to executor cache eviction."""
    rows = df.collect()
    return df.sparkSession.createDataFrame(rows, df.schema)


def _ingest_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_ingest_mysqldump: run the full pipeline on the demo dump in a temp
    dir, read the Parquet back (side-effecting ⇒ rows-only driver check)."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        dump = f"{tmp}/demo.sql"
        with open(dump, "w") as fh:
            fh.write(DEMO_DUMP)
        convert_dump(spark, dump, f"{tmp}/out")
        return pin_result(spark.read.parquet(f"{tmp}/out/acct").orderBy("id"))


def _scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_scan_parquet: projected scan + row count per file-level group —
    checks the Parquet source end-to-end (pushdown verified in test_plans)."""
    from ..catalog import load_table

    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select("l_returnflag", "l_quantity")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("l_quantity").alias("sum_qty"))
        .orderBy("l_returnflag")
    )


SCAN_PARQUET_SQL = """
SELECT l_returnflag, COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def _sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_sink_partitioned: partitioned Parquet write (the 100 TB layout:
    partition pruning on ship-month) then read one partition back."""
    import tempfile

    from ..catalog import load_table

    l = load_table(spark, sf_dir, "lineitem")
    with tempfile.TemporaryDirectory() as tmp:
        (
            l.withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
            .write.mode("overwrite")
            .partitionBy("ship_month")
            .parquet(f"{tmp}/lineitem_parted")
        )
        return pin_result(
            spark.read.parquet(f"{tmp}/lineitem_parted")
            .where(F.col("ship_month") == "1996-03")
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .orderBy("l_returnflag")
        )


SINK_PARTITIONED_SQL = """
SELECT l_returnflag, COUNT(*) AS n_rows
FROM lineitem
WHERE strftime(l_shipdate, '%Y-%m') = '1996-03'
GROUP BY l_returnflag ORDER BY l_returnflag
"""


QUERIES = {
    "q_ingest_mysqldump": _ingest_demo,
    "q_scan_parquet": _scan_parquet,
    "q_sink_partitioned": _sink_partitioned,
}

ORACLE = {
    # q_ingest_mysqldump: side-effecting, own-dump input → rows-only check.
    "q_scan_parquet": SCAN_PARQUET_SQL,
    "q_sink_partitioned": SINK_PARTITIONED_SQL,
}
