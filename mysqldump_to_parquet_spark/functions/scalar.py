"""Scalar function families (SURVEY.md §2.2 ``q_fn_*``).

All JVM-side ``pyspark.sql.functions`` — these stay inside whole-stage
codegen; no Python is involved at execution time.  Where Spark and DuckDB
return different integer widths for the same function (e.g. ``year()`` is
int32 in Spark, int64 in DuckDB) the Spark side casts up to ``bigint`` so
the driver's schema comparison sees identical shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat / substring / upper / lower / trim / regexp / split / length."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("first8"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).cast("long").alias("cust_num"),
        F.regexp_replace("c_name", "0", "").alias("no_zeros"),
        F.split("c_name", "#").getItem(1).alias("num_part"),
        F.trim(F.lit("  padded  ")).alias("trimmed"),
    )


FN_STRING_SQL = """
SELECT c_custkey,
       UPPER(c_name)                                    AS name_upper,
       LOWER(c_mktsegment)                              AS seg_lower,
       LENGTH(c_name)                                   AS name_len,
       SUBSTRING(c_name, 1, 8)                          AS first8,
       CONCAT_WS('|', c_mktsegment, c_name)             AS seg_name,
       CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS cust_num,
       regexp_replace(c_name, '0', '', 'g')             AS no_zeros,
       string_split(c_name, '#')[2]                     AS num_part,
       TRIM('  padded  ')                               AS trimmed
FROM customer
"""


def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day, date_trunc, datediff, date_add — the C1 cast family
    (reference parses 'YYYY-mm-DD hh:mm:ss' at fixed offsets,
    parquet_writer.rs:167–197; these are its queryable descendants)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("long").alias("days_since_95"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
    )


FN_DATE_SQL = """
SELECT o_orderkey,
       YEAR(o_orderdate)                                   AS yr,
       MONTH(o_orderdate)                                  AS mo,
       DAY(o_orderdate)                                    AS dom,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
       CAST(o_orderdate AS DATE) + 30                      AS due_date
FROM orders
"""


def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/ln/log10/pow/mod."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        # round() on a true-integer value — both engines agree; rounding an
        # arbitrary quotient at .5 boundaries diverges (HALF_UP-on-string vs
        # binary) and is deliberately avoided.
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_pct"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_k"),
        # transcendentals rounded to 9: JVM and DuckDB libm differ in the
        # last ulp (values O(10), drift ~1e-15 ≪ the 5e-10 boundary)
        F.round(F.ln(F.col("l_extendedprice") + 1), 9).alias("ln_price"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 9).alias("log10_price"),
        F.round(F.pow("l_tax", 2), 9).alias("tax_sq"),
        (F.col("l_orderkey") % 7).alias("mod7"),
    )


FN_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(l_tax * 100) AS BIGINT)       AS tax_pct,
       ABS(l_discount - 0.05)                   AS disc_dev,
       CAST(CEIL(l_quantity) AS BIGINT)         AS qty_ceil,
       CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
       ROUND(LN(l_extendedprice + 1), 9)        AS ln_price,
       ROUND(LOG10(l_extendedprice + 1), 9)     AS log10_price,
       ROUND(POW(l_tax, 2), 9)                  AS tax_sq,
       l_orderkey % 7                           AS mod7
FROM lineitem
"""


def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order functions on the embedding column: size,
    element access, transform + aggregate (sequential fold — both engines
    fold left-to-right, so the double arithmetic matches exactly)."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.col("embedding").getItem(0).cast("double").alias("first_elem"),
        F.aggregate(
            dbl, F.lit(0.0), lambda acc, x: acc + x * x
        ).alias("l2norm_sq"),
        F.size(F.filter(dbl, lambda x: x > 0)).cast("long").alias("n_positive"),
    )


FN_ARRAY_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT)                       AS dim,
       CAST(embedding[1] AS DOUBLE)                         AS first_elem,
       list_reduce(
         list_prepend(0.0,
           list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
         (acc, x) -> acc + x)                               AS l2norm_sq,
       CAST(len(list_filter(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                            x -> x > 0)) AS BIGINT)         AS n_positive
FROM embeddings
"""


def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element_at/map_keys, projected to scalars so the
    oracle stays hash-comparable."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("et"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return e.select(
        "event_id",
        F.element_at(m, "et").alias("et_val"),
        F.element_at(m, "uid").cast("long").alias("uid_val"),
        F.array_join(F.map_keys(m), ",").alias("key_list"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


FN_MAP_SQL = """
SELECT event_id,
       event_type                 AS et_val,
       user_id                    AS uid_val,
       'et,uid'                   AS key_list,
       CAST(2 AS BIGINT)          AS n_keys
FROM events
"""


def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction + schema-directed from_json on events.props."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k BIGINT").getField("k").alias("k_num"),
    )


FN_JSON_SQL = """
SELECT event_id,
       json_extract_string(props, '$.k')            AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
FROM events
"""


def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_fn_variant: semi-structured access through Spark 4's VARIANT type
    — ``parse_json`` once into the binary variant encoding, then typed
    ``variant_get`` path extraction feeding an ordinary aggregate.

    Versus q_fn_json's per-path string extraction: VARIANT parses each
    document once into a binary form all later paths share (and Parquet
    can shred into columns), which is the scale answer for event
    payloads queried on several keys — re-running a JSON parser per path
    per row is the thing that doesn't survive 100 TB.
    """
    e = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


FN_VARIANT_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_fn_bitwise: bit operators over integer keys — AND/OR/XOR/shift/
    bit_count, the building blocks of bitmap indexes, bloom hashes, and
    flag columns.  All codegen'd JVM arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderkey").bitwiseAND(F.lit(0xFF))).alias("low_byte"),
        (F.col("o_orderkey").bitwiseOR(F.lit(1))).alias("set_lsb"),
        (F.col("o_orderkey").bitwiseXOR(F.col("o_custkey"))).alias("key_xor"),
        F.shiftleft(F.col("o_orderkey"), 3).alias("shl3"),
        F.shiftright(F.col("o_orderkey"), 2).alias("shr2"),
        F.bit_count("o_orderkey").cast("long").alias("popcount"),
    )


FN_BITWISE_SQL = """
SELECT o_orderkey,
       o_orderkey & 255                 AS low_byte,
       o_orderkey | 1                   AS set_lsb,
       xor(o_orderkey, o_custkey)       AS key_xor,
       o_orderkey << 3                  AS shl3,
       o_orderkey >> 2                  AS shr2,
       CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
FROM orders
"""


def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_agg_bool: boolean aggregates per group — every/any (bool_and /
    bool_or) and count_if, the idioms behind SLA checks ("did every
    shipment arrive discounted?") that otherwise get written as clumsy
    SUM(CASE…)=COUNT(*) pairs.  Two-phase like any other aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.every(F.col("l_discount") > 0).alias("all_discounted"),
            F.any_value(F.lit(True)).alias("nonempty"),
            F.bool_or(F.col("l_quantity") >= 50).alias("any_bulk"),
            F.count_if(F.col("l_tax") > 0.05).alias("n_taxed"),
        )
        .orderBy("l_returnflag")
    )


AGG_BOOL_SQL = """
SELECT l_returnflag,
       bool_and(l_discount > 0)                 AS all_discounted,
       TRUE                                     AS nonempty,
       bool_or(l_quantity >= 50)                AS any_bulk,
       CAST(count_if(l_tax > 0.05) AS BIGINT)   AS n_taxed
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_fn_hash: cross-engine-stable digests and encodings — md5 / sha2 /
    base64 / hex.  These are the primitives the dedup/split/sample
    operators build on; all are bit-identical across engines by
    specification (unlike xxhash64/hash, which are engine-internal and
    deliberately kept out of oracle-checked outputs)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("md5_hex"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("sha256_hex"),
        F.base64(F.col("c_name").cast("binary")).alias("name_b64"),
        F.lower(F.hex(F.col("c_name").cast("binary"))).alias("name_hex"),
    )


FN_HASH_SQL = """
SELECT c_custkey,
       md5(c_name)                          AS md5_hex,
       sha256(c_name)                       AS sha256_hex,
       to_base64(CAST(c_name AS BLOB))      AS name_b64,
       lower(hex(CAST(c_name AS BLOB)))     AS name_hex
FROM customer
"""


def fn_date_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_fn_date_calendar: the calendar-arithmetic family beyond q_fn_date
    — month-end (billing cutoffs), quarter bucketing, ISO week, day-of-
    week, and month addition with end-of-month clamping.  Spark's
    ``dayofweek`` is 1=Sunday while DuckDB's is 0=Sunday — the oracle
    aligns with ``+1``; every other function agrees by specification."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.trunc(d, "quarter").alias("quarter_start"),
        F.dayofweek(d).cast("long").alias("dow"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.add_months(d, 1).alias("next_month"),
    )


FN_DATE_CALENDAR_SQL = """
SELECT o_orderkey,
       last_day(CAST(o_orderdate AS DATE))                    AS month_end,
       CAST(date_trunc('quarter', o_orderdate) AS DATE)       AS quarter_start,
       dayofweek(CAST(o_orderdate AS DATE)) + 1               AS dow,
       weekofyear(CAST(o_orderdate AS DATE))                  AS iso_week,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month
FROM orders
"""


def agg_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_agg_grouping: CUBE with ``grouping()`` flags — the metadata
    column that lets a consumer distinguish "NULL because subtotal" from
    "NULL because the data was NULL", which the plain cube/rollup
    operators cannot.  Same Expand-based plan as q_agg_cube."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("g_status", "g_priority", "o_orderstatus", "o_orderpriority")
    )


AGG_GROUPING_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus)   AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
"""


def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_agg_minmax_by: argmax/argmin aggregates — each customer's most
    and least expensive order id in ONE grouped pass (``max_by`` /
    ``min_by``), replacing the window-rank-then-filter idiom and its
    extra sort.  Ordering values (o_totalprice) are distinct per customer
    with probability ~1, and determinism is pinned anyway by taking
    argmax of the (price, orderkey) *pair* — a total order."""
    o = load_table(spark, sf_dir, "orders")
    pair = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", pair).alias("best_order"),
            F.min_by("o_orderkey", pair).alias("worst_order"),
            F.max("o_totalprice").alias("best_price"),
        )
        .orderBy("o_custkey")
    )


def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_fn_explode_outer: null-preserving lateral expansion —
    ``posexplode_outer`` keeps rows whose array is empty (pos/val NULL),
    where plain explode silently drops them.  The semantic that matters
    for fact tables with optional repeated attributes: an outer explode
    is row-count-auditable (every input key still appears), an inner one
    is not.  The 1→N fan-out happens inside the scan stage (Generate
    node), no shuffle."""
    c = load_table(spark, sf_dir, "customer")
    arr = F.regexp_extract_all("c_mktsegment", F.lit("(U)"), 1)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.posexplode_outer(arr),
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.col("pos").cast("long").alias("pos"),
        F.col("col").alias("val"),
    )


FN_EXPLODE_OUTER_SQL = """
WITH base AS (
  SELECT c_custkey, c_mktsegment,
         regexp_extract_all(c_mktsegment, '(U)', 1) AS arr
  FROM customer
),
ex AS (
  SELECT c_custkey,
         CAST(generate_subscripts(arr, 1) - 1 AS BIGINT) AS pos,
         unnest(arr) AS val
  FROM base
)
SELECT b.c_custkey, b.c_mktsegment, e.pos, e.val
FROM base b LEFT JOIN ex e ON b.c_custkey = e.c_custkey
"""


def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_fn_regex: the regex family beyond extract/replace — rlike
    predicates, match counting, and extract-all arrays (the primitives of
    log parsing and PII scrubbing).  Both engines use RE2-compatible
    pattern subsets here, so results are specification-identical."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_name").rlike("[0-9]{3}").alias("has_3digits"),
        F.regexp_count("c_name", F.lit("[0-9]")).cast("long").alias("n_digits"),
        # extract-all STILL runs; the array is serialized to one string
        # because the driver's canonicalizer sorts/hashes cell values and
        # array cells are unhashable there (the r2 q_embed_centroids
        # failure mode)
        F.array_join(
            F.regexp_extract_all("c_name", F.lit("([0-9]+)"), 1), ","
        ).alias("digit_runs"),
    )


FN_REGEX_SQL = """
SELECT c_custkey,
       regexp_matches(c_name, '[0-9]{3}')                      AS has_3digits,
       CAST(len(regexp_extract_all(c_name, '[0-9]')) AS BIGINT) AS n_digits,
       array_to_string(regexp_extract_all(c_name, '([0-9]+)', 1), ',')
                                                               AS digit_runs
FROM customer
"""


def fn_string_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_fn_string_pad: the formatting/string-shaping family — lpad/rpad
    (fixed-width keys, zero-padded ids), translate (character maps),
    repeat, reverse.  All codegen'd; byte-identical across engines."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.lpad(F.col("n_nationkey").cast("string"), 4, "0").alias("key4"),
        F.rpad("n_name", 12, ".").alias("name_pad"),
        F.translate("n_name", "_", "-").alias("name_dash"),
        F.repeat(F.lit("ab"), 3).alias("abab"),
        F.reverse("n_name").alias("name_rev"),
    )


FN_STRING_PAD_SQL = """
SELECT n_nationkey,
       lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS key4,
       rpad(n_name, 12, '.')                      AS name_pad,
       translate(n_name, '_', '-')                AS name_dash,
       repeat('ab', 3)                            AS abab,
       reverse(n_name)                            AS name_rev
FROM nation
"""


def fn_array_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_fn_array_algebra: array set-algebra and access — sort, distinct,
    concat, contains, position, slice — over per-customer token arrays.
    Arrays are sorted before comparison so the multiset hash is
    order-stable on both engines; every array output is serialized with
    ``array_join`` to a '|'-separated string because the driver's
    canonicalizer sorts/hashes cell values and array cells are unhashable
    there (the r2 q_embed_centroids failure mode) — the array algebra
    itself still runs JVM-side."""
    c = load_table(spark, sf_dir, "customer")
    toks = F.split("c_name", "#")
    return c.select(
        "c_custkey",
        F.array_join(F.array_sort(toks), "|").alias("toks_sorted"),
        F.array_join(
            F.array_sort(F.array_distinct(F.concat(toks, toks))), "|"
        ).alias("toks_dedup"),
        F.array_join(F.concat(toks, F.array(F.lit("x"))), "|").alias(
            "toks_plus"
        ),
        F.array_contains(toks, "Customer").alias("has_prefix"),
        F.array_position(toks, "Customer").cast("long").alias("prefix_pos"),
        F.array_join(F.slice(toks, 1, 1), "|").alias("first_tok"),
    )


FN_ARRAY_ALGEBRA_SQL = """
SELECT c_custkey,
       array_to_string(list_sort(string_split(c_name, '#')), '|')
                                                                AS toks_sorted,
       array_to_string(list_sort(list_distinct(string_split(c_name, '#')
                     || string_split(c_name, '#'))), '|')       AS toks_dedup,
       array_to_string(string_split(c_name, '#') || ['x'], '|') AS toks_plus,
       list_contains(string_split(c_name, '#'), 'Customer')     AS has_prefix,
       CAST(list_position(string_split(c_name, '#'), 'Customer') AS BIGINT)
                                                                AS prefix_pos,
       array_to_string(string_split(c_name, '#')[1:1], '|')     AS first_tok
FROM customer
"""


def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_agg_collect: grouped collection aggregates — the ordered list of
    a nation's customer keys and the distinct segment set.  collect_list
    has no deterministic order by itself, so the list is built from
    ``array_sort`` (and the set from sorted ``collect_set``) — the only
    way collection outputs can hash-match across engines.  The sorted
    lists are then serialized with ``array_join`` (numeric sort FIRST,
    string cast after — '10' < '2' lexicographically) because the
    driver's canonicalizer sorts/hashes cell values and array cells are
    unhashable there (the r2 q_embed_centroids failure mode)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.where(F.col("c_custkey") <= 200)
        .groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("c_custkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("cust_keys"),
            F.array_join(
                F.array_sort(F.collect_set("c_mktsegment")), ","
            ).alias("segments"),
            F.count(F.lit(1)).alias("n_cust"),
        )
        .orderBy("c_nationkey")
    )


AGG_COLLECT_SQL = """
SELECT c_nationkey,
       array_to_string(list_transform(list(c_custkey ORDER BY c_custkey),
                                      x -> CAST(x AS VARCHAR)), ',')
                                                     AS cust_keys,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',')
                                                     AS segments,
       COUNT(*)                                      AS n_cust
FROM customer
WHERE c_custkey <= 200
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


#: DuckDB's arg_max does not take a composite ordering key, so the oracle
#: expresses the identical (price, orderkey) total order with two ranked
#: windows — same argmax/argmin selection, fully deterministic.
AGG_MINMAX_BY_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice ASC, o_orderkey ASC)  AS rmin
  FROM orders
)
SELECT o_custkey,
       MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS best_order,
       MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS worst_order,
       MAX(o_totalprice)                           AS best_price
FROM ranked
GROUP BY o_custkey
ORDER BY o_custkey
"""


def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "large")
        .when(F.col("o_totalprice") > 100000, "medium")
        .otherwise("small")
        .alias("size_tier"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("pending"))
        .alias("status_or_pending"),
        F.nullif("o_orderpriority", F.lit("4-NOT SPECIFIED")).alias("prio_or_null"),
    )


FN_COND_SQL = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'large'
            WHEN o_totalprice > 100000 THEN 'medium'
            ELSE 'small' END                                  AS size_tier,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'pending')        AS status_or_pending,
       NULLIF(o_orderpriority, '4-NOT SPECIFIED')             AS prio_or_null
FROM orders
"""


# ----------------------------------------------------------- url parsing


def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_fn_url: URL component extraction — host, path, full query
    string, and one named query parameter — via Spark's ``parse_url``
    (the JVM-side java.net.URI family; no UDF).  The URL itself is a
    deterministic per-row fixture (the documents table carries no
    natural URLs); the DuckDB twin parses the same components with
    engine-neutral regexes, so the oracle is an independent
    implementation, not an echo."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://www.example"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".com/articles/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("?page="),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("&ref="),
        F.col("source"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("page")).alias("page_param"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
    )


FN_URL_SQL = """
WITH u AS (
  SELECT doc_id,
         'https://www.example' || CAST(doc_id % 7 AS VARCHAR)
         || '.com/articles/' || CAST(doc_id % 50 AS VARCHAR)
         || '?page=' || CAST(doc_id % 5 AS VARCHAR)
         || '&ref=' || source AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^[a-z]+://([^/?#]*)', 1)  AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]*([^?#]*)', 1) AS path,
       regexp_extract(url, '\\?([^#]*)', 1)           AS query,
       regexp_extract(url, '[?&]page=([^&#]*)', 1)    AS page_param,
       regexp_extract(url, '[?&]ref=([^&#]*)', 1)     AS ref_param
FROM u
"""


# ------------------------------------------------------------ geo distance

#: Earth mean radius (km) — the haversine constant.
EARTH_R_KM = 6371.0


def fn_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_fn_geo: great-circle (haversine) distance + bearing bucket from
    each customer's synthetic location to a fixed reference point.

    Locations are a deterministic per-row fixture (lat/lon derived from
    the customer and nation keys — the fixture tables carry no real
    coordinates); the haversine itself is the operator under test, all
    JVM-side trig (zero UDFs, zero shuffles).  Distances are rounded to
    4 decimals: libm trig differs in the last ulp across engines and the
    absolute drift (~1e-11 km here) sits far below the grid."""
    c = load_table(spark, sf_dir, "customer")
    lat = ((F.col("c_custkey") * 7919) % 1700) / F.lit(10.0) - 85.0
    lon = ((F.col("c_custkey") * 104729) % 3600) / F.lit(10.0) - 180.0
    lat0, lon0 = 48.8566, 2.3522  # fixed reference point
    rad = F.lit(3.141592653589793 / 180.0)
    dlat_h = (lat - lat0) * rad / 2
    dlon_h = (lon - lon0) * rad / 2
    a = (
        F.sin(dlat_h) * F.sin(dlat_h)
        + F.cos(lat * rad) * F.cos(F.lit(lat0) * rad) * F.sin(dlon_h) * F.sin(dlon_h)
    )
    dist = 2 * EARTH_R_KM * F.asin(F.sqrt(a))
    return c.select(
        "c_custkey",
        F.round(lat, 4).alias("lat"),
        F.round(lon, 4).alias("lon"),
        F.round(dist, 4).alias("dist_km"),
        (F.col("c_custkey") % 2 == 0).alias("east_hemi_probe"),
    )


# All intermediates forced to DOUBLE (DuckDB would otherwise run the
# /10.0 arithmetic in DECIMAL and emit DECIMAL outputs — a driver-hash
# type divergence even at equal values); operand order mirrors the
# Spark expression exactly.
FN_GEO_SQL = f"""
WITH pts AS (
  SELECT c_custkey,
         CAST((c_custkey * 7919) % 1700 AS DOUBLE) / 10.0 - 85.0   AS lat,
         CAST((c_custkey * 104729) % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon
  FROM customer
), h AS (
  SELECT c_custkey, lat, lon,
         sin((lat - 48.8566) * (3.141592653589793 / 180.0) / 2) AS slat,
         sin((lon - 2.3522) * (3.141592653589793 / 180.0) / 2)  AS slon,
         cos(lat * (3.141592653589793 / 180.0))                 AS clat,
         cos(48.8566 * (3.141592653589793 / 180.0))             AS clat0
  FROM pts
)
SELECT c_custkey,
       ROUND(lat, 4) AS lat,
       ROUND(lon, 4) AS lon,
       ROUND(2 * {EARTH_R_KM} * asin(sqrt(
         slat * slat + clat * clat0 * slon * slon)), 4) AS dist_km,
       (c_custkey % 2 = 0) AS east_hemi_probe
FROM h
"""


QUERIES = {
    "q_fn_url": fn_url,
    "q_fn_geo": fn_geo,
    "q_fn_string": fn_string,
    "q_fn_date": fn_date,
    "q_fn_math": fn_math,
    "q_fn_array": fn_array,
    "q_fn_map": fn_map,
    "q_fn_json": fn_json,
    "q_fn_variant": fn_variant,
    "q_fn_bitwise": fn_bitwise,
    "q_agg_bool": agg_bool,
    "q_fn_hash": fn_hash,
    "q_fn_date_calendar": fn_date_calendar,
    "q_agg_grouping": agg_grouping,
    "q_agg_minmax_by": agg_minmax_by,
    "q_fn_string_pad": fn_string_pad,
    "q_fn_regex": fn_regex,
    "q_fn_explode_outer": fn_explode_outer,
    "q_fn_array_algebra": fn_array_algebra,
    "q_agg_collect": agg_collect,
    "q_fn_cond": fn_cond,
}

ORACLE = {
    "q_fn_url": FN_URL_SQL,
    "q_fn_geo": FN_GEO_SQL,
    "q_fn_string": FN_STRING_SQL,
    "q_fn_date": FN_DATE_SQL,
    "q_fn_math": FN_MATH_SQL,
    "q_fn_array": FN_ARRAY_SQL,
    "q_fn_map": FN_MAP_SQL,
    "q_fn_json": FN_JSON_SQL,
    "q_fn_variant": FN_VARIANT_SQL,
    "q_fn_bitwise": FN_BITWISE_SQL,
    "q_agg_bool": AGG_BOOL_SQL,
    "q_fn_hash": FN_HASH_SQL,
    "q_fn_date_calendar": FN_DATE_CALENDAR_SQL,
    "q_agg_grouping": AGG_GROUPING_SQL,
    "q_agg_minmax_by": AGG_MINMAX_BY_SQL,
    "q_fn_string_pad": FN_STRING_PAD_SQL,
    "q_fn_regex": FN_REGEX_SQL,
    "q_fn_explode_outer": FN_EXPLODE_OUTER_SQL,
    "q_fn_array_algebra": FN_ARRAY_ALGEBRA_SQL,
    "q_agg_collect": AGG_COLLECT_SQL,
    "q_fn_cond": FN_COND_SQL,
}
