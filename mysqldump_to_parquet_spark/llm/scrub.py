"""PII scrubbing and URL canonicalization — corpus-hygiene operators.

Two curation passes every production training-data pipeline runs before
text reaches a tokenizer:

* **PII redaction** (``q_pii_redact``): replace e-mail addresses, phone
  numbers, and IPv4 addresses with typed placeholder tokens and count
  what was removed — the remove-then-count shape lets a pipeline both
  sanitize and audit in one scan.
* **URL canonicalization + dedup** (``q_dedup_url``): web-crawl corpora
  carry the same page under many URL spellings (tracking parameters,
  host case, trailing slash, fragments).  Canonicalizing the URL and
  grouping on the canonical form is the cheapest dedup signal there is —
  it removes refetch duplicates *before* any content hashing runs.

The fixture ``documents`` table carries no natural PII or URLs (synthetic
word soup), so both queries first *derive* a deterministic enriched
column from ``doc_id``/``source`` — the same expression in the Spark
query and the DuckDB oracle — and then run the real scrub pipeline on
it.  The operator under test is the redaction / canonicalization logic;
the enrichment is a fixture, not a mock: every regex runs against real
strings and the oracle checks the exact output (md5 of the redacted
text, exact canonical groups).

Scale shapes:
* ``pii_redact`` is pure per-row JVM regex work — codegen'd, zero
  shuffle, embarrassingly parallel at any corpus size.
* ``dedup_url`` is per-row canonicalization + ONE hash aggregation keyed
  on the canonical URL — the same single-shuffle shape as
  ``q_dedup_exact`` (llm/dedup.py); no joins, no skew beyond genuine
  per-URL duplicate counts (bounded by refetch policy, not corpus size).

Every regex sticks to the syntax intersection of Java (Spark) and RE2
(DuckDB): character classes, bounded repeats, anchors, ``\\b`` — no
backreferences, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_parallel

# --------------------------------------------------------------- pii redact

#: Engine-neutral PII patterns (Java ∩ RE2 syntax).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _enriched_expr() -> Column:
    """Deterministic PII-bearing text derived from doc_id (see module
    docstring): one e-mail, one phone, one IPv4 per document, prepended
    to the real text."""
    return F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" :: "),
        F.col("text"),
    )


_ENRICHED_SQL = (
    "'contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com or call +1-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || ' :: ' || text"
)


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_pii_redact: typed-placeholder PII redaction with removal counts.

    Replacement order matters and is fixed: e-mails first (their local
    part could otherwise be chewed up by a later pass), then IPv4, then
    phones.  Counts come from ``regexp_count`` over the pre-redaction
    text; the redacted text itself is checked exactly via its md5 (the
    full string would bloat the comparison for no extra evidence).

    The spreading repartition matters here: the fixture arrives as ONE
    parquet split, and per-row regex work serialized onto a single scan
    task measured 2.5× superlinear across the SF sweep; a no-op on any
    properly-split input."""
    d = load_table_parallel(spark, sf_dir, "documents")
    raw = _enriched_expr()
    redacted = F.regexp_replace(raw, EMAIL_RE, "<EMAIL>")
    redacted = F.regexp_replace(redacted, IPV4_RE, "<IP>")
    redacted = F.regexp_replace(redacted, PHONE_RE, "<PHONE>")
    return d.select(
        "doc_id",
        F.regexp_count(raw, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(raw, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(raw, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.length(redacted).cast("long").alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )


PII_REDACT_SQL = f"""
WITH enriched AS (
  SELECT doc_id, {_ENRICHED_SQL} AS raw FROM documents
), red AS (
  SELECT doc_id, raw,
         regexp_replace(
           regexp_replace(
             regexp_replace(raw, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{IPV4_RE}', '<IP>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g') AS redacted
  FROM enriched
)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(raw, '{IPV4_RE}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(raw, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(length(redacted) AS BIGINT) AS redacted_len,
       md5(redacted) AS redacted_md5
FROM red
"""


# ----------------------------------------------------------- url dedup

#: Three URL spellings of the same logical page, keyed by doc_id % 3:
#: tracking parameters, SHOUTING scheme+host, trailing slash + fragment.
def _url_expr() -> Column:
    page = F.concat(
        F.lit("/articles/"), (F.col("doc_id") % 50).cast("string")
    )
    host_n = (F.col("doc_id") % 7).cast("string")
    v = F.col("doc_id") % 3
    return (
        F.when(
            v == 0,
            F.concat(
                F.lit("https://www.example"), host_n, F.lit(".com"), page,
                F.lit("?utm_source=feed&utm_campaign="), F.col("source"),
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("HTTPS://WWW.EXAMPLE"), host_n, F.lit(".COM"), page
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://www.example"), host_n, F.lit(".com"), page,
                F.lit("/#section-2"),
            )
        )
    )


_URL_SQL = """
CASE doc_id % 3
  WHEN 0 THEN 'https://www.example' || CAST(doc_id % 7 AS VARCHAR)
              || '.com/articles/' || CAST(doc_id % 50 AS VARCHAR)
              || '?utm_source=feed&utm_campaign=' || source
  WHEN 1 THEN 'HTTPS://WWW.EXAMPLE' || CAST(doc_id % 7 AS VARCHAR)
              || '.COM/articles/' || CAST(doc_id % 50 AS VARCHAR)
  ELSE 'https://www.example' || CAST(doc_id % 7 AS VARCHAR)
       || '.com/articles/' || CAST(doc_id % 50 AS VARCHAR) || '/#section-2'
END
"""


#: Canonicalization pipeline, applied in order.  No backreferences: the
#: scheme/host prefix is extracted (group 0), lowercased, and re-glued to
#: the untouched remainder, instead of a case-mangling whole-string pass.
_SCHEME_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
_UTM_RE = r"[?&]utm_[A-Za-z_]+=[^&#]*"


def canonicalize_url(url: Column) -> Column:
    """Lowercase scheme+host, strip ``www.``, tracking params, fragments,
    and trailing slashes.  Pure engine-neutral regex composition."""
    prefix = F.regexp_extract(url, _SCHEME_HOST_RE, 0)
    rest = F.substring(url, F.length(prefix) + 1, F.lit(2_147_483_647))
    prefix = F.lower(prefix)
    prefix = F.regexp_replace(prefix, r"^(https?://)www\.", r"$1")
    rest = F.regexp_replace(rest, r"#.*$", "")          # fragment
    rest = F.regexp_replace(rest, _UTM_RE, "")          # tracking params
    rest = F.regexp_replace(rest, r"\?&", "?")          # ?&rest → ?rest
    # a stripped LEADING ?utm_… leaves the next param glued with '&':
    # promote the first '&' to '?' when no '?' survived before it
    # (anchored → single match; '$1' is Java's group ref, the oracle's
    # RE2 twin spells it '\\1')
    rest = F.regexp_replace(rest, r"^([^?]*?)&", r"$1?")
    rest = F.regexp_replace(rest, r"\?$", "")           # bare trailing ?
    rest = F.regexp_replace(rest, r"/$", "")            # trailing slash
    return F.concat(prefix, rest)


def dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_dedup_url: canonical-URL refetch dedup — group documents by the
    canonical form of their URL, keep the lowest doc_id as the survivor,
    and report the duplicate count per canonical page."""
    d = load_table(spark, sf_dir, "documents")
    canon = canonicalize_url(_url_expr())
    return (
        d.select("doc_id", canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


# The oracle's prefix lowering + www-strip avoids $1-vs-\1 backreference
# divergence the same way: RE2 spells the group ``\1``, Java ``$1``, so
# the SQL twin strips ``www.`` with a plain replace on the (now
# lowercased, scheme-anchored) prefix instead.
DEDUP_URL_SQL = f"""
WITH urls AS (
  SELECT doc_id, ({_URL_SQL}) AS url FROM documents
), split AS (
  SELECT doc_id,
         lower(regexp_extract(url, '{_SCHEME_HOST_RE}')) AS prefix,
         substr(url, length(regexp_extract(url, '{_SCHEME_HOST_RE}')) + 1)
           AS rest
  FROM urls
), canon AS (
  SELECT doc_id,
         replace(prefix, '://www.', '://')
         || regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(rest, '#.*$', ''),
                      '{_UTM_RE}', '', 'g'),
                    '\\?&', '?'),
                  '^([^?]*?)&', '\\1?'),
                '\\?$', ''),
              '/$', '') AS canonical_url
  FROM split
)
SELECT canonical_url,
       COUNT(*) AS n_variants,
       MIN(doc_id) AS keeper_doc_id
FROM canon
GROUP BY canonical_url
"""


QUERIES = {
    "q_pii_redact": pii_redact,
    "q_dedup_url": dedup_url,
}

ORACLE = {
    "q_pii_redact": PII_REDACT_SQL,
    "q_dedup_url": DEDUP_URL_SQL,
}
