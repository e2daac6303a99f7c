"""Corpus-curation workloads: PII redaction, blocklist filtering, BM25
retrieval, repeated-span (exact-substring) duplication profiling.

The four curation shapes a training-data pipeline runs between raw crawl
and tokenization (extension surface per SURVEY.md section 7.2.5; the
reference has no text processing at all):

 * **PII redaction** -- regex detect + replace of emails / phone numbers
   / IPv4 addresses, with per-source accounting.  The synthetic corpus
   contains no digits, so the query SEEDS deterministic PII-shaped
   strings from ``doc_id`` first (identically in both engines) -- the
   redaction regexes then do real work and the oracle stays non-trivial.
 * **blocklist filter** -- drop documents containing any term of a small
   blocklist.  The list rides the plan as a literal array (map-only
   ``arrays_overlap``, zero shuffle); a large blocklist would instead
   broadcast-semi-join the exploded token column.
 * **BM25 top-k retrieval** -- a rational-arithmetic BM25 variant
   (k1=1.2, b=0.75) scored entirely in integer math so both engines are
   bit-identical: floats appear nowhere.  Two passes over the scan --
   one tiny corpus-stats aggregate (N, sum dl, per-term df) attached as
   a broadcast single-row value, then a map-only score + TakeOrdered.
 * **repeated spans** -- the exact-substring dedup signal (Lee et al.,
   "Deduplicating Training Data Makes Language Models Better"): the
   fraction of each document's 8-token windows that also occur in
   ANOTHER document, profiled per source.

Cross-engine exactness: ratios stay integer (``2*n_dup >= n_pos``
instead of ``>= 0.5``), BM25 uses only ``*``/``+``/integer division
(Spark ``DIV`` == DuckDB ``//`` for the all-positive operands here),
span identity is the shared md5-derived :func:`h32` (identical collision
behavior on both engines).

Scale notes (100 TB posture):
 * PII / blocklist: pure map over the scan, no shuffle; the aggregate
   shuffles one row per (source) group.
 * BM25: stats pass = one partial-aggregated reduce to ONE row; score
   pass = map-only + TakeOrderedAndProject (per-partition heaps).  The
   idf*saturation product stays < 2^53 up to ~10^6 docs; at larger N
   drop the idf scale from 1e6 to 1e3 (same formula, one constant).
 * repeated spans: shuffles carry (span-hash, doc_id) pairs only --
   never text.  Two shuffles on the span hash (posting-list aggregate,
   then the flag join); the join side reuses the aggregate's
   partitioning.  Pathological spans (boilerplate in millions of docs)
   fatten one posting list; the mitigation is the same df-cap used by
   dedup.py's inverted index (documented there).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h32, h32_sql
from ..functions.text import tokens_expr, tokens_sql
from .base import load_tables, register

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Conservative Java-regex/RE2 common subset ([0-9] over \d dodges any
# escaping drift between engines' SQL string literals).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
IP_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

# Deterministic PII seeding: every doc gains one email, one E.164-ish
# phone, one private IPv4, all derived from doc_id.
_AUG_SQL = (
    "text || ' contact doc' || CAST(doc_id AS VARCHAR) || '@example.com"
    " tel +1-202-555-0' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    " || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'"
)


def _aug_expr() -> Column:
    return F.concat(
        F.col("text"),
        F.lit(" contact doc"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel +1-202-555-0"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit(" ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1"),
    )


@register(
    "text_pii_redaction_stats",
    oracle=f"""
    WITH aug AS (
        SELECT source, {_AUG_SQL} AS s FROM documents
    ),
    red AS (
        SELECT source, s,
               regexp_replace(regexp_replace(regexp_replace(s,
                   '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g'),
                   '{IP_RE}', '<IP>', 'g') AS r,
               len(regexp_extract_all(s, '{EMAIL_RE}')) AS n_email,
               len(regexp_extract_all(s, '{PHONE_RE}')) AS n_phone,
               len(regexp_extract_all(s, '{IP_RE}'))    AS n_ip
        FROM aug
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)                    AS n_docs,
           CAST(SUM(n_email) AS BIGINT)                AS emails,
           CAST(SUM(n_phone) AS BIGINT)                AS phones,
           CAST(SUM(n_ip) AS BIGINT)                   AS ips,
           CAST(SUM(len(s) - len(r)) AS BIGINT)        AS chars_delta
    FROM red GROUP BY source ORDER BY source
    """,
    category="text",
    description="regex PII scrub (emails, phones, IPv4) with per-source "
    "hit counts and redacted-length delta; PII is deterministically "
    "seeded from doc_id so the redaction does real work on the synthetic "
    "corpus; pure map + one tiny aggregate",
)
def text_pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    aug = docs.select("source", _aug_expr().alias("s"))
    red = aug.select(
        "source",
        "s",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("s"), EMAIL_RE, "<EMAIL>"),
                PHONE_RE,
                "<PHONE>",
            ),
            IP_RE,
            "<IP>",
        ).alias("r"),
        F.size(F.regexp_extract_all("s", F.lit(EMAIL_RE), 0)).alias("n_email"),
        F.size(F.regexp_extract_all("s", F.lit(PHONE_RE), 0)).alias("n_phone"),
        F.size(F.regexp_extract_all("s", F.lit(IP_RE), 0)).alias("n_ip"),
    )
    return (
        red.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_email").alias("emails"),
            F.sum("n_phone").alias("phones"),
            F.sum("n_ip").alias("ips"),
            F.sum(F.length("s") - F.length("r")).alias("chars_delta"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Blocklist filtering
# ---------------------------------------------------------------------------

BLOCKLIST = ("spark", "leak", "shuffle")


@register(
    "text_blocklist_filter_stats",
    oracle=f"""
    WITH t AS (
        SELECT source, n_chars,
               CASE WHEN len(list_intersect({tokens_sql('text')},
                    [{", ".join(f"'{w}'" for w in BLOCKLIST)}])) > 0
                    THEN 1 ELSE 0 END AS blocked
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)                       AS n_docs,
           CAST(SUM(blocked) AS BIGINT)                   AS n_blocked,
           CAST(COUNT(*) - SUM(blocked) AS BIGINT)        AS n_kept,
           CAST(SUM(blocked * n_chars) AS BIGINT)         AS chars_blocked
    FROM t GROUP BY source ORDER BY source
    """,
    category="text",
    description="term-blocklist document filter with per-source "
    "kept/dropped accounting; the blocklist rides the plan as a literal "
    "array (map-only arrays_overlap, zero shuffle) -- a large list would "
    "broadcast-semi-join the exploded tokens instead",
)
def text_blocklist_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    blocked = (
        F.arrays_overlap(
            tokens_expr("text"), F.array(*[F.lit(w) for w in BLOCKLIST])
        )
        .cast("int")
        .alias("blocked")
    )
    t = docs.select("source", "n_chars", blocked)
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("blocked").alias("n_blocked"),
            (F.count(F.lit(1)) - F.sum("blocked")).alias("n_kept"),
            F.sum(F.col("blocked") * F.col("n_chars")).alias("chars_blocked"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# BM25 top-k retrieval (rational arithmetic)
# ---------------------------------------------------------------------------

BM25_QUERY = ("spark", "join", "window")
BM25_TOPK = 10


def _tf_expr(word: str) -> Column:
    """Term frequency in the pre-projected token array ``t`` (the lambda
    must be unary: a second parameter would make pyspark treat it as an
    (element, index) higher-order function)."""
    return F.size(F.filter("t", lambda x: x == F.lit(word))).cast("long")


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source, {tokens_sql('text')} AS t FROM documents
    ),
    d AS (
        SELECT doc_id, source, len(t) AS dl,
               {", ".join(
                   f"len(list_filter(t, x -> x = '{w}')) AS tf{i}"
                   for i, w in enumerate(BM25_QUERY)
               )}
        FROM tok
    ),
    stats AS (
        SELECT COUNT(*) AS n, (1000 * SUM(dl)) // COUNT(*) AS avg_x1000,
               {", ".join(
                   f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
                   for i in range(len(BM25_QUERY))
               )}
        FROM d
    ),
    scored AS (
        SELECT doc_id, source,
               {" + ".join(
                   f"(((2 * n - 2 * df{i} + 1) * 1000000) // (2 * df{i} + 1))"
                   f" * ((22000 * tf{i} * 1000000) // "
                   f"(10000 * tf{i} + 3000 + 9 * ((1000000 * dl) // avg_x1000)))"
                   f" // 1000000"
                   for i in range(len(BM25_QUERY))
               )} AS score_x1e6,
               {" + ".join(
                   f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END"
                   for i in range(len(BM25_QUERY))
               )} AS n_hit_terms
        FROM d CROSS JOIN stats
    )
    SELECT doc_id, source, CAST(score_x1e6 AS BIGINT) AS score_x1e6,
           CAST(n_hit_terms AS INT) AS n_hit_terms
    FROM scored ORDER BY score_x1e6 DESC, doc_id LIMIT {BM25_TOPK}
    """,
    category="text",
    description="BM25 (k1=1.2, b=0.75) top-k retrieval in pure integer "
    "arithmetic (rational idf (2N-2df+1)/(2df+1) at 1e6 scale): one "
    "single-row corpus-stats aggregate broadcast-attached, then map-only "
    "scoring into TakeOrderedAndProject",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    tok = docs.select("doc_id", "source", tokens_expr("text").alias("t"))
    d = tok.select(
        "doc_id",
        "source",
        F.size("t").cast("long").alias("dl"),
        *[_tf_expr(w).alias(f"tf{i}") for i, w in enumerate(BM25_QUERY)],
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("(1000 * SUM(dl)) DIV COUNT(*)").alias("avg_x1000"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(BM25_QUERY))
        ],
    )
    # Single-row corpus stats: broadcast cross join (the similarity.py
    # centroid-attach pattern) -- never a scaling-side shuffle.
    scored = d.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "source",
        sum(
            F.expr(
                f"(((2 * n - 2 * df{i} + 1) * 1000000) DIV (2 * df{i} + 1))"
                f" * ((22000 * tf{i} * 1000000) DIV "
                f"(10000 * tf{i} + 3000 + 9 * ((1000000 * dl) DIV avg_x1000)))"
                f" DIV 1000000"
            )
            for i in range(len(BM25_QUERY))
        ).alias("score_x1e6"),
        sum(
            (F.col(f"tf{i}") > 0).cast("int") for i in range(len(BM25_QUERY))
        ).alias("n_hit_terms"),
    )
    return scored.orderBy(
        F.col("score_x1e6").desc(), F.col("doc_id")
    ).limit(BM25_TOPK)


# ---------------------------------------------------------------------------
# Repeated-span (exact-substring) duplication profile
# ---------------------------------------------------------------------------

SPAN_TOKENS = 8


@register(
    "dedup_repeated_spans",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source, {tokens_sql('text')} AS t FROM documents
    ),
    pos AS (
        SELECT doc_id, source,
               {h32_sql(f"array_to_string(t[i:i+{SPAN_TOKENS - 1}], ' ')")} AS h
        FROM tok, unnest(generate_series(1, len(t) - {SPAN_TOKENS - 1})) AS u(i)
        WHERE len(t) >= {SPAN_TOKENS}
    ),
    nd AS (
        SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM pos GROUP BY h
    ),
    per AS (
        SELECT doc_id, any_value(source) AS source,
               COUNT(*) AS n_pos,
               SUM(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS n_dup
        FROM pos JOIN nd USING (h) GROUP BY doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)      AS n_docs,
           CAST(SUM(n_pos) AS BIGINT)    AS spans_total,
           CAST(SUM(n_dup) AS BIGINT)    AS spans_duplicated,
           CAST(SUM(CASE WHEN 2 * n_dup >= n_pos THEN 1 ELSE 0 END)
                AS BIGINT)               AS docs_half_duplicated
    FROM per GROUP BY source ORDER BY source
    """,
    category="dedup",
    description=f"exact-substring duplication profile (Lee et al. "
    f"dedup signal): fraction of {SPAN_TOKENS}-token windows that recur "
    f"in another document, per source; shuffles (span-hash, doc_id) "
    f"pairs only, never text",
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    tok = docs.select("doc_id", "source", tokens_expr("text").alias("t")).where(
        F.size("t") >= SPAN_TOKENS
    )
    spans = F.transform(
        F.sequence(F.lit(1), F.size("t") - (SPAN_TOKENS - 1)),
        lambda i: h32(F.array_join(F.slice("t", i, SPAN_TOKENS), " ")),
    )
    pos = tok.select(
        "doc_id", "source", F.explode(spans).alias("h")
    )
    nd = pos.groupBy("h").agg(F.countDistinct("doc_id").alias("ndocs"))
    per = (
        pos.join(nd, "h")
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            F.count(F.lit(1)).alias("n_pos"),
            F.sum((F.col("ndocs") > 1).cast("long")).alias("n_dup"),
        )
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pos").alias("spans_total"),
            F.sum("n_dup").alias("spans_duplicated"),
            F.sum((2 * F.col("n_dup") >= F.col("n_pos")).cast("long")).alias(
                "docs_half_duplicated"
            ),
        )
        .orderBy("source")
    )
