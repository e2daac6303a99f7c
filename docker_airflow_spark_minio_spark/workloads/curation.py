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


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 + vector cosine fused by reciprocal-rank fusion
# ---------------------------------------------------------------------------

# The modern RAG retrieval primitive: a lexical ranking and a dense
# ranking are computed INDEPENDENTLY, truncated to a candidate pool,
# and fused by RRF (Cormack et al. 2009): score(d) = sum over rankings
# of 1/(k + rank_d), k=60.  Kept integer-exact: floor(1e6/(60+rank))
# per list, so the fused score and its ordering are bit-identical
# across engines.  The query is document/vector id 0 (the PQ/ADC
# convention); both pools exclude it.
RRF_K = 60
RRF_POOL = 20
RRF_TOPK = 10

_RRF_COS = (
    "ROUND(list_dot_product(a.v, q.qv) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6)"
)


@register(
    "retrieval_rrf_hybrid_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {tokens_sql('text')} AS t FROM documents WHERE doc_id <> 0
    ),
    d AS (
        SELECT doc_id, len(t) AS dl,
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
        SELECT doc_id,
               {" + ".join(
                   f"(((2 * n - 2 * df{i} + 1) * 1000000) // (2 * df{i} + 1))"
                   f" * ((22000 * tf{i} * 1000000) // "
                   f"(10000 * tf{i} + 3000 + 9 * ((1000000 * dl) // avg_x1000)))"
                   f" // 1000000"
                   for i in range(len(BM25_QUERY))
               )} AS s
        FROM d CROSS JOIN stats
    ),
    lex AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS r
        FROM (SELECT doc_id, s FROM scored ORDER BY s DESC, doc_id LIMIT {RRF_POOL})
    ),
    q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ),
    dv AS (
        SELECT a.vec_id AS doc_id, {_RRF_COS} AS cos
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id <> 0) a CROSS JOIN q
    ),
    den AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS r
        FROM (SELECT doc_id, cos FROM dv ORDER BY cos DESC, doc_id LIMIT {RRF_POOL})
    ),
    fused AS (
        SELECT COALESCE(lex.doc_id, den.doc_id) AS doc_id,
               lex.r AS lex_rank, den.r AS den_rank,
               COALESCE(1000000 // ({RRF_K} + lex.r), 0)
                 + COALESCE(1000000 // ({RRF_K} + den.r), 0) AS rrf_x1e6
        FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id
    )
    SELECT doc_id, CAST(rrf_x1e6 AS BIGINT) AS rrf_x1e6,
           CAST(lex_rank AS BIGINT) AS lex_rank,
           CAST(den_rank AS BIGINT) AS den_rank
    FROM fused ORDER BY rrf_x1e6 DESC, doc_id LIMIT {RRF_TOPK}
    """,
    category="text",
    description=f"hybrid retrieval: integer-exact BM25 ranking and dense "
    f"cosine ranking (query = id 0), each truncated to a {RRF_POOL}-"
    f"candidate pool via TakeOrderedAndProject, FULL OUTER joined and "
    f"fused by reciprocal-rank fusion (floor(1e6/({RRF_K}+rank)) per "
    "list) -- the RAG lexical+dense pattern with no float in the fused "
    "ordering",
)
def retrieval_rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: both rankings are map-only scoring passes into
    TakeOrderedAndProject pools (per-partition heaps, no global sort of
    the corpus); ranks come from a window over the POOL (RRF_POOL rows,
    single tiny partition -- never the corpus); the fusion join is
    pool-sized.  At 10^9 docs the dense side would swap brute-force
    scoring for the IVF/PQ entries' probe plan; the fusion stays
    identical."""
    from ..functions.vectors import cosine_similarity
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    docs = t["documents"].where(F.col("doc_id") != 0)
    tok = docs.select("doc_id", tokens_expr("text").alias("t"))
    d = tok.select(
        "doc_id",
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
    scored = d.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        sum(
            F.expr(
                f"(((2 * n - 2 * df{i} + 1) * 1000000) DIV (2 * df{i} + 1))"
                f" * ((22000 * tf{i} * 1000000) DIV "
                f"(10000 * tf{i} + 3000 + 9 * ((1000000 * dl) DIV avg_x1000)))"
                f" DIV 1000000"
            )
            for i in range(len(BM25_QUERY))
        ).alias("s"),
    )
    pool_w = Window.orderBy(F.col("s").desc(), "doc_id")
    lex = (
        scored.orderBy(F.col("s").desc(), "doc_id")
        .limit(RRF_POOL)
        .select("doc_id", F.row_number().over(pool_w).cast("long").alias("lex_rank"))
    )
    emb = t["embeddings"]
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    dv = (
        emb.where(F.col("vec_id") != 0)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .crossJoin(F.broadcast(q))
        .select(
            "doc_id", F.round(cosine_similarity(F.col("v"), F.col("qv")), 6).alias("cos")
        )
    )
    den_w = Window.orderBy(F.col("cos").desc(), "doc_id")
    den = (
        dv.orderBy(F.col("cos").desc(), "doc_id")
        .limit(RRF_POOL)
        .select("doc_id", F.row_number().over(den_w).cast("long").alias("den_rank"))
    )
    fused = (
        lex.withColumnRenamed("doc_id", "lex_id")
        .join(
            den.withColumnRenamed("doc_id", "den_id"),
            F.col("lex_id") == F.col("den_id"),
            "full_outer",
        )
        .select(
            F.coalesce("lex_id", "den_id").alias("doc_id"),
            (
                F.coalesce(
                    F.expr(f"1000000 DIV ({RRF_K} + lex_rank)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000 DIV ({RRF_K} + den_rank)"), F.lit(0)
                )
            ).cast("long").alias("rrf_x1e6"),
            F.col("lex_rank"),
            F.col("den_rank"),
        )
    )
    return fused.orderBy(F.col("rrf_x1e6").desc(), "doc_id").limit(RRF_TOPK)


# ---------------------------------------------------------------------------
# Winsorized robust statistics (rank-based, integer-exact)
# ---------------------------------------------------------------------------

# Outlier-robust per-group stats for data cleaning: clamp each value to
# the group's [p5, p95] taken as RANK-based (type-1) quantiles --
# value at 1-indexed rank ceil(q*n) under a total (value, id) order --
# so the bounds are actual data values and everything stays integer.
WINSOR_LO_PCT = 5
WINSOR_HI_PCT = 95


@register(
    "text_winsorized_length_stats",
    oracle=f"""
    WITH r AS (
        SELECT lang, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n_chars, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents
    ),
    b AS (
        SELECT lang,
               MAX(CASE WHEN rn = (n * {WINSOR_LO_PCT} + 99) // 100
                        THEN n_chars END) AS lo_v,
               MAX(CASE WHEN rn = (n * {WINSOR_HI_PCT} + 99) // 100
                        THEN n_chars END) AS hi_v
        FROM r GROUP BY lang
    )
    SELECT r.lang,
           CAST(COUNT(*) AS BIGINT)                                AS n_docs,
           CAST(ANY_VALUE(lo_v) AS BIGINT)                         AS lo_v,
           CAST(ANY_VALUE(hi_v) AS BIGINT)                         AS hi_v,
           CAST(SUM(LEAST(GREATEST(n_chars, lo_v), hi_v)) AS BIGINT)
                                                                   AS wsum_chars,
           CAST(SUM(CASE WHEN n_chars < lo_v OR n_chars > hi_v
                         THEN 1 ELSE 0 END) AS BIGINT)             AS n_clamped,
           CAST((SUM(LEAST(GREATEST(n_chars, lo_v), hi_v)) * 1000)
                // COUNT(*) AS BIGINT)                             AS wmean_x1000
    FROM r JOIN b ON r.lang = b.lang
    GROUP BY r.lang ORDER BY r.lang
    """,
    category="text",
    description=f"winsorized per-lang length stats: rank-based "
    f"[p{WINSOR_LO_PCT}, p{WINSOR_HI_PCT}] bounds (value at rank "
    "ceil(q*n), unique (value, id) order), clamp, integer sum/mean -- "
    "the outlier-robust cleaning profile, zero floats end to end",
)
def text_winsorized_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: the exact-rank pass sorts within each lang partition
    (one shuffle on lang; per-group sort).  Fine while groups fit a
    sort spill budget; at 100 TB with mega-groups the bounds would come
    from the GK sketch entry (`sketch_quantile_bound`) instead and the
    clamp stays this same map+broadcast-join shape.  Bounds per group
    are metadata-sized (one row per lang), broadcast back to the scan."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir)["documents"].select(
        "lang", "doc_id", "n_chars"
    )
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    r = docs.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )
    b = r.groupBy(F.col("lang").alias("b_lang")).agg(
        F.max(
            F.when(
                F.col("rn") == F.expr(f"(n * {WINSOR_LO_PCT} + 99) DIV 100"),
                F.col("n_chars"),
            )
        ).alias("lo_v"),
        F.max(
            F.when(
                F.col("rn") == F.expr(f"(n * {WINSOR_HI_PCT} + 99) DIV 100"),
                F.col("n_chars"),
            )
        ).alias("hi_v"),
    )
    clamped = F.least(F.greatest(F.col("n_chars"), F.col("lo_v")), F.col("hi_v"))
    joined = r.join(F.broadcast(b), F.col("lang") == F.col("b_lang"))
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.any_value("lo_v").cast("long").alias("lo_v"),
            F.any_value("hi_v").cast("long").alias("hi_v"),
            F.sum(clamped).alias("wsum_chars"),
            F.sum(
                (
                    (F.col("n_chars") < F.col("lo_v"))
                    | (F.col("n_chars") > F.col("hi_v"))
                ).cast("long")
            ).alias("n_clamped"),
            F.expr(
                "(SUM(LEAST(GREATEST(n_chars, lo_v), hi_v)) * 1000) DIV COUNT(1)"
            ).alias("wmean_x1000"),
        )
        .orderBy("lang")
    )
