"""Training-corpus assembly operators over the ``documents`` table.

The steps a large-scale LLM-data pipeline runs AFTER cleaning/dedup to
turn a document pool into training batches (extension surface per
SURVEY.md section 7.2.5; the reference has no corpus operations):

 * **sequence packing** -- greedy arrival-order packing of documents
   into fixed token-budget bins (one window cumsum per source; the
   streaming-friendly packer, vs first-fit-decreasing which needs a
   global sort by length).
 * **corpus mixing / resampling** -- per-source deterministic
   downsampling to a uniform token budget: the hash-gated keep decision
   is a pure map, reproducible across runs and engines.
 * **cluster representatives** -- the dedup end-game: keep exactly one
   canonical document per near-dup cluster (longest text wins,
   smallest id tie-break).
 * **stopword scrub** -- function-word removal stats per language: the
   token/byte shrink a cleaning pass would produce.

Scale notes (100 TB posture):
 * packing and mixing shuffle once on ``source`` (window partition key);
   no driver-side state, no collect -- both are one-pass window/agg
   shapes that scale with the partition count
 * arrival-order packing keeps bins contiguous in ingest order, so the
   written bins preserve locality for sequential training reads
 * the resample keep-decision is ``h32(doc_id) % 10000 < rate_bp`` -- a
   deterministic per-row predicate: re-running the pipeline (or running
   it on another engine) keeps the SAME documents, the property that
   makes corpus builds auditable
 * representatives reuse the persisted MinHash pair frame and the
   connected-components operator (operators/graph.py); the argmax per
   cluster is a window head, one shuffle on the component id
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import h32, h32_sql
from ..functions.text import LANG_PROFILES, tokens_expr
from .base import load_tables, register
from .dedup import (
    CLUSTER_MIN_JACCARD_BP,
    _band_sql,
    _minhash_cte,
    _verified_pairs,
)

PACK_BUDGET_TOKENS = 512
MIX_TARGET_TOKENS = 600


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------


@register(
    "seqpack_token_bins",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ), c AS (
        SELECT source, n_tok,
               COALESCE(SUM(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM t
    ), b AS (
        SELECT source, CAST(FLOOR(cum_before / {PACK_BUDGET_TOKENS}.0) AS BIGINT) AS bin,
               n_tok
        FROM c
    )
    SELECT source, bin,
           CAST(COUNT(*) AS BIGINT)  AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS tok_sum,
           CAST(FLOOR(10000.0 * SUM(n_tok) / {PACK_BUDGET_TOKENS}) AS BIGINT) AS fill_bp
    FROM b GROUP BY source, bin ORDER BY source, bin
    """,
    category="pipeline",
    description=f"sequence packing: greedy arrival-order bins of "
    f"{PACK_BUDGET_TOKENS} tokens per source (window cumsum, one shuffle); "
    "a boundary-straddling doc spills into the open bin -- the one-pass "
    "streaming packer",
)
def seqpack_token_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    t = docs.select("source", "doc_id", F.size(tokens_expr("text")).alias("n_tok"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = t.select(
        "source",
        "n_tok",
        F.floor(
            F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / PACK_BUDGET_TOKENS
        ).alias("bin"),
    )
    return (
        binned.groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tok_sum"),
            F.floor(10000.0 * F.sum("n_tok") / PACK_BUDGET_TOKENS).alias("fill_bp"),
        )
        .orderBy("source", "bin")
    )


# ---------------------------------------------------------------------------
# Corpus mixing / deterministic resample
# ---------------------------------------------------------------------------


@register(
    "corpus_mix_resample",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ), s AS (
        SELECT source, doc_id, n_tok,
               SUM(n_tok) OVER (PARTITION BY source) AS tok_total
        FROM t
    ), r AS (
        SELECT source, doc_id, n_tok, tok_total,
               LEAST(10000, CAST(FLOOR(10000.0 * {MIX_TARGET_TOKENS} / tok_total)
                                 AS BIGINT)) AS rate_bp
        FROM s
    ), k AS (
        SELECT source, n_tok, tok_total, rate_bp,
               CASE WHEN {h32_sql('CAST(doc_id AS VARCHAR)')} % 10000 < rate_bp
                    THEN 1 ELSE 0 END AS keep
        FROM r
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)      AS n_docs,
           CAST(SUM(keep) AS BIGINT)     AS n_kept,
           CAST(MAX(tok_total) AS BIGINT) AS tok_total,
           CAST(SUM(keep * n_tok) AS BIGINT) AS tok_kept,
           CAST(MAX(rate_bp) AS BIGINT)  AS rate_bp
    FROM k GROUP BY source ORDER BY source
    """,
    category="pipeline",
    description=f"corpus mixing: downsample every source to ~{MIX_TARGET_TOKENS} "
    "tokens with a deterministic hash gate (h32(doc_id) % 10000 < rate) -- "
    "reproducible across runs and engines; per-source kept/total stats",
)
def corpus_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    t = docs.select("source", "doc_id", F.size(tokens_expr("text")).alias("n_tok"))
    w = Window.partitionBy("source")
    s = t.withColumn("tok_total", F.sum("n_tok").over(w))
    rate = F.least(
        F.lit(10000),
        F.floor(10000.0 * MIX_TARGET_TOKENS / F.col("tok_total")),
    )
    k = s.withColumn("rate_bp", rate).withColumn(
        "keep",
        F.when(
            h32(F.col("doc_id").cast("string")) % 10000 < F.col("rate_bp"), 1
        ).otherwise(0),
    )
    return (
        k.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").alias("n_kept"),
            F.max("tok_total").alias("tok_total"),
            F.sum(F.col("keep") * F.col("n_tok")).alias("tok_kept"),
            F.max("rate_bp").alias("rate_bp"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Cluster representatives (dedup end-game)
# ---------------------------------------------------------------------------


_REPRESENTATIVES_ORACLE = f"""
WITH RECURSIVE {_minhash_cte()},
bands AS ({_band_sql()}),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
pairs AS (
    SELECT c.doc_a, c.doc_b
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b
    WHERE FLOOR(10000.0 * len(list_intersect(sa.sh, sb.sh)) /
          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))))
          >= {CLUSTER_MIN_JACCARD_BP}
),
bi AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(id, r) AS (
    SELECT a, a FROM bi
    UNION
    SELECT bi.b, reach.r FROM reach JOIN bi ON bi.a = reach.id
),
comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
ranked AS (
    SELECT comp.component, d.doc_id, d.n_chars,
           COUNT(*) OVER (PARTITION BY comp.component) AS n_docs,
           ROW_NUMBER() OVER (
               PARTITION BY comp.component
               ORDER BY d.n_chars DESC, d.doc_id) AS rn
    FROM comp JOIN documents d ON d.doc_id = comp.id
)
SELECT component,
       CAST(n_docs AS BIGINT)  AS n_docs,
       doc_id                  AS rep_doc,
       CAST(n_chars AS BIGINT) AS rep_chars
FROM ranked WHERE rn = 1 ORDER BY component
"""


@register(
    "dedup_cluster_representatives",
    oracle=_REPRESENTATIVES_ORACLE,
    category="dedup",
    description="one canonical survivor per near-dup cluster: MinHash "
    "pairs -> connected components -> per-cluster argmax (longest text, "
    "smallest doc_id tie-break) -- the row a dedup pipeline actually keeps",
)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    pairs = _verified_pairs(spark, sf_dir).where(
        F.col("jaccard_bp") >= CLUSTER_MIN_JACCARD_BP
    )
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "n_chars")
    joined = comp.join(docs, comp["id"] == docs["doc_id"]).select(
        "component", "doc_id", "n_chars"
    )
    wc = Window.partitionBy("component")
    wr = wc.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        joined.withColumn("n_docs", F.count(F.lit(1)).over(wc))
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "component",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("doc_id").alias("rep_doc"),
            F.col("n_chars").cast("long").alias("rep_chars"),
        )
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# Stopword scrub stats
# ---------------------------------------------------------------------------

_STOPWORDS = sorted({w for words in LANG_PROFILES.values() for w in words})
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"


@register(
    "text_stopword_scrub_stats",
    oracle=f"""
    WITH t AS (
        SELECT lang, string_split(text, ' ') AS t FROM documents
    ), s AS (
        SELECT lang, len(t) AS n_tok,
               list_filter(t, x -> list_contains({_STOP_SQL}, x)) AS removed
        FROM t
    ), m AS (
        SELECT lang, n_tok, len(removed) AS n_removed,
               COALESCE(list_sum(list_transform(removed, x -> length(x))), 0)
                   AS bytes_removed
        FROM s
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)           AS n_docs,
           CAST(SUM(n_tok) AS BIGINT)         AS tok_total,
           CAST(SUM(n_removed) AS BIGINT)     AS tok_removed,
           CAST(SUM(bytes_removed) AS BIGINT) AS bytes_removed,
           CAST(FLOOR(10000.0 * SUM(n_removed) / SUM(n_tok)) AS BIGINT)
               AS removed_bp
    FROM m GROUP BY lang ORDER BY lang
    """,
    category="text",
    description="cleaning-pass scrub stats: function-word (stopword) "
    "token and byte removal per language -- pure array expressions, "
    "no shuffle before the per-lang rollup",
)
def text_stopword_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    stop = F.array(*[F.lit(w) for w in _STOPWORDS])
    t = docs.select("lang", tokens_expr("text").alias("t"))
    s = t.select(
        "lang",
        F.size("t").alias("n_tok"),
        F.filter("t", lambda x: F.array_contains(stop, x)).alias("removed"),
    )
    m = s.select(
        "lang",
        "n_tok",
        F.size("removed").alias("n_removed"),
        F.aggregate(
            "removed", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("bytes_removed"),
    )
    return (
        m.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tok_total"),
            F.sum("n_removed").alias("tok_removed"),
            F.sum("bytes_removed").alias("bytes_removed"),
            F.floor(10000.0 * F.sum("n_removed") / F.sum("n_tok")).alias("removed_bp"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# REST ingest roundtrip: the bronze pipeline under the oracle gate
# ---------------------------------------------------------------------------

# The ingestion operators (paginated REST source with retry fan-out,
# NDJSON bronze landing with temp-prefix swap) previously had pytest
# coverage only.  This entry drives the WHOLE path -- size probe ->
# executor-side page fetches -> bronze write -> partitioned NDJSON read
# back -> aggregate -- against a deterministic fetcher that serves the
# documents table as a paginated JSON API, so the driver's DuckDB gate
# verifies the pipeline end-to-end: the aggregate over what landed in
# bronze must hash-match the aggregate over the source table.
REST_PER_PAGE = 100


@register(
    "pipeline_rest_ingest_roundtrip",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)     AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total
    FROM documents GROUP BY lang ORDER BY lang
    """,
    category="pipeline",
    description="bronze ingest roundtrip: paginated REST source (meta "
    "probe, executor-side page fetch fan-out, retry path) -> NDJSON "
    "bronze landing (temp-prefix swap) -> partitioned read-back -> "
    "aggregate; the oracle checks the landed data against the source "
    "table, putting the ingestion operators under the correctness gate",
)
def pipeline_rest_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import shutil
    import tempfile

    from ..sources.files import read_ndjson
    from ..sources.rest import PaginatedRestSource

    path = f"{sf_dir.rstrip('/')}/documents.parquet"
    per_page = REST_PER_PAGE

    # Nested so cloudpickle ships it by value to the executors; serves
    # the parquet table as a paginated JSON API, deterministically.
    # (Test-harness stand-in for an HTTP endpoint: it reads the source
    # parquet directly, so the executors must see the same filesystem --
    # true in local mode and in any cluster whose testdata lives on
    # shared storage; a real deployment points the source at an actual
    # REST service and this closure disappears.)
    def fetcher(url: str) -> str:
        import json as _json
        import re as _re

        import pyarrow.parquet as _pq

        pf = _pq.ParquetFile(path)
        if url.endswith("/meta"):
            return _json.dumps({"total": int(pf.metadata.num_rows)})
        page = int(_re.search(r"page=(\d+)", url).group(1))
        lo, hi = (page - 1) * per_page, page * per_page
        # Row-group pruned read: only the groups overlapping this page's
        # row range are decoded -- per-page cost is O(page + row group),
        # not O(table) (the previous full read_table().to_pylist() per
        # page made the fetch phase O(pages x table rows)).
        out, start = [], 0
        for rg in range(pf.num_row_groups):
            n = pf.metadata.row_group(rg).num_rows
            if start < hi and start + n > lo:
                rows = pf.read_row_group(
                    rg, columns=["doc_id", "lang", "n_chars"]
                ).to_pylist()
                out.extend(rows[max(0, lo - start) : min(n, hi - start)])
            start += n
            if start >= hi:
                break
        return _json.dumps(out)

    src = PaginatedRestSource(
        "http://example.invalid/docs",
        per_page=per_page,
        fetcher=fetcher,
        wait_time=0.0,
    )
    # Deterministic landing dir keyed by sf_dir, cleared before each run:
    # repeat invocations reuse one prefix instead of leaking a fresh
    # mkdtemp per call.
    out_dir = (
        f"{tempfile.gettempdir()}/bronze_roundtrip_"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}"
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    src.write_bronze(spark, out_dir, "2024-01-01")
    landed = read_ndjson(spark, f"{out_dir}/sys_file_date=2024-01-01")
    return (
        landed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_total"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Padding-waste profile (length-bucketed batching)
# ---------------------------------------------------------------------------

# The packing-strategy comparison point for `seqpack_token_bins`: if
# instead of concat-packing you pad each document to its power-of-two
# length bucket (the dynamic-batching shape most serving/training
# dataloaders use), how many pad tokens do you pay per bucket?  Bucket
# = 2^ceil(log2(max(n_tok, MIN_BUCKET))) -- log2 is exact at powers of
# two in IEEE double, so both engines bucket identically.
PAD_MIN_BUCKET = 16


@register(
    "corpus_padding_waste",
    oracle=f"""
    WITH t AS (
        SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    ),
    b AS (
        SELECT n_tok,
               CAST(POW(2, CEIL(LOG2(GREATEST(n_tok, {PAD_MIN_BUCKET}))))
                    AS BIGINT) AS bucket
        FROM t
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT)              AS n_docs,
           CAST(SUM(n_tok) AS BIGINT)            AS sum_tokens,
           CAST(SUM(bucket - n_tok) AS BIGINT)   AS sum_pad,
           CAST((SUM(bucket - n_tok) * 1000) // SUM(bucket) AS BIGINT)
                                                 AS waste_permille
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    category="pipeline",
    description="padding-waste profile for power-of-two length-bucketed "
    "batching: per bucket, documents, real tokens, pad tokens and "
    "integer waste-permille -- the measurement that decides between "
    "pad-batching and the seqpack concat packer; pure map + one "
    "small-key aggregate",
)
def corpus_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    t = docs.select(F.size(F.split("text", " ")).cast("long").alias("n_tok"))
    b = t.select(
        "n_tok",
        F.pow(
            F.lit(2.0), F.ceil(F.log2(F.greatest("n_tok", F.lit(PAD_MIN_BUCKET))))
        )
        .cast("long")
        .alias("bucket"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
            F.sum(F.col("bucket") - F.col("n_tok")).alias("sum_pad"),
            F.expr(
                "(SUM(bucket - n_tok) * 1000) DIV SUM(bucket)"
            ).alias("waste_permille"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Exact per-group quota sampling (hash-ordered)
# ---------------------------------------------------------------------------

# The complement of the rate-based hash-gated samplers: take EXACTLY
# min(Q, n) documents per source, chosen by deterministic hash order
# (h32 of the doc id -- uniform, reproducible, engine-identical), the
# way a balanced training mix pins per-domain document counts.
QUOTA_PER_SOURCE = 40


@register(
    "corpus_quota_sample",
    oracle=f"""
    WITH r AS (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY {h32_sql("CAST(doc_id AS VARCHAR)")}, doc_id
               ) AS rn
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)     AS n_taken,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(doc_id) AS BIGINT)  AS min_doc_id
    FROM r WHERE rn <= {QUOTA_PER_SOURCE}
    GROUP BY source ORDER BY source
    """,
    category="pipeline",
    description=f"exact per-source quota sample: first {QUOTA_PER_SOURCE} "
    "documents per source in deterministic h32 order -- fixed per-domain "
    "document COUNTS (vs the rate-based hash-gated samplers' "
    "proportions), the balanced-mix primitive; per-group rank over "
    "(hash, id)",
)
def corpus_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: ranking partitions by source and sorts by hash --
    with mega-sources, swap the full sort for the two-phase salted
    top-k (similarity.py::_two_phase_topk shape: per-salt partial
    quota, then final) since only Q winners per group survive; the
    roll-up is one small-key aggregate either way."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir)["documents"]
    w = Window.partitionBy("source").orderBy(
        h32(F.col("doc_id").cast("string")), "doc_id"
    )
    r = docs.select(
        "source", "doc_id", "n_chars", F.row_number().over(w).alias("rn")
    )
    return (
        r.where(F.col("rn") <= QUOTA_PER_SOURCE)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_taken"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Weighted (importance) sampling with a calibration monitor
# ---------------------------------------------------------------------------

# Per-document inclusion probability proportional to a weight, capped at
# 1 -- the Poisson/Bernoulli importance sampler large corpus-curation
# runs use when per-document quality or length should bias retention
# (heavier docs likelier kept), as opposed to the uniform and per-group
# rate gates above.  Weight here: n_chars capped at WEIGHTED_CAP_CHARS
# (docs at/above the cap are always kept), so p_bp = min(10000,
# n_chars * 10000 / cap) stays integer basis points.  The gate is a
# SALTED h32 stream ("ws:" prefix), independent of every other
# sampler's gate in the registry.
WEIGHTED_CAP_CHARS = 400  # 10000 bp / 400 chars = 25 bp per char


@register(
    "corpus_weighted_sample",
    oracle=f"""
    WITH p AS (
        SELECT source, n_chars,
               LEAST(10000, n_chars * {10000 // WEIGHTED_CAP_CHARS}) AS p_bp,
               CASE WHEN {h32_sql("'ws:' || CAST(doc_id AS VARCHAR)")} % 10000
                         < LEAST(10000, n_chars * {10000 // WEIGHTED_CAP_CHARS})
                    THEN 1 ELSE 0 END AS keep
        FROM documents
    ),
    g AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT)          AS n_docs,
               CAST(SUM(keep) AS BIGINT)         AS n_sampled,
               CAST(SUM(p_bp) AS BIGINT)         AS expected_bp,
               CAST(SUM(keep * n_chars) AS BIGINT) AS chars_sampled
        FROM p GROUP BY source
    )
    SELECT source, n_docs, n_sampled, expected_bp, chars_sampled,
           (n_sampled * 10000 - expected_bp) AS dev_bp,
           CASE WHEN ABS(n_sampled * 10000 - expected_bp)
                     <= 50000 + 5 * CAST(FLOOR(SQRT(expected_bp * 10000.0))
                                         AS BIGINT)
                THEN 1 ELSE 0 END AS within_5_sigma
    FROM g ORDER BY source
    """,
    category="pipeline",
    description="weighted (importance) sampling: per-document inclusion "
    "probability proportional to doc length capped at "
    f"{WEIGHTED_CAP_CHARS} chars, gated by a salted deterministic h32 "
    "stream -- reproducible across runs/engines, map-only; per-source "
    "realized-vs-expected deviation with a 5-sigma calibration flag "
    "(the estimator-monitor pattern of dedup_minhash_estimate_"
    "calibration)",
)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes: the gate is a per-row hash compare (map-only, no
    shuffle, no RNG state to coordinate across executors -- re-running
    the job reproduces the identical sample, which downstream training
    reproducibility requires); the roll-up is one small-key aggregate.
    Var(n_sampled) = sum p(1-p) <= sum p, so dev_bp's 5-sigma envelope
    is 5*sqrt(expected_bp*1e4) (+a 5-doc floor for tiny groups); IEEE
    sqrt is correctly rounded in both engines, keeping the flag
    hash-identical."""
    docs = load_tables(spark, sf_dir)["documents"]
    bp_per_char = 10000 // WEIGHTED_CAP_CHARS
    p_bp = F.least(F.lit(10000), F.col("n_chars") * bp_per_char)
    p = docs.select(
        "source",
        "n_chars",
        p_bp.alias("p_bp"),
        (
            h32(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))) % 10000
            < p_bp
        )
        .cast("long")
        .alias("keep"),
    )
    g = p.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("keep").alias("n_sampled"),
        F.sum("p_bp").alias("expected_bp"),
        F.sum(F.col("keep") * F.col("n_chars")).alias("chars_sampled"),
    )
    dev = F.col("n_sampled") * 10000 - F.col("expected_bp")
    bound = F.lit(50000) + 5 * F.floor(
        F.sqrt(F.col("expected_bp") * 10000.0)
    ).cast("long")
    return g.select(
        "source",
        "n_docs",
        "n_sampled",
        "expected_bp",
        "chars_sampled",
        dev.alias("dev_bp"),
        F.when(F.abs(dev) <= bound, 1).otherwise(0).alias("within_5_sigma"),
    ).orderBy("source")
