"""LM training-data curation workloads: published-rule quality filtering,
corpus-LM novelty scoring, importance-resampling feature leans, and
temperature-based mixture weights.

These extend the text/curation families with the *named* techniques a
large-scale pretraining pipeline runs (the reference computes nothing
text-analytic -- its documents are opaque payloads; SURVEY.md section
7.2.5 marks this whole family as extension surface):

* Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
  Methods, Analysis & Insights from Training Gopher", App. A1.1)
* corpus bigram-LM novelty (the KenLM-style rarity filter shape of
  CCNet/RefinedWeb, re-expressed as exact integer document-frequency
  rarity so the oracle hash-matches)
* DSIR-style hashed n-gram importance leans (Xie et al. 2023, "Data
  Selection for Language Models via Importance Resampling"),
  integer-exact via cross-multiplied ratio comparison
* unigram-LM temperature sampling weights (multilingual mixing a la
  XLM-R: weight ~ n^alpha) -- exact across engines because IEEE-754
  mandates correctly-rounded sqrt, so alpha in {0.5, 0.25} is portable

Everything stays JVM-side (split / higher-order functions / one hash
aggregate); ratios are integer per-mille (``a*1000 // b``), never float
division, so every output column is bit-exact against DuckDB.

Scale notes (100 TB posture):
 * gopher rules: scan -> project -> one low-cardinality hash agg; zero
   joins, zero Python
 * bigram novelty: the document-frequency table is filtered to df >= 2
   BEFORE the back-join, dropping the singleton tail that dominates web
   corpora (Zipf: most bigrams are unique), and bigrams travel as 8-byte
   portable hashes, never strings
 * DSIR leans: the per-bucket model is a FIXED 1024-row table (hashed
   feature space), broadcast back over a map-only scoring pass -- the
   same two-aggregate shape at any corpus size
 * temperature weights: one aggregate to per-source counts (rows ==
   number of sources), then driver-free 1-row-broadcast normalization
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import h32, h32_sql
from ..functions.text import (
    shingles_from_tokens,
    shingles_sql,
    tokens_expr,
    tokens_sql,
)
from .base import PersistCache, load_tables, register

#: (doc_id, lang, gh) -- one row per DISTINCT hashed bigram per document
#: (gh NULL for bigram-less docs, so they stay countable).  Built once,
#: consumed by the df-build, the back-join, and the per-doc totals of
#: ``text_bigram_novelty`` -- without the cache each branch would re-run
#: the tokenize+shingle+md5 pipeline, the expensive part of the query.
_BIGRAM_CACHE = PersistCache("bigram_hashes")

# Gopher's "stop word" presence rule uses this fixed list (Rae et al.
# 2021 App. A1.1: a document must contain at least two of them).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# Hashed feature space for the DSIR lean model (the paper uses 10k
# buckets for hashed n-grams; 1024 keeps the bucket table obviously
# broadcastable while preserving the shape).
DSIR_BUCKETS = 1024


@register(
    "text_gopher_quality_rules",
    oracle=f"""
    WITH t AS (
        SELECT lang,
               {tokens_sql("text")}                                AS toks,
               length(replace(text, ' ', ''))                      AS wchars,
               len(regexp_extract_all(text, '#|\\.\\.\\.'))        AS n_sym
        FROM documents
    ), f AS (
        SELECT lang,
               len(toks) AS n_tok,
               wchars,
               n_sym,
               len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
                   AS n_alpha,
               len(list_intersect(list_distinct(toks),
                   {GOPHER_STOPWORDS!r}))                           AS n_stop
        FROM t
    ), r AS (
        SELECT lang,
               CASE WHEN n_tok BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
                   AS r_wordcount,
               CASE WHEN wchars >= 3 * n_tok AND wchars <= 10 * n_tok
                    THEN 1 ELSE 0 END                               AS r_meanlen,
               CASE WHEN n_sym * 10 <= n_tok THEN 1 ELSE 0 END      AS r_symbol,
               CASE WHEN n_alpha * 10 >= n_tok * 8 THEN 1 ELSE 0 END
                   AS r_alpha,
               CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END              AS r_stopword
        FROM f
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)          AS n_docs,
           CAST(SUM(r_wordcount) AS BIGINT)  AS n_wordcount,
           CAST(SUM(r_meanlen) AS BIGINT)    AS n_meanlen,
           CAST(SUM(r_symbol) AS BIGINT)     AS n_symbol,
           CAST(SUM(r_alpha) AS BIGINT)      AS n_alpha_ok,
           CAST(SUM(r_stopword) AS BIGINT)   AS n_stopword,
           CAST(SUM(r_wordcount * r_meanlen * r_symbol * r_alpha
                    * r_stopword) AS BIGINT) AS n_pass_all,
           CAST((SUM(r_wordcount * r_meanlen * r_symbol * r_alpha
                     * r_stopword) * 1000) // COUNT(*) AS BIGINT)
               AS pass_all_pm
    FROM r GROUP BY lang ORDER BY lang
    """,
    category="text",
    description="Gopher quality rules (Rae et al. 2021 App. A1.1): word "
    "count 50..100k, mean word length 3..10, #/ellipsis symbol ratio "
    "<= 0.1, >= 80% alphabetic words, >= 2 Gopher stop words -- all as "
    "pure integer comparisons; per-lang per-rule pass counts (the "
    "line-level bullet/ellipsis rules need line structure the synthetic "
    "corpus lacks and are documented out)",
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: scan -> project (whole-stage codegen, no Python) -> one
    hash aggregate on ``lang``.  The mean-word-length rule is the exact
    integer form ``3*n_tok <= wchars <= 10*n_tok`` (wchars = characters
    excluding spaces), so no float division anywhere."""
    docs = load_tables(spark, sf_dir)["documents"]
    t = tokens_expr("text")
    feats = docs.select(
        "lang",
        F.size(t).alias("n_tok"),
        F.length(F.regexp_replace("text", " ", "")).alias("wchars"),
        F.size(F.regexp_extract_all("text", F.lit(r"#|\.\.\."), 0)).alias(
            "n_sym"
        ),
        F.size(F.filter(t, lambda x: x.rlike("[a-zA-Z]"))).alias("n_alpha"),
        F.size(
            F.array_intersect(
                F.array_distinct(t),
                F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            )
        ).alias("n_stop"),
    )
    rules = feats.select(
        "lang",
        F.when(F.col("n_tok").between(50, 100000), 1).otherwise(0).alias(
            "r_wordcount"
        ),
        F.when(
            (F.col("wchars") >= 3 * F.col("n_tok"))
            & (F.col("wchars") <= 10 * F.col("n_tok")),
            1,
        )
        .otherwise(0)
        .alias("r_meanlen"),
        F.when(F.col("n_sym") * 10 <= F.col("n_tok"), 1).otherwise(0).alias(
            "r_symbol"
        ),
        F.when(F.col("n_alpha") * 10 >= F.col("n_tok") * 8, 1)
        .otherwise(0)
        .alias("r_alpha"),
        F.when(F.col("n_stop") >= 2, 1).otherwise(0).alias("r_stopword"),
    )
    passed = (
        F.col("r_wordcount")
        * F.col("r_meanlen")
        * F.col("r_symbol")
        * F.col("r_alpha")
        * F.col("r_stopword")
    )
    return (
        rules.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("r_wordcount").alias("n_wordcount"),
            F.sum("r_meanlen").alias("n_meanlen"),
            F.sum("r_symbol").alias("n_symbol"),
            F.sum("r_alpha").alias("n_alpha_ok"),
            F.sum("r_stopword").alias("n_stopword"),
            F.sum(passed).alias("n_pass_all"),
            F.expr(
                "(SUM(r_wordcount * r_meanlen * r_symbol * r_alpha "
                "* r_stopword) * 1000) DIV COUNT(*)"
            ).alias("pass_all_pm"),
        )
        .orderBy("lang")
    )


_BIGRAM_HASH_SQL = (
    "list_distinct(list_transform("
    + shingles_sql(tokens_sql("text"), 2)
    + ", g -> " + h32_sql("g") + "))"
)


@register(
    "text_bigram_novelty",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang, {_BIGRAM_HASH_SQL} AS bh FROM documents
    ), e AS (
        SELECT doc_id, lang, len(bh) AS n_bi, UNNEST(bh) AS gh FROM d
    ), seen AS (
        SELECT gh FROM e GROUP BY gh HAVING COUNT(*) >= 2
    ), m AS (
        SELECT e.doc_id, COUNT(*) AS n_seen
        FROM e JOIN seen USING (gh) GROUP BY e.doc_id
    ), a AS (
        SELECT d.lang, len(d.bh) AS n_bi, COALESCE(m.n_seen, 0) AS n_seen
        FROM d LEFT JOIN m ON d.doc_id = m.doc_id
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)            AS n_docs,
           CAST(SUM(n_bi) AS BIGINT)           AS sum_bigrams,
           CAST(SUM(n_bi - n_seen) AS BIGINT)  AS sum_novel,
           CAST((SUM(n_bi - n_seen) * 1000) // SUM(n_bi) AS BIGINT)
               AS novelty_pm
    FROM a GROUP BY lang ORDER BY lang
    """,
    category="text",
    description="corpus bigram-LM novelty (the CCNet/KenLM rarity-filter "
    "shape): per-document share of distinct bigrams seen NOWHERE else in "
    "the corpus, as exact integer per-mille; bigrams travel as portable "
    "32-bit hashes and the df table is pruned to df>=2 before the "
    "back-join (the Zipf singleton tail never shuffles twice)",
)
def text_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one posting-list shuffle on 8-byte bigram hashes to build
    the document-frequency table, pruned to df >= 2 (at web scale most
    bigrams are singletons -- they are NOVEL by definition and never
    join), then one join back and two low-cardinality aggregates.  A
    float perplexity would need ln(), which is not correctly-rounded
    across engines; df-rarity is the exact-integer projection of the
    same filter."""
    def _build() -> DataFrame:
        docs = load_tables(spark, sf_dir)["documents"]
        sel = docs.select(
            "doc_id",
            "lang",
            tokens_expr("text").alias("toks"),
        ).select(
            "doc_id",
            "lang",
            F.array_distinct(
                F.transform(
                    shingles_from_tokens(F.col("toks"), 2), lambda g: h32(g)
                )
            ).alias("bh"),
        )
        # explode_outer keeps bigram-less documents as a single NULL-gh
        # row, so they still count into n_docs with n_bi = 0
        return sel.select("doc_id", "lang", F.explode_outer("bh").alias("gh"))

    ex = _BIGRAM_CACHE.get_or_build(spark, sf_dir, _build)
    seen = (
        ex.where(F.col("gh").isNotNull())
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= 2)
        .select("gh")
    )
    matched = (
        ex.join(seen, "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_seen"))
    )
    per_doc = (
        ex.groupBy("doc_id", "lang")
        .agg(F.count("gh").alias("n_bi"))
        .join(matched, "doc_id", "left")
        .fillna(0, ["n_seen"])
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bi").alias("sum_bigrams"),
            F.sum(F.col("n_bi") - F.col("n_seen")).alias("sum_novel"),
            F.expr("(SUM(n_bi - n_seen) * 1000) DIV SUM(n_bi)").alias(
                "novelty_pm"
            ),
        )
        .orderBy("lang")
    )


@register(
    "curation_dsir_feature_lean",
    oracle=f"""
    WITH ex AS (
        SELECT source, lang,
               {h32_sql("tok")} % {DSIR_BUCKETS} AS bucket
        FROM (SELECT source, lang, UNNEST({tokens_sql("text")}) AS tok
              FROM documents)
    ), b AS (
        SELECT bucket,
               COUNT(*)                                        AS raw_cnt,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)    AS tgt_cnt
        FROM ex GROUP BY bucket
    ), tot AS (
        SELECT SUM(raw_cnt) AS r_total, SUM(tgt_cnt) AS t_total FROM b
    ), lean AS (
        SELECT bucket,
               CASE WHEN CAST(tgt_cnt AS HUGEINT) * r_total
                         > CAST(raw_cnt AS HUGEINT) * t_total
                    THEN 1 ELSE 0 END AS leans_target
        FROM b, tot
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)                  AS n_tokens,
           CAST(SUM(leans_target) AS BIGINT)         AS n_lean_tokens,
           CAST((SUM(leans_target) * 1000) // COUNT(*) AS BIGINT)
               AS lean_pm
    FROM ex JOIN lean USING (bucket)
    GROUP BY source ORDER BY source
    """,
    category="curation",
    description="DSIR-style importance lean (Xie et al. 2023): hashed "
    "unigram features into 1024 buckets; a bucket leans target when its "
    "target-share exceeds its raw-share (cross-multiplied in 38-digit "
    "integers -- no float ratio), target = lang='en'; per-source share "
    "of tokens in target-leaning buckets as integer per-mille",
)
def curation_dsir_feature_lean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the bucket model is a FIXED 1024-row aggregate whatever the
    corpus size -- built in one shuffle, normalized against a 1-row
    total, broadcast back over a map-side join.  The ratio comparison
    cross-multiplies in decimal(38,0) (HUGEINT on the oracle side)
    because bucket_count * corpus_total overflows int64 at ~1e13 tokens,
    which a 100 TB corpus exceeds."""
    docs = load_tables(spark, sf_dir)["documents"]
    ex = docs.select(
        "source", "lang", F.explode(tokens_expr("text")).alias("tok")
    ).select(
        "source",
        "lang",
        (h32(F.col("tok")) % DSIR_BUCKETS).alias("bucket"),
    )
    b = ex.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("tgt_cnt"),
    )
    # Totals via an unpartitioned window OVER THE BUCKET TABLE -- a
    # constant-size (<= DSIR_BUCKETS rows) post-aggregate frame, so the
    # single-partition window is bounded whatever the corpus size.  A
    # separate .agg() branch would re-derive b from lineage and scan the
    # whole documents table a third time (measured in the plan audit).
    w_all = Window.partitionBy()
    lean = b.select(
        "bucket",
        "raw_cnt",
        "tgt_cnt",
        F.sum("raw_cnt").over(w_all).alias("r_total"),
        F.sum("tgt_cnt").over(w_all).alias("t_total"),
    ).select(
        "bucket",
        F.when(
            F.col("tgt_cnt").cast("decimal(38,0)")
            * F.col("r_total").cast("decimal(38,0)")
            > F.col("raw_cnt").cast("decimal(38,0)")
            * F.col("t_total").cast("decimal(38,0)"),
            1,
        )
        .otherwise(0)
        .alias("leans_target"),
    )
    return (
        ex.join(F.broadcast(lean), "bucket")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("leans_target").alias("n_lean_tokens"),
            F.expr("(SUM(leans_target) * 1000) DIV COUNT(*)").alias(
                "lean_pm"
            ),
        )
        .orderBy("source")
    )


@register(
    "corpus_temperature_weights",
    oracle="""
    WITH s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ), w AS (
        SELECT source, n_docs,
               CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) * 1000000)
                    AS BIGINT) AS w_half_x1e6,
               CAST(FLOOR(sqrt(sqrt(CAST(n_docs AS DOUBLE))) * 1000000)
                    AS BIGINT) AS w_quarter_x1e6
        FROM s
    ), tot AS (
        SELECT SUM(w_half_x1e6) AS sum_half, MIN(w_half_x1e6) AS min_half
        FROM w
    )
    SELECT source, n_docs, w_half_x1e6, w_quarter_x1e6,
           CAST((w_half_x1e6 * 1000) // sum_half AS BIGINT)
               AS share_half_pm,
           CAST((w_half_x1e6 * 1000) // min_half AS BIGINT)
               AS upsample_x1000
    FROM w, tot ORDER BY source
    """,
    category="curation",
    description="unigram-LM temperature sampling weights (XLM-R-style "
    "multilingual mixing, weight ~ n^alpha for alpha in {0.5, 0.25}): "
    "portable because IEEE-754 mandates correctly-rounded sqrt, then "
    "integer-floored before any cross-source arithmetic; per-source "
    "mixture share and upsampling factor vs the smallest source",
)
def corpus_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one count aggregate to source granularity (rows == number
    of sources), then a 1-row-broadcast normalization -- no window over
    the corpus, no driver collect.  alpha is restricted to {0.5, 0.25}
    = sqrt / sqrt(sqrt): general pow() is NOT correctly-rounded across
    engines, sqrt is, so these weights hash-match bit-for-bit."""
    docs = load_tables(spark, sf_dir)["documents"]
    s = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = s.select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000000)
        .cast("bigint")
        .alias("w_half_x1e6"),
        F.floor(F.sqrt(F.sqrt(F.col("n_docs").cast("double"))) * 1000000)
        .cast("bigint")
        .alias("w_quarter_x1e6"),
    )
    tot = w.agg(
        F.sum("w_half_x1e6").alias("sum_half"),
        F.min("w_half_x1e6").alias("min_half"),
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "w_half_x1e6",
            "w_quarter_x1e6",
            F.expr("(w_half_x1e6 * 1000) DIV sum_half").alias(
                "share_half_pm"
            ),
            F.expr("(w_half_x1e6 * 1000) DIV min_half").alias(
                "upsample_x1000"
            ),
        )
        .orderBy("source")
    )


# Token budget for the apportionment entry: fixed so the oracle is a
# pure function of the corpus (any real pipeline passes its own).
APPORTION_BUDGET = 1_000_000


@register(
    "corpus_token_apportionment",
    oracle=f"""
    WITH s AS (
        SELECT source,
               CAST(SUM(len({tokens_sql("text")})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ), w AS (
        SELECT source, n_tokens,
               ({APPORTION_BUDGET} * n_tokens)
                   // SUM(n_tokens) OVER ()                   AS base_quota,
               ({APPORTION_BUDGET} * n_tokens)
                   % SUM(n_tokens) OVER ()                    AS remainder
        FROM s
    ), r AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY remainder DESC, source)
                   AS rem_rank,
               {APPORTION_BUDGET} - SUM(base_quota) OVER ()   AS leftover
        FROM w
    )
    SELECT source, n_tokens,
           CAST(base_quota + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS quota_tokens
    FROM r ORDER BY source
    """,
    category="curation",
    description=f"exact token-budget apportionment (Hamilton / largest "
    f"remainder) of a {APPORTION_BUDGET}-token training budget across "
    "sources proportional to their token mass: floor quotas + the "
    "largest remainders get the leftover units, deterministic "
    "source-name tie-break -- quotas sum EXACTLY to the budget, with "
    "no floating-point shares to drift",
)
def corpus_token_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one aggregate to source granularity, then windows over the
    constant-size (rows == number of sources) weight table -- the
    RRF-pool bounded-window argument.  The quota arithmetic is PURE
    BIGINT div/mod on both engines (a decimal division would round
    before the floor and hand the leftover units to different sources
    -- observed at sf0.1); budget * per-source-tokens stays inside
    int64 up to ~9e12 tokens per source at this budget, and past that
    the budget is apportioned hierarchically (per shard, then across
    shards) rather than widening the type."""
    docs = load_tables(spark, sf_dir)["documents"]
    s = (
        docs.select("source", tokens_expr("text").alias("t"))
        .select("source", F.size("t").alias("n_tok"))
        .groupBy("source")
        .agg(F.sum("n_tok").cast("long").alias("n_tokens"))
    )
    w_all = Window.partitionBy()
    w = s.select(
        "source",
        "n_tokens",
        F.sum("n_tokens").over(w_all).alias("total"),
    ).selectExpr(
        "source",
        "n_tokens",
        f"({APPORTION_BUDGET}L * n_tokens) DIV total AS base_quota",
        f"({APPORTION_BUDGET}L * n_tokens) % total AS remainder",
    )
    r = w.select(
        "*",
        F.row_number()
        .over(Window.partitionBy().orderBy(F.desc("remainder"), F.asc("source")))
        .alias("rem_rank"),
        (F.lit(APPORTION_BUDGET) - F.sum("base_quota").over(w_all)).alias(
            "leftover"
        ),
    )
    return r.select(
        "source",
        "n_tokens",
        (
            F.col("base_quota")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota_tokens"),
    ).orderBy("source")


# CCNet-style line-level boilerplate: "lines" for this corpus are
# non-overlapping 3-token windows (the synthetic documents carry no
# newline/sentence structure -- see text_gopher_quality_rules' note);
# a line is boilerplate when its hash occurs in >= 4 distinct docs.
LINE_CHUNK_TOKENS = 3
BOILERPLATE_MIN_DOCS = 4

#: (doc_id, source, lh) -- one row per line INSTANCE; consumed by both
#: the distinct-doc-frequency build and the back-join, so the
#: tokenize+chunk+hash pipeline (the expensive part) runs once.
_LINE_CACHE = PersistCache("line_hashes")

_LINES_SQL = (
    f"list_transform(generate_series(0, (len(toks) + {LINE_CHUNK_TOKENS - 1})"
    f" // {LINE_CHUNK_TOKENS} - 1), "
    f"i -> array_to_string(toks[i*{LINE_CHUNK_TOKENS}+1 : "
    f"i*{LINE_CHUNK_TOKENS}+{LINE_CHUNK_TOKENS}], ' '))"
)


@register(
    "text_line_boilerplate",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, {tokens_sql("text")} AS toks FROM documents
    ), l AS (
        SELECT doc_id, source, {h32_sql("line")} AS lh
        FROM (SELECT doc_id, source, UNNEST({_LINES_SQL}) AS line FROM t)
    ), boiler AS (
        SELECT lh FROM l GROUP BY lh
        HAVING COUNT(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}
    ), flagged AS (
        SELECT l.doc_id, l.source,
               CASE WHEN b.lh IS NOT NULL THEN 1 ELSE 0 END AS is_boiler
        FROM l LEFT JOIN boiler b USING (lh)
    )
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT)      AS n_docs,
           CAST(COUNT(*) AS BIGINT)                    AS n_lines,
           CAST(SUM(is_boiler) AS BIGINT)              AS n_boiler_lines,
           CAST((SUM(is_boiler) * 1000) // COUNT(*) AS BIGINT)
               AS removed_pm
    FROM flagged GROUP BY source ORDER BY source
    """,
    category="text",
    description="CCNet-style line-level boilerplate removal (Wenzek et "
    "al. 2020): hash every pseudo-line (non-overlapping 3-token window "
    "-- the corpus has no newline structure), flag lines whose hash "
    "occurs in >= 4 distinct documents as boilerplate, report per-source "
    "removal stats as exact integer per-mille; line hashes travel as "
    "portable 32-bit integers and the Zipf singleton tail is pruned "
    "before the back-join",
)
def text_line_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the same posting-list shape as ``text_bigram_novelty`` --
    one shuffle of (line_hash, doc_id) pairs (8-byte hashes, never the
    line text) to build the distinct-doc-frequency table, pruned to
    df >= BOILERPLATE_MIN_DOCS BEFORE the back-join so the singleton
    tail that dominates web corpora (most lines are unique) shuffles
    once, not twice; then one broadcast-sized semi-join back and a
    low-cardinality per-source aggregate.  CCNet's percentile-based
    variant needs only a different threshold on the same df table."""
    def _build() -> DataFrame:
        docs = load_tables(spark, sf_dir)["documents"]
        w = LINE_CHUNK_TOKENS
        lines = docs.select(
            "doc_id", "source", tokens_expr("text").alias("toks")
        ).select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(0, (size(toks) + {w - 1}) DIV {w} - 1), "
                    f"i -> array_join(slice(toks, i*{w}+1, {w}), ' '))"
                )
            ).alias("line"),
        )
        return lines.select("doc_id", "source", h32(F.col("line")).alias("lh"))

    inst = _LINE_CACHE.get_or_build(spark, sf_dir, _build)
    boiler = (
        inst.groupBy("lh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= BOILERPLATE_MIN_DOCS)
        .select("lh", F.lit(1).alias("is_b"))
    )
    flagged = inst.join(F.broadcast(boiler), "lh", "left_outer").select(
        "doc_id",
        "source",
        F.coalesce(F.col("is_b"), F.lit(0)).alias("is_boiler"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("is_boiler").alias("n_boiler_lines"),
            F.expr("(SUM(is_boiler) * 1000) DIV COUNT(*)").alias(
                "removed_pm"
            ),
        )
        .orderBy("source")
    )


@register(
    "curation_quality_classifier",
    oracle=f"""
    WITH ex AS (
        SELECT doc_id, source, lang,
               {h32_sql("tok")} % {DSIR_BUCKETS} AS bucket
        FROM (SELECT doc_id, source, lang, UNNEST({tokens_sql("text")}) AS tok
              FROM documents)
    ), b AS (
        SELECT bucket,
               COUNT(*)                                     AS raw_cnt,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_cnt
        FROM ex GROUP BY bucket
    ), tot AS (
        SELECT SUM(raw_cnt) - SUM(tgt_cnt) AS rest_total,
               SUM(tgt_cnt) AS t_total
        FROM b
    ), w AS (
        SELECT bucket,
               (tgt_cnt * 1000000) // greatest(t_total, 1)
               - ((raw_cnt - tgt_cnt) * 1000000)
                   // greatest(rest_total, 1) AS weight
        FROM b, tot
    ), scored AS (
        SELECT ex.doc_id, ANY_VALUE(ex.source) AS source,
               SUM(w.weight) AS margin
        FROM ex JOIN w USING (bucket) GROUP BY ex.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)                       AS n_docs,
           CAST(SUM(CASE WHEN margin > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_positive,
           CAST(SUM(margin) AS BIGINT)                    AS sum_margin,
           CAST((SUM(CASE WHEN margin > 0 THEN 1 ELSE 0 END) * 1000)
                // COUNT(*) AS BIGINT)                    AS positive_pm
    FROM scored GROUP BY source ORDER BY source
    """,
    category="curation",
    description="hashed-feature linear quality-classifier inference "
    "(the fastText-style classifier stage completing the Gopher-rules / "
    "DSIR-importance / classifier curation triad): per-bucket integer "
    "weight = target ppm-rate minus background ppm-rate (target = "
    "lang='en', weights derived in-corpus like the DSIR leans), "
    "document margin = sum of weights over token instances, decision "
    "by integer margin sign -- bit-exact across engines",
)
def curation_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the model is a FIXED <= 1024-row integer-weight table
    (one shuffle + a bounded 1024-row window for totals), broadcast
    over a MAP-ONLY scoring pass -- O(1) model size at any corpus
    size, the property that makes classifier inference viable at
    100 TB.  Per-doc margins partial-aggregate map-side before the
    doc_id shuffle.  Weights are per-mille-of-a-mille integer rates
    (ppm), so margins stay within int64 for documents up to ~9e12
    tokens; no float ever enters, which is what lets the decision
    boundary hash-match DuckDB exactly."""
    docs = load_tables(spark, sf_dir)["documents"]
    ex = docs.select(
        "doc_id",
        "source",
        "lang",
        F.explode(tokens_expr("text")).alias("tok"),
    ).select(
        "doc_id",
        "source",
        "lang",
        (h32(F.col("tok")) % DSIR_BUCKETS).alias("bucket"),
    )
    b = ex.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("tgt_cnt"),
    )
    # totals over the bounded (<= DSIR_BUCKETS rows) bucket table, same
    # rationale as curation_dsir_feature_lean
    w_all = Window.partitionBy()
    weights = b.select(
        "bucket",
        "raw_cnt",
        "tgt_cnt",
        (F.sum("raw_cnt").over(w_all) - F.sum("tgt_cnt").over(w_all)).alias(
            "rest_total"
        ),
        F.sum("tgt_cnt").over(w_all).alias("t_total"),
    ).selectExpr(
        "bucket",
        # greatest(total, 1): a degenerate corpus (all-target or
        # no-target) zeroes one side's counts, so its rate term is 0
        # either way -- both engines stay defined and identical where
        # a raw division would raise in DuckDB and NULL in Spark
        "(tgt_cnt * 1000000) DIV greatest(t_total, 1) "
        "- ((raw_cnt - tgt_cnt) * 1000000) DIV greatest(rest_total, 1) "
        "AS weight",
    )
    # group by (doc_id, source) -- source is functionally dependent on
    # doc_id, and including it keeps the aggregate HASH-based (a
    # first() aggregate forces the sort-based strategy plus two extra
    # Sorts, seen in the plan audit)
    scored = (
        ex.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "source")
        .agg(F.sum("weight").alias("margin"))
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("margin") > 0, 1).otherwise(0)).alias(
                "n_positive"
            ),
            F.sum("margin").alias("sum_margin"),
            F.expr(
                "(SUM(CASE WHEN margin > 0 THEN 1 ELSE 0 END) * 1000) "
                "DIV COUNT(*)"
            ).alias("positive_pm"),
        )
        .orderBy("source")
    )


# UniMax epoch-capped language sampling (Chung et al. 2023, "UniMax:
# Fairer and More Effective Language Sampling for Large-Scale
# Multilingual Pretraining"): allocate a token budget across languages
# as uniformly as possible, capping every language at E epochs of its
# available tokens -- the waterfilling allocation.  The budget here is
# 3/4 of total capacity (a pure function of the corpus, so the oracle
# needs no side input, and the ratio is scale-invariant: the same
# languages cap at every SF -- at sf0.01 the four smaller languages cap
# at 2 epochs and 'en' absorbs the remainder).
UNIMAX_EPOCHS = 2
UNIMAX_BUDGET_NUM = 3
UNIMAX_BUDGET_DEN = 4


@register(
    "corpus_unimax_allocation",
    oracle=f"""
    WITH s AS (
        SELECT lang,
               CAST(SUM(len({tokens_sql("text")})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang
    ), c AS (
        SELECT lang, n_tokens,
               n_tokens * {UNIMAX_EPOCHS}                    AS capacity,
               ({UNIMAX_BUDGET_NUM} * SUM(n_tokens * {UNIMAX_EPOCHS})
                   OVER ()) // {UNIMAX_BUDGET_DEN}           AS budget,
               COUNT(*) OVER ()                              AS n_langs,
               ROW_NUMBER() OVER (ORDER BY n_tokens * {UNIMAX_EPOCHS},
                                  lang)                      AS rnk,
               COALESCE(SUM(n_tokens * {UNIMAX_EPOCHS}) OVER (
                   ORDER BY n_tokens * {UNIMAX_EPOCHS}, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0)                                        AS p_excl
        FROM s
    ), flg AS (
        SELECT *,
               MIN(CASE WHEN capacity * (n_langs - rnk + 1)
                             <= budget - p_excl
                        THEN 1 ELSE 0 END)
                   OVER (ORDER BY rnk ROWS UNBOUNDED PRECEDING)
                   AS capped
        FROM c
    ), tot AS (
        SELECT *,
               SUM(capped) OVER ()            AS k,
               SUM(capped * capacity) OVER () AS p_k
        FROM flg
    )
    SELECT lang, n_tokens,
           CAST(capacity AS BIGINT)           AS capacity,
           CAST(capped AS BIGINT)             AS is_capped,
           CAST(CASE WHEN capped = 1 THEN capacity
                ELSE (budget - p_k) // (n_langs - k) END AS BIGINT)
                                              AS allocation,
           CAST((CASE WHEN capped = 1 THEN capacity
                 ELSE (budget - p_k) // (n_langs - k) END) * 10000
                 // n_tokens AS BIGINT)       AS epochs_bp
    FROM tot ORDER BY lang
    """,
    category="curation",
    description=f"UniMax language sampling (Chung et al. 2023): allocate "
    f"a token budget ({UNIMAX_BUDGET_NUM}/{UNIMAX_BUDGET_DEN} of total "
    f"capacity) across languages as uniformly as possible with every "
    f"language capped at {UNIMAX_EPOCHS} epochs of its tokens -- the "
    "waterfilling solution in EXACT integer math (capping decided by "
    "cross-multiplied comparisons, one integer division for the shared "
    "water level); per-lang capacity/allocation/epochs-basis-points",
)
def corpus_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one aggregate to language granularity, then windows over a
    constant-size (rows == number of languages) table -- the same
    bounded-window argument as Hamilton apportionment above.  The
    waterfilling recurrence is solved closed-form: ranked ascending by
    capacity, a language is capped iff its capacity times the number
    of not-yet-processed languages fits the remaining budget
    (cross-multiplied -- no division), the capped prefix is a running
    MIN, and the shared water level is ONE integer division on the
    uncapped remainder.  Identical DIV//// semantics on all-positive
    operands keeps both engines bit-equal."""
    docs = load_tables(spark, sf_dir)["documents"]
    s = (
        docs.select("lang", F.size(tokens_expr("text")).alias("n_tok"))
        .groupBy("lang")
        .agg(F.sum("n_tok").cast("long").alias("n_tokens"))
    )
    w_all = Window.partitionBy()
    w_ord = Window.partitionBy().orderBy(F.col("capacity"), F.col("lang"))
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    c = (
        s.withColumn("capacity", F.col("n_tokens") * UNIMAX_EPOCHS)
        .withColumn(
            "budget",
            F.expr(
                f"({UNIMAX_BUDGET_NUM} * SUM(capacity) OVER ()) "
                f"DIV {UNIMAX_BUDGET_DEN}"
            ),
        )
        .withColumn("n_langs", F.count(F.lit(1)).over(w_all))
        .withColumn("rnk", F.row_number().over(w_ord))
        .withColumn(
            "p_excl", F.coalesce(F.sum("capacity").over(w_prev), F.lit(0))
        )
    )
    flg = c.withColumn(
        "capped",
        F.min(
            F.when(
                F.col("capacity") * (F.col("n_langs") - F.col("rnk") + 1)
                <= F.col("budget") - F.col("p_excl"),
                1,
            ).otherwise(0)
        ).over(
            Window.partitionBy()
            .orderBy("rnk")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    tot = flg.withColumn("k", F.sum("capped").over(w_all)).withColumn(
        "p_k", F.sum(F.col("capped") * F.col("capacity")).over(w_all)
    )
    alloc = F.when(F.col("capped") == 1, F.col("capacity")).otherwise(
        F.expr("(budget - p_k) DIV (n_langs - k)")
    )
    return (
        tot.select(
            "lang",
            "n_tokens",
            F.col("capacity").cast("long").alias("capacity"),
            F.col("capped").cast("long").alias("is_capped"),
            alloc.cast("long").alias("allocation"),
            (alloc * 10000)
            .cast("long")
            .alias("__a10k"),
        )
        .withColumn("epochs_bp", F.expr("__a10k DIV n_tokens"))
        .drop("__a10k")
        .orderBy("lang")
    )
