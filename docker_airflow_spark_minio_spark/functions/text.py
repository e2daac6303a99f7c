"""Text analysis building blocks: tokenization, shingles, quality features,
language-ID profiles.  All JVM-side expressions (no Python UDFs) -- these
run inside whole-stage codegen over the documents table, and every one has
a direct DuckDB equivalent for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Function-word profiles for the language-ID heuristic (public knowledge:
# highest-frequency function words per language).  Scoring = count of
# profile words among the document's tokens; ties resolve by LANG_ORDER.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "los", "las", "una", "es", "y"],
    "fr": ["le", "les", "des", "et", "est", "un"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3"],
}
LANG_ORDER = ["en", "de", "es", "fr", "zh"]

# A BPE-ish tokenizer regex: letter runs, digit runs, or single
# non-alphanumeric glyphs (identical semantics in Java regex and RE2).
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def tokens_expr(col: Column | str) -> Column:
    """Whitespace tokens (single-space split; the corpus is space-joined)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def shingles_from_tokens(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a PRE-PROJECTED token-array
    column.  ``tokens`` must be a column reference (``.select(...,
    tokens_expr(c).alias('t'))`` first), NOT an inline ``split()``
    expression: lambda bodies are not common-subexpression-eliminated,
    so an inline split would re-tokenize the whole document once per
    element -- O(len^2) per doc (measured 15x slower).  DuckDB
    equivalent: :func:`shingles_sql`."""
    # Guarded against sub-n-token inputs: Spark's sequence(1, 0) steps
    # DOWN to [1, 0] (not empty like DuckDB's generate_series), and the
    # i=0 element_at then throws under ANSI semantics -- a document
    # shorter than the shingle width must yield NO shingles, not a
    # crash.
    gram = F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tokens, i + k) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(gram)


def shingles_expr(col: Column | str, n: int = 3) -> Column:
    """Convenience single-expression form of :func:`shingles_from_tokens`.
    Fine for small inputs/tests; on the hot path pre-project the token
    array and use :func:`shingles_from_tokens` (see its warning)."""
    return shingles_from_tokens(tokens_expr(col), n)


def tokens_sql(expr: str) -> str:
    """DuckDB equivalent of :func:`tokens_expr`."""
    return f"string_split({expr}, ' ')"


def shingles_sql(tok_expr: str, n: int = 3) -> str:
    """DuckDB equivalent of :func:`shingles_expr`, over a token-list
    expression (DuckDB list slices are 1-based and inclusive on both
    ends, so an n-token window is ``t[i:i+n-1]``)."""
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({tok_expr}) - {n - 1}, 0)), "
        f"i -> array_to_string({tok_expr}[i:i+{n - 1}], ' ')))"
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens_expr(col))


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish regex tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def distinct_token_ratio(col: Column | str) -> Column:
    t = tokens_expr(col)
    return F.size(F.array_distinct(t)) / F.size(t)


def stopword_hits(col: Column | str, words: list[str]) -> Column:
    """Number of tokens that are in ``words``."""
    t = tokens_expr(col)
    wset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(t, lambda x: F.array_contains(wset, x)))


def lang_scores(col: Column | str) -> dict[str, Column]:
    return {lang: stopword_hits(col, words) for lang, words in LANG_PROFILES.items()}


def predicted_lang(scores: dict[str, Column]) -> Column:
    """argmax over LANG_ORDER, earlier language wins ties (plain CASE
    chain, portable to ANSI SQL verbatim): branch L fires when its score
    beats every earlier language strictly and every later one weakly."""
    expr = None
    for i, lang in enumerate(LANG_ORDER[:-1]):
        cond = None
        for j, other in enumerate(LANG_ORDER):
            if i == j:
                continue
            c = scores[lang] > scores[other] if j < i else scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(LANG_ORDER[-1]))


def predicted_lang_sql(score_exprs: dict[str, str]) -> str:
    """The DuckDB CASE chain equivalent of :func:`predicted_lang`."""
    branches = []
    for i, lang in enumerate(LANG_ORDER[:-1]):
        conds = []
        for j, other in enumerate(LANG_ORDER):
            if i == j:
                continue
            op = ">" if j < i else ">="
            conds.append(f"{score_exprs[lang]} {op} {score_exprs[other]}")
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(branches) + f" ELSE '{LANG_ORDER[-1]}' END"
