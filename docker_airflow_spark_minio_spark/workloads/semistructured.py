"""Beyond-relational API surface: VariantType and Python UDTFs.

The reference registers no UDF/UDAF/UDTF and touches JSON only at the
source level (SURVEY.md section 2.8); this module covers the two modern
Spark surfaces a user would reach for instead:

 * **Variant** -- ``parse_json`` + ``variant_get``: the Spark 4 binary
   semi-structured encoding.  Unlike ``get_json_object`` (string
   re-parse per access), a variant column parses once and every field
   access is a binary traversal -- the right call when several fields
   are pulled from the same JSON blob.
 * **Python UDTF** -- a table function emitting a data-dependent number
   of rows per input (here: per-document repeated-token rows), invoked
   via SQL ``LATERAL``.  This is the row-EXPANDING custom-logic shape;
   contrast with ``mapInPandas`` (operators/media.py) which streams
   whole Arrow batches -- a UDTF composes with SQL joins/lateral
   references, at the cost of row-at-a-time Python.

Scale notes: variant decode is JVM-side, codegen-friendly, no Python.
The UDTF is the slow path by construction (per-row Python) -- the
workload keeps it off the hot columns (ids + tokens only) and notes the
Arrow-batched alternative; it exists for API parity, not throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load_tables, register

TOKEN_MIN_REPEATS = 4


@register(
    "variant_json_extract",
    oracle="""
    SELECT event_type,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k,
           COUNT(*) AS qtd
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    category="scan",
    description="VariantType semi-structured access: parse_json once, "
    "variant_get per field (binary traversal, no string re-parse) -- the "
    "Spark-4 upgrade over get_json_object for multi-field extraction",
)
def variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("qtd"),
        )
        .orderBy("event_type")
    )


_UDTF_SQL = """
    SELECT t.doc_id, r.token, r.n
    FROM documents t, LATERAL repeated_tokens(t.text) r
    ORDER BY t.doc_id, r.token
"""


@register(
    "udtf_repeated_tokens",
    oracle=f"""
    SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY doc_id, token HAVING COUNT(*) >= {TOKEN_MIN_REPEATS}
    ORDER BY doc_id, token
    """,
    category="udtf",
    description=f"Python UDTF via SQL LATERAL: one input document expands "
    f"to N (token, count) rows for tokens repeated >= {TOKEN_MIN_REPEATS} "
    "times -- the table-function API surface; per-row Python, so kept off "
    "hot paths (mapInPandas is the throughput variant of this shape)",
)
def udtf_repeated_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, n: long")
    class RepeatedTokens:
        def eval(self, text: str):  # noqa: ANN001
            counts: dict[str, int] = {}
            for tok in (text or "").split(" "):
                counts[tok] = counts.get(tok, 0) + 1
            for tok in sorted(counts):
                if counts[tok] >= TOKEN_MIN_REPEATS:
                    yield tok, counts[tok]

    spark.udtf.register("repeated_tokens", RepeatedTokens)
    load_tables(spark, sf_dir)["documents"].createOrReplaceTempView("documents")
    return spark.sql(_UDTF_SQL)
