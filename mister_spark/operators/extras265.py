"""Wave 265: language-ID evaluation and Spark-4 VARIANT ingestion.

- tx_langid_eval: the corpus carries ground-truth ``lang`` labels, so
  the stopword-profile classifier behind tx_langid gets the full
  supervised treatment — a (true, predicted) confusion matrix with
  per-cell share-of-true and correctness flags. The labeled set
  includes ``zh``, a language the profile table does not know: the
  matrix shows exactly where out-of-profile text lands (the
  open-world failure mode a deployment must audit before trusting a
  langid gate).
- io_variant_query: the Spark 4 semi-structured path — build a
  nested JSON document per order, ``parse_json`` it into a VARIANT
  column, and extract typed fields back out with
  ``try_variant_get`` (nested object hop, numeric coercion) feeding
  a normal aggregate. The oracle builds the byte-identical JSON
  string in DuckDB and extracts with its JSON functions — a genuine
  cross-engine parse round-trip, not a bypass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money, ratio
from mister_spark.operators.textstats import _duck_langid_case, tx_langid
from mister_spark.registry import query


@query(
    "tx_langid_eval",
    oracle=f"""
    WITH pred AS ({_duck_langid_case()}),
    j AS (SELECT d.lang AS true_lang, p.pred_lang
          FROM documents d JOIN pred p ON p.doc_id = d.doc_id),
    m AS (SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
          FROM j GROUP BY 1, 2),
    tot AS (SELECT true_lang, CAST(SUM(n) AS BIGINT) AS nt
            FROM m GROUP BY 1)
    SELECT m.true_lang, m.pred_lang, m.n,
           FLOOR(m.n / CAST(tot.nt AS DOUBLE) * 10000 + 0.5) / 10000
             AS share_of_true,
           CAST(CASE WHEN m.true_lang = m.pred_lang THEN 1 ELSE 0 END
                AS BIGINT) AS is_correct
    FROM m JOIN tot ON tot.true_lang = m.true_lang
    """,
)
def tx_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword-profile language classifier
    against the corpus's ground-truth ``lang`` labels: one row per
    (true, predicted) cell with the count, the share of that true
    class (row-normalized recall decomposition), and the diagonal
    flag. The labeled data contains ``zh`` — outside the profile
    table — so the matrix exposes the open-world behavior (where
    unknown languages land) that aggregate accuracy hides.

    Scale: the predictor is the audited tx_langid plan (JVM token-set
    overlap, no shuffle before the doc-keyed join); the matrix is a
    |langs|² aggregate — model-sized output from one join + one
    groupBy."""
    docs = cat(spark, sf_dir)["documents"].select("doc_id", "lang")
    pred = tx_langid(spark, sf_dir).select("doc_id", "pred_lang")
    m = (
        docs.join(pred, "doc_id")
        .groupBy(
            F.col("lang").alias("true_lang"), "pred_lang"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = m.groupBy("true_lang").agg(F.sum("n").cast("bigint").alias("nt"))
    return (
        m.join(F.broadcast(tot), "true_lang")
        .select(
            "true_lang",
            "pred_lang",
            "n",
            ratio(F.col("n") / F.col("nt").cast("double")).alias(
                "share_of_true"
            ),
            (F.col("true_lang") == F.col("pred_lang"))
            .cast("bigint")
            .alias("is_correct"),
        )
    )


# The JSON document both engines construct per order, byte-identical:
# fixed key order, no whitespace, integer cents for the price so no
# float formatting can differ. (The Spark twin is built inside the
# operator — Column construction needs an active session.)
def _variant_json_spark():
    return F.concat(
        F.lit('{"order":{"key":'),
        F.col("o_orderkey").cast("string"),
        F.lit(',"priority":"'),
        F.col("o_orderpriority"),
        F.lit('"},"cents":'),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .cast("string"),
        F.lit("}"),
    )


_VARIANT_JSON_DUCK = (
    "'{\"order\":{\"key\":' || CAST(o_orderkey AS VARCHAR)"
    " || ',\"priority\":\"' || o_orderpriority"
    " || '\"},\"cents\":'"
    " || CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)"
    " || '}'"
)


@query(
    "io_variant_query",
    oracle=f"""
    WITH raw AS (SELECT {_VARIANT_JSON_DUCK} AS doc FROM orders),
    x AS (SELECT json_extract_string(doc, '$.order.priority') AS priority,
                 CAST(json_extract(doc, '$.cents') AS BIGINT) AS cents
          FROM raw)
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           FLOOR(SUM(cents) / 100.0 * 100 + 0.5) / 100 AS total_price
    FROM x GROUP BY priority
    """,
)
def io_variant_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion round-trip: construct a nested JSON
    document per order (fixed key order, integer cents — byte-
    identical in both engines), ``parse_json`` it into a VariantType
    column, then ``try_variant_get`` the nested priority string and
    the numeric leaf back into typed columns feeding a grouped
    aggregate. VARIANT is the Spark 4 answer to schema-on-read
    semi-structured columns (binary-encoded, field-path pushdown);
    this pins that the parse→extract path preserves values exactly —
    the DuckDB oracle parses the SAME bytes with its JSON engine.

    Scale: parse_json/variant_get are JVM expressions inside
    whole-stage codegen — one narrow pass, one |priorities|-group
    aggregate; no Python, no shuffle beyond the final groupBy."""
    orders = cat(spark, sf_dir)["orders"]
    v = orders.select(F.parse_json(_variant_json_spark()).alias("v"))
    x = v.select(
        F.try_variant_get("v", "$.order.priority", "string").alias(
            "priority"
        ),
        F.try_variant_get("v", "$.cents", "bigint").alias("cents"),
    )
    return x.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        money(F.sum("cents") / 100.0).alias("total_price"),
    )
