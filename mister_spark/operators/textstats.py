"""Text-analysis suite for LLM-training-data pipelines.

Everything stays JVM-side (split / transform / filter / aggregate higher-
order functions) — no Python in the per-token path, so at 100 TB the
whole stage is whole-stage-codegen over the parquet scan with one final
shuffle at most.

Cross-engine note: tokenization is defined as "split on single space,
drop empties" in BOTH engines (common.DUCK_TOKENS); fingerprints use
integer-only arithmetic so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from mister_spark.functions.hashing import rolling_fingerprint
from mister_spark.functions.text import bigrams as _bigrams
from mister_spark.operators.common import DUCK_TOKENS, cat, tokens, rnd
from mister_spark.registry import query

STOPWORDS = ("the", "a", "of", "and", "to", "in")

LANG_PROFILES = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "y"),
    "fr": ("le", "la", "de", "et"),
    "de": ("der", "die", "das", "und"),
}


def _n_in_set(toks: Column, words: tuple[str, ...]) -> Column:
    lit = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit, t))).cast("long")


def _duck_n_in_set(words: tuple[str, ...]) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"CAST(len(list_filter(toks, t -> list_contains({arr}, t))) AS BIGINT)"


@query(
    "tx_tokencount",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents)
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
    FROM t
    """,
)
def tx_tokencount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = cat(spark, sf_dir)["documents"]
    toks = tokens()
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )


@query(
    "tx_quality",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    m AS (SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
                 CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS chars,
                 {_duck_n_in_set(STOPWORDS)} AS n_stop
          FROM t)
    SELECT doc_id, n_tokens,
           FLOOR((n_distinct / n_tokens) * 10000 + 0.5) / 10000 AS distinct_ratio,
           FLOOR((chars / n_tokens) * 10000 + 0.5) / 10000 AS mean_tok_len,
           FLOOR((n_stop / n_tokens) * 10000 + 0.5) / 10000 AS stop_ratio,
           FLOOR((0.3 * LEAST(n_tokens / 100, 1.0)
                 + 0.4 * (n_distinct / n_tokens)
                 + 0.3 * (1 - n_stop / n_tokens)) * 10000 + 0.5) / 10000 AS quality
    FROM m
    """,
)
def tx_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length, lexical diversity, stopword
    density. All ratios computed from raw integer counts with identical
    double arithmetic in both engines."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", tokens().alias("toks"))
    m = t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("chars"),
        _n_in_set(F.col("toks"), STOPWORDS).alias("n_stop"),
    )
    nt = F.col("n_tokens")
    return m.select(
        "doc_id",
        "n_tokens",
        rnd(F.col("n_distinct") / nt, 4).alias("distinct_ratio"),
        rnd(F.col("chars") / nt, 4).alias("mean_tok_len"),
        rnd(F.col("n_stop") / nt, 4).alias("stop_ratio"),
        rnd(
            0.3 * F.least(nt / 100, F.lit(1.0))
            + 0.4 * (F.col("n_distinct") / nt)
            + 0.3 * (1 - F.col("n_stop") / nt),
            4,
        ).alias("quality"),
    )


@query(
    "tx_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents)
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(toks,
                 x -> CAST(ascii(x) * 131 + len(x) AS BIGINT))),
             (a, b) -> (a * 1000003 + b) % 2147483647) AS fp
    FROM t
    """,
)
def tx_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint over the token stream.
    Integer-only arithmetic (token code = ascii(first char)*131 + len),
    mod 2^31-1, so both engines produce identical BIGINTs."""
    docs = cat(spark, sf_dir)["documents"]
    return docs.select("doc_id", rolling_fingerprint(tokens()).alias("fp"))


@query(
    "tx_ngram_topk",
    oracle=f"""
    WITH t AS (SELECT {DUCK_TOKENS} AS toks FROM documents),
    bg AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                        i -> toks[i] || ' ' || toks[i + 1])) AS bigram
           FROM t)
    SELECT bigram, COUNT(*) AS n
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def tx_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-20 bigrams; tie-broken on the bigram text so both
    engines pick the same rows."""
    docs = cat(spark, sf_dir)["documents"]
    toks = tokens()
    bigrams = _bigrams(toks)
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


def _duck_langid_case() -> str:
    score = {k: _duck_n_in_set(v).replace("toks", "toks") for k, v in LANG_PROFILES.items()}
    return f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    s AS (SELECT doc_id,
                 {score['en']} AS s_en, {score['es']} AS s_es,
                 {score['fr']} AS s_fr, {score['de']} AS s_de
          FROM t)
    SELECT doc_id,
           CASE WHEN s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_de = 0 THEN 'unknown'
                WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                WHEN s_fr >= s_de THEN 'fr'
                ELSE 'de' END AS pred_lang,
           s_en
    FROM s
    """


@query("tx_langid", oracle=_duck_langid_case())
def tx_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID. Deterministic argmax with a fixed
    priority order (en > es > fr > de) so the oracle CASE chain and the
    Spark when-chain agree exactly. (A real deployment would use n-gram
    profiles per language; the scorer shape — per-profile token-set
    overlap, JVM-side — is the 100 TB-relevant part.)"""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", tokens().alias("toks"))
    s = t.select(
        "doc_id",
        *[
            _n_in_set(F.col("toks"), words).alias(f"s_{lang}")
            for lang, words in LANG_PROFILES.items()
        ],
    )
    zero = (
        (F.col("s_en") == 0)
        & (F.col("s_es") == 0)
        & (F.col("s_fr") == 0)
        & (F.col("s_de") == 0)
    )
    pred = (
        F.when(zero, "unknown")
        .when(
            (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_de")),
            "en",
        )
        .when((F.col("s_es") >= F.col("s_fr")) & (F.col("s_es") >= F.col("s_de")), "es")
        .when(F.col("s_fr") >= F.col("s_de"), "fr")
        .otherwise("de")
    )
    return s.select("doc_id", pred.alias("pred_lang"), "s_en")
