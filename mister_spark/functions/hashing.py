"""Hash-sketch primitives: rolling fingerprints and MinHash helpers."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

FP_MOD = 2147483647  # 2^31 - 1
FP_MUL = 1000003


def token_codes(toks: Column) -> Column:
    """Cross-engine token code: ascii(first char)*131 + length."""
    return F.transform(toks, lambda x: (F.ascii(x) * 131 + F.length(x)).cast("long"))


def rolling_fingerprint(toks: Column) -> Column:
    """Polynomial rolling hash over the token stream; integer-only so
    Spark and DuckDB agree bit-for-bit."""
    return F.aggregate(
        token_codes(toks),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_MUL + x) % FP_MOD,
    )


def minhash_signatures(exploded_hashes: DataFrame, k: int) -> DataFrame:
    """(doc_id, h) rows → one row per doc with k min-hash columns m0..m{k-1}.

    Explode + k plain min() aggregates is the vectorized form — k
    array_min(transform(...)) expressions allocate k arrays per row and
    measured ~10x slower (PERF.md)."""
    return exploded_hashes.groupBy("doc_id").agg(
        *[F.min(F.xxhash64("h", F.lit(i))).alias(f"m{i}") for i in range(k)]
    )
