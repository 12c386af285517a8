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


# Universal-hash MinHash family over 2^31-1: the base item hash is 60
# md5 bits (cross-engine-identical, like dd_simhash), and permutation i
# is the Carter–Wegman map (a_i·h + b_i) mod P — pure BIGINT-safe
# integer arithmetic (a_i, h mod P < 2^31 → products < 2^62), so both
# a Spark expression and a DuckDB oracle compute the SAME signatures.
# It is also cheaper than k seeded xxhash64 calls per row.
MH_P = FP_MOD


def mh_a(i: int) -> int:
    return (FP_MUL * (2 * i + 1)) % MH_P


def mh_b(i: int) -> int:
    return (7919 * i + 17) % MH_P


def mh_hash60(col: Column) -> Column:
    """60-bit md5-derived item hash (identical in DuckDB via
    CAST('0x' || substr(md5(x), 1, 15) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def band_fingerprint(cols: list) -> Column:
    """Ordered polynomial fold of signature columns into one band
    hash — the integer twin of a seeded hash over the band tuple."""
    acc = F.lit(0).cast("long")
    for c in cols:
        acc = (acc * FP_MUL + F.col(c)) % FP_MOD
    return acc


def minhash_signatures(exploded_hashes: DataFrame, k: int) -> DataFrame:
    """(doc_id, h) rows (h = mh_hash60 of the item) → one row per doc
    with k min-hash columns m0..m{k-1}.

    Explode + k plain min() aggregates is the vectorized form — k
    array_min(transform(...)) expressions allocate k arrays per row and
    measured ~10x slower (PERF.md). The base-hash mod is HOISTED into a
    projection: aggregate expressions are not CSE'd across each other,
    so leaving `h % P` inline evaluates it k times per row (round-10
    profile: the signature aggregate is the op's hottest stage)."""
    pre = exploded_hashes.select(
        "doc_id", (F.col("h") % MH_P).alias("_hm")
    )
    hm = F.col("_hm")
    return pre.groupBy("doc_id").agg(
        *[
            F.min((F.lit(mh_a(i)) * hm + F.lit(mh_b(i))) % MH_P).alias(
                f"m{i}"
            )
            for i in range(k)
        ]
    )


def duck_minhash_mins(k: int, duck_tokens: str) -> str:
    """DuckDB twin of the shingle→signature pipeline: CTEs `sh`
    (distinct per-doc trigram shingles), `hv` (mod-P item hashes) and
    `mins` (doc_id, i, m) — the long form of minhash_signatures."""
    return f"""
    shtok AS (SELECT doc_id, {duck_tokens} AS toks FROM documents),
    sh AS MATERIALIZED (SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(toks) - 2),
                      i -> toks[i] || ' ' || toks[i + 1] || ' '
                           || toks[i + 2])) AS s
        FROM shtok) q),
    hv AS MATERIALIZED (
      SELECT doc_id,
             CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % {MH_P} AS hm
      FROM sh),
    mins AS MATERIALIZED (
      SELECT doc_id, p.i,
             MIN((((({FP_MUL} * (2 * p.i + 1)) % {MH_P}) * hm)
                  + ((7919 * p.i + 17) % {MH_P})) % {MH_P}) AS m
      FROM hv, (SELECT unnest(range(0, {k})) AS i) p
      GROUP BY 1, 2)"""
