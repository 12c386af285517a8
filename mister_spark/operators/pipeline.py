"""Training-data pipeline wave: corpus quality gates, repetition
filters, deny-list redaction, mixture sampling/stats, embedding-norm
stats, and random-projection LSH ANN.

These are the operators a 100 TB pretraining-data pipeline runs between
raw crawl and tokenizer: filter (Gopher-style heuristics, repetition),
scrub (PII-shaped redaction), rebalance (stratified sampling, domain
mix), and embedding hygiene. Everything except the LSH signature kernel
stays JVM-side in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, bigrams, tokens, trigrams
from mister_spark.functions.vectors import cosine as _cosine
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.operators.dedup import COSINE_T
from mister_spark.registry import query

STOPWORDS = ("the", "a", "of", "and", "to", "in")


@query(
    "tx_gopher_quality",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    m AS (SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(toks, x -> len(x))), (a, b) -> a + b)
                      AS DOUBLE) / len(toks) AS mean_len,
                 CAST(len(list_filter(toks,
                        t -> list_contains(['the','a','of','and','to','in'], t)))
                      AS BIGINT) AS stop_hits
          FROM t)
    SELECT doc_id, n_tokens,
           FLOOR(mean_len * 10000 + 0.5) / 10000 AS mean_tok_len,
           stop_hits,
           CAST(CASE WHEN n_tokens BETWEEN 30 AND 50000 THEN 1 ELSE 0 END
                AS INTEGER) AS flag_wordcount,
           CAST(CASE WHEN mean_len BETWEEN 2 AND 12 THEN 1 ELSE 0 END
                AS INTEGER) AS flag_meanlen,
           CAST(CASE WHEN stop_hits >= 1 THEN 1 ELSE 0 END
                AS INTEGER) AS flag_stop,
           CAST(CASE WHEN n_tokens BETWEEN 30 AND 50000
                      AND mean_len BETWEEN 2 AND 12
                      AND stop_hits >= 1 THEN 1 ELSE 0 END
                AS INTEGER) AS passes
    FROM m
    """,
)
def tx_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate (Rae et al. 2021 heuristics,
    public paper): word-count bounds, mean-word-length bounds, stopword
    presence — emitted as per-flag ints plus a combined pass bit so a
    pipeline can tune each gate independently.

    Scale: pure per-row expressions over one scan; no shuffle at all —
    the whole stage is codegen reading only (doc_id, text)."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", tokens().alias("toks"))
    n = F.size("toks").cast("bigint")
    chars = F.aggregate(
        F.transform(F.col("toks"), F.length),
        F.lit(0).cast("bigint"),
        lambda a, b: a + b,
    )
    mean_len = chars.cast("double") / F.size("toks")
    stop_lit = F.array(*[F.lit(w) for w in STOPWORDS])
    stop_hits = F.size(
        F.filter(F.col("toks"), lambda x: F.array_contains(stop_lit, x))
    ).cast("bigint")
    m = t.select(
        "doc_id",
        n.alias("n_tokens"),
        mean_len.alias("mean_len"),
        stop_hits.alias("stop_hits"),
    )
    f_wc = (F.col("n_tokens") >= 30) & (F.col("n_tokens") <= 50000)
    f_ml = (F.col("mean_len") >= 2) & (F.col("mean_len") <= 12)
    f_st = F.col("stop_hits") >= 1
    as_int = lambda c: F.when(c, 1).otherwise(0).cast("int")  # noqa: E731
    return m.select(
        "doc_id",
        "n_tokens",
        rnd(F.col("mean_len"), 4).alias("mean_tok_len"),
        "stop_hits",
        as_int(f_wc).alias("flag_wordcount"),
        as_int(f_ml).alias("flag_meanlen"),
        as_int(f_st).alias("flag_stop"),
        as_int(f_wc & f_ml & f_st).alias("passes"),
    )


@query(
    "tx_repetition",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    big AS (SELECT doc_id, len(toks) AS n,
                   list_transform(generate_series(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i + 1]) AS bg,
                   list_transform(generate_series(1, len(toks) - 2),
                                  i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS tg
            FROM t WHERE len(toks) >= 3),
    cnt AS (SELECT doc_id, bigram, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(bg) AS bigram FROM big)
            GROUP BY 1, 2),
    top AS (SELECT doc_id, MAX(c) AS topc, SUM(c) AS nbg FROM cnt GROUP BY 1)
    SELECT big.doc_id,
           FLOOR((CAST(topc AS DOUBLE) / nbg) * 10000 + 0.5) / 10000
             AS top_bigram_share,
           FLOOR((CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE) / len(tg))
                 * 10000 + 0.5) / 10000 AS dup_trigram_ratio
    FROM big JOIN top ON big.doc_id = top.doc_id
    """,
)
def tx_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filter (the 'repeated lines / n-grams' family of
    pretraining heuristics): per document, the share of bigrams taken
    by the single most frequent bigram, and the fraction of duplicated
    trigrams. High values mark boilerplate/template text.

    Scale: the mode count shuffles on (doc_id, bigram) — key cardinality
    is bounded by corpus token count, partial aggregation applies; the
    trigram dup ratio is per-row list math with no shuffle."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", tokens().alias("toks")).filter(F.size("toks") >= 3)
    top = (
        t.select("doc_id", F.explode(bigrams(F.col("toks"))).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("topc"), F.sum("c").alias("nbg"))
    )
    tg = trigrams(F.col("toks"))
    tri = t.select(
        "doc_id",
        ratio(
            (F.size(tg) - F.size(F.array_distinct(tg))).cast("double") / F.size(tg)
        ).alias("dup_trigram_ratio"),
    )
    return (
        tri.join(top, "doc_id")
        .select(
            "doc_id",
            ratio(F.col("topc").cast("double") / F.col("nbg")).alias(
                "top_bigram_share"
            ),
            "dup_trigram_ratio",
        )
    )


REDACT_PAT = r"\b(customer|user|key)\b"


@query(
    "tx_redact",
    oracle=rf"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{REDACT_PAT}')) AS BIGINT)
             AS n_redacted,
           md5(regexp_replace(text, '{REDACT_PAT}', '[MASK]', 'g')) AS scrub_md5
    FROM documents
    """,
)
def tx_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deny-list redaction (the PII-scrub shape: in production the
    pattern set is emails / phone numbers / ID formats; this corpus has
    none, so a token deny-list exercises the same plumbing): count the
    masked spans and fingerprint the scrubbed text.

    Scale: regexp_replace + md5 are JVM intrinsics per row — one scan,
    no shuffle, no Python."""
    docs = cat(spark, sf_dir)["documents"]
    scrub = F.regexp_replace("text", REDACT_PAT, "[MASK]")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(REDACT_PAT), 0))
        .cast("bigint")
        .alias("n_redacted"),
        F.md5(F.encode(scrub, "UTF-8")).alias("scrub_md5"),
    )


@query(
    "ds_stratified_sample",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE CASE WHEN lang = 'en' THEN doc_id % 10 = 0
               ELSE doc_id % 2 = 0 END
    """,
)
def ds_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample for mixture rebalancing:
    downsample the over-represented language (en keeps 1/10) while
    keeping 1/2 of everything else — the hash-mod systematic-sampling
    pattern, stratified by a column.

    Scale: a per-row predicate pushed into the scan; no shuffle, and the
    sample is reproducible run-to-run (pure function of doc_id)."""
    docs = cat(spark, sf_dir)["documents"]
    keep = F.when(F.col("lang") == "en", F.col("doc_id") % 10 == 0).otherwise(
        F.col("doc_id") % 2 == 0
    )
    return docs.filter(keep).select("doc_id", "lang", "source")


@query(
    "ds_domain_mix",
    oracle=f"""
    WITH t AS (SELECT source, lang, len({DUCK_TOKENS}) AS nt FROM documents),
    g AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(nt) AS DOUBLE) AS toks
          FROM t GROUP BY 1, 2)
    SELECT source, lang, n_docs,
           FLOOR(toks / (SELECT SUM(toks) FROM g) * 10000 + 0.5) / 10000
             AS tok_share
    FROM g
    """,
)
def ds_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture report: documents and token share per
    (source, lang) cell — what a pipeline checks before setting
    sampling weights.

    Scale: one shuffle on the tiny (source, lang) key space with
    map-side partials; the corpus-total divisor is a broadcast scalar.
    Token counts are integers, so double sums are exact and
    order-independent."""
    docs = cat(spark, sf_dir)["documents"]
    g = (
        docs.select("source", "lang", F.size(tokens()).alias("nt"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("double").alias("toks"),
        )
    )
    total = g.agg(F.sum("toks").alias("t"))
    return (
        g.join(F.broadcast(total))
        .select(
            "source",
            "lang",
            "n_docs",
            ratio(F.col("toks") / F.col("t")).alias("tok_share"),
        )
    )


@query(
    "emb_norm_stats",
    oracle="""
    WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           FLOOR(AVG(sqrt(list_dot_product(v, v))) * 10000 + 0.5) / 10000
             AS mean_norm,
           FLOOR(AVG(v[1]) * 10000 + 0.5) / 10000 AS mean_dim0
    FROM e GROUP BY 1
    """,
)
def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column hygiene: per label, vector count, mean L2 norm,
    and mean first component — the sanity stats run before any
    similarity work (catch unnormalized or degenerate batches).

    Scale: norm is a codegen aggregate over each array; the groupBy key
    (label) is tiny, so partial aggregation collapses everything
    map-side."""
    from mister_spark.functions.vectors import norm as _norm

    emb = cat(spark, sf_dir)["embeddings"].select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        ratio(F.avg(_norm(F.col("v")))).alias("mean_norm"),
        ratio(F.avg(F.element_at(F.col("v"), 1))).alias("mean_dim0"),
    )


RP_TABLES = 16
RP_BITS = 4
RP_SEED = 7


@query(
    "sim_rp_lsh",
    # Real oracle: the ±1 plane matrix rebuilds from the same md5 bits,
    # signature bits are dot-product signs (identical doubles up to a
    # sign flip only within ~1e-13 of zero — never observed), bit
    # packing and the (tbl, sig) collision join are integer-exact, and
    # the verify is the same floor-rounded cosine dd_embedding_cosine's
    # oracle already matches.
    oracle=f"""
    WITH planes AS MATERIALIZED (
      SELECT d.d, c.c,
             CASE WHEN (CAST('0x' || substr(md5(
                    CAST(d.d AS VARCHAR) || ':' || CAST(c.c AS VARCHAR)),
                    1, 15) AS BIGINT) & 1) = 1
                  THEN 1.0 ELSE -1.0 END AS w
      FROM (SELECT unnest(range(0, 64)) AS d) d,
           (SELECT unnest(range(0, {RP_TABLES * RP_BITS})) AS c) c),
    e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
    dots AS (SELECT e.vec_id, p.c,
                    SUM(e.v[CAST(p.d AS INT) + 1] * p.w) AS s
             FROM e, planes p GROUP BY 1, 2),
    sigs AS (SELECT vec_id, c // {RP_BITS} AS tbl,
                    CAST(SUM(CASE WHEN s > 0
                             THEN CAST(1 AS BIGINT) << (c % {RP_BITS})
                             ELSE 0 END) AS BIGINT) AS sig
             FROM dots GROUP BY 1, 2),
    cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
             FROM sigs a JOIN sigs b
               ON a.tbl = b.tbl AND a.sig = b.sig
              AND a.vec_id < b.vec_id)
    SELECT c.vec_a, c.vec_b,
           FLOOR(list_cosine_similarity(x.v, y.v) * 10000 + 0.5) / 10000
             AS cosine
    FROM cand c JOIN e x ON x.vec_id = c.vec_a
                JOIN e y ON y.vec_id = c.vec_b
    WHERE FLOOR(list_cosine_similarity(x.v, y.v) * 10000 + 0.5) / 10000
          >= {COSINE_T}
    """,
)
def sim_rp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection (sign) LSH near-dup pairs: RP_TABLES hash
    tables of RP_BITS signed hyperplane bits each; vectors colliding in
    any table become candidates, which are then exactly verified
    (cosine >= COSINE_T, same output contract as dd_embedding_cosine).

    P[bit agree] = 1 - angle/pi, so a cosine-0.4 pair collides in a
    4-bit table w.p. 0.63^4 ~ 0.16 and in >=1 of 16 tables w.p. ~0.94 —
    recall tunes with (tables, bits) and pytest pins it >= 0.8.

    Scale: signatures are one narrow numpy pass (batch GEMM against a
    64 x 64 plane matrix regenerated deterministically per worker).
    Verification happens INSIDE each (table, signature) bucket with the
    same normalized-GEMM kernel as dd_embedding_cosine — one shuffle of
    n x RP_TABLES vector rows, zero per-pair Catalyst expressions, and
    the only cross-table work is a dropDuplicates over the (few)
    verified pairs. An earlier draft materialized every candidate pair
    and evaluated an interpreted zip_with cosine per pair: ~160 s at
    sf0.1 vs ~3 s for this shape. At 100 TB, RP_BITS grows with corpus
    size to keep per-bucket GEMMs bounded."""
    import numpy as np
    import pandas as pd

    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    def _signatures(batches):
        # Rademacher (±1) hyperplanes from md5 bits — the same sign-LSH
        # guarantee as Gaussian planes, but cross-engine-deterministic
        # (the DuckDB oracle rebuilds the identical plane matrix)
        import hashlib

        planes = np.array(
            [
                [
                    1.0
                    if int(
                        hashlib.md5(f"{d}:{c}".encode()).hexdigest()[:15],
                        16,
                    )
                    & 1
                    else -1.0
                    for c in range(RP_TABLES * RP_BITS)
                ]
                for d in range(64)
            ]
        )
        weights = 1 << np.arange(RP_BITS)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([np.asarray(v) for v in pdf["v"]])
            bits = (x @ planes) > 0
            bits = bits.reshape(len(pdf), RP_TABLES, RP_BITS)
            sigs = bits @ weights  # (n, RP_TABLES)
            out = pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), RP_TABLES),
                    "tbl": np.tile(np.arange(RP_TABLES), len(pdf)),
                    "sig": sigs.reshape(-1),
                }
            )
            yield out

    sigs = emb.mapInPandas(_signatures, schema="vec_id long, tbl int, sig long")
    bucketed = sigs.join(emb, "vec_id")
    thresh = COSINE_T

    def _bucket_verify(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        ids = pdf["vec_id"].to_numpy()
        m = np.asarray([np.asarray(x) for x in pdf["v"]])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = np.floor((m @ m.T) * 10000 + 0.5) / 10000
        ia, ib = np.nonzero(np.triu(cos >= thresh, k=1))
        return pd.DataFrame(
            {
                "vec_a": np.minimum(ids[ia], ids[ib]),
                "vec_b": np.maximum(ids[ia], ids[ib]),
                "cosine": cos[ia, ib],
            }
        )

    return (
        bucketed.groupBy("tbl", "sig")
        .applyInPandas(_bucket_verify, schema="vec_a long, vec_b long, cosine double")
        .dropDuplicates(["vec_a", "vec_b"])
    )
