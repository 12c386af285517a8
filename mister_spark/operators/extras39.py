"""Wave 39: leakage-safe splits, packing efficiency, embedding drift,
and lexical diversity.

ds_user_split is the entity-level train/val/test split (hash the USER,
not the event — row-level splits leak a user's behavior across splits);
ds_pack_efficiency is the padding-waste audit that justifies ds_pack's
concat-and-chunk layout with numbers; ml_psi_drift is the population-
stability-index monitor every deployed embedding pipeline alarms on;
tx_simpson_diversity rounds out textstats with the ecology-standard
diversity indices (Gini-Simpson, Shannon, type-token ratio).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

SPLIT_MOD = 10  # 8/1/1 train/val/test over a Knuth multiplicative mix
SEQ_LEN = 2048  # mirrors pipeline2.SEQ_LEN
PACK_SHARDS = 16  # mirrors pipeline2.PACK_SHARDS
PSI_DIMS = 8  # leading embedding dims monitored
PSI_BINS = 10
PSI_GRID = 100_000_000  # per-bin PSI terms snapped to a 1e-8 grid
H_GRID = 1_000_000  # per-token n·ln(n) terms snapped to a 1e-6 grid


@query(
    "ds_user_split",
    oracle=f"""
    WITH s AS (SELECT user_id, event_id, value,
                      CASE WHEN ((user_id * 2654435761) % 4294967296)
                                % {SPLIT_MOD} < 8 THEN 'train'
                           WHEN ((user_id * 2654435761) % 4294967296)
                                % {SPLIT_MOD} = 8 THEN 'val'
                           ELSE 'test' END AS split
               FROM events)
    SELECT split,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           FLOOR(SUM(value) * 100 + 0.5) / 100 AS total_value
    FROM s GROUP BY 1
    """,
)
def ds_user_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split manifest: the SPLIT KEY IS THE
    USER, hashed 8/1/1 by the engine-portable Knuth multiplicative mix
    (ds_shard_assign's), so every event of a user lands in exactly one
    split — row-level random splits would let the model memorize a
    user's train rows and 'predict' their test rows. Hash-based (not
    random) assignment also means new data added later lands in the
    same splits — the property an ongoing training pipeline needs.

    Scale: the split id is a map-side expression; one partial-agg
    shuffle over 3 keys (the distinct-user count shuffles user_id once
    via partial distinct). No per-entity state, no sampling pass."""
    ev = cat(spark, sf_dir)["events"]
    mix = ((F.col("user_id") * 2654435761) % 4294967296) % SPLIT_MOD
    s = ev.select(
        "user_id",
        "value",
        F.when(mix < 8, "train").when(mix == 8, "val").otherwise("test").alias(
            "split"
        ),
    )
    return s.groupBy("split").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        money(F.sum("value")).alias("total_value"),
    )


@query(
    "ds_pack_efficiency",
    oracle=f"""
    WITH t AS (SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
                      CAST(len({DUCK_TOKENS}) AS BIGINT) AS n
               FROM documents),
    v AS (SELECT * FROM t WHERE n >= 1),
    naive AS (SELECT CAST(SUM(((n + {SEQ_LEN} - 1) // {SEQ_LEN})
                              * {SEQ_LEN}) AS BIGINT) AS naive_slots,
                     CAST(SUM(n) AS BIGINT) AS total_tokens,
                     CAST(COUNT(*) AS BIGINT) AS n_docs
              FROM v),
    sh AS (SELECT shard, SUM(n) AS st FROM v GROUP BY 1),
    packed AS (SELECT CAST(SUM(((st + {SEQ_LEN} - 1) // {SEQ_LEN})
                               * {SEQ_LEN}) AS BIGINT) AS packed_slots
               FROM sh)
    SELECT n.total_tokens, n.n_docs, n.naive_slots, p.packed_slots,
           FLOOR(CAST(n.total_tokens AS DOUBLE) / n.naive_slots
                 * 10000 + 0.5) / 10000 AS naive_util,
           FLOOR(CAST(n.total_tokens AS DOUBLE) / p.packed_slots
                 * 10000 + 0.5) / 10000 AS packed_util
    FROM naive n, packed p
    """,
)
def ds_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit of the two batch layouts: pad-per-document
    (every doc padded up to a multiple of {SEQ_LEN}) vs ds_pack's
    concat-and-chunk (only each shard's LAST sequence is padded). The
    utilization gap is the GPU-hours number that justifies packing —
    on short-doc corpora naive padding routinely wastes most of the
    batch. Slots are exact integer ceil-arithmetic.

    Scale: one narrow token-count pass, one global fold, one
    {PACK_SHARDS}-row shard rollup — no windows, no joins beyond two
    1-row broadcasts."""
    docs = cat(spark, sf_dir)["documents"]
    v = docs.select(
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(tokens()).cast("bigint").alias("n"),
    ).filter(F.col("n") >= 1)
    naive = v.agg(
        F.sum(
            (F.floor((F.col("n") + SEQ_LEN - 1) / SEQ_LEN)) * SEQ_LEN
        )
        .cast("bigint")
        .alias("naive_slots"),
        F.sum("n").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    sh = v.groupBy("shard").agg(F.sum("n").alias("st"))
    packed = sh.agg(
        F.sum((F.floor((F.col("st") + SEQ_LEN - 1) / SEQ_LEN)) * SEQ_LEN)
        .cast("bigint")
        .alias("packed_slots")
    )
    j = naive.crossJoin(F.broadcast(packed))
    return j.select(
        "total_tokens",
        "n_docs",
        "naive_slots",
        "packed_slots",
        ratio(F.col("total_tokens").cast("double") / F.col("naive_slots")).alias(
            "naive_util"
        ),
        ratio(F.col("total_tokens").cast("double") / F.col("packed_slots")).alias(
            "packed_util"
        ),
    )


@query(
    "ml_psi_drift",
    oracle=f"""
    WITH x AS (SELECT vec_id, g.d AS dim,
                      CAST(embedding[g.d] AS DOUBLE) AS v,
                      vec_id % 2 AS side
               FROM embeddings
               CROSS JOIN (SELECT unnest(generate_series(1, {PSI_DIMS}))
                           AS d) g),
    st AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx
           FROM x WHERE side = 0 GROUP BY 1),
    bx AS (SELECT x.dim, x.side,
                  CAST(CASE WHEN st.mx = st.mn THEN 0
                       ELSE LEAST({PSI_BINS - 1}, GREATEST(0,
                            FLOOR((x.v - st.mn)
                                  / ((st.mx - st.mn) / {PSI_BINS}))))
                       END AS BIGINT) AS bin
           FROM x JOIN st ON x.dim = st.dim),
    c AS (SELECT dim, bin,
                 CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cr,
                 CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cc
          FROM bx GROUP BY 1, 2),
    n AS (SELECT dim, SUM(cr) AS nr, SUM(cc) AS nc FROM c GROUP BY 1),
    grid AS (SELECT d.d AS dim, b.b AS bin
             FROM (SELECT unnest(generate_series(1, {PSI_DIMS})) AS d) d
             CROSS JOIN (SELECT unnest(generate_series(0,
                         {PSI_BINS - 1})) AS b) b),
    f AS (SELECT g.dim, g.bin,
                 COALESCE(c.cr, 0) AS cr, COALESCE(c.cc, 0) AS cc,
                 n.nr, n.nc
          FROM grid g
          LEFT JOIN c ON g.dim = c.dim AND g.bin = c.bin
          JOIN n ON g.dim = n.dim),
    t AS (SELECT dim, nr, nc,
                 CAST(FLOOR((CAST(cr + 1 AS DOUBLE) / (nr + {PSI_BINS})
                             - CAST(cc + 1 AS DOUBLE) / (nc + {PSI_BINS}))
                            * ln((CAST(cr + 1 AS DOUBLE)
                                  / (nr + {PSI_BINS}))
                                 / (CAST(cc + 1 AS DOUBLE)
                                    / (nc + {PSI_BINS})))
                            * {PSI_GRID} + 0.5) AS BIGINT) AS term
          FROM f)
    SELECT CAST(dim AS BIGINT) AS dim,
           CAST(MAX(nr) AS BIGINT) AS n_ref, CAST(MAX(nc) AS BIGINT) AS n_cur,
           FLOOR(CAST(SUM(term) AS DOUBLE) / {PSI_GRID} * 10000 + 0.5)
             / 10000 AS psi
    FROM t GROUP BY 1
    """,
)
def ml_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index per leading embedding dimension
    between the even-id reference snapshot and the odd-id current
    snapshot — the drift alarm (PSI > 0.2 = investigate, > 0.25 =
    retrain) every deployed embedding/scoring pipeline monitors. Bins
    are {PSI_BINS} fixed-width cells from the REFERENCE min/max
    (current-side outliers clamp into the edge bins); shares are
    Laplace-smoothed so empty bins stay finite; each bin's
    (p−q)·ln(p/q) term is snapped to a 1e-8 grid before the per-dim
    sum, so engine summation order can't move the rounded PSI.

    Scale: the dim explosion is a narrow ×{PSI_DIMS} fan-out; stats
    and counts are two partial-agg shuffles on (dim, bin) keys; the
    {PSI_DIMS}×{PSI_BINS} grid is a broadcast literal frame."""
    emb = cat(spark, sf_dir)["embeddings"]
    x = emb.select(
        "vec_id",
        (F.col("vec_id") % 2).alias("side"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("dim"),
                        F.element_at("embedding", i).cast("double").alias("v"),
                    )
                    for i in range(1, PSI_DIMS + 1)
                ]
            )
        ).alias("e"),
    ).select("vec_id", "side", "e.dim", "e.v")
    st = (
        x.filter(F.col("side") == 0)
        .groupBy("dim")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    )
    width = (F.col("mx") - F.col("mn")) / PSI_BINS
    bin_ = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.lit(PSI_BINS - 1),
            F.greatest(F.lit(0), F.floor((F.col("v") - F.col("mn")) / width)),
        )
    )
    bx = x.join(F.broadcast(st), "dim").select(
        "dim", "side", bin_.cast("bigint").alias("bin")
    )
    # checkpointed: the per-dim totals branch and the grid join both
    # read this {PSI_DIMS}×{PSI_BINS}-row frame — without it each
    # branch replays the data-sized explode+count
    c = (
        bx.groupBy("dim", "bin")
        .agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("cr"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("cc"),
        )
        .localCheckpoint()
    )
    n = c.groupBy("dim").agg(
        F.sum("cr").alias("nr"), F.sum("cc").alias("nc")
    )
    grid = spark.range(1, PSI_DIMS + 1).select(
        F.col("id").cast("int").alias("dim")
    ).crossJoin(
        spark.range(0, PSI_BINS).select(F.col("id").cast("bigint").alias("bin"))
    )
    f = (
        grid.join(F.broadcast(c), ["dim", "bin"], "left")
        .fillna(0, subset=["cr", "cc"])
        .join(F.broadcast(n), "dim")
    )
    p = (F.col("cr") + 1).cast("double") / (F.col("nr") + PSI_BINS)
    q = (F.col("cc") + 1).cast("double") / (F.col("nc") + PSI_BINS)
    t = f.select(
        "dim",
        "nr",
        "nc",
        F.floor((p - q) * F.log(p / q) * PSI_GRID + F.lit(0.5))
        .cast("bigint")
        .alias("term"),
    )
    return t.groupBy(F.col("dim").cast("bigint").alias("dim")).agg(
        F.max("nr").cast("bigint").alias("n_ref"),
        F.max("nc").cast("bigint").alias("n_cur"),
        ratio(F.sum("term").cast("double") / PSI_GRID).alias("psi"),
    )


@query(
    "tx_simpson_diversity",
    oracle=f"""
    WITH tk AS (SELECT source, unnest({DUCK_TOKENS}) AS tok
                FROM documents),
    g AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
          FROM tk GROUP BY 1, 2),
    s AS (SELECT source,
                 CAST(SUM(n) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_types,
                 CAST(SUM(n * (n - 1)) AS BIGINT) AS pairs,
                 CAST(SUM(CAST(FLOOR(n * ln(CAST(n AS DOUBLE))
                                     * {H_GRID} + 0.5) AS BIGINT))
                      AS BIGINT) AS nlogn
          FROM g GROUP BY 1)
    SELECT source, n_tokens, n_types,
           FLOOR(CAST(n_types AS DOUBLE) / n_tokens * 10000 + 0.5) / 10000
             AS ttr,
           FLOOR((1 - CAST(pairs AS DOUBLE)
                      / (CAST(n_tokens AS DOUBLE) * (n_tokens - 1)))
                 * 10000 + 0.5) / 10000 AS simpson,
           FLOOR((ln(CAST(n_tokens AS DOUBLE))
                  - CAST(nlogn AS DOUBLE) / {H_GRID} / n_tokens)
                 * 10000 + 0.5) / 10000 AS shannon
    FROM s
    """,
)
def tx_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity scorecard per source: type-token ratio,
    Gini-Simpson index (1 − Σnᵢ(nᵢ−1)/N(N−1): probability two random
    tokens differ — the repetitiveness complement to tx_repetition),
    and Shannon entropy via H = ln N − (Σ nᵢ ln nᵢ)/N. A source whose
    diversity collapses is templated or spam-flooded — a corpus-mix
    red flag quota decisions act on. The pair count is exact int64;
    each nᵢ·ln nᵢ term is snapped to a 1e-6 grid before summation so
    engine order can't move the rounded entropy.

    Scale: one (source, token) partial-agg shuffle, then a #sources
    rollup — the same two-exchange shape as tx_source_quality; no
    windows, no joins."""
    docs = cat(spark, sf_dir)["documents"]
    tk = docs.select("source", F.explode(tokens()).alias("tok"))
    g = tk.groupBy("source", "tok").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    s = g.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.col("n") * (F.col("n") - 1)).cast("bigint").alias("pairs"),
        F.sum(
            F.floor(
                F.col("n") * F.log(F.col("n").cast("double")) * H_GRID
                + F.lit(0.5)
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("nlogn"),
    )
    nt = F.col("n_tokens").cast("double")
    return s.select(
        "source",
        "n_tokens",
        "n_types",
        ratio(F.col("n_types").cast("double") / nt).alias("ttr"),
        ratio(
            1 - F.col("pairs").cast("double") / (nt * (F.col("n_tokens") - 1))
        ).alias("simpson"),
        ratio(
            F.log(nt) - F.col("nlogn").cast("double") / H_GRID / nt
        ).alias("shannon"),
    )
