"""Wave 238: per-example data valuation and burstiness timescales.

ds_knn_shapley computes EXACT Shapley data values under the KNN
utility (Jia et al.'s closed form): for the probe embedding, sort
training points by similarity and the telescoping recursion
s_j = s_(j+1) + (b_j - b_(j+1)) * min(K, j) / (K j) collapses to a
SUFFIX SUM — every training point's marginal contribution to
classifying the probe, exactly, with no subset enumeration. Positive
values are the examples that teach the probe's label; negative ones
actively mislead — the per-example accounting behind "which data
earned its storage", at two windows' cost. ev_fano_factor_curve
measures WHEN traffic clusters: the Fano factor (variance/mean of
window counts) at 1h/6h/24h windows reads 1 under Poisson at every
scale, and the window size where it departs upward is the timescale
at which bursts live (ev_burstiness scores inter-event times; the
Fano curve localizes the scale).

Exactness: similarity ranks use grid-rounded cosines with vec_id
tiebreaks, the Shapley suffix terms are rationals of integers;
window counts are integers on gap-filled spines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

KS_K = 5
KS_TOP = 10
EPOCH = "1970-01-01"
FANO_WINDOWS = (1, 6, 24)

_UNIT = (
    "list_transform({v}, x -> x / GREATEST(SQRT(list_reduce("
    "list_prepend(CAST(0 AS DOUBLE), list_transform({v}, y -> y * y)),"
    " (a, b) -> a + b)), 1e-12))"
)
_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])),"
    " (p, q) -> p + q)"
)


@query(
    "ds_knn_shapley",
    # Real oracle: the similarity order is the rounded-cosine grid
    # with vec_id tiebreaks, b flags are integers, each telescoping
    # term is a rational of integers, and the suffix sum + top/bottom
    # cuts use the same rounded grid and tiebreaks.
    oracle=f"""
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                         label
                  FROM embeddings),
    q AS (SELECT v AS qv, label AS y0 FROM base WHERE vec_id = 0),
    sc AS (SELECT b.vec_id, b.label,
                  FLOOR({_DOT.format(a=_UNIT.format(v="b.v"),
                                     b=_UNIT.format(v="q.qv"))}
                        * 1e4 + 0.5) / 1e4 AS c,
                  CASE WHEN b.label = q.y0 THEN 1 ELSE 0 END AS m
           FROM base b, q WHERE b.vec_id <> 0),
    rk AS (SELECT vec_id, c, m,
                  ROW_NUMBER() OVER (ORDER BY c DESC, vec_id) AS j,
                  COUNT(*) OVER () AS n
           FROM sc),
    term AS (SELECT rk.*,
                    CASE WHEN j < n THEN
                      (m - LEAD(m) OVER (ORDER BY j))
                      * LEAST({KS_K}, j) * 1.0 / ({KS_K} * j)
                    ELSE CAST(m AS DOUBLE) / n END AS t
             FROM rk),
    ti AS (SELECT vec_id, j, m,
                  CAST(FLOOR(t * 1e12 + 0.5) AS BIGINT) AS ti
           FROM term),
    shap AS (SELECT vec_id, j, m,
                    SUM(ti) OVER (ORDER BY j DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) / 1e12 AS s
             FROM ti),
    lab AS (SELECT shap.*,
                   ROW_NUMBER() OVER (
                     ORDER BY FLOOR(s * 1e6 + 0.5) DESC, vec_id)
                     AS rtop,
                   ROW_NUMBER() OVER (
                     ORDER BY FLOOR(s * 1e6 + 0.5), vec_id) AS rbot
            FROM shap)
    SELECT CASE WHEN rtop <= {KS_TOP} THEN 'valuable'
                ELSE 'harmful' END AS role,
           vec_id, CAST(j AS BIGINT) AS sim_rank,
           CAST(m AS BIGINT) AS same_label,
           FLOOR(s * 1e6 + 0.5) / 1e6 AS shapley
    FROM lab
    WHERE rtop <= {KS_TOP} OR rbot <= {KS_TOP}
    """,
)
def ds_knn_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact KNN-Shapley data values for the probe (vec_id 0): sort
    training embeddings by cosine similarity; the Shapley value of
    the j-th nearest under the K={k} NN utility telescopes to a
    suffix sum of (b_j - b_(j+1)) min(K, j)/(K j) — marginal worth
    per example with NO subset sampling. The {t} most valuable and
    {t} most harmful examples are returned: the first are the
    probe's true teachers, the second are near neighbors with the
    WRONG label — the canonical relabel/purge shortlist, priced
    example by example.

    Scale: one broadcast-probe similarity pass; the global similarity
    rank is the two-phase range-partitioned `global_rank` (no
    single-task sort), the lead(m) term a self-join on rank j+1, and
    the suffix sum telescopes to total − prefix with the prefix from
    `bucketed_cumsum` (bucket-partitioned windows only). Terms are
    snapped to an exact 1e-12 integer grid before summing so the
    distributed prefix sum is order-independent (integer addition is
    associative; partial sums stay ≲ 1e13, far under 2^53, so the
    final double conversion is exact in both engines). The top/bottom
    cuts are two `orderBy().limit()` TakeOrdereds. The O(2^n) Shapley
    definition never appears — the KNN utility makes it linear."""
    base = cat(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    q = base.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("label").alias("y0")
    )

    # norm-once cosine: see functions.vectors.unit_cos (the naive
    # transform(v, x -> x / norm(v)) re-evaluates the norm per
    # element — O(d^2) per row; measured 10-13 -> 4-7 s at sf1)
    from mister_spark.functions.vectors import unit_cos

    sc = (
        base.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            rnd(unit_cos(F.col("v"), F.col("qv")), 4).alias("c"),
            F.when(F.col("label") == F.col("y0"), 1).otherwise(0).alias("m"),
        )
        .localCheckpoint()
    )
    from mister_spark.functions.ranks import bucketed_cumsum, global_rank

    nf = sc.agg(F.count(F.lit(1)).alias("n"))
    ranked = global_rank(sc, F.col("c").desc(), F.col("vec_id"), rank_col="j")
    # lead(m) over the rank order, without the unpartitioned window:
    # rank j's successor flag is a distributed self-join on j+1 (ranks
    # are contiguous 1..n, so m_next is NULL exactly at j = n).
    nxt = ranked.select((F.col("j") - 1).alias("j"), F.col("m").alias("m_next"))
    term = (
        ranked.join(nxt, "j", "left")
        .crossJoin(F.broadcast(nf))
        .select(
            "vec_id", "j", "m",
            F.when(
                F.col("m_next").isNotNull(),
                (F.col("m") - F.col("m_next"))
                * F.least(F.lit(KS_K), F.col("j"))
                * 1.0
                / (KS_K * F.col("j")),
            )
            .otherwise(F.col("m").cast("double") / F.col("n"))
            .alias("t"),
        )
        .withColumn("ti", F.floor(F.col("t") * 1e12 + F.lit(0.5)).cast("long"))
        .localCheckpoint()
    )
    # suffix(j) = total − prefix(j) + ti(j): exact on the integer grid,
    # so the bucketed two-phase prefix equals the oracle's sequential
    # descending window bit-for-bit.
    totf = term.agg(F.sum("ti").alias("tot"))
    shap = (
        bucketed_cumsum(term, "j", {"pre": F.col("ti")})
        .crossJoin(F.broadcast(totf))
        .select(
            "vec_id", "j", "m",
            ((F.col("tot") - F.col("pre") + F.col("ti")) / 1e12).alias("s"),
        )
        .localCheckpoint()
    )
    skey = F.floor(F.col("s") * 1e6 + F.lit(0.5))
    top = (
        shap.orderBy(skey.desc(), "vec_id")
        .limit(KS_TOP)
        .withColumn("role", F.lit("valuable"))
    )
    bot = (
        shap.orderBy(skey.asc(), "vec_id")
        .limit(KS_TOP)
        .join(F.broadcast(top.select("vec_id")), "vec_id", "left_anti")
        .withColumn("role", F.lit("harmful"))
    )
    return top.unionByName(bot).select(
        "role",
        "vec_id",
        F.col("j").cast("bigint").alias("sim_rank"),
        F.col("m").cast("bigint").alias("same_label"),
        rnd(F.col("s"), 6).alias("shapley"),
    )


ds_knn_shapley.__doc__ = ds_knn_shapley.__doc__.format(k=KS_K, t=KS_TOP)


def _fano_oracle() -> str:
    per_w = []
    for w in FANO_WINDOWS:
        per_w.append(f"""
    c{w} AS (SELECT h // {w} AS win, CAST(SUM(arr) AS DOUBLE) AS n
             FROM (SELECT hb.h, COALESCE(a.arr, 0) AS arr
                   FROM (SELECT unnest(generate_series(b.h0, b.h1))
                           AS h FROM bounds b) hb
                   LEFT JOIN a ON a.h = hb.h)
             GROUP BY 1),
    f{w} AS (SELECT CAST({w} AS BIGINT) AS window_hours,
                    CAST(COUNT(*) AS BIGINT) AS n_windows,
                    AVG(n) AS mu, VAR_SAMP(n) AS vv
             FROM c{w})""")
    unions = "\nUNION ALL\n".join(
        f"SELECT window_hours, n_windows, mu, vv FROM f{w}"
        for w in FANO_WINDOWS
    )
    return f"""
    WITH a AS (SELECT date_diff('hour', TIMESTAMP '{EPOCH} 00:00:00',
                      date_trunc('hour', ts)) AS h,
                      CAST(COUNT(*) AS BIGINT) AS arr
               FROM events GROUP BY 1),
    bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM a),
    {",".join(per_w)}
    SELECT window_hours, n_windows,
           FLOOR(mu * 1e4 + 0.5) / 1e4 AS mean_count,
           FLOOR(CASE WHEN mu <= 0 THEN 0.0 ELSE vv / mu END
                 * 1e4 + 0.5) / 1e4 AS fano
    FROM ({unions})
    """


@query("ev_fano_factor_curve", oracle=_fano_oracle())
def ev_fano_factor_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance/mean of window counts) at {ws}-hour
    windows over the gap-filled hour axis: a Poisson stream reads 1
    at EVERY scale; clustering pushes it above 1 starting at the
    timescale where the bursts live, so the curve's departure point
    localizes WHEN the process stops being memoryless.
    ev_burstiness scores the inter-event distribution; the Fano
    curve tells you which aggregation window still mixes bursts
    with calm (the windowing decision every counter dashboard makes
    blind).

    Scale: one hour-grain count; each window size is one integer
    re-bucketing + a 2-moment aggregate on the calendar-bounded
    frame."""
    a = (
        cat(spark, sf_dir)["events"]
        .select(
            F.floor(
                F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600
            )
            .cast("bigint")
            .alias("h")
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("arr"))
        .localCheckpoint()
    )
    bounds = a.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    filled = spine.join(a, "h", "left").select(
        "h", F.coalesce(F.col("arr"), F.lit(0)).alias("arr")
    ).localCheckpoint()
    outs = []
    for w in FANO_WINDOWS:
        c = filled.groupBy(F.expr(f"h div {w}").alias("win")).agg(
            F.sum("arr").cast("double").alias("n")
        )
        f = c.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.avg("n").alias("mu"),
            F.var_samp("n").alias("vv"),
        ).select(
            F.lit(w).cast("bigint").alias("window_hours"),
            "n_windows",
            rnd(F.col("mu"), 4).alias("mean_count"),
            rnd(
                F.when(F.col("mu") <= 0, F.lit(0.0)).otherwise(
                    F.col("vv") / F.col("mu")
                ),
                4,
            ).alias("fano"),
        )
        outs.append(f)
    out = outs[0]
    for f in outs[1:]:
        out = out.unionByName(f)
    return out


ev_fano_factor_curve.__doc__ = ev_fano_factor_curve.__doc__.format(
    ws=FANO_WINDOWS
)
