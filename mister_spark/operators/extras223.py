"""Wave 223: Matryoshka embedding evaluation and unbinned calibration.

emb_matryoshka_eval measures what dimension truncation costs
retrieval: renormalize each prefix of the embedding (8/16/32/64
dims), rerun the exact cosine top-10 against the full-dimension
ground truth, and report the overlap plus the mean similarity
distortion per prefix — the curve that says how far a
Matryoshka-style index can cut dimensions before recall pays
(emb_quantize_int8 prices PRECISION cuts; this prices DIMENSION
cuts). stat_spiegelhalter_z is the calibration test WITHOUT bins:
E[(y - p)(1 - 2p)] is exactly zero for a calibrated scorer, and its
studentized sum is one aggregate — the global yes/no that
ml_calibration_bins' decile table illustrates but never tests
(binned gaps can cancel; this statistic can't be fooled by binning
choices because there are none).

Exactness: similarities are grid-rounded with vec_id tiebreaks
before every cut (the sim_* convention); the calibration sums run on
the 1e-6-snapped probability grid (the extras32 trick), so both
engines sum identical operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, rnd
from mister_spark.operators.extras32 import CAL_POS_LABEL_LT
from mister_spark.registry import query

MAT_DIMS = (8, 16, 32, 64)
MAT_K = 10

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


def _mat_oracle() -> str:
    per_dim = []
    for d in MAT_DIMS:
        trunc = _UNIT.format(v=f"list_slice(e.v, 1, {d})")
        qtr = _UNIT.format(v=f"list_slice(q.qv, 1, {d})")
        per_dim.append(f"""
    s{d} AS (SELECT e.vec_id,
                    FLOOR({_DOT.format(a=trunc, b=qtr)} * 1e4 + 0.5)
                      / 1e4 AS cd,
                    FLOOR({_DOT.format(a=_UNIT.format(v="e.v"),
                                       b=_UNIT.format(v="q.qv"))}
                          * 1e4 + 0.5) / 1e4 AS cf
             FROM base e, q WHERE e.vec_id <> 0),
    t{d} AS (SELECT vec_id, cd, cf,
                    ROW_NUMBER() OVER (ORDER BY cd DESC, vec_id) AS rk
             FROM s{d}),
    o{d} AS (SELECT CAST({d} AS BIGINT) AS dim,
                    CAST(SUM(CASE WHEN t.vec_id IN
                         (SELECT vec_id FROM full_top) THEN 1 ELSE 0
                         END) AS BIGINT) AS hits,
                    FLOOR(AVG(ABS(t.cd - t.cf)) * 1e4 + 0.5) / 1e4
                      AS mean_sim_delta
             FROM t{d} t WHERE t.rk <= {MAT_K})""")
    unions = "\nUNION ALL\n".join(
        f"SELECT dim, hits, mean_sim_delta FROM o{d}" for d in MAT_DIMS
    )
    return f"""
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings),
    q AS (SELECT v AS qv FROM base WHERE vec_id = 0),
    fs AS (SELECT e.vec_id,
                  FLOOR({_DOT.format(a=_UNIT.format(v="e.v"),
                                     b=_UNIT.format(v="q.qv"))}
                        * 1e4 + 0.5) / 1e4 AS c
           FROM base e, q WHERE e.vec_id <> 0),
    full_top AS (SELECT vec_id FROM (
                   SELECT vec_id,
                          ROW_NUMBER() OVER (ORDER BY c DESC, vec_id)
                            AS rk
                   FROM fs) WHERE rk <= {MAT_K}),
    {",".join(per_dim)}
    SELECT dim, CAST(hits AS DOUBLE) / {MAT_K} AS overlap_at_{MAT_K},
           mean_sim_delta
    FROM ({unions})
    """


@query("emb_matryoshka_eval", oracle=_mat_oracle())
def emb_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation curve: for each dimension prefix
    {dims}, renormalize the truncated vectors, rerun the exact
    cosine top-{k} for the probe (vec_id 0), and score overlap with
    the full-dimension top-{k} plus the mean |truncated - full|
    similarity distortion. The ops table for "can we serve retrieval
    from the first 16 dims and rerank with the rest?" — the
    two-stage-index design decision, measured instead of assumed.

    Scale: one pass per prefix over the corpus (slice + codegen fold,
    no UDF), each ending in a TakeOrdered top-{k}; the probe vector
    broadcasts. At 100 TB each pass is the same brute-force-scored
    scan sim_brute_topk uses — the point of the op is to certify the
    CHEAPER index before you build it."""
    base = (
        cat(spark, sf_dir)["embeddings"]
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .localCheckpoint()
    )
    q = base.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))

    # norm-once cosine per prefix: see functions.vectors.unit_cos
    # (the naive transform(v, x -> x / norm(v)) re-evaluates the norm
    # per element — O(d^2) per row, and this op pays it once per
    # prefix width)
    from mister_spark.functions.vectors import unit_cos

    scored = (
        base.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            rnd(unit_cos(F.col("v"), F.col("qv")), 4).alias("cf"),
            *[
                rnd(
                    unit_cos(
                        F.slice(F.col("v"), 1, d),
                        F.slice(F.col("qv"), 1, d),
                    ),
                    4,
                ).alias(f"c{d}")
                for d in MAT_DIMS
            ],
        )
        .localCheckpoint()  # one scored pass feeds all prefix cuts
    )
    full_top = {
        r["vec_id"]
        for r in scored.orderBy(F.col("cf").desc(), "vec_id")
        .limit(MAT_K)
        .collect()
    }
    out = []
    for d in MAT_DIMS:
        rows = (
            scored.orderBy(F.col(f"c{d}").desc(), "vec_id")
            .limit(MAT_K)
            .select("vec_id")
            .collect()
        )
        hits = sum(1 for r in rows if r["vec_id"] in full_top)
        delta = (
            scored.select(
                F.col(f"c{d}").alias("cd"), "cf",
                F.row_number().over(
                    W.orderBy(F.col(f"c{d}").desc(), "vec_id")
                ).alias("rk"),
            )
            .filter(F.col("rk") <= MAT_K)
            .agg(rnd(F.avg(F.abs(F.col("cd") - F.col("cf"))), 4))
            .collect()[0][0]
        )
        out.append((d, hits / MAT_K, delta))
    return spark.createDataFrame(
        out,
        f"dim long, overlap_at_{MAT_K} double, mean_sim_delta double",
    )


emb_matryoshka_eval.__doc__ = emb_matryoshka_eval.__doc__.format(
    dims=MAT_DIMS, k=MAT_K
)


@query(
    "stat_spiegelhalter_z",
    # Real oracle: probabilities snap to the 1e-6 integer grid before
    # any sum (the extras32 trick), labels are integers, and the z
    # ratio + normal tail are shared closed forms on the grid.
    oracle=f"""
    WITH s AS (SELECT FLOOR((1.0 / (1.0 + exp(-CAST(embedding[1]
                      AS DOUBLE)))) * 1e6 + 0.5) / 1e6 AS p,
                      CASE WHEN label < {CAL_POS_LABEL_LT} THEN 1
                           ELSE 0 END AS y
               FROM embeddings),
    a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM((y - p) * (1 - 2 * p)) AS num,
                 SUM((1 - 2 * p) * (1 - 2 * p) * p * (1 - p)) AS den,
                 SUM((y - p) * (y - p)) AS brier_n,
                 CAST(SUM(y) AS BIGINT) AS pos
          FROM s),
    z AS (SELECT a.*, CASE WHEN den <= 0 THEN 0.0
                           ELSE num / SQRT(den) END AS zs
          FROM a)
    SELECT n AS n_scored, pos AS n_positive,
           FLOOR(brier_n / n * 1e6 + 0.5) / 1e6 AS brier,
           FLOOR(zs * 1e4 + 0.5) / 1e4 AS z,
           FLOOR(2 * {normal_sf_sql("ABS(zs)")} * 1e6 + 0.5) / 1e6
             AS p_value
    FROM z
    """,
)
def stat_spiegelhalter_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spiegelhalter's calibration z on the sigmoid scorer of
    ml_calibration_bins (sigmoid of embedding dim 0 vs label <
    {lt}): for a calibrated p, E[(y - p)(1 - 2p)] = 0 term by term,
    so z = sum/(sqrt of its variance) tests miscalibration with NO
    binning — decile tables can hide offsetting gaps; this single
    number can't. Reported with the Brier score it decomposes
    against. The pre-deployment gate for any probability a pipeline
    acts on.

    Scale: one narrow map + ONE 5-sum aggregate, map-side
    combinable; nothing leaves the executors but five numbers."""
    prob = 1.0 / (1.0 + F.exp(-F.element_at("embedding", 1).cast("double")))
    s = cat(spark, sf_dir)["embeddings"].select(
        (F.floor(prob * 1e6 + F.lit(0.5)) / 1e6).alias("p"),
        F.when(F.col("label") < CAL_POS_LABEL_LT, 1).otherwise(0).alias("y"),
    )
    a = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("y") - F.col("p")) * (1 - 2 * F.col("p"))).alias("num"),
        F.sum(
            (1 - 2 * F.col("p"))
            * (1 - 2 * F.col("p"))
            * F.col("p")
            * (1 - F.col("p"))
        ).alias("den"),
        F.sum(
            (F.col("y") - F.col("p")) * (F.col("y") - F.col("p"))
        ).alias("brier_n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    zs = F.when(F.col("den") <= 0, F.lit(0.0)).otherwise(
        F.col("num") / F.sqrt(F.col("den"))
    )
    return a.select(
        F.col("n").alias("n_scored"),
        F.col("pos").alias("n_positive"),
        rnd(F.col("brier_n") / F.col("n"), 6).alias("brier"),
        rnd(zs, 4).alias("z"),
        rnd(2 * normal_sf(F.abs(zs)), 6).alias("p_value"),
    )


stat_spiegelhalter_z.__doc__ = stat_spiegelhalter_z.__doc__.format(
    lt=CAL_POS_LABEL_LT
)
