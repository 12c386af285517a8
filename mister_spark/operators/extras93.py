"""Wave 93: spatial bucketed joins, spatial autocorrelation, and ALS
matrix factorization.

j_spatial_grid_join is the grid-cell radius join — bucket points into
cells, equi-join each cell against its 3×3 neighborhood, verify exact
distance only on candidates; the same bucket-then-verify shape as
MinHash-LSH, applied to geometry (coordinates here are synthesized
deterministically from keys so the oracle replays everything);
stat_moran_i computes Moran's I spatial autocorrelation of account
balance over that neighbor graph — 'are nearby customers similar',
the spatial twin of lag-1 autocorrelation; ml_als_factorization is
alternating least squares on the customer×part purchase matrix with
both factor sides distributed — the collaborative-filtering core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

GRID_DEG = 1.0  # cell size (degrees)
RADIUS = 0.5  # match radius (degrees, flat-space demo)
ALS_RANK = 4
ALS_ITERS = 3
ALS_LAMBDA = 0.1


def _latlon_sql() -> str:
    """Deterministic synthetic coordinates from the customer key."""
    return f"""
      SELECT c_custkey, c_acctbal,
             ((c_custkey * {FP_MUL} + 7) % {FP_MOD}) % 18000 / 100.0 - 90
               AS lat,
             ((c_custkey * {FP_MUL} + 13) % {FP_MOD}) % 36000 / 100.0 - 180
               AS lon
      FROM customer
    """


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = cat(spark, sf_dir)["customer"]
    return c.select(
        "c_custkey",
        "c_acctbal",
        (((F.col("c_custkey") * FP_MUL + 7) % FP_MOD) % 18000 / 100.0 - 90)
        .alias("lat"),
        (((F.col("c_custkey") * FP_MUL + 13) % FP_MOD) % 36000 / 100.0 - 180)
        .alias("lon"),
    )


_PAIR_SQL = f"""
    pts AS ({_latlon_sql()}),
    cells AS (SELECT c_custkey, c_acctbal, lat, lon,
                     CAST(FLOOR(lat / {GRID_DEG}) AS BIGINT) AS cx,
                     CAST(FLOOR(lon / {GRID_DEG}) AS BIGINT) AS cy
              FROM pts),
    cand AS (SELECT a.c_custkey AS ka, b.c_custkey AS kb,
                    a.c_acctbal AS xa, b.c_acctbal AS xb,
                    SQRT((a.lat - b.lat) * (a.lat - b.lat)
                         + (a.lon - b.lon) * (a.lon - b.lon)) AS dist
             FROM cells a
             JOIN (SELECT * FROM (VALUES (-1), (0), (1)) t(dx)) dxs ON TRUE
             JOIN (SELECT * FROM (VALUES (-1), (0), (1)) t(dy)) dys ON TRUE
             JOIN cells b ON b.cx = a.cx + dxs.dx AND b.cy = a.cy + dys.dy
                          AND a.c_custkey < b.c_custkey),
    hit AS (SELECT * FROM cand WHERE dist <= {RADIUS})
"""


@query(
    "j_spatial_grid_join",
    oracle=f"""
    WITH {_PAIR_SQL}
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS candidate_pairs,
           CAST(COUNT(*) AS BIGINT) AS matched_pairs,
           FLOOR(COALESCE(AVG(dist), 0) * 10000 + 0.5) / 10000 AS avg_dist
    FROM hit
    """,
)
def j_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join of customer points (coordinates synthesized
    deterministically from keys — flat-degree space, a geometry demo
    not a geodesy one): bucket into {g}° grid cells, equi-join each
    point against its 3×3 neighbor cells, verify the exact distance
    only on candidates. Same candidate-generation discipline as
    MinHash-LSH: NEVER all-pairs; the cell join bounds work by local
    density.

    Scale: one shuffle on cell id (candidates are per-cell-pair
    local); the ×9 neighbor expansion is map-side; a production
    version salts hot cells exactly like j_skew_salted."""
    cells = _points(spark, sf_dir).select(
        "c_custkey",
        "c_acctbal",
        "lat",
        "lon",
        F.floor(F.col("lat") / GRID_DEG).cast("bigint").alias("cx"),
        F.floor(F.col("lon") / GRID_DEG).cast("bigint").alias("cy"),
    ).localCheckpoint()
    a = cells.select(
        F.col("c_custkey").alias("ka"),
        F.col("lat").alias("la"),
        F.col("lon").alias("oa"),
        "cx",
        "cy",
    ).withColumn(
        "dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    ).withColumn(
        "dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    ).select(
        "ka",
        "la",
        "oa",
        (F.col("cx") + F.col("dx")).alias("jx"),
        (F.col("cy") + F.col("dy")).alias("jy"),
    )
    b = cells.select(
        F.col("c_custkey").alias("kb"),
        F.col("lat").alias("lb"),
        F.col("lon").alias("ob"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dist = F.sqrt(
        (F.col("la") - F.col("lb")) * (F.col("la") - F.col("lb"))
        + (F.col("oa") - F.col("ob")) * (F.col("oa") - F.col("ob"))
    )
    cand = (
        a.join(b, ["jx", "jy"])
        .filter(F.col("ka") < F.col("kb"))
        .select("ka", "kb", dist.alias("dist"))
        .localCheckpoint()
    )
    tot = cand.agg(F.count(F.lit(1)).cast("bigint").alias("candidate_pairs"))
    hit = cand.filter(F.col("dist") <= RADIUS).agg(
        F.count(F.lit(1)).cast("bigint").alias("matched_pairs"),
        ratio(F.coalesce(F.avg("dist"), F.lit(0.0))).alias("avg_dist"),
    )
    return tot.crossJoin(F.broadcast(hit))


j_spatial_grid_join.__doc__ = j_spatial_grid_join.__doc__.format(g=GRID_DEG)


@query(
    "stat_moran_i",
    oracle=f"""
    WITH {_PAIR_SQL},
    m AS (SELECT AVG(c_acctbal) AS xbar,
                 CAST(COUNT(*) AS DOUBLE) AS n FROM pts),
    num AS (SELECT SUM((xa - m.xbar) * (xb - m.xbar)) * 2 AS s,
                   CAST(COUNT(*) AS DOUBLE) * 2 AS w
            FROM hit, m),
    den AS (SELECT SUM((c_acctbal - m.xbar) * (c_acctbal - m.xbar)) AS d
            FROM pts, m)
    SELECT CAST(num.w AS BIGINT) AS links,
           FLOOR(m.n / num.w * num.s / den.d * 10000 + 0.5) / 10000
             AS moran_i,
           FLOOR(-1.0 / (m.n - 1) * 10000 + 0.5) / 10000 AS expected_i
    FROM num, den, m
    """,
)
def stat_moran_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I spatial autocorrelation of account balance over the
    radius-{r}° neighbor graph: I = (n/Σw)·Σw_ij(x_i−x̄)(x_j−x̄)/Σ(x_i−x̄)²
    with symmetric binary weights. E[I] = −1/(n−1) under no spatial
    structure — and since the demo coordinates are hash-synthesized,
    landing near that expectation is itself the correctness signal.

    Scale: reuses the grid-bucketed candidate join (never all-pairs);
    the numerator is one aggregate over matched pairs, the denominator
    one over points."""
    pts = _points(spark, sf_dir).localCheckpoint()
    m = pts.agg(
        F.avg("c_acctbal").alias("xbar"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    bal = pts.select(F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("x"))
    cells = pts.select(
        "c_custkey",
        F.floor(F.col("lat") / GRID_DEG).cast("bigint").alias("cx"),
        F.floor(F.col("lon") / GRID_DEG).cast("bigint").alias("cy"),
        "lat",
        "lon",
    )
    a = cells.select(
        F.col("c_custkey").alias("ka"),
        F.col("lat").alias("la"),
        F.col("lon").alias("oa"),
        "cx",
        "cy",
    ).withColumn(
        "dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    ).withColumn(
        "dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    ).select(
        "ka", "la", "oa",
        (F.col("cx") + F.col("dx")).alias("jx"),
        (F.col("cy") + F.col("dy")).alias("jy"),
    )
    b = cells.select(
        F.col("c_custkey").alias("kb"),
        F.col("lat").alias("lb"),
        F.col("lon").alias("ob"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dist = F.sqrt(
        (F.col("la") - F.col("lb")) * (F.col("la") - F.col("lb"))
        + (F.col("oa") - F.col("ob")) * (F.col("oa") - F.col("ob"))
    )
    hit = (
        a.join(b, ["jx", "jy"])
        .filter((F.col("ka") < F.col("kb")) & (dist <= RADIUS))
        .select("ka", "kb")
    )
    # no broadcast hint: the balance side is data-sized at scale — the
    # pair joins shuffle on the point key (AQE may still broadcast here)
    pair = hit.join(
        bal.select(F.col("k").alias("ka"), F.col("x").alias("xa")), "ka"
    ).join(bal.select(F.col("k").alias("kb"), F.col("x").alias("xb")), "kb")
    num = pair.crossJoin(F.broadcast(m)).agg(
        (F.sum((F.col("xa") - F.col("xbar")) * (F.col("xb") - F.col("xbar"))) * 2).alias("s"),
        (F.count(F.lit(1)).cast("double") * 2).alias("w"),
    )
    den = pts.crossJoin(F.broadcast(m)).agg(
        F.sum(
            (F.col("c_acctbal") - F.col("xbar"))
            * (F.col("c_acctbal") - F.col("xbar"))
        ).alias("d"),
        F.first("n").alias("n"),
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            F.col("w").cast("bigint").alias("links"),
            ratio(F.col("n") / F.col("w") * F.col("s") / F.col("d")).alias(
                "moran_i"
            ),
            ratio(-1.0 / (F.col("n") - 1)).alias("expected_i"),
        )
    )


stat_moran_i.__doc__ = stat_moran_i.__doc__.format(r=RADIUS)


def als_train(spark: SparkSession, sf_dir: str):
    """ALS on the customer×part purchase-count matrix, rank {k},
    λ = {lam}: alternate per-user and per-item ridge solves, each a
    grouped 4×4 normal-equation solve via applyInPandas with the
    OTHER side's factors joined in. Both factor tables live as
    DataFrames — at 100 TB neither side needs to fit anywhere; the
    joins shuffle on the respective keys and every solve sees only its
    own group's rows. Returns per-iteration RMSE (must be
    non-increasing).
    """
    import numpy as np
    import pandas as pd

    li = cat(spark, sf_dir)["lineitem"]
    orders = cat(spark, sf_dir)["orders"]
    r = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("r"))
        .localCheckpoint()
    )
    k = ALS_RANK

    def init_side(df, key):
        # deterministic small factors from the key hash
        cols = [
            (
                ((F.col(key) * FP_MUL + 17 * (j + 1)) % FP_MOD) % 1000
                / 1000.0
                - 0.5
            ).alias(f"f{j}")
            for j in range(k)
        ]
        return df.select(F.col(key), *cols)

    Q = init_side(r.select("i").distinct(), "i").localCheckpoint()

    schema = ", ".join(["key long"] + [f"f{j} double" for j in range(k)])

    def solve_side(ratings, other, own_key, other_key):
        # ratings (own_key, other_key, r) ⋈ other factors → per-own solve
        j = ratings.join(
            other.select(
                F.col(other_key),
                *[F.col(f"f{m}").alias(f"o{m}") for m in range(k)],
            ),
            other_key,
        )

        def solve(pdf: pd.DataFrame) -> pd.DataFrame:
            A = pdf[[f"o{m}" for m in range(k)]].to_numpy(dtype=np.float64)
            y = pdf["r"].to_numpy(dtype=np.float64)
            G = A.T @ A + ALS_LAMBDA * np.eye(k)
            v = np.linalg.solve(G, A.T @ y)
            return pd.DataFrame(
                [[int(pdf[own_key].iloc[0])] + [float(x) for x in v]],
                columns=["key"] + [f"f{m}" for m in range(k)],
            )

        out = j.groupBy(own_key).applyInPandas(solve, schema)
        return out.withColumnRenamed("key", own_key)

    rmses = []
    P = None
    for _ in range(ALS_ITERS):
        P = solve_side(r, Q, "u", "i").localCheckpoint()
        Q = solve_side(r, P, "i", "u").localCheckpoint()
        pred = (
            r.join(P.select("u", *[F.col(f"f{m}").alias(f"p{m}") for m in range(k)]), "u")
            .join(Q.select("i", *[F.col(f"f{m}").alias(f"q{m}") for m in range(k)]), "i")
        )
        dot = None
        for m in range(k):
            term = F.col(f"p{m}") * F.col(f"q{m}")
            dot = term if dot is None else dot + term
        rmse = pred.agg(
            F.sqrt(F.avg((F.col("r") - dot) * (F.col("r") - dot))).alias("e")
        ).collect()[0]["e"]
        rmses.append(float(rmse))
    base = r.agg(
        F.sqrt(F.avg(F.col("r") * F.col("r"))).alias("b")
    ).collect()[0]["b"]
    return rmses, float(base)


als_train.__doc__ = als_train.__doc__.format(k=ALS_RANK, lam=ALS_LAMBDA)


def _als_d3(c1, c2, c3) -> str:
    (a, d, g), (b, e, h), (c, f, i) = c1, c2, c3
    return (
        f"({a}*({e}*{i}-{f}*{h}) - {b}*({d}*{i}-{f}*{g})"
        f" + {c}*({d}*{h}-{e}*{g}))"
    )


def _als_d4(cols) -> str:
    """4×4 determinant by first-column cofactor expansion."""
    c1, c2, c3, c4 = cols
    terms = []
    for r in range(4):
        minors = tuple(
            tuple(col[i] for i in range(4) if i != r)
            for col in (c2, c3, c4)
        )
        sign = "+" if r % 2 == 0 else "-"
        terms.append(f"{sign} {c1[r]} * {_als_d3(*minors)}")
    return "(" + " ".join(terms) + ")"


def _als_oracle() -> str:
    """The full ALS trajectory as one recursive CTE: state = both
    factor tables as DOUBLE[][] (dense-rank indexed), each micro-step
    re-solves one side's per-entity 4×4 ridge normal equations by
    Cramer (generated cofactor SQL) from grouped sums over the
    ratings join — exactly the grouped applyInPandas solve, replayed.
    Cramer-vs-LU float drift is ~1e-13 on these ridge systems; the
    1e-6 RMSE grid absorbs it."""
    k = ALS_RANK
    # symmetric Gramian entry names with the ridge on the diagonal
    def g(i: int, j: int) -> str:
        lo, hi = min(i, j), max(i, j)
        e = f"q.g{lo}{hi}"
        return f"({e} + {ALS_LAMBDA!r})" if i == j else e
    gcols = [tuple(g(r, m) for r in range(1, k + 1)) for m in range(1, k + 1)]
    bcol = tuple(f"q.b{r}" for r in range(1, k + 1))
    det = _als_d4(gcols)
    solves = ", ".join(
        _als_d4(gcols[:m] + [bcol] + gcols[m + 1:]) + f" / {det}"
        for m in range(k)
    )
    def a(i: int) -> str:
        # input-side factor element i for this rating row (no LATERAL
        # alias: lambda-free correlated indexing into the state lists)
        return (
            f"(CASE WHEN (s.st % 2) = 0 THEN s.qi[x.iidx][{i}]"
            f" ELSE s.pu[x.uidx][{i}] END)"
        )

    gsums = ",\n             ".join(
        f"SUM({a(i)} * {a(j)}) AS g{i}{j}"
        for i in range(1, k + 1)
        for j in range(i, k + 1)
    ) + ",\n             " + ",\n             ".join(
        f"SUM({a(i)} * x.r) AS b{i}" for i in range(1, k + 1)
    )
    steps = 2 * ALS_ITERS
    return f"""
    WITH RECURSIVE
    ratings AS (SELECT o_custkey AS u, l_partkey AS i,
                       CAST(COUNT(*) AS DOUBLE) AS r
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                GROUP BY 1, 2),
    ru AS (SELECT u, CAST(ROW_NUMBER() OVER (ORDER BY u) AS INT) AS uidx
           FROM (SELECT DISTINCT u FROM ratings) q),
    ri AS (SELECT i, CAST(ROW_NUMBER() OVER (ORDER BY i) AS INT) AS iidx
           FROM (SELECT DISTINCT i FROM ratings) q),
    rx AS (SELECT r.r, ru.uidx, ri.iidx
           FROM ratings r JOIN ru USING (u) JOIN ri USING (i)),
    qinit AS (SELECT list(f ORDER BY iidx) AS qi FROM (
        SELECT iidx, list_transform(range(1, {k + 1}), j ->
          CAST(((i * {FP_MUL} + 17 * j) % {FP_MOD}) % 1000 AS DOUBLE)
            / 1000.0 - 0.5) AS f
        FROM ri) z),
    als AS (
      SELECT 0 AS st, q0.qi AS pu, q0.qi AS qi FROM qinit q0
      UNION ALL
      SELECT s.st + 1,
             CASE WHEN (s.st % 2) = 0 THEN lat.newf ELSE s.pu END,
             CASE WHEN (s.st % 2) = 0 THEN s.qi ELSE lat.newf END
      FROM als s
      CROSS JOIN LATERAL (
        SELECT list([{solves}] ORDER BY q.tgt) AS newf
        FROM (
          SELECT CASE WHEN (s.st % 2) = 0 THEN x.uidx
                      ELSE x.iidx END AS tgt,
             {gsums}
          FROM rx x
          GROUP BY 1
        ) q
      ) lat
      WHERE s.st < {steps}
    ),
    base AS (SELECT SQRT(AVG(r * r)) AS b FROM ratings),
    rm AS (SELECT t.it AS it,
                  SQRT(AVG((x.r - list_aggregate(list_transform(
                    range(1, {k + 1}), m -> p.pu[x.uidx][m]
                      * q.qi[x.iidx][m]), 'sum'))
                    * (x.r - list_aggregate(list_transform(
                    range(1, {k + 1}), m -> p.pu[x.uidx][m]
                      * q.qi[x.iidx][m]), 'sum')))) AS rmse
           FROM (VALUES (1), (2), (3)) AS t(it)
           CROSS JOIN rx x
           JOIN als p ON p.st = 2 * t.it - 1
           JOIN als q ON q.st = 2 * t.it
           GROUP BY t.it)
    SELECT CAST(it AS BIGINT) AS iteration,
           FLOOR(rmse * 1e6 + 0.5) / 1e6 AS rmse,
           FLOOR(base.b * 1e6 + 0.5) / 1e6 AS baseline_rmse
    FROM rm CROSS JOIN base
    """


@query("ml_als_factorization", oracle=_als_oracle())
# Full ALS replay in the oracle's recursive CTE; pytest additionally
# gates non-increasing RMSE.
def ml_als_factorization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collaborative filtering by alternating least squares on the
    customer×part purchase matrix (see als_train): per-iteration
    training RMSE against the predict-zero baseline. The factorization
    that powers 'customers like you bought' — here with both factor
    sides distributed, so neither users nor items need to fit on any
    single node."""
    import math

    rmses, base = als_train(spark, sf_dir)
    # floor-grid rounding — identical double arithmetic to the oracle
    rows = [
        (
            it + 1,
            math.floor(e * 1e6 + 0.5) / 1e6,
            math.floor(base * 1e6 + 0.5) / 1e6,
        )
        for it, e in enumerate(rmses)
    ]
    return spark.createDataFrame(
        rows, "iteration long, rmse double, baseline_rmse double"
    )
