"""Wave 205: optimal transport between embedding distributions and
confounding sensitivity.

ml_sinkhorn_ot is entropic optimal transport (Sinkhorn) between the
label-0 and label-1 embedding distributions, run on the sign-LSH
CODEBOOK (the 8-bit table-0 buckets, each a mass + centroid) rather
than raw points — the standard scale path for dataset-distance in
training-data work: stat_wasserstein_1d prices a 1-D shift,
ds_semdedup asks "same point twice?", OT prices HOW FAR one
distribution must move to become the other in the full embedding
geometry, with the transport PLAN saying what moves where.
stat_evalue is VanderWeele's sensitivity analysis: given the observed
risk ratio between day-one-engaged and unengaged users' purchase
rates, how strong would an UNMEASURED confounder have to be (on both
arms) to explain the association away? The number that belongs next
to every ml_cox_ph / stat_did readout built on observational data.

Exactness: bucket masses are integers, centroids are pre-rounded to
the 1e-4 grid before the cost matrix, the Sinkhorn recursion replays
iteration-for-iteration as a recursive CTE carrying the column
scaling vector, and the E-value is closed-form arithmetic on four
integer counts.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

OT_BITS = 8  # codebook = sign-LSH table-0 signature (<= 256 buckets)
OT_ITERS = 15
OT_LAMBDA_FRAC = 0.1  # entropic regularization as a fraction of mean cost
EV_DIM = 64


def _ot_planes() -> list[list[float]]:
    """The 64 x OT_BITS ±1 plane matrix — md5-derived, the SAME
    construction (d:c keying) as extras129's sign-LSH table 0."""
    return [
        [
            1.0
            if int(hashlib.md5(f"{d}:{c}".encode()).hexdigest()[:15], 16) & 1
            else -1.0
            for c in range(OT_BITS)
        ]
        for d in range(EV_DIM)
    ]


_OT_PLANES_SQL = f"""
    planes AS MATERIALIZED (
      SELECT d.d, c.c,
             CASE WHEN (CAST('0x' || substr(md5(
                    CAST(d.d AS VARCHAR) || ':' || CAST(c.c AS VARCHAR)),
                    1, 15) AS BIGINT) & 1) = 1
                  THEN 1.0 ELSE -1.0 END AS w
      FROM (SELECT unnest(range(0, {EV_DIM})) AS d) d,
           (SELECT unnest(range(0, {OT_BITS})) AS c) c)"""


@query(
    "ml_sinkhorn_ot",
    # Real oracle: the codebook replays the md5 sign-LSH bucketing
    # (integer signatures), masses are integers, centroids are
    # grid-rounded BEFORE the cost matrix so both engines square
    # identical decimals, and the Sinkhorn recursion carries the
    # column scaling list through the same {it} iterations; only
    # EXP/sum ulps drift, absorbed by the output grid.
    oracle=f"""
    WITH RECURSIVE
    {_OT_PLANES_SQL},
    e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                              CAST(label % 2 AS INT) AS g
                       FROM embeddings),
    dots AS (SELECT e.vec_id, e.g, p.c,
                    SUM(e.v[CAST(p.d AS INT) + 1] * p.w) AS s
             FROM e, planes p GROUP BY 1, 2, 3),
    sigs AS (SELECT vec_id, g,
                    CAST(SUM(CASE WHEN s > 0
                             THEN CAST(1 AS BIGINT) << c
                             ELSE 0 END) AS BIGINT) AS sig
             FROM dots GROUP BY 1, 2),
    cb AS (SELECT g, sig, CAST(COUNT(*) AS BIGINT) AS mass
           FROM sigs GROUP BY 1, 2),
    cent AS (SELECT s.g, s.sig, u.d,
                    FLOOR(AVG(e.v[u.d]) * 1e4 + 0.5) / 1e4 AS val
             FROM sigs s JOIN e ON e.vec_id = s.vec_id
             CROSS JOIN (SELECT unnest(generate_series(1, {EV_DIM}))
                         AS d) u
             GROUP BY 1, 2, 3),
    idx AS (SELECT g, sig, mass,
                   CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY sig)
                        AS INT) AS i
            FROM cb),
    cost AS MATERIALIZED (
      SELECT i0.i AS i, i1.i AS j,
             SUM((c0.val - c1.val) * (c0.val - c1.val)) AS c
      FROM cent c0 JOIN idx i0 ON i0.g = 0 AND c0.g = 0
                                AND i0.sig = c0.sig
           JOIN cent c1 ON c1.g = 1 AND c1.d = c0.d
           JOIN idx i1 ON i1.g = 1 AND i1.sig = c1.sig
      GROUP BY 1, 2),
    lam AS (SELECT {OT_LAMBDA_FRAC} * AVG(c) AS l FROM cost),
    km AS MATERIALIZED (SELECT i, j, EXP(-c / lam.l) AS kk
                        FROM cost, lam),
    aa AS (SELECT i, CAST(mass AS DOUBLE)
                     / (SELECT SUM(mass) FROM idx WHERE g = 0) AS w
           FROM idx WHERE g = 0),
    bb AS (SELECT i AS j, CAST(mass AS DOUBLE)
                     / (SELECT SUM(mass) FROM idx WHERE g = 1) AS w
           FROM idx WHERE g = 1),
    nb AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM aa) AS b0,
                  (SELECT CAST(COUNT(*) AS BIGINT) FROM bb) AS b1),
    sink AS (
      SELECT 0 AS it,
             (SELECT list(CAST(1.0 AS DOUBLE) ORDER BY j) FROM bb) AS vv
      UNION ALL
      SELECT s.it + 1,
             (SELECT list(bb2.w / kt.kts ORDER BY bb2.j)
              FROM (SELECT k2.j, SUM(k2.kk * au.u) AS kts
                    FROM km k2
                    JOIN (SELECT kv.i, aa2.w / kv.kvs AS u
                          FROM (SELECT k1.i,
                                       SUM(k1.kk * s.vv[k1.j]) AS kvs
                                FROM km k1 GROUP BY 1) kv
                          JOIN aa aa2 ON aa2.i = kv.i) au
                      ON au.i = k2.i
                    GROUP BY 1) kt
              JOIN bb bb2 ON bb2.j = kt.j)
      FROM sink s WHERE s.it < {OT_ITERS}
    ),
    vfin AS (SELECT vv FROM sink WHERE it = {OT_ITERS}),
    ufin AS (SELECT kv.i, aa.w / kv.kvs AS u
             FROM (SELECT k1.i, SUM(k1.kk * vf.vv[k1.j]) AS kvs
                   FROM km k1, vfin vf GROUP BY 1) kv
             JOIN aa ON aa.i = kv.i),
    plan AS (SELECT km.i, km.j,
                    uf.u * km.kk * vf.vv[km.j] AS pi, cost.c
             FROM km JOIN ufin uf ON uf.i = km.i
                     JOIN cost ON cost.i = km.i AND cost.j = km.j,
                  vfin vf),
    res AS (SELECT SUM(pi * c) AS ot,
                   (SELECT SUM(ABS(cs - bb.w))
                    FROM (SELECT j, SUM(pi) AS cs FROM plan GROUP BY 1) q
                    JOIN bb ON bb.j = q.j) AS merr
            FROM plan)
    SELECT (SELECT b0 FROM nb) AS n_buckets_src,
           (SELECT b1 FROM nb) AS n_buckets_dst,
           (SELECT FLOOR(l * 1e6 + 0.5) / 1e6 FROM lam) AS lambda_reg,
           FLOOR(ot * 1e6 + 0.5) / 1e6 AS ot_cost,
           FLOOR(merr * 1e6 + 0.5) / 1e6 AS marginal_err
    FROM res
    """,
)
def ml_sinkhorn_ot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropic OT distance between the label-0 and label-1 embedding
    distributions: compress each side to its sign-LSH codebook
    (8-bit table-0 signature -> <= 256 buckets with integer masses
    and grid-rounded centroids), build the squared-euclidean cost
    matrix between codebooks, and run {it} Sinkhorn scaling rounds at
    lambda = 0.1 x mean cost. Reports the transport cost <plan, cost>
    and the residual marginal error (how converged the plan is). OT
    is the dataset-distance that respects geometry — two corpora with
    identical marginal stats but shifted clusters read 0 under moment
    tests and loudly nonzero here; the codebook trick is what makes
    it feasible at corpus scale (the plan lives on buckets, never on
    points).

    Scale: the only corpus-sized work is ONE signature pass (8
    codegen sign-dot expressions) + the per-(bucket, dim) centroid
    groupBy — both map-side combinable; everything after (cost
    matrix, {it} scaling rounds of two tiny joins each) is
    codebook-sized (<= 256 x 256). The oracle replays the recursion
    as a recursive CTE carrying the scaling vector."""
    planes = _ot_planes()
    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        (F.col("label") % 2).cast("int").alias("g"),
    )
    bit_cols = []
    for c in range(OT_BITS):
        w = F.array(*[F.lit(planes[d][c]) for d in range(EV_DIM)])
        dot = F.aggregate(
            F.zip_with(F.col("v"), w, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit_cols.append(
            F.when(dot > 0, F.lit(1 << c)).otherwise(F.lit(0))
        )
    sigs = emb.select(
        "vec_id",
        "g",
        "v",
        sum(bit_cols[1:], bit_cols[0]).cast("bigint").alias("sig"),
    ).localCheckpoint()  # one corpus pass; feeds masses + centroids
    cb = sigs.groupBy("g", "sig").agg(F.count(F.lit(1)).alias("mass"))
    cent = (
        sigs.select(
            "g", "sig", F.posexplode("v").alias("d0", "xv")
        )
        .groupBy("g", "sig", (F.col("d0") + 1).alias("d"))
        .agg(rnd(F.avg("xv"), 4).alias("val"))
    )
    from pyspark.sql import Window as W

    idx = cb.withColumn(
        "i",
        F.row_number()
        .over(W.partitionBy("g").orderBy("sig"))
        .cast("int"),
    ).localCheckpoint()  # codebook-sized; feeds cost + marginals
    c0 = cent.filter(F.col("g") == 0).join(
        idx.filter(F.col("g") == 0).select("sig", "i"), "sig"
    )
    c1 = cent.filter(F.col("g") == 1).join(
        idx.filter(F.col("g") == 1).select(
            "sig", F.col("i").alias("j")
        ),
        "sig",
    )
    cost = (
        c0.select("i", "d", F.col("val").alias("v0"))
        .join(c1.select("j", "d", F.col("val").alias("v1")), "d")
        .groupBy("i", "j")
        .agg(
            F.sum(
                (F.col("v0") - F.col("v1")) * (F.col("v0") - F.col("v1"))
            ).alias("c")
        )
        .localCheckpoint()  # <= 256x256; feeds lambda, kernel, plan
    )
    lam = cost.agg((OT_LAMBDA_FRAC * F.avg("c")).alias("l"))
    tot0 = idx.filter(F.col("g") == 0).agg(F.sum("mass").alias("t"))
    tot1 = idx.filter(F.col("g") == 1).agg(F.sum("mass").alias("t"))
    # everything past the cost matrix is codebook-sized (<= 256 x 256),
    # so the {it} scaling rounds run as ONE single-row expression fold
    # instead of {it} distributed join+checkpoint jobs (guide §1.2:
    # don't pay cluster scheduling for model-sized state). The dense
    # matrices ride as array columns — column attributes, so lambda
    # bodies index them O(1) without the element_at-in-lambda
    # re-evaluation trap (PERF.md) — and the recursion alternates
    # u/vv half-steps through an aggregate() so each half-step is
    # evaluated exactly once.
    avrow = (
        idx.filter(F.col("g") == 0)
        .crossJoin(F.broadcast(tot0))
        .select("i", (F.col("mass").cast("double") / F.col("t")).alias("w"))
        .agg(F.array_sort(F.collect_list(F.struct("i", "w"))).alias("a0"))
        .select(F.transform("a0", lambda x: x["w"]).alias("av"))
    )
    bvrow = (
        idx.filter(F.col("g") == 1)
        .crossJoin(F.broadcast(tot1))
        .select("i", (F.col("mass").cast("double") / F.col("t")).alias("w"))
        .agg(F.array_sort(F.collect_list(F.struct("i", "w"))).alias("b0"))
        .select(F.transform("b0", lambda x: x["w"]).alias("bv"))
    )
    cmrow = (
        cost.groupBy("i")
        .agg(F.array_sort(F.collect_list(F.struct("j", "c"))).alias("r"))
        .agg(F.array_sort(F.collect_list(F.struct("i", "r"))).alias("rr"))
        .select(
            F.transform(
                "rr", lambda x: F.transform(x["r"], lambda y: y["c"])
            ).alias("cm")
        )
    )
    # 2*iters+1 half-steps: odd = u from vv, even = vv from u; the
    # final extra odd step is the loop-exit u the transport plan uses
    n_half = 2 * OT_ITERS + 1
    sol = (
        cmrow.crossJoin(F.broadcast(avrow))
        .crossJoin(F.broadcast(bvrow))
        .crossJoin(F.broadcast(lam))
        .withColumn(
            "km",
            F.expr("transform(cm, row -> transform(row, c -> exp(-c / l)))"),
        )
        .withColumn(
            "uv",
            F.expr(
                f"""aggregate(
  sequence(1, {n_half}),
  named_struct('u', transform(av, x -> CAST(0 AS DOUBLE)),
               'vv', transform(bv, x -> CAST(1 AS DOUBLE))),
  (acc, it) -> if(it % 2 = 1,
    named_struct(
      'u', transform(sequence(1, size(av)), i ->
             element_at(av, i) /
             aggregate(sequence(1, size(bv)), CAST(0 AS DOUBLE),
               (s, j) -> s + element_at(element_at(km, i), j)
                           * element_at(acc.vv, j))),
      'vv', acc.vv),
    named_struct(
      'u', acc.u,
      'vv', transform(sequence(1, size(bv)), j ->
              element_at(bv, j) /
              aggregate(sequence(1, size(av)), CAST(0 AS DOUBLE),
                (s, i) -> s + element_at(element_at(km, i), j)
                            * element_at(acc.u, i))))))"""
            ),
        )
        .withColumn(
            "ot",
            F.expr(
                """aggregate(sequence(1, size(av)), CAST(0 AS DOUBLE),
  (s, i) -> s + element_at(uv.u, i) *
    aggregate(sequence(1, size(bv)), CAST(0 AS DOUBLE),
      (t, j) -> t + element_at(element_at(km, i), j)
                  * element_at(uv.vv, j)
                  * element_at(element_at(cm, i), j)))"""
            ),
        )
        .withColumn(
            "merr",
            F.expr(
                """aggregate(sequence(1, size(bv)), CAST(0 AS DOUBLE),
  (s, j) -> s + abs(element_at(uv.vv, j) *
    aggregate(sequence(1, size(av)), CAST(0 AS DOUBLE),
      (t, i) -> t + element_at(uv.u, i)
                  * element_at(element_at(km, i), j))
    - element_at(bv, j)))"""
            ),
        )
    )
    return sol.select(
        F.size("av").cast("bigint").alias("n_buckets_src"),
        F.size("bv").cast("bigint").alias("n_buckets_dst"),
        rnd(F.col("l"), 6).alias("lambda_reg"),
        rnd(F.col("ot"), 6).alias("ot_cost"),
        rnd(F.col("merr"), 6).alias("marginal_err"),
    )


ml_sinkhorn_ot.__doc__ = ml_sinkhorn_ot.__doc__.format(it=OT_ITERS)


@query(
    "stat_evalue",
    # Real oracle: the 2x2 table is four integer counts; RR, its CI
    # (shared-literal 1.959964), and both E-values are the same
    # closed-form expressions of those integers in both engines.
    oracle="""
    WITH u AS (SELECT user_id,
                      MIN(epoch_us(ts) // 86400000000) AS d0,
                      CAST(MAX(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS bought
               FROM events GROUP BY 1),
    fd AS (SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS c0
           FROM events e JOIN u ON u.user_id = e.user_id
           WHERE epoch_us(e.ts) // 86400000000 = u.d0
           GROUP BY 1),
    t AS (SELECT CASE WHEN f.c0 >= 2 THEN 1 ELSE 0 END AS x, u.bought
          FROM u JOIN fd f ON f.user_id = u.user_id),
    c AS (SELECT
            CAST(SUM(CASE WHEN x = 1 AND bought = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS a,
            CAST(SUM(CASE WHEN x = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(SUM(CASE WHEN x = 0 AND bought = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS b,
            CAST(SUM(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
          FROM t),
    rrx AS (SELECT a, n1, b, n0,
                   (CAST(a AS DOUBLE) / n1) / (CAST(b AS DOUBLE) / n0)
                     AS rr,
                   SQRT(1.0/a - 1.0/n1 + 1.0/b - 1.0/n0) AS se
            FROM c WHERE a > 0 AND b > 0 AND n1 > 0 AND n0 > 0),
    dirn AS (SELECT a, n1, b, n0, rr, se,
                    CASE WHEN rr >= 1 THEN rr ELSE 1.0 / rr END AS rrs,
                    CASE WHEN rr >= 1
                         THEN EXP(LN(rr) - 1.959964 * se)
                         ELSE 1.0 / EXP(LN(rr) + 1.959964 * se)
                    END AS ci_near
             FROM rrx)
    SELECT n1 AS n_engaged, n0 AS n_unengaged,
           FLOOR(CAST(a AS DOUBLE) / n1 * 1e4 + 0.5) / 1e4
             AS rate_engaged,
           FLOOR(CAST(b AS DOUBLE) / n0 * 1e4 + 0.5) / 1e4
             AS rate_unengaged,
           FLOOR(rr * 1e4 + 0.5) / 1e4 AS risk_ratio,
           FLOOR((rrs + SQRT(rrs * (rrs - 1.0))) * 1e4 + 0.5) / 1e4
             AS evalue_point,
           FLOOR(CASE WHEN ci_near > 1
                 THEN ci_near + SQRT(ci_near * (ci_near - 1.0))
                 ELSE 1.0 END * 1e4 + 0.5) / 1e4 AS evalue_ci
    FROM dirn
    """,
)
def stat_evalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-value sensitivity analysis for the day-one-engagement ->
    purchase association: the minimum strength (risk-ratio scale, on
    BOTH the exposure and outcome arms) an unmeasured confounder
    would need to fully explain away the observed risk ratio:
    E = RR + sqrt(RR(RR-1)) (direction-folded), plus the same for the
    CI bound nearer 1 (1.0 if the CI already crosses the null). An
    observed RR of 2 needs a confounder of strength 3.41 — quoting
    that number next to ml_cox_ph / stat_did readouts is what keeps
    observational claims honest.

    Scale: one per-user collapse + the first-day count join (the same
    two passes as ml_cox_ph), then a 4-cell integer table and closed
    form. Map-side combinable."""
    ev = cat(spark, sf_dir)["events"].select(
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        "user_id",
        "event_type",
    ).localCheckpoint()
    u = (
        ev.groupBy("user_id")
        .agg(
            F.min("day").alias("d0"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("bought"),
        )
        .localCheckpoint()
    )
    fd = (
        ev.join(u.select("user_id", "d0"), "user_id")
        .filter(F.col("day") == F.col("d0"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c0"))
    )
    t = u.join(fd, "user_id").select(
        F.when(F.col("c0") >= 2, 1).otherwise(0).alias("x"), "bought"
    )
    c = t.agg(
        F.sum(
            F.when((F.col("x") == 1) & (F.col("bought") == 1), 1).otherwise(
                0
            )
        ).alias("a"),
        F.sum(F.when(F.col("x") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(
            F.when((F.col("x") == 0) & (F.col("bought") == 1), 1).otherwise(
                0
            )
        ).alias("b"),
        F.sum(F.when(F.col("x") == 0, 1).otherwise(0)).alias("n0"),
    ).filter(
        (F.col("a") > 0)
        & (F.col("b") > 0)
        & (F.col("n1") > 0)
        & (F.col("n0") > 0)
    )
    rr = (F.col("a").cast("double") / F.col("n1")) / (
        F.col("b").cast("double") / F.col("n0")
    )
    se = F.sqrt(
        1.0 / F.col("a")
        - 1.0 / F.col("n1")
        + 1.0 / F.col("b")
        - 1.0 / F.col("n0")
    )
    d = c.select(
        "a",
        "n1",
        "b",
        "n0",
        rr.alias("rr"),
        F.when(rr >= 1, rr).otherwise(1.0 / rr).alias("rrs"),
        F.when(rr >= 1, F.exp(F.log(rr) - 1.959964 * se))
        .otherwise(1.0 / F.exp(F.log(rr) + 1.959964 * se))
        .alias("ci_near"),
    )
    rrs = F.col("rrs")
    ci = F.col("ci_near")
    return d.select(
        F.col("n1").cast("bigint").alias("n_engaged"),
        F.col("n0").cast("bigint").alias("n_unengaged"),
        rnd(F.col("a").cast("double") / F.col("n1"), 4).alias(
            "rate_engaged"
        ),
        rnd(F.col("b").cast("double") / F.col("n0"), 4).alias(
            "rate_unengaged"
        ),
        rnd(F.col("rr"), 4).alias("risk_ratio"),
        rnd(rrs + F.sqrt(rrs * (rrs - 1.0)), 4).alias("evalue_point"),
        rnd(
            F.when(ci > 1, ci + F.sqrt(ci * (ci - 1.0))).otherwise(1.0),
            4,
        ).alias("evalue_ci"),
    )
