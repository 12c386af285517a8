"""Wave 73: distributed boosting, parameterized SQL, and
game-theoretic feature importance.

ml_adaboost_stumps is AdaBoost done the distributed way — sample
weights live as a COLUMN (recomputed per round from the model, never
shuffled), and each round's best stump comes from one weighted
(feature, bin) aggregation; sql_parameterized pins Spark's
parameterized-SQL API (the injection-safe templating every SQL surface
needs); ml_feature_shapley applies the exact Shapley decomposition to
FEATURE subsets (which feature earns the accuracy), with v(S)
evaluated as one aggregation per coalition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

ADA_ROUNDS = 5
ADA_BINS = 32
ADA_FEATS = (1, 2, 3)  # embedding dims used as features
SHAP_FEATS = (1, 2, 3)


def _ada_stump_round(s: DataFrame):
    """One boosting round: weighted error of every (feature, bin,
    polarity) stump from a single aggregation; returns the argmin
    stump row."""
    cells = (
        s.groupBy("feat", "bin")
        .agg(
            F.sum(F.col("w") * F.col("y")).alias("wp"),
            F.sum(F.col("w") * (1 - F.col("y"))).alias("wn"),
        )
        .collect()
    )
    import math

    by_feat: dict[int, list] = {}
    for r in cells:
        by_feat.setdefault(r["feat"], []).append(r)
    tot_p = sum(r["wp"] for r in cells) / len(ADA_FEATS)
    tot_n = sum(r["wn"] for r in cells) / len(ADA_FEATS)
    best = None
    for feat, rows in by_feat.items():
        rows.sort(key=lambda r: r["bin"])
        cp = cn = 0.0
        for r in rows:
            cp += r["wp"]
            cn += r["wn"]
            # stump: predict 1 when bin <= threshold (polarity +)
            err_plus = cn + (tot_p - cp)  # negatives below + positives above
            err_minus = cp + (tot_n - cn)
            for pol, err in ((1, err_plus), (-1, err_minus)):
                if best is None or err < best[0] - 1e-15:
                    best = (err, feat, r["bin"], pol)
    err, feat, thr, pol = best
    err = max(min(err / (tot_p + tot_n), 1 - 1e-10), 1e-10)
    alpha = 0.5 * math.log((1 - err) / err)
    return feat, thr, pol, alpha, err


def _ada_oracle() -> str:
    """The 5-round AdaBoost loop unrolled into chained CTEs. Per round:
    the per-row weight EXP(-ysign*margin) is an expression over the
    stump parameters of the cross-joined s1..s{r-1} single-row CTEs,
    the (feat, bin) weighted cells aggregate once, cp/cn are
    bin-ordered prefix sums per feat, totals are the (feat, bin)-ordered
    prefix's last value (a deterministic accumulation order — the
    Python driver sums in collect order, which only matters below the
    1e-4 output grid), and the argmin stump breaks ties by
    (err, feat, bin, polarity DESC). Alpha is recomputed from the same
    clamped err, so every round's weights agree."""
    nf = len(ADA_FEATS)
    bins = ", ".join(
        f"LEAST(CAST(FLOOR(1.0 / (1.0 + EXP(-CAST(embedding[{d}] AS "
        f"DOUBLE))) * {ADA_BINS}) AS INT), {ADA_BINS - 1}) AS b{i}"
        for i, d in enumerate(ADA_FEATS)
    )
    parts = [
        f"""base AS (SELECT vec_id,
                    CASE WHEN label < 5 THEN 1 ELSE 0 END AS y, {bins}
             FROM embeddings)""",
        "lng AS ("
        + " UNION ALL ".join(
            f"SELECT vec_id, y, {i} AS feat, b{i} AS bin FROM base"
            for i in range(nf)
        )
        + ")",
    ]

    def margin(upto: int) -> str:
        if upto == 0:
            return "0.0"
        terms = []
        for k in range(1, upto + 1):
            sel = (
                f"CASE s{k}.feat "
                + " ".join(
                    f"WHEN {i} THEN base.b{i}" for i in range(nf)
                )
                + " END"
            )
            terms.append(
                f"s{k}.alpha * (CASE WHEN {sel} <= s{k}.thr"
                f" THEN s{k}.pol ELSE -s{k}.pol END)"
            )
        return "(" + " + ".join(terms) + ")"

    def sfrm(upto: int) -> str:
        return "".join(f", s{k}" for k in range(1, upto + 1))

    for r in range(1, ADA_ROUNDS + 1):
        m = margin(r - 1)
        parts.append(f"""
    cells{r} AS (SELECT l.feat, l.bin,
                    SUM(EXP(-(2 * l.y - 1) * {m}) * l.y) AS wp,
                    SUM(EXP(-(2 * l.y - 1) * {m}) * (1 - l.y)) AS wn
             FROM lng l JOIN base ON base.vec_id = l.vec_id{sfrm(r - 1)}
             GROUP BY l.feat, l.bin)""")
        parts.append(f"""
    pre{r} AS (SELECT feat, bin,
                    SUM(wp) OVER (PARTITION BY feat ORDER BY bin
                                  ROWS UNBOUNDED PRECEDING) AS cp,
                    SUM(wn) OVER (PARTITION BY feat ORDER BY bin
                                  ROWS UNBOUNDED PRECEDING) AS cn,
                    SUM(wp) OVER (ORDER BY feat, bin
                                  ROWS UNBOUNDED PRECEDING) AS gp,
                    SUM(wn) OVER (ORDER BY feat, bin
                                  ROWS UNBOUNDED PRECEDING) AS gn
             FROM cells{r})""")
        parts.append(f"""
    tot{r} AS (SELECT gp / {nf} AS tp, gn / {nf} AS tn
             FROM pre{r} ORDER BY feat DESC, bin DESC LIMIT 1)""")
        parts.append(f"""
    s{r} AS (SELECT feat, bin AS thr, pol, werr,
                    0.5 * LN((1 - cerr) / cerr) AS alpha, cerr
             FROM (SELECT p.feat, p.bin, u.pol,
                          CASE WHEN u.pol = 1
                               THEN p.cn + (t.tp - p.cp)
                               ELSE p.cp + (t.tn - p.cn) END AS werr,
                          GREATEST(LEAST(
                            (CASE WHEN u.pol = 1
                                  THEN p.cn + (t.tp - p.cp)
                                  ELSE p.cp + (t.tn - p.cn) END)
                            / (t.tp + t.tn), 1 - 1e-10), 1e-10) AS cerr
                   FROM pre{r} p, tot{r} t,
                        (SELECT UNNEST([1, -1]) AS pol) u) q
             ORDER BY werr, feat, thr, pol DESC LIMIT 1)""")
        mr = margin(r)
        parts.append(f"""
    acc{r} AS (SELECT AVG(CASE WHEN (CASE WHEN {mr} > 0 THEN 1 ELSE 0
                    END) = base.y THEN 1.0 ELSE 0.0 END) AS a
             FROM base{sfrm(r)})""")
    unions = "\nUNION ALL\n".join(
        f"""SELECT CAST({r - 1} AS INTEGER) AS round,
               CAST(s{r}.feat AS INTEGER) AS feat,
               CAST(s{r}.thr AS INTEGER) AS threshold,
               CAST(s{r}.pol AS INTEGER) AS polarity,
               FLOOR(s{r}.alpha * 10000 + 0.5) / 10000 AS alpha,
               FLOOR(s{r}.cerr * 10000 + 0.5) / 10000 AS weighted_err,
               FLOOR(acc{r}.a * 10000 + 0.5) / 10000 AS train_acc
        FROM s{r}, acc{r}"""
        for r in range(1, ADA_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + unions


@query("ml_adaboost_stumps", oracle=_ada_oracle())
# pytest gates monotone weighted error + accuracy beat over best stump.
def ml_adaboost_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AdaBoost with depth-1 stumps over binned embedding features
    ({r} rounds, {b} bins, features = dims {f}): sample weights are a
    recomputed COLUMN (w ∝ exp(−y·F(x)), derived from the model
    broadcast — never stored, never shuffled), and each round's best
    stump falls out of ONE (feature, bin) weighted aggregation plus an
    O(bins·features) driver scan. Reports per-round stump, weighted
    error, and ensemble training accuracy.

    Scale: per round = one narrow weight map + one bounded-cell
    shuffle; model state is O(rounds). The textbook 'boosting needs
    sequential passes' is true — but each pass is embarrassingly
    parallel."""
    import math

    emb = cat(spark, sf_dir)["embeddings"]
    feats = [
        F.least(
            F.floor(
                (1.0 / (1.0 + F.exp(-F.element_at("embedding", d).cast("double"))))
                * ADA_BINS
            ).cast("int"),
            F.lit(ADA_BINS - 1),
        ).alias(f"b{i}")
        for i, d in enumerate(ADA_FEATS)
    ]
    base = emb.select(
        "vec_id", (F.col("label") < 5).cast("int").alias("y"), *feats
    ).localCheckpoint()
    long = base.select(
        "vec_id",
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("feat"), F.col(f"b{i}").alias("bin")
                    )
                    for i in range(len(ADA_FEATS))
                ]
            )
        ).alias("fb"),
    ).select("vec_id", "y", F.col("fb.feat").alias("feat"), F.col("fb.bin").alias("bin"))
    model: list[tuple[int, int, int, float]] = []  # (feat, thr, pol, alpha)

    def margin_col():
        m = F.lit(0.0)
        for feat, thr, pol, alpha in model:
            pred = F.when(
                F.col(f"b{feat}") <= thr, F.lit(pol)
            ).otherwise(F.lit(-pol))
            m = m + alpha * pred
        return m

    out = []
    for rnd_i in range(ADA_ROUNDS):
        ysign = 2 * F.col("y") - 1
        w = F.exp(-ysign * margin_col())
        wl = long.join(
            base.select("vec_id", *(f"b{i}" for i in range(len(ADA_FEATS)))),
            "vec_id",
        ).withColumn("w", w)
        feat, thr, pol, alpha, err = _ada_stump_round(wl)
        model.append((feat, thr, pol, alpha))
        acc = base.select(
            F.avg(
                ((margin_col() > 0).cast("int") == F.col("y")).cast("double")
            ).alias("a")
        ).collect()[0]["a"]
        out.append(
            (
                rnd_i,
                int(feat),
                int(thr),
                int(pol),
                math.floor(alpha * 10000 + 0.5) / 10000,
                math.floor(err * 10000 + 0.5) / 10000,
                math.floor(acc * 10000 + 0.5) / 10000,
            )
        )
    return spark.createDataFrame(
        out,
        "round int, feat int, threshold int, polarity int, alpha double, "
        "weighted_err double, train_acc double",
    ).orderBy("round")


ml_adaboost_stumps.__doc__ = ml_adaboost_stumps.__doc__.format(
    r=ADA_ROUNDS, b=ADA_BINS, f=ADA_FEATS
)


@query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS revenue
    FROM orders
    WHERE o_totalprice > 250000 AND o_orderstatus = 'O'
    GROUP BY 1
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL through Spark's bind-parameter API
    (`spark.sql(query, args={...})`): the threshold and status arrive
    as TYPED named parameters, not string-spliced literals — the
    injection-safe templating contract a SQL surface owes its callers.
    Catalyst still constant-folds the bound values, so pushdown is
    identical to literal SQL.

    Scale: plan-identical to the literal query — parameters bind
    before optimization."""
    cat(spark, sf_dir).register_views()
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS revenue
        FROM orders
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        GROUP BY 1
        """,
        args={"min_price": 250000, "status": "O"},
    )


def _shap_oracle() -> str:
    """All 2^k coalition accuracies as one aggregate row (integer
    vote/equality arithmetic — no float drift), then each feature's
    Shapley sum written term-by-term in the same lexicographic
    coalition order (and thus the same left-to-right float
    accumulation) as the Python loop; factorial weights are the same
    small-integer divisions."""
    import math
    from itertools import combinations

    k = len(SHAP_FEATS)
    cols = ", ".join(
        f"CASE WHEN CAST(embedding[{d}] AS DOUBLE) > 0"
        f" THEN 1 ELSE 0 END AS c{i}"
        for i, d in enumerate(SHAP_FEATS)
    )

    def vname(S):
        return "v" + "".join(str(i) for i in S) if S else "vempty"

    aggs = ["AVG(CAST(y AS DOUBLE)) AS br"]
    allS = [
        S for r_ in range(1, k + 1) for S in combinations(range(k), r_)
    ]
    for S in allS:
        votes = " + ".join(f"c{i}" for i in S)
        aggs.append(
            f"AVG(CASE WHEN (CASE WHEN ({votes}) * 2 >= {len(S)}"
            f" THEN 1 ELSE 0 END) = y THEN 1.0 ELSE 0.0 END)"
            f" AS {vname(S)}"
        )

    def vexpr(S):
        return "GREATEST(br, 1 - br)" if not S else vname(S)

    rows = []
    for i in range(k):
        others = [j for j in range(k) if j != i]
        terms = []
        for r_ in range(k):
            for S in combinations(others, r_):
                w = (
                    math.factorial(len(S))
                    * math.factorial(k - len(S) - 1)
                    / math.factorial(k)
                )
                Si = tuple(sorted(S + (i,)))
                terms.append(
                    f"{w!r} * ({vexpr(Si)} - {vexpr(S)})"
                )
        phi = " + ".join(terms)
        rows.append(
            f"""SELECT 'dim{SHAP_FEATS[i] - 1}' AS feature,
               FLOOR(({phi}) * 10000 + 0.5) / 10000 AS shapley_acc,
               FLOOR(({vexpr(tuple(range(k)))} - GREATEST(br, 1 - br))
                     * 10000 + 0.5) / 10000 AS total_gain
        FROM v"""
        )
    return (
        "WITH b AS (SELECT CASE WHEN label < 5 THEN 1 ELSE 0 END AS y, "
        + cols
        + " FROM embeddings),\nv AS (SELECT "
        + ",\n       ".join(aggs)
        + " FROM b)\n"
        + "\nUNION ALL\n".join(rows)
    )


@query("ml_feature_shapley", oracle=_shap_oracle())
# pytest checks efficiency vs full-model accuracy.
def ml_feature_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley feature importance for the 3-feature majority-vote
    classifier (dims {f}): v(S) = training accuracy using only the
    features in S (empty set falls back to the base rate), each
    coalition scored by ONE aggregation pass, and every feature's
    credit is its exact Shapley value over the 2³ coalition lattice.
    The model-agnostic 'who earns the accuracy' decomposition,
    exact because k is small — which is also the honest scaling note:
    beyond ~10 features you sample permutations.

    Scale: 2^k single-row aggregation passes over one cached frame;
    driver combinatorics are O(2^k·k)."""
    import math
    from itertools import combinations

    emb = cat(spark, sf_dir)["embeddings"]
    cols = [
        (F.element_at("embedding", d).cast("double") > 0)
        .cast("int")
        .alias(f"c{i}")
        for i, d in enumerate(SHAP_FEATS)
    ]
    base = emb.select(
        (F.col("label") < 5).cast("int").alias("y"), *cols
    ).localCheckpoint()
    k = len(SHAP_FEATS)
    base_rate = base.agg(F.avg("y").alias("r")).collect()[0]["r"]
    base_acc = max(base_rate, 1 - base_rate)

    def v(S: tuple) -> float:
        if not S:
            return base_acc
        votes = sum((F.col(f"c{i}") for i in S[1:]), F.col(f"c{S[0]}"))
        pred = (votes * 2 >= len(S)).cast("int")
        return base.agg(
            F.avg((pred == F.col("y")).cast("double")).alias("a")
        ).collect()[0]["a"]

    vals = {S: v(S) for r_ in range(k + 1) for S in combinations(range(k), r_)}
    rows = []
    for i in range(k):
        total = 0.0
        others = [j for j in range(k) if j != i]
        for r_ in range(k):
            for S in combinations(others, r_):
                w = (
                    math.factorial(len(S))
                    * math.factorial(k - len(S) - 1)
                    / math.factorial(k)
                )
                total += w * (
                    vals[tuple(sorted(S + (i,)))] - vals[S]
                )
        rows.append(
            (
                f"dim{SHAP_FEATS[i] - 1}",
                math.floor(total * 10000 + 0.5) / 10000,
            )
        )
    full = vals[tuple(range(k))]
    rows = [
        (name, val, math.floor((full - base_acc) * 10000 + 0.5) / 10000)
        for name, val in rows
    ]
    return spark.createDataFrame(
        rows, "feature string, shapley_acc double, total_gain double"
    ).orderBy("feature")


ml_feature_shapley.__doc__ = ml_feature_shapley.__doc__.format(f=SHAP_FEATS)
