"""Wave 257: directed triad census and gamma GLM pricing curves.

graph_triad_census classifies EVERY node triple of the directed
nation-trade graph into the 16 isomorphism classes of the classic
Holland–Leinhardt census (003 … 300): the complete local signature of
a digraph — transitive 030T excess over cyclic 030C is the standard
hierarchy diagnostic, 201/210/300 density says how mutual the trade
web is. The census is computed from PAIR dyad codes and a shared
64-entry canonical lookup (generated at import by exhaustive
permutation canonicalization — no table copied from anywhere), so both
engines classify identically. stat_gamma_glm fits order price ~
exp(b0 + b1·items) as a log-link Gamma GLM by IRLS — the right model
when spend is positive, right-skewed, and variance grows with the
square of the mean (where OLS on raw price lets a few huge orders own
the fit): for the log link the IRLS weights are identically 1, so each
step is one closed-form 2-parameter OLS on the working response,
replayed step-for-step in the oracle's recursion.

Exactness: dyad codes and triple counts are integers; the 64→16 CASE
is the same literal in both engines; IRLS iterates round to 1e-9 per
step on identical double operands (the ml_temperature_scaling
pattern).
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

GLM_ITERS = 6

# --- triad machinery -------------------------------------------------
# 6-bit code over ordered pairs of the sorted triple (a < b < c):
# bit 0: a->b, 1: b->a, 2: a->c, 3: c->a, 4: b->c, 5: c->b.
_PAIRS = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]

# canonical-class -> Holland–Leinhardt name, keyed by the minimal code
# under the 6 node permutations (names pinned by the structural
# definitions in the docstring)
_CANON_NAME = {
    0: "003",
    1: "012",
    3: "102",
    5: "021D",  # one source -> two sinks (out-star)
    10: "021U",  # two sources -> one sink (in-star)
    6: "021C",  # directed path
    7: "111U",  # mutual dyad + outgoing asymmetric edge
    11: "111D",  # mutual dyad + incoming asymmetric edge
    15: "201",
    21: "030T",  # transitive triangle
    25: "030C",  # cyclic triangle
    23: "120U",  # mutual dyad, both members point at the third (021U + M)
    30: "120D",  # mutual dyad, third points at both members (021D + M)
    27: "120C",  # mutual dyad + directed path through the third
    31: "210",
    63: "300",
}


def _triad_label(code: int) -> str:
    best = 64
    adj = {}
    for i, (x, y) in enumerate(_PAIRS):
        adj[(x, y)] = (code >> i) & 1
    for p in permutations(range(3)):
        c = 0
        for i, (x, y) in enumerate(_PAIRS):
            c |= adj[(p[x], p[y])] << i
        best = min(best, c)
    return _CANON_NAME[best]


TRIAD_LABELS = {code: _triad_label(code) for code in range(64)}


def _triad_case_sql(expr: str) -> str:
    whens = " ".join(
        f"WHEN {code} THEN '{label}'" for code, label in TRIAD_LABELS.items()
    )
    return f"CASE {expr} {whens} END"


_TRIAD_EDGES = """
    e0 AS (SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
                  CAST(COUNT(*) AS BIGINT) AS w
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           WHERE s.s_nationkey <> c.c_nationkey
           GROUP BY 1, 2),
    e AS (SELECT src, dst FROM e0
          WHERE w > (SELECT AVG(w) FROM e0)),
    nodes AS (SELECT DISTINCT n FROM (
                SELECT src AS n FROM e UNION ALL SELECT dst FROM e) q),
    pc AS (SELECT x.n AS x, y.n AS y,
                  CAST(MAX(CASE WHEN e1.src IS NOT NULL THEN 1 ELSE 0 END)
                       + 2 * MAX(CASE WHEN e2.src IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS pc
           FROM nodes x JOIN nodes y ON x.n < y.n
           LEFT JOIN e e1 ON e1.src = x.n AND e1.dst = y.n
           LEFT JOIN e e2 ON e2.src = y.n AND e2.dst = x.n
           GROUP BY 1, 2)
"""


@query(
    "graph_triad_census",
    oracle=f"""
    WITH {_TRIAD_EDGES},
    triples AS (SELECT a.n AS a, b.n AS b, c.n AS c
                FROM nodes a JOIN nodes b ON a.n < b.n
                             JOIN nodes c ON b.n < c.n),
    coded AS (SELECT p1.pc + 4 * p2.pc + 16 * p3.pc AS code
              FROM triples t
              JOIN pc p1 ON p1.x = t.a AND p1.y = t.b
              JOIN pc p2 ON p2.x = t.a AND p2.y = t.c
              JOIN pc p3 ON p3.x = t.b AND p3.y = t.c)
    SELECT {_triad_case_sql("code")} AS triad_type,
           CAST(COUNT(*) AS BIGINT) AS n_triples
    FROM coded GROUP BY 1 ORDER BY triad_type
    """,
)
def graph_triad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holland–Leinhardt triad census of the directed nation-trade
    graph (edges kept only where pair support exceeds the mean —
    the raw distinct graph is complete-mutual at every SF, a census
    with one nonzero cell): every node triple classified into the 16
    digraph isomorphism classes (003 empty … 300 complete-mutual) via
    pair dyad codes and a 64-entry canonical lookup generated at
    import by exhaustive permutation canonicalization. The census is the
    digraph's local fingerprint: 030T ≫ 030C means hierarchy, heavy
    201/210/300 means a mutual trade web, and the whole vector is the
    classical null-model test bed (graph_config_triangles compares
    one slice of it).

    Scale: one fact-scan edge rollup to the ≤25-node nation digraph;
    triples and dyad codes are model-sized broadcast joins (C(25,3) =
    2300 rows), one 16-row grouped count."""
    c = cat(spark, sf_dir)
    e = (
        c["lineitem"]
        .select("l_suppkey", "l_orderkey")
        .join(
            c["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                c["supplier"].select(
                    "s_suppkey", F.col("s_nationkey").alias("src")
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            c["customer"].select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_nationkey").alias("dst"),
            ),
            "o_custkey",
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .localCheckpoint()  # model-sized weighted digraph
    )
    thr = e.agg(F.avg("w").alias("t"))
    e = (
        e.crossJoin(F.broadcast(thr))
        .filter(F.col("w") > F.col("t"))
        .select("src", "dst")
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("n"))
        .unionByName(e.select(F.col("dst").alias("n")))
        .distinct()
    )
    pairs = nodes.alias("x").join(
        nodes.alias("y"), F.col("x.n") < F.col("y.n")
    ).select(F.col("x.n").alias("x"), F.col("y.n").alias("y"))
    pc = (
        pairs.join(
            e.select(
                F.col("src").alias("x"), F.col("dst").alias("y"),
                F.lit(1).alias("f1"),
            ),
            ["x", "y"],
            "left",
        )
        .join(
            e.select(
                F.col("dst").alias("x"), F.col("src").alias("y"),
                F.lit(1).alias("f2"),
            ),
            ["x", "y"],
            "left",
        )
        .groupBy("x", "y")
        .agg(
            (
                F.max(F.coalesce(F.col("f1"), F.lit(0)))
                + 2 * F.max(F.coalesce(F.col("f2"), F.lit(0)))
            )
            .cast("bigint")
            .alias("pc")
        )
        .localCheckpoint()
    )
    triples = (
        nodes.alias("a")
        .join(nodes.alias("b"), F.col("a.n") < F.col("b.n"))
        .join(nodes.alias("c"), F.col("b.n") < F.col("c.n"))
        .select(
            F.col("a.n").alias("a"),
            F.col("b.n").alias("b"),
            F.col("c.n").alias("c"),
        )
    )
    coded = (
        triples.join(
            F.broadcast(pc.select(
                F.col("x").alias("a"), F.col("y").alias("b"),
                F.col("pc").alias("p1"),
            )),
            ["a", "b"],
        )
        .join(
            F.broadcast(pc.select(
                F.col("x").alias("a"), F.col("y").alias("c"),
                F.col("pc").alias("p2"),
            )),
            ["a", "c"],
        )
        .join(
            F.broadcast(pc.select(
                F.col("x").alias("b"), F.col("y").alias("c"),
                F.col("pc").alias("p3"),
            )),
            ["b", "c"],
        )
        .select(
            (F.col("p1") + 4 * F.col("p2") + 16 * F.col("p3")).alias("code")
        )
    )
    label = F.expr(_triad_case_sql("code"))
    return (
        coded.select(label.alias("triad_type"))
        .groupBy("triad_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triples"))
        .orderBy("triad_type")
    )


_GLM_SQL = f"""
WITH RECURSIVE d AS (SELECT CAST(o.o_totalprice AS DOUBLE) AS yv,
                            CAST(COUNT(*) AS DOUBLE) AS x
                     FROM orders o
                     JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                     GROUP BY o.o_orderkey, o.o_totalprice),
irls(it, b0, b1) AS (
  SELECT 0, FLOOR(LN((SELECT AVG(yv) FROM d)) * 1000000000 + 0.5)
         / 1000000000, CAST(0.0 AS DOUBLE)
  UNION ALL
  SELECT w.it + 1,
         FLOOR((s.sz / s.n - ((s.sxz - s.sx * s.sz / s.n)
                / (s.sxx - s.sx * s.sx / s.n)) * s.sx / s.n)
               * 1000000000 + 0.5) / 1000000000,
         FLOOR(((s.sxz - s.sx * s.sz / s.n)
                / (s.sxx - s.sx * s.sx / s.n)) * 1000000000 + 0.5)
           / 1000000000
  FROM irls w,
       LATERAL (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                       SUM(d.x) AS sx, SUM(d.x * d.x) AS sxx,
                       SUM(w.b0 + w.b1 * d.x
                           + (d.yv - EXP(w.b0 + w.b1 * d.x))
                             / EXP(w.b0 + w.b1 * d.x)) AS sz,
                       SUM(d.x * (w.b0 + w.b1 * d.x
                           + (d.yv - EXP(w.b0 + w.b1 * d.x))
                             / EXP(w.b0 + w.b1 * d.x))) AS sxz
                FROM d) s
  WHERE w.it < {GLM_ITERS}
),
bf AS (SELECT b0, b1 FROM irls WHERE it = {GLM_ITERS}),
fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM((d.yv - EXP(bf.b0 + bf.b1 * d.x))
                   * (d.yv - EXP(bf.b0 + bf.b1 * d.x))
                   / (EXP(bf.b0 + bf.b1 * d.x)
                      * EXP(bf.b0 + bf.b1 * d.x))) AS pearson
        FROM d CROSS JOIN bf)
SELECT FLOOR(bf.b0 * 1000000 + 0.5) / 1000000 AS b0,
       FLOOR(bf.b1 * 1000000 + 0.5) / 1000000 AS b1,
       FLOOR(EXP(bf.b1) * 10000 + 0.5) / 10000 AS price_mult_per_item,
       FLOOR(fit.pearson / (fit.n - 2) * 10000 + 0.5) / 10000
         AS dispersion,
       fit.n
FROM bf CROSS JOIN fit
"""


@query("stat_gamma_glm", oracle=_GLM_SQL)
def stat_gamma_glm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gamma GLM with log link for order price vs line-item count:
    E[price] = exp(b0 + b1·items), fit by {i} IRLS steps — for the
    log link the IRLS weight is identically 1 (V(μ)=μ², (dμ/dη)²/V =
    1), so each step is one closed-form OLS of the working response
    z = η + (y−μ)/μ on x. The multiplicative read is the point:
    exp(b1) is the price multiplier per extra item, and the Pearson
    dispersion says how over-spread prices are around the curve —
    the model OLS-on-logs approximates and right-skew breaks.

    Scale: one fact join + per-order rollup builds the (y, x) frame;
    each IRLS step is ONE aggregate with the 2-double state broadcast
    ({i} passes); iterates round to 1e-9 so both engines walk the
    identical path."""
    import math

    c = cat(spark, sf_dir)
    d = (
        c["orders"]
        .select("o_orderkey", "o_totalprice")
        .join(
            c["lineitem"].select("l_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
        .select(F.col("o_totalprice").cast("double").alias("yv"), "x")
        .localCheckpoint()
    )
    b0 = math.log(d.agg(F.avg("yv").alias("m")).collect()[0]["m"])
    b0 = math.floor(b0 * 1e9 + 0.5) / 1e9
    b1 = 0.0
    for _ in range(GLM_ITERS):
        mu = F.exp(F.lit(b0) + F.lit(b1) * F.col("x"))
        z = F.lit(b0) + F.lit(b1) * F.col("x") + (F.col("yv") - mu) / mu
        row = d.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(z).alias("sz"),
            F.sum(F.col("x") * z).alias("sxz"),
        ).collect()[0]
        slope = (row["sxz"] - row["sx"] * row["sz"] / row["n"]) / (
            row["sxx"] - row["sx"] * row["sx"] / row["n"]
        )
        inter = row["sz"] / row["n"] - slope * row["sx"] / row["n"]
        b0 = math.floor(inter * 1e9 + 0.5) / 1e9
        b1 = math.floor(slope * 1e9 + 0.5) / 1e9
    mu = F.exp(F.lit(b0) + F.lit(b1) * F.col("x"))
    fit = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            (F.col("yv") - mu) * (F.col("yv") - mu) / (mu * mu)
        ).alias("pearson"),
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return fit.select(
        r6(F.lit(b0)).alias("b0"),
        r6(F.lit(b1)).alias("b1"),
        rnd(F.exp(F.lit(b1)), 4).alias("price_mult_per_item"),
        rnd(F.col("pearson") / (F.col("n") - 2), 4).alias("dispersion"),
        "n",
    )


stat_gamma_glm.__doc__ = stat_gamma_glm.__doc__.format(i=GLM_ITERS)
