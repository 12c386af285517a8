"""Wave 86: link prediction, parametric variance testing, time-series
alignment, and ANN tuning curves.

graph_adamic_adar scores non-adjacent co-purchase pairs by
Σ 1/ln(deg(shared neighbor)) — the link-prediction upgrade of raw
common-neighbor counts (a shared rare neighbor beats a shared hub);
stat_bartlett is the parametric k-group variance-homogeneity test
(the precondition check before pooled-variance ANOVA; Levene is its
robust twin, already shipped); ev_dtw_distance aligns two daily event
series with banded dynamic time warping — phase-shifted but
same-shape series score close where Euclidean distance calls them
far apart; sim_ann_recall_curve measures IVF recall@10 as a function
of nprobe against the exact top-k — the tuning curve an ANN deployment
publishes before picking its probe budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import (
    COP_SUPPORT,
    _DUCK_BASKETS,
    _copurchase_edges,
)
from mister_spark.operators.similarity import IVF_NLIST, _emb, ivf_topk
from mister_spark.registry import query

AA_TOP = 20
DTW_BAND = 7  # Sakoe–Chiba band half-width (days)
DTW_TYPES = ("click", "view")
ANN_NPROBES = (1, 2, 4, 8, 16, 32, 64)
ANN_K = 10


@query(
    "graph_adamic_adar",
    oracle=f"""
    WITH {_DUCK_BASKETS},
    e AS (SELECT x.l_partkey AS p1, y.l_partkey AS p2
          FROM bk x JOIN bk y ON x.l_orderkey = y.l_orderkey
                             AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {COP_SUPPORT}),
    sym AS (SELECT p1 AS u, p2 AS v FROM e
            UNION ALL SELECT p2 AS u, p1 AS v FROM e),
    deg AS (SELECT u, CAST(COUNT(*) AS DOUBLE) AS d FROM sym GROUP BY 1),
    wedge AS (SELECT a.u AS x, b.u AS y, a.v AS via
              FROM sym a JOIN sym b ON a.v = b.v AND a.u < b.u),
    cand AS (SELECT w.x, w.y,
                    SUM(1.0 / LN(deg.d)) AS aa,
                    CAST(COUNT(*) AS BIGINT) AS shared
             FROM wedge w JOIN deg ON w.via = deg.u
             WHERE NOT EXISTS (SELECT 1 FROM e
                               WHERE e.p1 = w.x AND e.p2 = w.y)
             GROUP BY 1, 2)
    SELECT x AS u, y AS v, shared,
           FLOOR(aa * 10000 + 0.5) / 10000 AS adamic_adar
    FROM cand ORDER BY aa DESC, x, y LIMIT {AA_TOP}
    """,
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction on the co-purchase graph: for every
    NON-adjacent part pair with ≥1 shared neighbor, score
    Σ_v 1/ln(deg(v)) over shared neighbors v; top-{t}. Rare shared
    neighbors dominate — the reason AA beats common-neighbor counts on
    most link-prediction benchmarks.

    Scale: the wedge join shuffles the symmetrized edge list on the
    shared-neighbor key — quadratic only in the hottest node's degree,
    which the co-purchase builder's basket cap and support threshold
    already bound; the anti-join against existing edges and the
    |brands|-ish degree broadcast are linear. Top-{t} is a distributed
    TakeOrdered."""
    e = _copurchase_edges(spark, sf_dir).select("p1", "p2").localCheckpoint()
    sym = e.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionByName(
        e.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("double").alias("d"))
    a = sym.select(F.col("u").alias("x"), F.col("v").alias("via"))
    b = sym.select(F.col("u").alias("y"), F.col("v").alias("via"))
    wedge = a.join(b, "via").filter(F.col("x") < F.col("y"))
    scored = (
        wedge.join(
            F.broadcast(deg.select(F.col("u").alias("via"), "d")), "via"
        )
        .join(
            e.select(F.col("p1").alias("x"), F.col("p2").alias("y")),
            ["x", "y"],
            "left_anti",
        )
        .groupBy("x", "y")
        .agg(
            F.sum(1.0 / F.log("d")).alias("aa"),
            F.count(F.lit(1)).cast("bigint").alias("shared"),
        )
    )
    return (
        scored.orderBy(F.col("aa").desc(), "x", "y")
        .limit(AA_TOP)
        .select(
            F.col("x").alias("u"),
            F.col("y").alias("v"),
            "shared",
            ratio(F.col("aa")).alias("adamic_adar"),
        )
    )


graph_adamic_adar.__doc__ = graph_adamic_adar.__doc__.format(t=AA_TOP)


@query(
    "stat_bartlett",
    oracle="""
    WITH g AS (SELECT c_mktsegment AS seg, CAST(COUNT(*) AS DOUBLE) AS n,
                      VAR_SAMP(c_acctbal) AS v
               FROM customer GROUP BY 1),
    t AS (SELECT SUM(n) AS nn, CAST(COUNT(*) AS DOUBLE) AS k,
                 SUM((n - 1) * v) / (SUM(n) - COUNT(*)) AS sp2,
                 SUM((n - 1) * LN(v)) AS slnv,
                 SUM(1.0 / (n - 1)) AS sinv
          FROM g)
    SELECT CAST(k AS BIGINT) AS groups, CAST(k - 1 AS BIGINT) AS dof,
           FLOOR(((nn - k) * LN(sp2) - slnv)
                 / (1 + (sinv - 1.0 / (nn - k)) / (3 * (k - 1)))
                 * 10000 + 0.5) / 10000 AS bartlett_t
    FROM t
    """,
)
def stat_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test of equal variances across market segments on
    account balance: T = [(N−k)·ln(Sp²) − Σ(nᵢ−1)·ln(Sᵢ²)] / C with
    the Bartlett correction C — T ~ χ²(k−1) under normality. The
    parametric precondition check before pooled-variance ANOVA
    (stat_levene is the robust twin for heavy tails).

    Scale: one partial-agg shuffle to k group rows; the statistic is
    k-row arithmetic."""
    g = (
        cat(spark, sf_dir)["customer"]
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.var_samp("c_acctbal").alias("v"),
        )
    )
    n, v = F.col("n"), F.col("v")
    nn = F.sum(n)
    k = F.count(F.lit(1)).cast("double")
    sp2 = F.sum((n - 1) * v) / (nn - k)
    slnv = F.sum((n - 1) * F.log(v))
    sinv = F.sum(1.0 / (n - 1))
    t = ((nn - k) * F.log(sp2) - slnv) / (
        1 + (sinv - 1.0 / (nn - k)) / (3 * (k - 1))
    )
    return g.agg(
        k.cast("bigint").alias("groups"),
        (k - 1).cast("bigint").alias("dof"),
        ratio(t).alias("bartlett_t"),
    )


def dtw_series(spark: SparkSession, sf_dir: str):
    """Daily count series for the two DTW_TYPES over the union day
    span (missing days = 0). The rollup is the only data-sized step;
    the returned series are |days|-sized (calendar-bounded — thousands
    of points even at 100 TB)."""
    ev = cat(spark, sf_dir)["events"]
    d = (
        ev.filter(F.col("event_type").isin(*DTW_TYPES))
        .groupBy(
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias(
                "day"
            ),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = d.collect()
    days = sorted({r["day"] for r in rows})
    idx = {day: i for i, day in enumerate(days)}
    a = [0.0] * len(days)
    b = [0.0] * len(days)
    for r in rows:
        if r["event_type"] == DTW_TYPES[0]:
            a[idx[r["day"]]] = float(r["n"])
        else:
            b[idx[r["day"]]] = float(r["n"])
    return a, b


def dtw_banded(a, b, band: int) -> float:
    """Sakoe–Chiba banded DTW with |x−y| local cost, O(n·band)."""
    import numpy as np

    n, m = len(a), len(b)
    inf = float("inf")
    prev = np.full(m + 1, inf)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, inf)
        lo = max(1, i - band)
        hi = min(m, i + band)
        for j in range(lo, hi + 1):
            c = abs(a[i - 1] - b[j - 1])
            cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return float(prev[m])


@query(
    "ev_dtw_distance",
    # Real oracle: the banded DTW DP re-expressed as an anti-diagonal
    # wavefront (cells on diagonal d = i+j depend only on diagonals
    # d-1 and d-2, so each recursive-CTE step is one list_transform
    # with no intra-step dependency — the classic way to parallelize a
    # DP the row recurrence cur[j] = f(cur[j-1], ...) forbids).
    # Diagonal lists are 1-indexed by i (cell (i, d-i) at position
    # i+1); out-of-band/out-of-range cells hold 1e308 (stand-in for
    # +inf — any real banded path is astronomically smaller). All cell
    # values are integer-valued doubles (daily counts, L1 costs), so
    # addition order can't drift and both engines agree bitwise.
    oracle=f"""
    WITH RECURSIVE dd AS (
      SELECT DATE_DIFF('day', DATE '1970-01-01',
                       CAST(DATE_TRUNC('day', ts) AS DATE)) AS day,
             event_type, COUNT(*) AS n
      FROM events WHERE event_type IN ('{DTW_TYPES[0]}', '{DTW_TYPES[1]}')
      GROUP BY 1, 2),
    ab AS (SELECT day,
                  CAST(COALESCE(MAX(CASE WHEN event_type = '{DTW_TYPES[0]}'
                                         THEN n END), 0) AS DOUBLE) AS av,
                  CAST(COALESCE(MAX(CASE WHEN event_type = '{DTW_TYPES[1]}'
                                         THEN n END), 0) AS DOUBLE) AS bv
           FROM dd GROUP BY day),
    ser AS (SELECT list(av ORDER BY day) AS a, list(bv ORDER BY day) AS b,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM ab),
    dp AS (
      SELECT 0 AS d,
             list_transform(range(0, s.n + 1),
                            i -> CASE WHEN i = 0 THEN 0.0
                                      ELSE 1e308 END) AS cur,
             list_transform(range(0, s.n + 1), i -> 1e308) AS prev
      FROM ser s
      UNION ALL
      SELECT dp.d + 1,
             list_transform(range(0, s.n + 1), i ->
               CASE WHEN i >= 1 AND dp.d + 1 - i >= 1
                         AND dp.d + 1 - i <= s.n
                         AND ABS(i - (dp.d + 1 - i)) <= {DTW_BAND}
                    THEN ABS(s.a[i] - s.b[dp.d + 1 - i])
                         + LEAST(dp.cur[i], dp.cur[i + 1], dp.prev[i])
                    ELSE 1e308 END),
             dp.cur
      FROM dp, ser s
      WHERE dp.d < 2 * s.n),
    l1 AS (SELECT CAST(SUM(ABS(av - bv)) AS DOUBLE) AS v FROM ab)
    SELECT '{DTW_TYPES[0]}' AS type_a, '{DTW_TYPES[1]}' AS type_b,
           s.n AS n_days,
           FLOOR(dp.cur[s.n + 1] * 10000 + 0.5) / 10000 AS dtw,
           FLOOR(l1.v * 10000 + 0.5) / 10000 AS l1,
           CASE WHEN s.n > 0
                THEN FLOOR(dp.cur[s.n + 1] / s.n * 10000 + 0.5) / 10000
                ELSE 0.0 END AS dtw_per_step
    FROM dp, ser s, l1
    WHERE dp.d = 2 * s.n
    """,
)
def ev_dtw_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded (Sakoe–Chiba ±{b} days) dynamic time warping between the
    daily '{t0}' and '{t1}' series, with the straight L1 distance as
    the no-warping baseline — DTW ≤ L1 always; a large gap means the
    series share shape but are phase-shifted (e.g. lagging conversion
    follows traffic).

    Scale: the per-day rollup is one partial-agg shuffle; the DP runs
    on the collected |days|-sized series (calendar-bounded, O(n·band)
    — model-sized state, never row-scale)."""
    import math

    a, b = dtw_series(spark, sf_dir)
    n = len(a)
    l1 = sum(abs(x - y) for x, y in zip(a, b))
    d = dtw_banded(a, b, DTW_BAND)
    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
    row = (
        DTW_TYPES[0],
        DTW_TYPES[1],
        n,
        r4(d),
        r4(l1),
        r4(d / n) if n else 0.0,
    )
    return spark.createDataFrame(
        [row],
        "type_a string, type_b string, n_days long, dtw double, "
        "l1 double, dtw_per_step double",
    )


ev_dtw_distance.__doc__ = ev_dtw_distance.__doc__.format(
    b=DTW_BAND, t0=DTW_TYPES[0], t1=DTW_TYPES[1]
)


def _ann_curve_oracle() -> str:
    import math

    from mister_spark.operators.similarity import (
        IVF_NLIST,
        duck_ivf_topk,
    )

    base = duck_ivf_topk(IVF_NLIST, ANN_K)
    # strip the nprobe-specific tail CTE; keep the shared scored/crank
    base = base[: base.rindex(",\n    ivf_out AS (")] + ""
    tops = []
    rows = []
    for p in ANN_NPROBES:
        tops.append(f"""
    got{p} AS (SELECT s.vec_id
               FROM scored s JOIN crank cr ON cr.j = s.j AND cr.rk <= {p}
               ORDER BY s.cosine DESC, s.vec_id LIMIT {ANN_K})""")
        frac = math.floor(p / IVF_NLIST * 10000 + 0.5) / 10000
        rows.append(f"""
    SELECT CAST({p} AS BIGINT) AS nprobe, {frac!r} AS probe_frac,
           FLOOR((SELECT COUNT(*) FROM got{p} g
                  JOIN got{IVF_NLIST} x ON x.vec_id = g.vec_id)
                 / {float(ANN_K)!r} * 10000 + 0.5) / 10000 AS recall""")
    return (
        "WITH RECURSIVE "
        + base
        + ","
        + ",".join(tops)
        + "\nUNION ALL\n".join(rows)
    )


@query(
    "sim_ann_recall_curve",
    # Real oracle: the shared spherical-k-means CTE scores every
    # vector once; each nprobe point is a grid-stable top-K cut and
    # the recall an integer intersection over K.
    oracle=_ann_curve_oracle(),
)
def sim_ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall@{k} vs nprobe for query vec_id=0, measured against
    the exact full-scan top-{k}: the published tuning curve that turns
    'trust the index' into a number per probe budget. nprobe=nlist is
    the exactness sanity row (recall must be 1.0).

    Scale: each point is one narrow mapInPandas scan (codebook in the
    task closure, no shuffle) + an O(k) TakeOrdered collect — the
    curve costs |nprobes| scans and collects only model-sized state."""
    import math

    emb = _emb(spark, sf_dir).localCheckpoint()
    exact = {
        r["vec_id"] for r in ivf_topk(emb, IVF_NLIST, ANN_K).collect()
    }
    rows = []
    for nprobe in ANN_NPROBES:
        got = {r["vec_id"] for r in ivf_topk(emb, nprobe, ANN_K).collect()}
        rows.append(
            (
                nprobe,
                math.floor(nprobe / IVF_NLIST * 10000 + 0.5) / 10000,
                math.floor(len(got & exact) / ANN_K * 10000 + 0.5)
                / 10000,
            )
        )
    return spark.createDataFrame(
        rows, "nprobe long, probe_frac double, recall double"
    )


sim_ann_recall_curve.__doc__ = sim_ann_recall_curve.__doc__.format(k=ANN_K)
