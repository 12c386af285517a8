"""Wave 74: zero-copy clones, ROC decision geometry, and synthetic
control.

io_snapshot_clone pins SHALLOW CLONE semantics on the transactional
table (a manifest-only copy that diverges copy-on-write — the
dev/staging workflow every lakehouse runs); ml_roc_hull computes the
ROC convex hull and picks the cost-optimal operating threshold (the
decision-theory step after ml_auc's ranking score); ev_synthetic_
control builds the counterfactual for one treated segment as a
weighted blend of donor segments fit on the pre-period — the
comparative case-study method when no randomized control exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

ROC_BINS = 50
ROC_COST_FN_FP = 3.0  # a false negative costs 3x a false positive
SC_TREATED = "src0"
SC_STEPS = 400


@query(
    "io_snapshot_clone",
    # Real oracle: the clone lifecycle is a fixed script over the %3
    # residue classes — the clone diverges by the %3=2 append while the
    # source stays at the 2-commit row count; the zero-copy flag and
    # version numbers are structural constants.
    oracle="""
    WITH c AS (SELECT
      CAST(SUM(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
           + SUM(CASE WHEN o_orderkey % 3 = 1 THEN 1 ELSE 0 END)
           AS BIGINT) AS ab,
      CAST(COUNT(*) AS BIGINT) AS abc
     FROM orders)
    SELECT 'clone' AS "table", abc AS live_rows,
           CAST(1 AS BIGINT) AS version, ab AS rows_at_clone,
           CAST(1 AS BIGINT) AS zero_copy
    FROM c
    UNION ALL SELECT 'source', ab, 1, ab, 1 FROM c
    """,
)
def io_snapshot_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shallow-clone lifecycle: clone a 2-commit table by manifest
    reference (zero data copied — proven by byte accounting), then
    append to the CLONE only and show the source is untouched while
    the clone diverged. The dev-table / experiment-branch workflow,
    with the real formats' hazard documented (vacuuming the source
    strands the clone).

    Scale: the clone commit is O(#dirs) metadata regardless of table
    size — that's the point."""
    import os
    import uuid

    from mister_spark.sources.snapshots import SnapshotTable
    from mister_spark.sources.staged import REPO_TMP

    base = os.path.join(REPO_TMP, f"clone_{uuid.uuid4().hex[:8]}")
    src = SnapshotTable(spark, base + "_src", stats_cols=["o_orderkey"])
    orders = cat(spark, sf_dir)["orders"].select("o_orderkey", "o_totalprice")
    src.create(orders.filter(F.col("o_orderkey") % 3 == 0))
    src.append(orders.filter(F.col("o_orderkey") % 3 == 1))

    def dir_bytes(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    clone = SnapshotTable(spark, base + "_cl", stats_cols=["o_orderkey"])
    before_bytes = dir_bytes(clone.path)
    clone.clone_from(src)
    clone_commit_bytes = dir_bytes(clone.path) - before_bytes
    rows_at_clone = clone.row_count()
    clone.append(orders.filter(F.col("o_orderkey") % 3 == 2))
    out = [
        ("source", int(src.row_count()), int(src.current_version())),
        ("clone", int(clone.row_count()), int(clone.current_version())),
    ]
    data_rows = src.read().count()  # source still reads fine
    assert data_rows == src.row_count()
    return spark.createDataFrame(
        [
            (
                name,
                n,
                v,
                int(rows_at_clone),
                int(clone_commit_bytes < 10_000),  # manifest-only: ~1 KB
            )
            for name, n, v in out
        ],
        "table string, live_rows long, version long, rows_at_clone long, "
        "zero_copy long",
    ).orderBy("table")


@query(
    "ml_roc_hull",
    # Real oracle: the driver's monotone-chain walk is replaced by the
    # pairwise hull characterization (valid because the ROC staircase is
    # x-sorted): a point is a hull vertex iff (a) it has the max tpr of
    # its exact-fpr tie group (the walk pops a tie when the higher point
    # arrives) and (b) it is strictly ABOVE every chord a→b of points
    # straddling it (cross <= 0 = on-or-below = popped; collinear
    # middles removed, matching the walk's >= 0 pop). The (0,0) anchor
    # is hull[0] and can never be popped, so it is exempt from (a).
    # All arithmetic is integer cumsums divided by the same doubles, so
    # the tie groups and cross-product signs match Spark bitwise.
    oracle=f"""
    WITH pr AS (SELECT LEAST(CAST(FLOOR(
                  1.0 / (1.0 + EXP(-CAST(embedding[1] AS DOUBLE)))
                  * {ROC_BINS}) AS INT), {ROC_BINS - 1}) AS bin,
                CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
                FROM embeddings),
    cells AS (SELECT bin, CAST(SUM(y) AS BIGINT) AS np,
                     CAST(SUM(1 - y) AS BIGINT) AS nn
              FROM pr GROUP BY bin),
    tot AS (SELECT CAST(SUM(np) AS DOUBLE) AS p,
                   CAST(SUM(nn) AS DOUBLE) AS n FROM cells),
    pts AS (SELECT {ROC_BINS} AS tb, 0.0 AS fpr, 0.0 AS tpr, 1 AS anch
            UNION ALL
            SELECT c.bin,
                   CAST(SUM(c.nn) OVER (ORDER BY c.bin DESC) AS DOUBLE) / t.n,
                   CAST(SUM(c.np) OVER (ORDER BY c.bin DESC) AS DOUBLE) / t.p,
                   0
            FROM cells c CROSS JOIN tot t),
    keep1 AS (SELECT tb, fpr, tpr FROM (
                SELECT tb, fpr, tpr, MAX(tpr) OVER (PARTITION BY fpr) AS mx
                FROM pts WHERE anch = 0) s WHERE tpr = mx
              UNION ALL SELECT tb, fpr, tpr FROM pts WHERE anch = 1),
    hull AS (SELECT k.tb, k.fpr, k.tpr FROM keep1 k
             WHERE NOT EXISTS (
               SELECT 1 FROM pts a, pts b
               WHERE a.fpr < k.fpr AND b.fpr > k.fpr
                 AND (b.fpr - a.fpr) * (k.tpr - a.tpr)
                     - (b.tpr - a.tpr) * (k.fpr - a.fpr) <= 0)),
    best AS (SELECT tb FROM hull CROSS JOIN tot
             ORDER BY {ROC_COST_FN_FP} * p * (1 - tpr) + n * fpr, tb
             LIMIT 1)
    SELECT CAST(h.tb AS INTEGER) AS threshold_bin,
           FLOOR(h.fpr * 10000 + 0.5) / 10000 AS fpr,
           FLOOR(h.tpr * 10000 + 0.5) / 10000 AS tpr,
           CAST(CASE WHEN h.tb = (SELECT tb FROM best) THEN 1 ELSE 0 END
                AS BIGINT) AS cost_optimal
    FROM hull h ORDER BY threshold_bin
    """,
)
def ml_roc_hull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC convex hull + cost-optimal operating point: bin the sigmoid
    scorer into {b} thresholds (one distributed rollup), walk the ROC
    points' upper convex hull on the driver, and select the hull
    vertex minimizing expected cost under a {c}:1 FN:FP cost ratio —
    the step that turns a ranking metric (ml_auc) into a deployable
    threshold. Hull vertices are the only thresholds any cost ratio
    can ever make optimal.

    Scale: the rollup is {b} cells; the hull walk is O(bins) driver
    work."""
    import math

    emb = cat(spark, sf_dir)["embeddings"]
    prob = 1.0 / (1.0 + F.exp(-F.element_at("embedding", 1).cast("double")))
    b = emb.select(
        F.least(
            F.floor(prob * ROC_BINS).cast("int"), F.lit(ROC_BINS - 1)
        ).alias("bin"),
        (F.col("label") < 5).cast("int").alias("y"),
    ).groupBy("bin").agg(
        F.sum("y").alias("np"),
        F.sum(1 - F.col("y")).alias("nn"),
    ).collect()
    cells = sorted(b, key=lambda r: -r["bin"])  # descending threshold
    P = sum(r["np"] for r in cells)
    N = sum(r["nn"] for r in cells)
    pts = [(0.0, 0.0, ROC_BINS)]  # (fpr, tpr, threshold_bin)
    tp = fp = 0
    for r in cells:
        tp += r["np"]
        fp += r["nn"]
        pts.append((fp / N, tp / P, r["bin"]))
    # upper convex hull by cross product
    hull: list[tuple[float, float, int]] = []
    for p in pts:
        while len(hull) >= 2:
            (x1, y1, _), (x2, y2, _) = hull[-2], hull[-1]
            if (x2 - x1) * (p[1] - y1) - (y2 - y1) * (p[0] - x1) >= 0:
                hull.pop()
            else:
                break
        hull.append(p)
    # cost-optimal vertex: cost = FN_cost*P*(1-tpr) + FP_cost*N*fpr
    best = min(
        hull,
        key=lambda p: (ROC_COST_FN_FP * P * (1 - p[1]) + N * p[0], p[2]),
    )
    rows = [
        (
            int(p[2]),
            math.floor(p[0] * 10000 + 0.5) / 10000,
            math.floor(p[1] * 10000 + 0.5) / 10000,
            int(p[2] == best[2]),
        )
        for p in hull
    ]
    return spark.createDataFrame(
        rows, "threshold_bin int, fpr double, tpr double, cost_optimal long"
    ).orderBy("threshold_bin")


ml_roc_hull.__doc__ = ml_roc_hull.__doc__.format(b=ROC_BINS, c=ROC_COST_FN_FP)


def _sc_oracle() -> str:
    """Projected-gradient synthetic control replayed as a recursive
    CTE: the donor×day matrix, treated series and Frobenius step size
    are list-valued CTEs; each of the {s} steps is one gradient
    update plus the exact sort/cumsum simplex projection in list ops.
    The projection is continuous in w, so a borderline rho flip
    cannot move the output; the 1e-2/1e-3 grids absorb float drift.
    """.format(s=SC_STEPS)
    k = "len(xm.m)"
    nd = "len(tr.y)"
    # v_t = (Xpreᵀ w − ypre)_t ; g_s = (Xpre v)_s — pre-period only
    v = (
        "list_transform(range(1, mm.mid + 1), t -> "
        "list_aggregate(list_transform(range(1, {k} + 1), s2 -> "
        "xm.m[s2][t] * s.w[s2]), 'sum') - tr.y[t])".format(k=k)
    )
    g = (
        "list_transform(range(1, {k} + 1), s2 -> "
        "list_aggregate(list_transform(range(1, mm.mid + 1), t -> "
        "xm.m[s2][t] * lv.v[t]), 'sum'))".format(k=k)
    )
    return f"""
    WITH RECURSIVE
    base AS (SELECT 'src' || CAST(user_id % 20 AS VARCHAR) AS seg,
                    date_diff('day', DATE '1970-01-01',
                              CAST(date_trunc('day', ts) AS DATE)) AS t,
                    SUM(value) AS y
             FROM events WHERE event_type = 'purchase'
             GROUP BY 1, 2),
    days AS (SELECT t, CAST(ROW_NUMBER() OVER (ORDER BY t) AS INT) AS ti
             FROM (SELECT DISTINCT t FROM base) q),
    segs AS (SELECT seg, CAST(ROW_NUMBER() OVER (ORDER BY seg) AS INT)
                    AS si
             FROM (SELECT DISTINCT seg FROM base) q),
    dense AS (SELECT sg.seg, sg.si, dy.ti,
                     COALESCE(b.y, CAST(0.0 AS DOUBLE)) AS y0
              FROM segs sg CROSS JOIN days dy
              LEFT JOIN base b ON b.seg = sg.seg AND b.t = dy.t),
    tr0 AS (SELECT list(y0 ORDER BY ti) AS y FROM dense
            WHERE seg = '{SC_TREATED}'),
    mm AS (SELECT CAST(len(y) // 2 AS INT) AS mid, len(y) AS nd
           FROM tr0),
    tr AS (SELECT list_slice(y, 1, mm.mid) AS y, t0.y AS yall
           FROM tr0 t0 CROSS JOIN mm),
    xall AS (SELECT list(row ORDER BY si) AS m FROM (
        SELECT si, list(y0 ORDER BY ti) AS row FROM dense
        WHERE seg <> '{SC_TREATED}' GROUP BY si) q),
    xm AS (SELECT list_transform(m, r -> list_slice(r, 1, mm.mid)) AS m,
                  xall.m AS mall
           FROM xall CROSS JOIN mm),
    lr AS (SELECT 1.0 / (SQRT(list_aggregate(list_transform(
             range(1, {k} + 1), i -> list_aggregate(list_transform(
               range(1, {k} + 1), j -> list_aggregate(list_transform(
                 range(1, mm.mid + 1), t -> xm.m[i][t] * xm.m[j][t]),
                 'sum') * list_aggregate(list_transform(
                 range(1, mm.mid + 1), t -> xm.m[i][t] * xm.m[j][t]),
                 'sum')), 'sum')), 'sum')) + 1e-9) AS lr
           FROM xm CROSS JOIN mm),
    pg AS (
      SELECT 0 AS it,
             list_transform(range(1, {k} + 1),
                            i -> 1.0 / {k}) AS w
      FROM xm
      UNION ALL
      SELECT s.it + 1, lw.wnew
      FROM pg s CROSS JOIN xm CROSS JOIN mm CROSS JOIN tr CROSS JOIN lr
      CROSS JOIN LATERAL (SELECT {v} AS v) lv
      CROSS JOIN LATERAL (SELECT list_transform(range(1, {k} + 1),
        i -> s.w[i] - lr.lr * ({g})[i]) AS w2) lw2
      CROSS JOIN LATERAL (SELECT list_sort(lw2.w2, 'DESC') AS u) lu
      CROSS JOIN LATERAL (SELECT list_transform(range(1, {k} + 1),
        i -> list_aggregate(list_slice(lu.u, 1, i), 'sum')) AS css) lc
      CROSS JOIN LATERAL (SELECT list_max(list_transform(
        range(1, {k} + 1),
        i -> CASE WHEN lu.u[i] * i > lc.css[i] - 1 THEN i
                  ELSE 0 END)) AS rho) lrho
      CROSS JOIN LATERAL (SELECT (lc.css[lrho.rho] - 1) / lrho.rho
        AS theta) lt
      CROSS JOIN LATERAL (SELECT list_transform(lw2.w2,
        x -> GREATEST(x - lt.theta, CAST(0.0 AS DOUBLE))) AS wnew) lw
      WHERE s.it < {SC_STEPS}
    ),
    wf AS (SELECT w FROM pg WHERE it = {SC_STEPS}),
    synth AS (SELECT list_transform(range(1, mm.nd + 1), t ->
                list_aggregate(list_transform(range(1, {k} + 1),
                  s2 -> xm.mall[s2][t] * wf.w[s2]), 'sum')) AS sv
              FROM wf CROSS JOIN xm CROSS JOIN mm),
    met AS (SELECT
        SQRT(list_aggregate(list_transform(range(1, mm.mid + 1), t ->
          (sy.sv[t] - tr.yall[t]) * (sy.sv[t] - tr.yall[t])), 'sum')
          / mm.mid) AS pre_rmse,
        SQRT(list_aggregate(list_transform(range(1, mm.mid + 1), t ->
          (list_aggregate(list_transform(range(1, {k} + 1),
             s2 -> xm.m[s2][t]), 'sum') / {k} - tr.yall[t])
          * (list_aggregate(list_transform(range(1, {k} + 1),
             s2 -> xm.m[s2][t]), 'sum') / {k} - tr.yall[t])), 'sum')
          / mm.mid) AS naive_rmse,
        list_aggregate(list_transform(range(mm.mid + 1, mm.nd + 1),
          t -> tr.yall[t] - sy.sv[t]), 'sum') / (mm.nd - mm.mid)
          AS post_effect
        FROM synth sy CROSS JOIN xm CROSS JOIN mm CROSS JOIN tr),
    top AS (SELECT string_agg(
              seg || ':' ||
              CAST(FLOOR(w * 1000 + 0.5) / 1000 AS VARCHAR),
              ',' ORDER BY w DESC, seg) AS top_donors
            FROM (SELECT d.seg AS seg, wf.w[d.di] AS w,
                         ROW_NUMBER() OVER (ORDER BY wf.w[d.di] DESC,
                                            d.seg) AS rn
                  FROM (SELECT seg,
                          CAST(ROW_NUMBER() OVER (ORDER BY seg) AS INT)
                            AS di
                        FROM segs WHERE seg <> '{SC_TREATED}') d
                  CROSS JOIN wf) q
            WHERE rn <= 3)
    SELECT '{SC_TREATED}' AS treated,
           FLOOR(pre_rmse * 100 + 0.5) / 100 AS pre_rmse,
           FLOOR(naive_rmse * 100 + 0.5) / 100 AS naive_rmse,
           FLOOR(post_effect * 100 + 0.5) / 100 AS post_effect,
           (SELECT top_donors FROM top) AS top_donors
    FROM met
    """


@query("ev_synthetic_control", oracle=_sc_oracle())
# Projected-gradient fit replayed in the oracle's recursive CTE;
# pytest additionally gates pre-fit error.
def ev_synthetic_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic control for segment '{t}' (users hashing to it):
    donor-segment daily purchase series fit the treated segment's
    PRE-period (calendar first half) with simplex-constrained weights
    (projected gradient, {s} steps, driver-side on the |donors|×|days|
    matrix), then the weighted donor blend extrapolates the POST
    counterfactual — the gap is the estimated effect. The method for
    'what would have happened' when there is no randomized control.

    Scale: the data reduces to a (segment, day) matrix in one shuffle
    — days×20 cells; the optimization never touches row-level data."""
    import math

    import numpy as np

    ev = cat(spark, sf_dir)["events"]
    seg = F.concat(F.lit("src"), (F.col("user_id") % 20).cast("string"))
    d = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            seg.alias("seg"),
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias(
                "t"
            ),
        )
        .agg(F.sum("value").alias("y"))
        .collect()
    )
    days = sorted({r["t"] for r in d})
    segs = sorted({r["seg"] for r in d})
    di = {t: i for i, t in enumerate(days)}
    Y = {s: np.zeros(len(days)) for s in segs}
    for r in d:
        Y[r["seg"]][di[r["t"]]] = r["y"]
    mid = len(days) // 2
    treated = Y[SC_TREATED]
    donors = [s for s in segs if s != SC_TREATED]
    X = np.array([Y[s] for s in donors])  # donors x days
    Xpre, ypre = X[:, :mid], treated[:mid]
    k = len(donors)
    w = np.ones(k) / k
    lr = 1.0 / (np.linalg.norm(Xpre @ Xpre.T) + 1e-9)
    for _ in range(SC_STEPS):
        g = Xpre @ (Xpre.T @ w - ypre)
        w = w - lr * g
        # project onto the simplex
        u = np.sort(w)[::-1]
        css = np.cumsum(u)
        rho = np.nonzero(u * np.arange(1, k + 1) > (css - 1))[0][-1]
        theta = (css[rho] - 1) / (rho + 1)
        w = np.maximum(w - theta, 0)
    synth = X.T @ w
    pre_rmse = float(np.sqrt(np.mean((synth[:mid] - treated[:mid]) ** 2)))
    naive = float(
        np.sqrt(np.mean((X[:, :mid].mean(axis=0) - treated[:mid]) ** 2))
    )
    post_gap = float(np.mean(treated[mid:] - synth[mid:]))
    top = sorted(zip(donors, w), key=lambda t: (-t[1], t[0]))[:3]
    rows = [
        (
            SC_TREATED,
            math.floor(pre_rmse * 100 + 0.5) / 100,
            math.floor(naive * 100 + 0.5) / 100,
            math.floor(post_gap * 100 + 0.5) / 100,
            ",".join(f"{s}:{math.floor(v * 1000 + 0.5) / 1000}" for s, v in top),
        )
    ]
    return spark.createDataFrame(
        rows,
        "treated string, pre_rmse double, naive_rmse double, "
        "post_effect double, top_donors string",
    )


ev_synthetic_control.__doc__ = ev_synthetic_control.__doc__.format(
    t=SC_TREATED, s=SC_STEPS
)
