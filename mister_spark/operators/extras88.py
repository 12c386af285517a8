"""Wave 88: histogram-based tree learning, distributional model
selection, streaming-sketch second moments, and CLIP-style multimodal
filtering.

ml_hist_tree grows a depth-2 regression tree with HISTOGRAM split
search — per-bin sufficient statistics instead of per-row sorting,
the core trick that makes XGBoost/LightGBM feasible on billions of
rows; stat_dist_fit_compare fits normal / lognormal / exponential by
moments and ranks them by one-sample KS distance (the 'which
distribution is this column' screen); sketch_ams_f2 is the AMS/
Count-Sketch estimator of the second frequency moment with the exact
F2 riding along as measured error; mm_clip_filter is the LAION-style
curation gate: caption quality × embedding-norm sanity × similarity-
to-anchor threshold, as one declarative pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL
from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

AMS_ROWS = 5  # independent sketch rows (median taken across them)
CLIP_DIM = 64
CLIP_SIM_MIN = 0.0  # anchor-similarity gate
CLIP_NORM_LO, CLIP_NORM_HI = 0.5, 2.0
CLIP_MIN_DISTINCT = 0.3


def _hist_stats(df, node_expr):
    """Per (node, feature, bin) sufficient stats — the histogram that
    makes split search O(bins), not O(rows)."""
    out = None
    for feat in ("f1", "f2"):
        g = df.groupBy(
            node_expr.alias("node"),
            F.lit(feat).alias("feat"),
            F.col(feat).alias("bin"),
        ).agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("y").alias("s"),
            F.sum(F.col("y") * F.col("y")).alias("ss"),
        )
        out = g if out is None else out.unionByName(g)
    return out.collect()


def _best_split(rows, node):
    """Driver-side argmax over bin boundaries for one node: O(bins)."""
    best = None
    for feat in ("f1", "f2"):
        bins = sorted(
            (r["bin"], r["n"], r["s"], r["ss"])
            for r in rows
            if r["node"] == node and r["feat"] == feat
        )
        tot_n = sum(b[1] for b in bins)
        tot_s = sum(b[2] for b in bins)
        tot_ss = sum(b[3] for b in bins)
        if tot_n < 2:
            continue
        sse_parent = tot_ss - tot_s * tot_s / tot_n
        ln = ls = lss = 0.0
        for b, n, s, ss in bins[:-1]:
            ln += n
            ls += s
            lss += ss
            rn, rs, rss = tot_n - ln, tot_s - ls, tot_ss - lss
            if ln < 1 or rn < 1:
                continue
            sse = (lss - ls * ls / ln) + (rss - rs * rs / rn)
            gain = sse_parent - sse
            cand = (gain, feat, b)
            if best is None or cand > best:
                best = cand
    return best  # (gain, feat, threshold_bin) or None


@query(
    "ml_hist_tree",
    # Real oracle: the depth-2 histogram split search unrolled — per
    # level a (node, feat, bin) histogram, bin-ordered prefix sums
    # (the Python accumulation order), per-feat totals as the last
    # prefix row, candidates excluding each feat's max bin, and the
    # strict tuple-max tie-break (gain, feat, bin all DESC — 'f2'
    # sorts above 'f1' exactly like the Python tuple). A child with
    # no positive-gain split collapses to its parent leaf via the
    # LEFT-JOIN NULL path; leaf paths are the same formatted strings.
    oracle="""
    WITH d AS (SELECT ((dayofweek(o_orderdate) + 6) % 7) + 1 AS f1,
                      CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS f2,
                      o_totalprice AS y
               FROM orders),
    h0 AS (SELECT 'f1' AS feat, f1 AS bin, CAST(COUNT(*) AS DOUBLE) AS n,
                  SUM(y) AS s, SUM(y * y) AS ss
           FROM d GROUP BY 2
           UNION ALL
           SELECT 'f2', f2, CAST(COUNT(*) AS DOUBLE), SUM(y), SUM(y * y)
           FROM d GROUP BY 2),
    c0 AS (SELECT feat, bin,
                  SUM(n) OVER w AS ln, SUM(s) OVER w AS ls,
                  SUM(ss) OVER w AS lss,
                  MAX(bin) OVER (PARTITION BY feat) AS mb
           FROM h0
           WINDOW w AS (PARTITION BY feat ORDER BY bin
                        ROWS UNBOUNDED PRECEDING)),
    t0 AS (SELECT feat, ln AS tn, ls AS ts, lss AS tss FROM (
             SELECT feat, ln, ls, lss,
                    ROW_NUMBER() OVER (PARTITION BY feat
                                       ORDER BY bin DESC) AS rn
             FROM c0) q WHERE rn = 1),
    s0 AS (SELECT c.feat, c.bin AS thr,
                  (t.tss - t.ts * t.ts / t.tn)
                  - ((c.lss - c.ls * c.ls / c.ln)
                     + ((t.tss - c.lss)
                        - (t.ts - c.ls) * (t.ts - c.ls)
                          / (t.tn - c.ln))) AS gain
           FROM c0 c JOIN t0 t ON c.feat = t.feat
           WHERE c.bin < c.mb AND t.tn >= 2
             AND c.ln >= 1 AND t.tn - c.ln >= 1
           ORDER BY gain DESC, c.feat DESC, c.bin DESC LIMIT 1),
    dn AS (SELECT d.*, CASE WHEN (CASE s0.feat WHEN 'f1' THEN d.f1
                                  ELSE d.f2 END) <= s0.thr
                            THEN 1 ELSE 2 END AS node
           FROM d, s0),
    h1 AS (SELECT node, 'f1' AS feat, f1 AS bin,
                  CAST(COUNT(*) AS DOUBLE) AS n, SUM(y) AS s,
                  SUM(y * y) AS ss
           FROM dn GROUP BY 1, 3
           UNION ALL
           SELECT node, 'f2', f2, CAST(COUNT(*) AS DOUBLE), SUM(y),
                  SUM(y * y)
           FROM dn GROUP BY 1, 3),
    c1 AS (SELECT node, feat, bin,
                  SUM(n) OVER w AS ln, SUM(s) OVER w AS ls,
                  SUM(ss) OVER w AS lss,
                  MAX(bin) OVER (PARTITION BY node, feat) AS mb
           FROM h1
           WINDOW w AS (PARTITION BY node, feat ORDER BY bin
                        ROWS UNBOUNDED PRECEDING)),
    t1 AS (SELECT node, feat, ln AS tn, ls AS ts, lss AS tss FROM (
             SELECT node, feat, ln, ls, lss,
                    ROW_NUMBER() OVER (PARTITION BY node, feat
                                       ORDER BY bin DESC) AS rn
             FROM c1) q WHERE rn = 1),
    s1 AS (SELECT node, feat, thr, gain FROM (
             SELECT c.node, c.feat, c.bin AS thr,
                    (t.tss - t.ts * t.ts / t.tn)
                    - ((c.lss - c.ls * c.ls / c.ln)
                       + ((t.tss - c.lss)
                          - (t.ts - c.ls) * (t.ts - c.ls)
                            / (t.tn - c.ln))) AS gain,
                    ROW_NUMBER() OVER (PARTITION BY c.node
                                       ORDER BY (t.tss - t.ts * t.ts
                                                 / t.tn)
                                       - ((c.lss - c.ls * c.ls / c.ln)
                                          + ((t.tss - c.lss)
                                             - (t.ts - c.ls)
                                               * (t.ts - c.ls)
                                               / (t.tn - c.ln))) DESC,
                                       c.feat DESC, c.bin DESC) AS rk
             FROM c1 c JOIN t1 t ON c.node = t.node AND c.feat = t.feat
             WHERE c.bin < c.mb AND t.tn >= 2
               AND c.ln >= 1 AND t.tn - c.ln >= 1) q
           WHERE rk = 1),
    lf AS (SELECT dn.y,
                  CASE WHEN dn.node = 1 THEN
                    CASE WHEN a.gain > 0 THEN
                      CASE WHEN (CASE a.feat WHEN 'f1' THEN dn.f1
                                 ELSE dn.f2 END) <= a.thr
                           THEN 3 ELSE 4 END
                    ELSE 1 END
                  ELSE
                    CASE WHEN b.gain > 0 THEN
                      CASE WHEN (CASE b.feat WHEN 'f1' THEN dn.f1
                                 ELSE dn.f2 END) <= b.thr
                           THEN 5 ELSE 6 END
                    ELSE 2 END
                  END AS leaf
           FROM dn LEFT JOIN s1 a ON a.node = 1
                   LEFT JOIN s1 b ON b.node = 2),
    agg AS (SELECT leaf, CAST(COUNT(*) AS BIGINT) AS n,
                   FLOOR(AVG(y) * 10000 + 0.5) / 10000 AS prediction
            FROM lf GROUP BY leaf)
    SELECT agg.leaf,
           CASE WHEN agg.leaf = 1 THEN s0.feat || '<=' || s0.thr
                WHEN agg.leaf = 2 THEN s0.feat || '>' || s0.thr
                WHEN agg.leaf = 3 THEN s0.feat || '<=' || s0.thr
                     || ' & ' || a.feat || '<=' || a.thr
                WHEN agg.leaf = 4 THEN s0.feat || '<=' || s0.thr
                     || ' & ' || a.feat || '>' || a.thr
                WHEN agg.leaf = 5 THEN s0.feat || '>' || s0.thr
                     || ' & ' || b.feat || '<=' || b.thr
                ELSE s0.feat || '>' || s0.thr
                     || ' & ' || b.feat || '>' || b.thr
           END AS path,
           agg.n, agg.prediction,
           FLOOR(s0.gain * 100 + 0.5) / 100 AS root_gain
    FROM agg, s0
    LEFT JOIN s1 a ON a.node = 1
    LEFT JOIN s1 b ON b.node = 2
    ORDER BY agg.leaf
    """,
)
def ml_hist_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-2 regression tree predicting order totalprice from
    (order weekday, priority code) using HISTOGRAM split search: one
    aggregate builds per-bin (n, Σy, Σy²) and the driver scans bin
    boundaries for the max-SSE-reduction split — the LightGBM/XGBoost
    structure where split cost depends on BINS, never rows. Emits one
    row per leaf with its path, size, and mean prediction.

    Scale: each depth level is ONE partial-agg shuffle to
    |nodes|×|features|×|bins| rows; the collected histogram and the
    argmax are model-sized. Continuous features would first be
    quantile-binned (the repo's approx-percentile boundary broadcast
    pattern) — identical downstream."""
    orders = cat(spark, sf_dir)["orders"]
    d = orders.select(
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).cast("long").alias("f1"),
        F.substring("o_orderpriority", 1, 1).cast("long").alias("f2"),
        F.col("o_totalprice").alias("y"),
    ).localCheckpoint()

    root_rows = _hist_stats(d, F.lit(0))
    s0 = _best_split(root_rows, 0)
    gain0, feat0, thr0 = s0
    node1 = F.when(F.col(feat0) <= thr0, 1).otherwise(2)
    l1_rows = _hist_stats(d, node1)
    splits = {}
    for node in (1, 2):
        s = _best_split(l1_rows, node)
        if s is not None and s[0] > 0:
            splits[node] = s
    leaf_expr = F.when(
        F.col(feat0) <= thr0,
        F.when(F.col(splits[1][1]) <= splits[1][2], 3).otherwise(4)
        if 1 in splits
        else F.lit(1),
    ).otherwise(
        F.when(F.col(splits[2][1]) <= splits[2][2], 5).otherwise(6)
        if 2 in splits
        else F.lit(2),
    )
    leaves = (
        d.groupBy(leaf_expr.alias("leaf"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            ratio(F.avg("y")).alias("prediction"),
        )
        .collect()
    )

    def path(leaf: int) -> str:
        if leaf in (1, 2):
            side = "<=" if leaf == 1 else ">"
            return f"{feat0}{side}{thr0}"
        parent = 1 if leaf in (3, 4) else 2
        pside = "<=" if parent == 1 else ">"
        g, f, t = splits[parent]
        side = "<=" if leaf in (3, 5) else ">"
        return f"{feat0}{pside}{thr0} & {f}{side}{t}"

    out = sorted(
        (int(r["leaf"]), path(int(r["leaf"])), int(r["n"]), float(r["prediction"]))
        for r in leaves
    )
    import math

    g2 = math.floor(float(gain0) * 100 + 0.5) / 100
    rows = [(leaf, p, n, pred, g2) for leaf, p, n, pred in out]
    return spark.createDataFrame(
        rows,
        "leaf long, path string, n long, prediction double, root_gain double",
    )


def _norm_cdf_sql(z: str) -> str:
    """Signed-z normal CDF from the engine-shared erf polynomial."""
    from mister_spark.functions.special import normal_sf_sql

    return (
        f"(CASE WHEN ({z}) >= 0 THEN 1 - {normal_sf_sql(f'({z})')}"
        f" ELSE {normal_sf_sql(f'(-({z}))')} END)"
    )


@query(
    "stat_dist_fit_compare",
    oracle=f"""
    WITH x AS (SELECT o_totalprice AS v FROM orders WHERE o_totalprice > 0),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(v) AS mu,
                 STDDEV_SAMP(v) AS sd, AVG(LN(v)) AS lmu,
                 STDDEV_SAMP(LN(v)) AS lsd
          FROM x),
    dv AS (SELECT v, CAST(COUNT(*) AS DOUBLE) AS c FROM x GROUP BY 1),
    e AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM dv),
    ks AS (SELECT
             MAX(ABS(cum / m.n
                     - (1 - EXP(-v / m.mu)))) AS ks_exp,
             MAX(ABS(cum / m.n
                     - {_norm_cdf_sql('(v - m.mu) / m.sd')}))
               AS ks_norm,
             MAX(ABS(cum / m.n
                     - {_norm_cdf_sql('(LN(v) - m.lmu) / m.lsd')}))
               AS ks_lnorm
           FROM e, m)
    SELECT dist, FLOOR(p1 * 10000 + 0.5) / 10000 AS param1,
           FLOOR(p2 * 10000 + 0.5) / 10000 AS param2,
           FLOOR(ks * 10000 + 0.5) / 10000 AS ks
    FROM (
      SELECT 'exponential' AS dist, m.mu AS p1, 0.0 AS p2, ks.ks_exp AS ks
      FROM m, ks
      UNION ALL
      SELECT 'normal', m.mu, m.sd, ks.ks_norm FROM m, ks
      UNION ALL
      SELECT 'lognormal', m.lmu, m.lsd, ks.ks_lnorm FROM m, ks)
    """,
)
def stat_dist_fit_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments fits of exponential / normal / lognormal to
    order totalprice, each scored by one-sample KS distance against
    the exact ECDF — the 'what distribution is this column' screen
    that should run before any parametric assumption. The smallest KS
    wins; all three being large is the real finding (use the empirical
    distribution).

    Scale: moments are one aggregate; the ECDF is the |distinct
    values| frame cumulated with `bucketed_cumsum` (two-phase prefix
    sum — no single-task window); each KS is a max over that frame.
    The normal CDF uses the engine-shared erf polynomial
    (functions/special) — approximation error is identical on both
    sides. (Right-limit KS variant: sup over observed points of
    |ECDF−F|, the standard plug-in screen.)"""
    from mister_spark.functions.special import normal_sf

    x = (
        cat(spark, sf_dir)["orders"]
        .filter(F.col("o_totalprice") > 0)
        .select(F.col("o_totalprice").alias("v"))
    )
    m = x.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("v").alias("mu"),
        F.stddev_samp("v").alias("sd"),
        F.avg(F.log("v")).alias("lmu"),
        F.stddev_samp(F.log("v")).alias("lsd"),
    )
    dv = x.groupBy("v").agg(F.count(F.lit(1)).cast("double").alias("c"))
    e = bucketed_cumsum(dv, "v", {"cum": F.col("c")})
    j = e.crossJoin(F.broadcast(m))
    ecdf = F.col("cum") / F.col("n")

    def norm_cdf(z):
        # shared A&S erf polynomial: CDF(z) = 1 - SF(|z|) for z>=0,
        # SF(|z|) for z<0 — normal_sf takes z>=0
        return F.when(z >= 0, 1 - normal_sf(z)).otherwise(normal_sf(-z))

    ks = j.agg(
        F.max(F.abs(ecdf - (1 - F.exp(-F.col("v") / F.col("mu"))))).alias(
            "ks_exp"
        ),
        F.max(
            F.abs(ecdf - norm_cdf((F.col("v") - F.col("mu")) / F.col("sd")))
        ).alias("ks_norm"),
        F.max(
            F.abs(
                ecdf
                - norm_cdf((F.log("v") - F.col("lmu")) / F.col("lsd"))
            )
        ).alias("ks_lnorm"),
    )
    base = m.crossJoin(F.broadcast(ks))
    rows = [
        ("exponential", F.col("mu"), F.lit(0.0), F.col("ks_exp")),
        ("normal", F.col("mu"), F.col("sd"), F.col("ks_norm")),
        ("lognormal", F.col("lmu"), F.col("lsd"), F.col("ks_lnorm")),
    ]
    out = None
    for dist, p1, p2, k in rows:
        r = base.select(
            F.lit(dist).alias("dist"),
            ratio(p1).alias("param1"),
            ratio(p2).alias("param2"),
            ratio(k).alias("ks"),
        )
        out = r if out is None else out.unionByName(r)
    return out


def _ams_oracle() -> str:
    unions = []
    for r in range(AMS_ROWS):
        unions.append(f"""
      SELECT {r} AS row_id,
             CASE WHEN ((h * {FP_MUL} + {101 + 2 * r}) % {FP_MOD}) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn, n
      FROM f""")
    u = " UNION ALL ".join(unions)
    return f"""
    WITH f AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                      (ASCII(event_type) * 131
                       + LENGTH(event_type)) AS h
               FROM events GROUP BY event_type),
    ex AS (SELECT CAST(SUM(n * n) AS BIGINT) AS f2_exact FROM f),
    rows_ AS ({u}),
    est AS (SELECT row_id, SUM(sgn * n) * SUM(sgn * n) AS e
            FROM rows_ GROUP BY 1),
    med AS (SELECT MEDIAN(e) AS f2_est FROM est)
    SELECT ex.f2_exact, CAST(med.f2_est AS BIGINT) AS f2_est,
           FLOOR(ABS(med.f2_est - ex.f2_exact) / ex.f2_exact * 10000 + 0.5)
             / 10000 AS rel_error
    FROM ex, med
    """


@query("sketch_ams_f2", oracle=_ams_oracle())
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-frequency-moment sketch over event types: {r}
    independent ±1 hash rows, each estimating F2 = Σf² as (Σ±f)², the
    median across rows published against the exact F2 — the
    self-join-size / skew estimator that runs in O(rows) memory
    however many distinct keys exist. Portable deterministic sign
    hashes make the whole sketch oracle-replayable.

    Scale: ONE partial-agg shuffle to |types| rows (the sketch update
    Σ±f is mergeable map-side; here the frequency rollup demonstrates
    it); the {r}-row median is driver arithmetic. With a single
    counter per row the memory is O({r}) regardless of key
    cardinality."""
    ev = cat(spark, sf_dir)["events"]
    f = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    h = (F.ascii("event_type") * 131 + F.length("event_type")).cast("long")
    f = f.withColumn("h", h).localCheckpoint()
    ex = f.agg(F.sum(F.col("n") * F.col("n")).cast("bigint").alias("f2_exact"))
    est = None
    for r in range(AMS_ROWS):
        sgn = F.when(
            ((F.col("h") * FP_MUL + (101 + 2 * r)) % FP_MOD) % 2 == 0, 1
        ).otherwise(-1)
        e = f.agg(
            (F.sum(sgn * F.col("n")) * F.sum(sgn * F.col("n"))).alias("e")
        ).withColumn("row_id", F.lit(r))
        est = e if est is None else est.unionByName(e)
    med = est.agg(F.expr("median(e)").alias("f2_est"))
    return med.crossJoin(F.broadcast(ex)).select(
        "f2_exact",
        F.col("f2_est").cast("bigint").alias("f2_est"),
        ratio(
            F.abs(F.col("f2_est") - F.col("f2_exact")) / F.col("f2_exact")
        ).alias("rel_error"),
    )


sketch_ams_f2.__doc__ = sketch_ams_f2.__doc__.format(r=AMS_ROWS)


@query(
    "mm_clip_filter",
    oracle=f"""
    WITH pair AS (
      SELECT d.doc_id, e.embedding,
             CAST(len(list_filter(string_split(d.text, ' '),
                                  t -> t <> '')) AS DOUBLE) AS n_tok,
             CAST(len(list_distinct(list_filter(string_split(d.text, ' '),
                                                t -> t <> '')))
                  AS DOUBLE) AS n_dis
      FROM documents d JOIN embeddings e ON d.doc_id % 500 = e.vec_id),
    feat AS (
      SELECT doc_id, n_dis / n_tok AS distinct_ratio,
             SQRT((SELECT SUM((embedding[i]::DOUBLE) * (embedding[i]::DOUBLE))
                   FROM generate_series(1, {CLIP_DIM}) AS s(i))) AS nrm,
             (SELECT SUM((embedding[i]::DOUBLE) * (1.0 / SQRT({CLIP_DIM})))
              FROM generate_series(1, {CLIP_DIM}) AS s(i)) AS anchor_dot
      FROM pair WHERE n_tok > 0),
    gate AS (
      SELECT doc_id,
             CASE WHEN distinct_ratio >= {CLIP_MIN_DISTINCT}
                  THEN 1 ELSE 0 END AS pass_text,
             CASE WHEN nrm BETWEEN {CLIP_NORM_LO} AND {CLIP_NORM_HI}
                  THEN 1 ELSE 0 END AS pass_norm,
             CASE WHEN anchor_dot / nrm >= {CLIP_SIM_MIN}
                  THEN 1 ELSE 0 END AS pass_sim
      FROM feat)
    SELECT CAST(COUNT(*) AS BIGINT) AS candidates,
           CAST(SUM(pass_text) AS BIGINT) AS pass_text,
           CAST(SUM(pass_norm) AS BIGINT) AS pass_norm,
           CAST(SUM(pass_sim) AS BIGINT) AS pass_sim,
           CAST(SUM(pass_text * pass_norm * pass_sim) AS BIGINT) AS kept,
           FLOOR(CAST(SUM(pass_text * pass_norm * pass_sim) AS DOUBLE)
                 / COUNT(*) * 10000 + 0.5) / 10000 AS keep_rate
    FROM gate
    """,
)
def mm_clip_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style multimodal curation gate: join captions (documents)
    to their paired embeddings, then keep rows passing ALL of (a)
    caption distinct-token ratio ≥ {q}, (b) embedding L2 norm inside
    [{lo}, {hi}] (dead/exploded encoders fail here), (c) cosine
    similarity to a fixed anchor direction ≥ {s} (the CLIP-score
    threshold; anchor = the normalized all-ones direction standing in
    for a text-encoder vector). Reports the per-gate and combined
    funnel — the numbers a dataset card publishes.

    Scale: one equi-join (the pairing), all three gates are narrow
    JVM expressions over the joined row — a single pass, no UDFs;
    the funnel is one aggregate."""
    docs = cat(spark, sf_dir)["documents"]
    emb = cat(spark, sf_dir)["embeddings"]
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    pair = (
        docs.select(
            "doc_id",
            (F.col("doc_id") % 500).alias("vec_id"),
            F.size(toks).cast("double").alias("n_tok"),
            F.size(F.array_distinct(toks)).cast("double").alias("n_dis"),
        )
        .filter(F.col("n_tok") > 0)
        .join(
            F.broadcast(
                emb.select(
                    "vec_id", F.col("embedding").cast("array<double>").alias("v")
                )
            ),
            "vec_id",
        )
    )
    sq = F.aggregate(
        F.transform(F.col("v"), lambda x: x * x),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    dot = F.aggregate(
        F.transform(F.col("v"), lambda x: x * F.lit(1.0 / CLIP_DIM**0.5)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    feat = pair.select(
        "doc_id",
        (F.col("n_dis") / F.col("n_tok")).alias("distinct_ratio"),
        F.sqrt(sq).alias("nrm"),
        dot.alias("anchor_dot"),
    )
    g = feat.select(
        (F.col("distinct_ratio") >= CLIP_MIN_DISTINCT)
        .cast("long")
        .alias("pass_text"),
        (
            (F.col("nrm") >= CLIP_NORM_LO) & (F.col("nrm") <= CLIP_NORM_HI)
        )
        .cast("long")
        .alias("pass_norm"),
        (F.col("anchor_dot") / F.col("nrm") >= CLIP_SIM_MIN)
        .cast("long")
        .alias("pass_sim"),
    )
    kept = F.sum(
        F.col("pass_text") * F.col("pass_norm") * F.col("pass_sim")
    )
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("candidates"),
        F.sum("pass_text").cast("bigint").alias("pass_text"),
        F.sum("pass_norm").cast("bigint").alias("pass_norm"),
        F.sum("pass_sim").cast("bigint").alias("pass_sim"),
        kept.cast("bigint").alias("kept"),
        ratio(kept.cast("double") / F.count(F.lit(1))).alias("keep_rate"),
    )


mm_clip_filter.__doc__ = mm_clip_filter.__doc__.format(
    q=CLIP_MIN_DISTINCT, lo=CLIP_NORM_LO, hi=CLIP_NORM_HI, s=CLIP_SIM_MIN
)
