"""Wave 38: the missing correlation/robust-trend statistics, exact
PR-AUC, and regex journey classification.

stat_kendall_tau completes the correlation family (Pearson in
stat_corr, Spearman in stat_spearman) with the concordance-based
tau-b that handles ties and ordinal data; stat_theil_sen is the
robust trend slope (median of pairwise slopes) every noisy daily
metric should be trended with; ml_pr_auc is average precision — the
ranking metric that, unlike ROC-AUC (ml_auc), stays honest under
heavy class imbalance; ev_fsm_match is the MATCH_RECOGNIZE-style
sequence-pattern classifier over per-user journey strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

DAY_US = 86_400_000_000
AP_POS_LABEL_LT = 5  # positive class: label in [0, 5) — mirrors ml_auc
SLOPE_GRID = 10_000  # pairwise slopes snapped to a 1e-4 integer grid
AP_GRID = 100_000_000  # per-threshold AP terms snapped to a 1e-8 grid

# journey-pattern regexes: engine-portable subset (anchors, classes,
# ., *, +) — Java regex (Spark rlike) and RE2 (DuckDB regexp_matches)
# agree on all of these, and both do substring search.
FSM_PATTERNS = [
    ("converted", "v.*c.*p"),
    ("error_then_purchase", "e.*p"),
    ("signup_first", "^s"),
    ("pure_browser", "^[vc]+$"),
]


@query(
    "stat_kendall_tau",
    oracle=f"""
    WITH d AS (SELECT epoch_us(ts) // {DAY_US} AS day,
                      CAST(SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS x,
                      CAST(SUM(CASE WHEN event_type = 'error'
                               THEN 1 ELSE 0 END) AS BIGINT) AS y
               FROM events GROUP BY 1),
    p AS (SELECT CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS conc,
                 CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS disc,
                 CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END)
                      AS BIGINT) AS tx,
                 CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END)
                      AS BIGINT) AS ty
          FROM d a JOIN d b ON a.day < b.day),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                 COUNT(*) * (COUNT(*) - 1) / 2 AS n0
          FROM d)
    SELECT n.n_days, p.conc, p.disc,
           FLOOR(CAST(p.conc - p.disc AS DOUBLE)
                 / SQRT(CAST((n.n0 - p.tx) * (n.n0 - p.ty) AS DOUBLE))
                 * 10000 + 0.5) / 10000 AS tau_b
    FROM p, n
    """,
)
def stat_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between daily purchase count and daily error
    count — the concordance correlation that completes the family
    (Pearson = stat_corr, Spearman = stat_spearman): for every day
    pair, do the two series move the same way? tau-b's tie correction
    ((n0−n1)(n0−n2) in the denominator) matters here because small
    integer daily counts tie constantly. Everything is integer pair
    counts until the single rounded division.

    Scale: the pair join runs on the COLLAPSED day frame (one
    partial-agg shuffle first), so it is O(#days²) — bounded by the
    calendar span, not the event count; the frame broadcasts. For
    entity-sized frames swap in the O(n log n) merge-inversion count
    (global_rank + bucketed inversion merge)."""
    ev = cat(spark, sf_dir)["events"]
    d = (
        ev.select(
            F.expr(f"unix_micros(ts) div {DAY_US}").alias("day"),
            (F.col("event_type") == "purchase").cast("long").alias("px"),
            (F.col("event_type") == "error").cast("long").alias("py"),
        )
        .groupBy("day")
        .agg(F.sum("px").alias("x"), F.sum("py").alias("y"))
        .localCheckpoint()
    )
    a = d.select(F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = d.select(F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    prod = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    p = (
        a.join(F.broadcast(b), F.col("da") < F.col("db"))
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0)).cast("bigint").alias("conc"),
            F.sum(F.when(prod < 0, 1).otherwise(0)).cast("bigint").alias("disc"),
            F.sum(F.when(F.col("xa") == F.col("xb"), 1).otherwise(0))
            .cast("bigint")
            .alias("tx"),
            F.sum(F.when(F.col("ya") == F.col("yb"), 1).otherwise(0))
            .cast("bigint")
            .alias("ty"),
        )
    )
    n = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        (F.count(F.lit(1)) * (F.count(F.lit(1)) - 1) / 2).cast("bigint").alias("n0"),
    )
    tau = (F.col("conc") - F.col("disc")).cast("double") / F.sqrt(
        ((F.col("n0") - F.col("tx")) * (F.col("n0") - F.col("ty"))).cast("double")
    )
    return p.crossJoin(F.broadcast(n)).select(
        "n_days", "conc", "disc", ratio(tau).alias("tau_b")
    )


@query(
    "stat_theil_sen",
    oracle=f"""
    WITH dc AS (SELECT event_type, epoch_us(ts) // {DAY_US} AS day,
                       CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS vc
                FROM events GROUP BY 1, 2),
    sl AS (SELECT a.event_type,
                  CAST(FLOOR(CAST(b.vc - a.vc AS DOUBLE) / (b.day - a.day)
                             * {SLOPE_GRID} + 0.5) AS BIGINT) AS s
          FROM dc a JOIN dc b
            ON a.event_type = b.event_type AND a.day < b.day)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           FLOOR(median(s) / {SLOPE_GRID} * 10000 + 0.5) / 10000
             AS slope_cents_per_day
    FROM sl GROUP BY 1
    """,
)
def stat_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend: per event type, the MEDIAN of all
    pairwise (day_i, day_j) slopes of daily revenue — up to ~29%
    contaminated days can't move it, unlike the OLS slope
    (stat_regression) a single outlier day drags. Slopes are snapped
    to a 1e-{4} integer grid before the median so the even-count
    midpoint interpolation is dyadic-exact in both engines.

    Scale: pairs are generated WITHIN event_type on the collapsed
    daily frame — O(#days² per type), calendar-bounded. The grouped
    exact median is one sort-based aggregation (same shape as
    stat_mad); at very long spans, Siegel's repeated-median per
    bounded time block or approx_percentile(0.5) drop in."""
    ev = cat(spark, sf_dir)["events"]
    dc = (
        ev.select(
            "event_type",
            F.expr(f"unix_micros(ts) div {DAY_US}").alias("day"),
            "value",
        )
        .groupBy("event_type", "day")
        .agg(F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("long").alias("vc"))
        .localCheckpoint()
    )
    a = dc.select("event_type", F.col("day").alias("da"), F.col("vc").alias("va"))
    b = dc.select("event_type", F.col("day").alias("db"), F.col("vc").alias("vb"))
    sl = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .select(
            "event_type",
            F.floor(
                (F.col("vb") - F.col("va")).cast("double")
                / (F.col("db") - F.col("da"))
                * SLOPE_GRID
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("s"),
        )
    )
    return sl.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        ratio(F.median("s") / SLOPE_GRID).alias("slope_cents_per_day"),
    )


@query(
    "ml_pr_auc",
    oracle=f"""
    WITH s AS (SELECT CAST(embedding[1] AS DOUBLE) AS score,
                      CASE WHEN label < {AP_POS_LABEL_LT} THEN 1 ELSE 0 END
                        AS pos
               FROM embeddings),
    g AS (SELECT score, CAST(SUM(pos) AS BIGINT) AS np,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM s GROUP BY 1),
    c AS (SELECT np, cnt,
                 SUM(cnt) OVER (ORDER BY score DESC ROWS UNBOUNDED
                                PRECEDING) AS cumn,
                 SUM(np) OVER (ORDER BY score DESC ROWS UNBOUNDED
                               PRECEDING) AS cump
          FROM g),
    r AS (SELECT SUM(CAST(FLOOR(CAST(np * cump AS DOUBLE) / cumn
                                * {AP_GRID} + 0.5) AS BIGINT)) AS sterm
          FROM c),
    t AS (SELECT CAST(SUM(pos) AS BIGINT) AS p,
                 CAST(SUM(1 - pos) AS BIGINT) AS nn FROM s)
    SELECT t.p AS n_pos, t.nn AS n_neg,
           FLOOR(CAST(r.sterm AS DOUBLE) / {AP_GRID} / t.p * 10000 + 0.5)
             / 10000 AS avg_precision
    FROM r, t
    """,
)
def ml_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision (area under the precision-recall curve,
    step interpolation: AP = Σ_thresholds ΔRecall · Precision) of the
    same scalar score / binary class as ml_auc — the metric to report
    when positives are rare, where ROC-AUC stays misleadingly high.
    Tie handling: thresholds are the DISTINCT score values, so tied
    scores enter as one PR point, matching sklearn. Each threshold's
    ΔR·P term is an integer-count rational snapped to a 1e-8 grid
    BEFORE the global sum, so engine summation order can't move the
    result.

    Scale: the score table collapses to |distinct scores| in one
    partial-agg shuffle; both running sums ride ONE two-phase
    `bucketed_cumsum` (descending via negated score) — no single-task
    window."""
    emb = cat(spark, sf_dir)["embeddings"]
    s = emb.select(
        F.element_at("embedding", 1).cast("double").alias("score"),
        F.when(F.col("label") < AP_POS_LABEL_LT, 1).otherwise(0).alias("pos"),
    )
    g = (
        s.groupBy("score")
        .agg(
            F.sum("pos").cast("bigint").alias("np"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
        .withColumn("negs", -F.col("score"))
    )
    c = bucketed_cumsum(
        g, "negs", {"cumn": F.col("cnt"), "cump": F.col("np")}
    )
    r = c.agg(
        F.sum(
            F.floor(
                (F.col("np") * F.col("cump")).cast("double")
                / F.col("cumn")
                * AP_GRID
                + F.lit(0.5)
            ).cast("bigint")
        ).alias("sterm")
    )
    t = s.agg(
        F.sum("pos").cast("bigint").alias("p"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("nn"),
    )
    return r.crossJoin(F.broadcast(t)).select(
        F.col("p").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        ratio(F.col("sterm").cast("double") / AP_GRID / F.col("p")).alias(
            "avg_precision"
        ),
    )


def _fsm_oracle() -> str:
    flag_cols = ",\n           ".join(
        f"CAST(SUM(CASE WHEN regexp_matches(jny, '{pat}') THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS f{i}"
        for i, (_, pat) in enumerate(FSM_PATTERNS)
    )
    arms = "\n    UNION ALL\n".join(
        f"    SELECT '{name}' AS pattern, f{i} AS n_users,"
        f" FLOOR(CAST(f{i} AS DOUBLE) / tot * 10000 + 0.5) / 10000 AS share"
        f" FROM f"
        for i, (name, _) in enumerate(FSM_PATTERNS)
    )
    return f"""
    WITH j AS (SELECT user_id,
                      string_agg(substr(event_type, 1, 1), ''
                                 ORDER BY ts, event_id) AS jny
               FROM events GROUP BY 1),
    f AS (SELECT {flag_cols},
           CAST(COUNT(*) AS BIGINT) AS tot
          FROM j)
{arms}
    """


@query("ev_fsm_match", oracle=_fsm_oracle())
def ev_fsm_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style journey classification: each user's
    events collapse (ordered by ts, event_id) into a one-char-per-
    event journey string (c/e/p/s/v), and a small regex battery
    classifies it — converted (view…click…purchase in order, the
    strict-sequence version of ev_funnel), error-then-purchase,
    signup-first, pure-browser. Reports matched users and share per
    pattern.

    Scale: ONE user_id shuffle builds all journeys (sort_array over a
    (ts, event_id, ch) struct list — deterministic total order); regex
    evaluation is JVM codegen on the collapsed per-user frame. At
    100 TB, cap journey length with slice(…, 1, K) inside the same
    aggregate — the patterns here only need bounded prefixes."""
    ev = cat(spark, sf_dir)["events"]
    j = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.substring("event_type", 1, 1).alias("ch"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["ch"]
                ),
                "",
            ).alias("jny")
        )
    )
    aggs = [
        F.sum(F.col("jny").rlike(pat).cast("long")).cast("bigint").alias(f"f{i}")
        for i, (_, pat) in enumerate(FSM_PATTERNS)
    ] + [F.count(F.lit(1)).cast("bigint").alias("tot")]
    f = j.agg(*aggs)
    arms = F.array(
        *[
            F.struct(
                F.lit(name).alias("pattern"),
                F.col(f"f{i}").alias("n_users"),
                ratio(F.col(f"f{i}").cast("double") / F.col("tot")).alias(
                    "share"
                ),
            )
            for i, (name, _) in enumerate(FSM_PATTERNS)
        ]
    )
    return f.select(F.explode(arms).alias("a")).select(
        "a.pattern", "a.n_users", "a.share"
    )
