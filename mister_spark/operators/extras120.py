"""Wave 120: gradient-boosted stumps, ANSI try-math surface, and the
corpus health scorecard.

ml_gbm_stumps runs gradient boosting for regression — each round
fits a depth-1 histogram stump to the RESIDUALS of the ensemble so
far (shrinkage 0.5) — the additive-model loop under every GBM
library, with the histogram split search keeping rounds scan-cheap;
sql_try_math pins the try_divide / try_add / try_to_number ANSI
surface — dirty arithmetic degrades to counted NULLs instead of
killing the job; ds_corpus_health_scorecard is the capstone
composition: one row of corpus health built by CALLING the repo's
own registered operators (dedup, hygiene, blocklist, language
entropy), the report a data-engineering on-call reads first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

GBM_ROUNDS = 3
GBM_LR = 0.5


def _gbm_oracle() -> str:
    """The 3-round boosting loop unrolled into chained CTEs: per round
    an f-ordered prefix scan over the 7-bin residual histogram (the
    exact accumulation order of the Python driver loop — totals are
    the LAST prefix value, not an unordered SUM), the variance-gain
    argmax with the full tuple tie-break (gain, f, left-mean,
    right-mean, all DESC = Python's strict tuple-max), and the
    prediction threaded forward as a scalar-subquery expression."""
    parts = [
        """d AS (SELECT ((dayofweek(o_orderdate) + 6) % 7) + 1 AS f,
                    o_totalprice AS y FROM orders)""",
        "base AS (SELECT AVG(y) AS p FROM d)",
    ]

    def pred(upto: int) -> str:
        e = "b.p"
        for k in range(1, upto + 1):
            e += (
                f" + {GBM_LR} * (CASE WHEN d.f <= s{k}.thr THEN s{k}.lm"
                f" ELSE s{k}.rm END)"
            )
        return "(" + e + ")"

    def frm(upto: int) -> str:
        return "d, base b" + "".join(f", s{k}" for k in range(1, upto + 1))

    for r in range(1, GBM_ROUNDS + 1):
        p = pred(r - 1)
        parts.append(f"""
    h{r} AS (SELECT d.f, CAST(COUNT(*) AS DOUBLE) AS n,
                    SUM(d.y - {p}) AS s,
                    SUM((d.y - {p}) * (d.y - {p})) AS ss
             FROM {frm(r - 1)} GROUP BY d.f)""")
        parts.append(f"""
    c{r} AS (SELECT f, SUM(n) OVER w AS ln, SUM(s) OVER w AS ls,
                    SUM(ss) OVER w AS lss
             FROM h{r}
             WINDOW w AS (ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW))""")
        parts.append(f"""
    t{r} AS (SELECT ln AS tn, ls AS ts, lss AS tss
             FROM c{r} ORDER BY f DESC LIMIT 1)""")
        parts.append(f"""
    mx{r} AS (SELECT MAX(f) AS mf FROM c{r})""")
        parts.append(f"""
    s{r} AS (SELECT f AS thr,
                    (t.tss - t.ts * t.ts / t.tn)
                    - (-(c.ls * c.ls) / c.ln
                       - ((t.ts - c.ls) * (t.ts - c.ls)) / (t.tn - c.ln)
                       + t.tss) AS gain,
                    c.ls / c.ln AS lm,
                    (t.ts - c.ls) / (t.tn - c.ln) AS rm
             FROM c{r} c, t{r} t, mx{r} m
             WHERE c.f < m.mf
             ORDER BY 2 DESC, 1 DESC, 3 DESC, 4 DESC LIMIT 1)""")
        pf = pred(r)
        parts.append(f"""
    rmse{r} AS (SELECT SQRT(AVG((d.y - {pf}) * (d.y - {pf}))) AS v
                FROM {frm(r)})""")
    unions = "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS BIGINT) AS round,
               CAST(s{r}.thr AS BIGINT) AS split_at,
               FLOOR(s{r}.gain * 100 + 0.5) / 100 AS gain,
               FLOOR(rmse{r}.v * 10000 + 0.5) / 10000 AS train_rmse
        FROM s{r}, rmse{r}"""
        for r in range(1, GBM_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + unions


@query("ml_gbm_stumps", oracle=_gbm_oracle())
def ml_gbm_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient boosting with depth-1 histogram stumps: predict order
    totalprice from weekday; each round fits the best single split to
    the current RESIDUALS (variance-reduction argmax over the 7-bin
    histogram — split search never touches rows) and adds it with
    shrinkage {lr}. Train RMSE must fall every round (pinned) — the
    additive-model mechanic of XGBoost/LightGBM reduced to its
    auditable core.

    Scale: each round is ONE partial-agg shuffle to |bins| rows (the
    histogram) and an O(bins) driver argmax; predictions update as a
    broadcast CASE expression, never a data-sized join."""
    orders = cat(spark, sf_dir)["orders"]
    d = orders.select(
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).cast("int").alias("f"),
        F.col("o_totalprice").alias("y"),
    ).localCheckpoint()
    pred_expr = F.lit(0.0)
    base = d.agg(F.avg("y")).collect()[0][0]
    pred_expr = F.lit(float(base))
    out = []
    for rnd_i in range(1, GBM_ROUNDS + 1):
        resid = d.select("f", (F.col("y") - pred_expr).alias("r"))
        h = (
            resid.groupBy("f")
            .agg(
                F.count(F.lit(1)).cast("double").alias("n"),
                F.sum("r").alias("s"),
                F.sum(F.col("r") * F.col("r")).alias("ss"),
            )
            .collect()
        )
        bins = sorted((row["f"], row["n"], row["s"], row["ss"]) for row in h)
        tot_n = sum(b[1] for b in bins)
        tot_s = sum(b[2] for b in bins)
        tot_ss = sum(b[3] for b in bins)
        base_sse = tot_ss - tot_s * tot_s / tot_n
        best = None
        ln = ls = 0.0
        for f_val, n_b, s_b, _ in bins[:-1]:
            ln += n_b
            ls += s_b
            rn, rs = tot_n - ln, tot_s - ls
            sse = (
                (0 if ln == 0 else -(ls * ls) / ln)
                + (0 if rn == 0 else -(rs * rs) / rn)
                + tot_ss
            )
            cand = (base_sse - sse, f_val, ls / ln, rs / rn)
            if best is None or cand > best:
                best = cand
        gain, thr, left_mean, right_mean = best
        pred_expr = pred_expr + GBM_LR * F.when(
            F.col("f") <= thr, F.lit(float(left_mean))
        ).otherwise(F.lit(float(right_mean)))
        rmse = (
            d.select((F.col("y") - pred_expr).alias("e"))
            .agg(F.sqrt(F.avg(F.col("e") * F.col("e"))))
            .collect()[0][0]
        )
        import math

        out.append(
            (
                rnd_i,
                int(thr),
                math.floor(float(gain) * 100 + 0.5) / 100,
                math.floor(float(rmse) * 10000 + 0.5) / 10000,
            )
        )
    return spark.createDataFrame(
        out, "round long, split_at long, gain double, train_rmse double"
    )


ml_gbm_stumps.__doc__ = ml_gbm_stumps.__doc__.format(lr=GBM_LR)


@query(
    "sql_try_math",
    oracle="""
    WITH d AS (SELECT o_totalprice AS y,
                      CAST(o_orderkey % 5 AS DOUBLE) AS k,
                      'x' || CAST(o_orderkey AS VARCHAR) AS bad
               FROM orders)
    SELECT CAST(COUNT(*) AS BIGINT) AS rows_in,
           CAST(SUM(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS null_divides,
           FLOOR(SUM(CASE WHEN k > 0 THEN y / k END) * 100 + 0.5) / 100
             AS safe_sum,
           CAST(SUM(CASE WHEN TRY_CAST(bad AS DOUBLE) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS bad_numbers
    FROM d
    """,
)
def sql_try_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI try-math surface: try_divide turns division-by-zero into
    NULL (counted, not fatal), and try_to_number turns unparseable
    strings into NULL — dirty rows become a metric instead of a dead
    job under ANSI mode. The safe aggregate alongside proves the
    clean rows still compute exactly.

    Scale: pure expression surface; one aggregate."""
    orders = cat(spark, sf_dir)["orders"]
    d = orders.select(
        F.col("o_totalprice").alias("y"),
        (F.col("o_orderkey") % 5).cast("double").alias("k"),
        F.concat(F.lit("x"), F.col("o_orderkey").cast("string")).alias(
            "bad"
        ),
    )
    td = F.expr("try_divide(y, k)")
    return d.agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_in"),
        F.sum(td.isNull().cast("long")).cast("bigint").alias("null_divides"),
        (F.floor(F.sum(td) * 100 + F.lit(0.5)) / 100).alias("safe_sum"),
        F.sum(F.expr("try_to_number(bad, '999999')").isNull().cast("long"))
        .cast("bigint")
        .alias("bad_numbers"),
    )


@query(
    "ds_corpus_health_scorecard",
    # Real oracle: every component the scorecard invokes is itself
    # oracle-exact, so this inlines their SQL definitions (exact-dup
    # groups, the four hygiene flags, blocklist hits, token totals)
    # plus the normalized source-mix entropy; ratios round on the
    # shared floor grid.
    oracle=r"""
    WITH nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                       CAST(COUNT(DISTINCT text) AS DOUBLE) AS g
                FROM documents),
    enc AS (SELECT CAST(
              SUM(CASE WHEN regexp_matches(text,
                    '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END)
              + SUM(CASE WHEN text LIKE chr(13) || '%'
                           OR text LIKE '%' || chr(13) || '%'
                         THEN 1 ELSE 0 END)
              + SUM(CASE WHEN strpos(text, chr(65533)) > 0
                         THEN 1 ELSE 0 END)
              + SUM(CASE WHEN text <> trim(text) THEN 1 ELSE 0 END)
              AS BIGINT) AS defects
            FROM documents),
    bl AS (SELECT SUM(CASE WHEN len(list_filter(
                   list_filter(string_split(text, ' '), x -> x <> ''),
                   x -> list_contains(['error', 'dup', 'slow'], x))) > 0
                 THEN 1.0 ELSE 0.0 END) AS flagged
           FROM documents),
    tok AS (SELECT CAST(SUM(len(list_filter(string_split(text, ' '),
                                            t -> t <> ''))) AS BIGINT)
              AS tokens
            FROM documents),
    src AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM documents
            GROUP BY source),
    ent AS (SELECT -SUM(CASE WHEN c > 0
                             THEN (c / nd.n) * LN(c / nd.n) END)
                   / LN(COUNT(*)) AS e
            FROM src, nd GROUP BY nd.n)
    SELECT CAST(nd.n AS BIGINT) AS docs, tok.tokens AS tokens,
           FLOOR((1.0 - nd.g / nd.n) * 10000 + 0.5) / 10000
             AS exact_dup_rate,
           enc.defects AS hygiene_defects,
           FLOOR(bl.flagged / nd.n * 10000 + 0.5) / 10000
             AS blocklist_flag_rate,
           FLOOR(ent.e * 10000 + 0.5) / 10000 AS source_mix_entropy
    FROM nd, enc, bl, tok, ent
    """,
)
def ds_corpus_health_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus health scorecard — ONE row composed by invoking the
    repo's own registered operators: exact-duplicate rate (dd_exact),
    hygiene defects (tx_encoding_audit), blocklist flag rate
    (tx_blocklist_screen), source-mix entropy (normalized, from the
    raw source counts), and token volume (tx_tokencount). The on-call
    page-one view; every number is attributable to a fully
    oracle-checked operator.

    Scale: inherits each component's plan; the scorecard itself is
    driver arithmetic over their (tiny) outputs."""
    from mister_spark import registry as reg

    docs = cat(spark, sf_dir)["documents"]
    n_docs = docs.count()
    dd = reg.QUERIES["dd_exact"](spark, sf_dir)
    n_groups = dd.count()
    dup_rate = 1.0 - n_groups / n_docs
    enc = reg.QUERIES["tx_encoding_audit"](spark, sf_dir).agg(
        F.sum(
            F.col("ctrl_chars")
            + F.col("carriage_returns")
            + F.col("replacement_chars")
            + F.col("edge_whitespace")
        )
    ).collect()[0][0]
    bl = reg.QUERIES["tx_blocklist_screen"](spark, sf_dir).agg(
        F.sum("flagged"), F.sum("docs")
    ).collect()[0]
    flag_rate = float(bl[0]) / float(bl[1])
    src = docs.groupBy("source").count().collect()
    import math

    ps = [r["count"] / n_docs for r in src]
    ent = -sum(p * math.log(p) for p in ps if p > 0) / math.log(len(ps))
    tok = reg.QUERIES["tx_tokencount"](spark, sf_dir).agg(
        F.sum("n_tokens")
    ).collect()[0][0]
    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
    row = (
        int(n_docs),
        int(tok),
        r4(dup_rate),
        int(enc),
        r4(flag_rate),
        r4(ent),
    )
    return spark.createDataFrame(
        [row],
        "docs long, tokens long, exact_dup_rate double, hygiene_defects "
        "long, blocklist_flag_rate double, source_mix_entropy double",
    )
