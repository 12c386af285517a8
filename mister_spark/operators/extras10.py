"""Wave 10: storage-layout queries (partition pruning, bucketed joins,
salted skew joins), sweep-line concurrency, robust anomaly detection,
Kaplan-Meier survival, deterministic weighted sampling, and a Gaussian
naive-Bayes classifier over the embeddings table.

The io_* queries make the layout levers from SURVEY §E driver-visible:
each stages a derived layout once (marker-invalidated, see
sources/staged.py), then answers from that layout, with the oracle
running the same logical query over the original parquet — so the
correctness gate proves the layout changes storage, not semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


@query(
    "io_partitioned_prune",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS total
    FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
    """,
)
def io_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly urgent-order revenue read from a priority-partitioned
    layout: the o_orderpriority predicate becomes directory-level
    partition pruning (PartitionFilters in the scan, pinned in
    tests/test_wave10.py), so only the 1-URGENT directory is read.
    At 100 TB this is the difference between scanning the full fact
    table and scanning ~1/5 of it — paid for by one partitioned
    rewrite, amortized over every priority-filtered query after it.
    The oracle runs the same query over the unpartitioned original:
    identical rows prove the layout is storage-only."""
    from mister_spark.sources.staged import stage_partitioned_orders

    path = stage_partitioned_orders(spark, sf_dir)
    o = spark.read.parquet(path)
    return (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            money(F.sum("o_totalprice")).alias("total"),
        )
    )


@query(
    "io_bucketed_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100
             AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
)
def io_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority revenue over orders⋈lineitem where BOTH sides are
    bucketed by the orderkey: Catalyst elides the exchanges on both
    join inputs (zero-shuffle sort-merge join, pinned in
    tests/test_wave10.py), leaving only the tiny post-join aggregate
    exchange. At 100 TB the fact-fact orderkey shuffle is the single
    largest data movement in the workload; bucketing pays it once at
    write time and every downstream join reads matching buckets
    side by side."""
    from mister_spark.sources.staged import stage_bucketed_order_tables

    to, tl = stage_bucketed_order_tables(spark, sf_dir)
    o = spark.table(to)
    l = spark.table(tl)
    j = o.join(l, o.o_orderkey == l.l_orderkey)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        ),
    )


@query(
    "j_skew_salted",
    oracle="""
    WITH favg AS (
      SELECT l_returnflag,
             FLOOR(AVG(l_discount) * 1000000 + 0.5) / 1000000 AS flag_avg
      FROM lineitem GROUP BY 1)
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(AVG(l.l_discount) * 10000 + 0.5) / 10000 AS avg_disc,
           FLOOR(MAX(ABS(l.l_discount - f.flag_avg)) * 10000 + 0.5) / 10000
             AS max_abs_dev
    FROM lineitem l JOIN favg f ON l.l_returnflag = f.l_returnflag
    GROUP BY 1
    """,
)
def j_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join against a pathologically skewed key: l_returnflag has
    3 values, so a plain repartition join lands the whole fact table on
    3 tasks. The fact side gets salt = xxhash64(orderkey) mod 64 and the
    3-row dim side is replicated across all 64 salts, so the join fans
    out over 192 balanced partitions instead of 3 hot ones. This is the
    pattern for skewed joins where the dim is too big to broadcast (the
    shuffle_hash hint here suppresses the broadcast Catalyst would pick
    for a genuinely tiny dim, to exercise the salted-shuffle path; the
    per-flag mean is rounded to 6 dp on both sides so float drift can't
    flip the max-deviation row). Library form: functions/skew.salted_join
    — this operator inlines it with a deterministic key-derived salt so
    the oracle row set is reproducible."""
    li = cat(spark, sf_dir)["lineitem"].select(
        "l_returnflag", "l_discount", "l_orderkey"
    )
    favg = li.groupBy("l_returnflag").agg(rnd(F.avg("l_discount"), 6).alias("flag_avg"))
    n_salt = 64
    dim = favg.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).hint("shuffle_hash")
    fact = li.withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(n_salt)).cast("int")
    )
    j = fact.join(dim, ["l_returnflag", "salt"])
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        ratio(F.avg("l_discount")).alias("avg_disc"),
        ratio(F.max(F.abs(F.col("l_discount") - F.col("flag_avg")))).alias(
            "max_abs_dev"
        ),
    )


_SESS_SQL = """
      SELECT user_id,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id,
             tus
      FROM (SELECT user_id, epoch_us(ts) AS tus,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                             OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                             > 1800000000
                          OR LAG(epoch_us(ts))
                             OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                             IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM events)
"""


@query(
    "ev_concurrency",
    oracle=f"""
    WITH sess AS (
      SELECT user_id, sess_id, MIN(tus) AS s, MAX(tus) AS e
      FROM ({_SESS_SQL}) GROUP BY 1, 2),
    d AS (
      SELECT s AS tus, 1 AS delta FROM sess
      UNION ALL SELECT e + 1, -1 FROM sess),
    r AS (
      SELECT tus, SUM(delta) OVER (ORDER BY tus, delta DESC
                                   ROWS UNBOUNDED PRECEDING) AS run
      FROM d)
    SELECT strftime(make_timestamp((tus // 3600000000) * 3600000000),
                    '%Y-%m-%d %H:00') AS hour,
           CAST(MAX(run) AS BIGINT) AS max_cc
    FROM r GROUP BY 1
    """,
)
def ev_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per hour, sweep-line style: each session
    [start, end] contributes a +1 event at start and a -1 at end+1, and
    the running sum of deltas in (time, starts-before-ends) order is the
    live concurrency.

    Scale: a naive sweep is a single global ORDER BY — one task owns the
    whole timeline. Instead the running sum is decomposed: within each
    hour bucket a partitioned window does the local prefix sum in
    parallel, and the cross-hour carry is a cumulative sum over the tiny
    per-hour-total frame (#hours rows, broadcast back). Same numbers as
    the oracle's single global window, but the heavy pass is fully
    parallel — the textbook two-phase prefix-sum on Spark."""
    from mister_spark.operators.events import GAP_US, _ev

    ev = _ev(spark, sf_dir).select("user_id", "tus")
    w = W.partitionBy("user_id").orderBy("tus")
    lagged = F.lag("tus").over(w)
    sess = (
        ev.withColumn(
            "new_sess",
            F.when(lagged.isNull() | (F.col("tus") - lagged > GAP_US), 1).otherwise(0),
        )
        .withColumn(
            "sess_id", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0))
        )
        .groupBy("user_id", "sess_id")
        .agg(F.min("tus").alias("s"), F.max("tus").alias("e"))
    )
    # one explode instead of a self-union: a union would duplicate the
    # whole sessionize subtree into two plan branches, doubling the
    # events scan and the user_id exchange
    d = sess.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("tus"), F.lit(1).alias("delta")),
                F.struct((F.col("e") + 1).alias("tus"), F.lit(-1).alias("delta")),
            )
        ).alias("ev")
    ).select("ev.tus", "ev.delta")
    d = d.withColumn("hb", F.expr("tus div 3600000000")).localCheckpoint()
    w_in = (
        W.partitionBy("hb")
        .orderBy(F.col("tus"), F.col("delta").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = d.withColumn("run_local", F.sum("delta").over(w_in))
    hour_tot = d.groupBy("hb").agg(F.sum("delta").alias("tot"))
    w_h = W.orderBy("hb").rowsBetween(W.unboundedPreceding, -1)
    offsets = hour_tot.withColumn("off", F.coalesce(F.sum("tot").over(w_h), F.lit(0)))
    peak = (
        local.join(F.broadcast(offsets.select("hb", "off")), "hb")
        .groupBy("hb")
        .agg(F.max(F.col("run_local") + F.col("off")).alias("max_cc"))
    )
    return peak.select(
        F.date_format(F.timestamp_micros(F.col("hb") * HOUR_US), "yyyy-MM-dd HH:00").alias(
            "hour"
        ),
        F.col("max_cc").cast("long").alias("max_cc"),
    )


@query(
    "ev_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1),
    dev AS (
      SELECT e.event_type, e.value, ABS(e.value - m.med) AS dv, m.med
      FROM events e JOIN med m ON e.event_type = m.event_type),
    mad AS (
      SELECT event_type, ANY_VALUE(med) AS med,
             quantile_cont(dv, 0.5) AS mad
      FROM dev GROUP BY 1)
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(ANY_VALUE(m.med) * 10000 + 0.5) / 10000 AS med,
           FLOOR(ANY_VALUE(m.mad) * 10000 + 0.5) / 10000 AS mad,
           CAST(SUM(CASE WHEN m.mad > 0 AND
                         FLOOR(0.6745 * d.dv / m.mad * 10000 + 0.5) / 10000 > 3.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           FLOOR(AVG(CASE WHEN m.mad > 0 AND
                          FLOOR(0.6745 * d.dv / m.mad * 10000 + 0.5) / 10000 > 3.5
                          THEN 1.0 ELSE 0.0 END) * 10000 + 0.5) / 10000
             AS outlier_share
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY 1
    """,
)
def ev_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-event-type anomaly counts via the modified z-score
    0.6745·|x−median| / MAD (> 3.5 ⇒ outlier, Iglewicz–Hoaglin). Median
    and MAD resist the heavy-tailed `value` column where mean/stddev
    z-scores (ev_zscore) drown. Two exact-percentile aggregates on the
    same key — both shuffles land on event_type, the second input
    already clustered; the robust z is rounded before the 3.5 compare so
    engines agree on boundary rows.

    Scale: exact median needs a full sort per group; the 100 TB form
    swaps percentile() for percentile_approx() (t-digest sketch, one
    pass, mergeable) at a tolerance the anomaly threshold doesn't feel —
    same plan shape, sketch instead of sort."""
    ev = cat(spark, sf_dir)["events"].select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dv", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"), F.expr("percentile(dv, 0.5)").alias("mad")
    )
    rz_out = (F.col("mad") > 0) & (
        rnd(F.lit(0.6745) * F.col("dv") / F.col("mad"), 4) > 3.5
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            ratio(F.first("med")).alias("med"),
            ratio(F.first("mad")).alias("mad"),
            F.sum(F.when(rz_out, 1).otherwise(0)).cast("long").alias("n_outliers"),
            ratio(F.avg(F.when(rz_out, 1.0).otherwise(0.0))).alias("outlier_share"),
        )
    )


@query(
    "ev_survival",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MIN(epoch_us(ts) // 86400000000) AS d0,
             MAX(epoch_us(ts) // 86400000000) AS d1
      FROM events GROUP BY 1),
    lab AS (
      SELECT user_id, d1 - d0 AS t,
             CASE WHEN (SELECT MAX(d1) FROM u) - d1 < 7 THEN 1 ELSE 0 END AS cens
      FROM u),
    g AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(1 - cens) AS BIGINT) AS n_deaths
      FROM lab GROUP BY 1),
    r AS (
      SELECT t, n_deaths,
             (SELECT SUM(cnt) FROM g) -
               COALESCE(SUM(cnt) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                                       PRECEDING AND 1 PRECEDING), 0) AS n_risk
      FROM g),
    s AS (
      SELECT t, n_risk, n_deaths,
             CAST(n_risk - n_deaths AS DOUBLE) / n_risk AS factor
      FROM r)
    SELECT t, CAST(n_risk AS BIGINT) AS n_risk, n_deaths,
           CASE WHEN MAX(CASE WHEN factor <= 0 THEN 1 ELSE 0 END)
                     OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1
                THEN 0.0
                ELSE FLOOR(EXP(SUM(LN(factor))
                               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING))
                           * 10000 + 0.5) / 10000 END AS survival
    FROM s
    """,
)
def ev_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier user-lifetime survival curve with right-censoring:
    lifetime = days between a user's first and last event; users still
    active within 7 days of the corpus horizon are censored (they leave
    the risk set without counting as churn). S(t) = Π_{u≤t}(1−d_u/n_u),
    computed as exp of a running LN sum so the product is a window
    aggregate, with an any-zero-so-far guard because ln(0) is undefined
    (Spark yields NULL, DuckDB errors).

    Scale: the only heavy pass is the per-user min/max day (one shuffle
    on user_id). Lifetimes collapse to ≤ #days distinct values, so the
    K-M windows run over a frame bounded by the calendar, not the
    corpus."""
    ev = cat(spark, sf_dir)["events"].select(
        F.expr("unix_micros(ts) div 86400000000").alias("day"), "user_id"
    )
    u = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        # the horizon scalar and the lifetime labeling both read u:
        # cut the lineage so the events scan + user agg run once
        .localCheckpoint()
    )
    horizon = u.agg(F.max("d1").alias("maxd"))
    lab = u.join(F.broadcast(horizon)).select(
        (F.col("d1") - F.col("d0")).alias("t"),
        F.when(F.col("maxd") - F.col("d1") < 7, 1).otherwise(0).alias("cens"),
    )
    g = lab.groupBy("t").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.lit(1) - F.col("cens")).cast("long").alias("n_deaths"),
    )
    total = g.agg(F.sum("cnt").alias("total"))
    w_prior = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    w_run = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    r = (
        g.join(F.broadcast(total))
        .withColumn(
            "n_risk", F.col("total") - F.coalesce(F.sum("cnt").over(w_prior), F.lit(0))
        )
        .withColumn(
            "factor",
            (F.col("n_risk") - F.col("n_deaths")).cast("double") / F.col("n_risk"),
        )
    )
    return r.select(
        "t",
        F.col("n_risk").cast("long").alias("n_risk"),
        "n_deaths",
        F.when(
            F.max(F.when(F.col("factor") <= 0, 1).otherwise(0)).over(w_run) == 1,
            F.lit(0.0),
        )
        .otherwise(rnd(F.exp(F.sum(F.log("factor")).over(w_run)), 4))
        .alias("survival"),
    )


@query(
    "ds_weighted_sample",
    oracle="""
    SELECT doc_id, n_chars FROM documents
    WHERE ((doc_id * 1103515245 + 12345) % 2147483648) / 2147483648.0 * 2000.0
          < 0.15 * n_chars
    """,
)
def ds_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted Bernoulli document sample: inclusion probability
    proportional to n_chars (≈0.15·len/2000), with the per-doc uniform
    drawn from a deterministic LCG mix of doc_id instead of rand() so
    the exact row set reproduces cross-engine and cross-run — the
    property a training-data pipeline needs for auditable sampling.
    Only IEEE *,/,% arithmetic on both sides (no pow/ln whose libm
    rounding differs between engines), so the boundary compare is
    bit-identical. Narrow filter, pushed to the scan — embarrassingly
    parallel at any scale."""
    docs = cat(spark, sf_dir)["documents"]
    u = ((F.col("doc_id") * 1103515245 + 12345) % 2147483648) / 2147483648.0
    return docs.filter(u * 2000.0 < 0.15 * F.col("n_chars")).select(
        "doc_id", "n_chars"
    )


NB_DIMS = 64


@query(
    "ml_gaussian_nb",
    # Real oracle: train/score/argmax are all plain SQL — per-(label,
    # dim) mean/var_pop, the Gaussian log-likelihood sum, log-prior,
    # and the (score DESC, cand) argmax window, then integer confusion
    # counts. The multiple-unnest SELECT zips position and value like
    # posexplode.
    oracle="""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                        CAST(label AS BIGINT) AS label
                 FROM embeddings),
    tr0 AS (SELECT * FROM emb WHERE vec_id % 5 <> 0),
    tr AS (SELECT label, unnest(generate_series(1, len(v))) AS i,
                  unnest(v) AS x
           FROM tr0),
    model AS (SELECT label AS cand, i, AVG(x) AS mu,
                     VAR_POP(x) + 1e-9 AS var
              FROM tr GROUP BY 1, 2),
    priors AS (SELECT label AS cand, CAST(COUNT(*) AS DOUBLE) AS n_lab
               FROM tr0 GROUP BY 1),
    ntr AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tr0),
    te AS (SELECT vec_id, label AS true_label,
                  unnest(generate_series(1, len(v))) AS i, unnest(v) AS x
           FROM emb WHERE vec_id % 5 = 0),
    scored AS (SELECT t.vec_id, t.true_label, m.cand,
                      SUM(-0.5 * LN(2 * PI() * m.var)
                          - (t.x - m.mu) * (t.x - m.mu) / (2 * m.var))
                        AS ll_sum
               FROM te t JOIN model m ON m.i = t.i
               GROUP BY 1, 2, 3),
    fin AS (SELECT s.vec_id, s.true_label, s.cand,
                   s.ll_sum + LN(p.n_lab / nt.n) AS score
            FROM scored s JOIN priors p ON p.cand = s.cand
            CROSS JOIN ntr nt),
    pred AS (SELECT true_label, cand,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY score DESC, cand) AS rk
             FROM fin)
    SELECT true_label AS label, cand AS pred, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred WHERE rk = 1 GROUP BY 1, 2
    """,
)
def ml_gaussian_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian naive Bayes over the embeddings table: train per-(label,
    dim) mean/variance on the vec_id%5≠0 split, score the held-out 20%
    with Σ_d [−½ln(2πσ²) − (x−μ)²/2σ²] + ln(prior), predict argmax.
    Returns the confusion matrix (label, pred, n); pytest gates holdout
    accuracy well above the 10-class chance floor.

    Scale: the model is 10 labels × 64 dims = 640 rows — aggregated with
    one (label,dim) shuffle over the exploded train set, then broadcast.
    Scoring is a broadcast join on dim (64 rows/vector → 640 scored
    terms), one (vec,label) partial-agg shuffle, and a per-vector argmax
    window. Data big, model small; no Python in the loop."""
    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        F.col("label").cast("long").alias("label"),
    )
    # model/priors/n_train all read the train split — checkpoint once
    train = emb.filter(F.col("vec_id") % 5 != 0).localCheckpoint()
    test = emb.filter(F.col("vec_id") % 5 == 0)

    tr = train.select("vec_id", "label", F.posexplode("v").alias("d", "x"))
    model = tr.groupBy("label", "d").agg(
        F.avg("x").alias("mu"),
        (F.var_pop("x") + F.lit(1e-9)).alias("var"),
    )
    priors = train.groupBy("label").agg(F.count(F.lit(1)).alias("n_lab"))
    n_train = train.count()

    te = test.select(
        F.col("vec_id"), F.col("label").alias("true_label"), F.posexplode("v").alias("d", "x")
    )
    scored = (
        te.join(F.broadcast(model.withColumnRenamed("label", "cand")), "d")
        .withColumn(
            "ll",
            -0.5 * F.log(2 * 3.141592653589793 * F.col("var"))
            - (F.col("x") - F.col("mu")) ** 2 / (2 * F.col("var")),
        )
        .groupBy("vec_id", "true_label", "cand")
        .agg(F.sum("ll").alias("ll_sum"))
        .join(F.broadcast(priors.withColumnRenamed("label", "cand")), "cand")
        .withColumn(
            "score", F.col("ll_sum") + F.log(F.col("n_lab") / F.lit(float(n_train)))
        )
    )
    w = W.partitionBy("vec_id").orderBy(F.col("score").desc(), F.col("cand"))
    pred = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        pred.groupBy(F.col("true_label").alias("label"), F.col("cand").alias("pred"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
