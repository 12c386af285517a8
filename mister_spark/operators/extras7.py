"""Wave 7: OHLC resampling, distribution analytics, lateral joins,
weighted corpus interleaving, and two classical hypothesis tests.

Rounds out the surface with shapes users reach for daily: financial-style
time-series downsampling (OHLC), cumulative-distribution ranking, dwell
(inter-event gap) histograms, per-row correlated LATERAL subqueries,
deterministic weighted source interleaving for training order, χ² and
Welch-t tests as single-pass aggregates, and a unigram-LM negative
log-likelihood quality score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query


@query(
    "ev_ohlc_resample",
    oracle="""
    WITH r AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hr,
             value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS ra,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rd
      FROM events)
    SELECT event_type, hr,
           FLOOR(MAX(CASE WHEN ra = 1 THEN value END) * 10000 + 0.5) / 10000 AS open,
           FLOOR(MAX(value) * 10000 + 0.5) / 10000 AS high,
           FLOOR(MIN(value) * 10000 + 0.5) / 10000 AS low,
           FLOOR(MAX(CASE WHEN rd = 1 THEN value END) * 10000 + 0.5) / 10000 AS close,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM r GROUP BY 1, 2
    """,
)
def ev_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per (event_type, hour), the open (first),
    high, low, close (last) of `value` — the canonical time-series
    resample for tick → bar conversion. First/last are defined by
    (ts, event_id) so ties are deterministic in both engines.

    Scale: ONE shuffle on (event_type, hour) serves both windows (same
    partitioning, opposite sort orders reuse the exchange) and the
    final aggregate — no per-row state beyond the window sort."""
    ev = cat(spark, sf_dir)["events"]
    keyed = ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hts"),
        "ts",
        "event_id",
        "value",
    )
    wa = W.partitionBy("event_type", "hts").orderBy("ts", "event_id")
    wd = W.partitionBy("event_type", "hts").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    r = keyed.withColumn("ra", F.row_number().over(wa)).withColumn(
        "rd", F.row_number().over(wd)
    )
    # group on the RAW window key (hts), formatting only in the final
    # select: grouping on date_format(hts) is a derived key Catalyst
    # can't prove co-partitioned, which would add a second exchange
    return (
        r.groupBy("event_type", "hts")
        .agg(
            ratio(F.max(F.when(F.col("ra") == 1, F.col("value")))).alias("open"),
            ratio(F.max("value")).alias("high"),
            ratio(F.min("value")).alias("low"),
            ratio(F.max(F.when(F.col("rd") == 1, F.col("value")))).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .select(
            "event_type",
            F.date_format("hts", "yyyy-MM-dd HH:00").alias("hr"),
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )


@query(
    "w_cume_dist",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           FLOOR(c_acctbal * 100 + 0.5) / 100 AS bal,
           FLOOR(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal)
                 * 10000 + 0.5) / 10000 AS cd
    FROM customer
    """,
)
def w_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distribution rank of account balance within each
    market segment — "what fraction of my segment is at or below me".
    cume_dist assigns equal values equal rank, so no tiebreak is needed
    for cross-engine determinism.

    Scale: one shuffle on the segment key; the window sort is per
    segment (5 keys here — at scale, partition by a finer composite or
    pre-bucket the measure to keep per-key sorts bounded)."""
    cust = cat(spark, sf_dir)["customer"]
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        money(F.col("c_acctbal")).alias("bal"),
        ratio(F.cume_dist().over(w)).alias("cd"),
    )


@query(
    "ev_dwell_histogram",
    oracle="""
    WITH g AS (
      SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events)
    SELECT CASE WHEN gap < 60 * 1000000 THEN 'lt_1m'
                WHEN gap < 300 * 1000000 THEN '1m_5m'
                WHEN gap < 1800 * 1000000 THEN '5m_30m'
                ELSE 'gt_30m' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM g WHERE gap IS NOT NULL
    GROUP BY 1
    """,
)
def ev_dwell_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time histogram: the distribution of gaps between a user's
    consecutive events, bucketed at the 1 m / 5 m / 30 m boundaries
    that also drive sessionization — the evidence for choosing a
    session gap threshold rather than assuming one.

    Scale: one shuffle on user_id for the lag window (integer
    microsecond arithmetic — no float drift), then a 4-key partial-agg
    rollup that moves almost nothing."""
    ev = cat(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    g = ev.select((us - F.lag(us).over(w)).alias("gap")).filter(
        F.col("gap").isNotNull()
    )
    bucket = (
        F.when(F.col("gap") < 60 * 1_000_000, "lt_1m")
        .when(F.col("gap") < 300 * 1_000_000, "1m_5m")
        .when(F.col("gap") < 1800 * 1_000_000, "5m_30m")
        .otherwise("gt_30m")
    )
    return g.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


@query(
    "j_lateral",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey,
           strftime(t.o_orderdate, '%Y-%m-%d') AS odate
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_orderdate
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC
      LIMIT 2) t
    """,
)
def j_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's two most recent
    orders — the per-row top-N idiom SQL users write as
    `, LATERAL (... ORDER BY ... LIMIT n)`, run through Spark's own
    lateral-join support (Catalyst decorrelates it; the physical plan
    is the same shuffle + bounded per-key selection a window top-N
    compiles to, so no per-customer re-scan of orders happens).

    Scale: decorrelation means ONE pass over orders however many
    customers exist — the naive interpretation (a subquery per row)
    never executes."""
    c = cat(spark, sf_dir)
    c["customer"].createOrReplaceTempView("v_customer")
    c["orders"].createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
               date_format(t.o_orderdate, 'yyyy-MM-dd') AS odate
        FROM v_customer c JOIN LATERAL (
          SELECT o_orderkey, o_orderdate
          FROM v_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC
          LIMIT 2) t
        """
    )


INTERLEAVE_SHARDS = 8


@query(
    "ds_interleave",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, source,
             doc_id % {INTERLEAVE_SHARDS} AS shard,
             CAST(SUBSTR(source, 4) AS INT) % 3 + 1 AS w,
             (doc_id * 2654435761) % 1000000007 AS h
      FROM documents),
    r AS (
      SELECT doc_id, source, shard, w,
             ROW_NUMBER() OVER (PARTITION BY shard, source ORDER BY h, doc_id)
               AS rn
      FROM s)
    SELECT shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY shard
             ORDER BY CAST(rn AS DOUBLE) / w, source, doc_id) AS BIGINT) AS pos,
           doc_id, source
    FROM r
    """,
)
def ds_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted deterministic source interleaving: within each training
    shard, documents from all sources are merged by stride scheduling —
    a source with weight w contributes its k-th document at virtual
    time k/w, so a weight-3 source appears 3× as often as a weight-1
    source, evenly spread rather than in blocks. Shard and shuffle keys
    are pure integer arithmetic (Knuth multiplicative hash), identical
    in both engines — no engine hash function in the contract.

    Scale: order is defined PER SHARD (each data-parallel trainer reads
    one shard), so there is no global sort anywhere. The explicit
    repartition on shard makes BOTH windows run off ONE exchange:
    hash(shard) satisfies the (shard, source) window's clustering (the
    subset rule), whereas letting the first window hash on
    (shard, source) would split each shard across partitions and force
    a second shuffle for the shard window. Weights here derive from the
    source id; a real pipeline would join a tiny weights dim instead."""
    docs = cat(spark, sf_dir)["documents"]
    s = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % INTERLEAVE_SHARDS).alias("shard"),
        (F.substring("source", 4, 10).cast("int") % 3 + 1).alias("w"),
        ((F.col("doc_id") * 2654435761) % 1000000007).alias("h"),
    ).repartition("shard")
    w_rn = W.partitionBy("shard", "source").orderBy("h", "doc_id")
    r = s.withColumn("rn", F.row_number().over(w_rn))
    w_pos = W.partitionBy("shard").orderBy(
        F.col("rn").cast("double") / F.col("w"), "source", "doc_id"
    )
    return r.select(
        "shard",
        F.row_number().over(w_pos).cast("bigint").alias("pos"),
        "doc_id",
        "source",
    )


@query(
    "stat_chi2",
    oracle="""
    WITH o AS (
      SELECT event_type AS et, CAST(isodow(ts) AS BIGINT) AS dw,
             CAST(COUNT(*) AS DOUBLE) AS obs
      FROM events GROUP BY 1, 2),
    tot AS (SELECT SUM(obs) AS n FROM o),
    rt AS (SELECT et, SUM(obs) AS r FROM o GROUP BY 1),
    ct AS (SELECT dw, SUM(obs) AS c FROM o GROUP BY 1)
    SELECT FLOOR(SUM((obs - r * c / n) * (obs - r * c / n) / (r * c / n))
                 * 10000 + 0.5) / 10000 AS chi2,
           CAST((COUNT(DISTINCT o.et) - 1) * (COUNT(DISTINCT o.dw) - 1)
                AS BIGINT) AS dof
    FROM o JOIN rt ON o.et = rt.et JOIN ct ON o.dw = ct.dw, tot
    """,
)
def stat_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² test of independence between event type and ISO day-of-week:
    contingency counts, expected = row·col/total, χ² = Σ(o-e)²/e — "is
    activity mix different on different weekdays" as one number + dof.

    Scale: the contingency table is at most |types|×7 rows after ONE
    partial-agg shuffle of the events scan; margins and the statistic
    are computed on that tiny table (broadcast joins), so data size
    only affects the first aggregate."""
    ev = cat(spark, sf_dir)["events"]
    iso = ((F.dayofweek("ts") + 5) % 7) + 1
    # checkpoint the ≤ |types|×7 contingency table: the margins and the
    # statistic all read it, and without the cut each margin branch
    # replays the events scan + aggregate
    o = (
        ev.groupBy(F.col("event_type").alias("et"), iso.cast("bigint").alias("dw"))
        .agg(F.count(F.lit(1)).cast("double").alias("obs"))
        .localCheckpoint()
    )
    tot = o.agg(F.sum("obs").alias("n"))
    rt = o.groupBy("et").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("dw").agg(F.sum("obs").alias("c"))
    e = F.col("r") * F.col("c") / F.col("n")
    return (
        o.join(F.broadcast(rt), "et")
        .join(F.broadcast(ct), "dw")
        .join(F.broadcast(tot))
        .agg(
            rnd(F.sum((F.col("obs") - e) * (F.col("obs") - e) / e), 4).alias(
                "chi2"
            ),
            (
                (F.countDistinct("et") - 1) * (F.countDistinct("dw") - 1)
            )
            .cast("bigint")
            .alias("dof"),
        )
    )


@query(
    "stat_welch_ttest",
    oracle="""
    WITH g AS (
      SELECT c_mktsegment AS seg, CAST(COUNT(*) AS DOUBLE) AS n,
             AVG(c_acctbal) AS m, VAR_SAMP(c_acctbal) AS v
      FROM customer
      WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY') GROUP BY 1)
    SELECT FLOOR((a.m - b.m) / SQRT(a.v / a.n + b.v / b.n) * 10000 + 0.5)
             / 10000 AS t_stat,
           FLOOR(((a.v / a.n + b.v / b.n) * (a.v / a.n + b.v / b.n))
                 / ((a.v / a.n) * (a.v / a.n) / (a.n - 1)
                    + (b.v / b.n) * (b.v / b.n) / (b.n - 1)) * 100 + 0.5)
             / 100 AS dof
    FROM g a, g b WHERE a.seg = 'AUTOMOBILE' AND b.seg = 'MACHINERY'
    """,
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two customer segments'
    account balances: t = (m₁-m₂)/√(v₁/n₁+v₂/n₂) with
    Welch–Satterthwaite degrees of freedom — the default two-sample
    test when variances can't be assumed equal (A/B testing's
    workhorse).

    Scale: sufficient statistics (n, mean, var) per group in ONE
    partial-agg pass; the test itself is O(1) driver-side arithmetic
    expressed as a 2×2 self-join of a 2-row frame."""
    cust = cat(spark, sf_dir)["customer"]
    g = (
        cust.filter(F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"))
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("c_acctbal").alias("m"),
            F.var_samp("c_acctbal").alias("v"),
        )
    )
    a = g.filter(F.col("seg") == "AUTOMOBILE").select(
        F.col("n").alias("na"), F.col("m").alias("ma"), F.col("v").alias("va")
    )
    b = g.filter(F.col("seg") == "MACHINERY").select(
        F.col("n").alias("nb"), F.col("m").alias("mb"), F.col("v").alias("vb")
    )
    sa = F.col("va") / F.col("na")
    sb = F.col("vb") / F.col("nb")
    return a.join(F.broadcast(b)).select(
        rnd((F.col("ma") - F.col("mb")) / F.sqrt(sa + sb), 4).alias("t_stat"),
        rnd(
            ((sa + sb) * (sa + sb))
            / (sa * sa / (F.col("na") - 1) + sb * sb / (F.col("nb") - 1)),
            2,
        ).alias("dof"),
    )


@query(
    "tx_unigram_nll",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({DUCK_TOKENS}) AS tk FROM documents),
    cnt AS (SELECT tk, CAST(COUNT(*) AS DOUBLE) AS c FROM tok GROUP BY 1),
    tot AS (SELECT SUM(c) AS n FROM cnt)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           FLOOR(AVG(-LN(c / n)) * 10000 + 0.5) / 10000 AS nll
    FROM tok JOIN cnt ON tok.tk = cnt.tk, tot
    GROUP BY doc_id
    """,
)
def tx_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score: train a unigram language model on the
    corpus (token → relative frequency) and score every document by its
    mean negative log-likelihood — the cheap perplexity proxy data
    pipelines use to flag gibberish (high NLL) and boilerplate (low
    NLL) before a real LM ever runs.

    Scale: the token-frequency "model" is one partial-agg shuffle; the
    scoring join broadcasts nothing data-sized (the vocab is Zipf-small
    relative to the corpus, and AQE picks broadcast only when it fits).
    Everything is JVM expressions — no Python in the per-token path."""
    docs = cat(spark, sf_dir)["documents"]
    tok = docs.select("doc_id", F.explode(tokens()).alias("tk"))
    cnt = tok.groupBy("tk").agg(F.count(F.lit(1)).cast("double").alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    return (
        tok.join(cnt, "tk")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            rnd(F.avg(-F.log(F.col("c") / F.col("n"))), 4).alias("nll"),
        )
    )
