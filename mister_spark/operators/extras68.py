"""Wave 68: sequence-overlap eval, offline bandit replay, segment
migration, and schema drift alerts.

tx_rouge_l brings the LCS-based ROUGE-L metric (the summarization/
paraphrase eval) to document pairs via an Arrow-batched DP kernel;
ml_bandit_replay evaluates a greedy arm-selection policy on logged
data with the replay method — the offline answer to "would the bandit
have beaten what we ran"; ev_segment_migration is the CRM
segment-transition matrix (who moved between spend tiers across
periods); io_schema_drift classifies schema changes between two table
versions into safe / narrowing / breaking — the alert that runs before
a reader breaks at 3am.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

ROUGE_PAIRS_MOD = 25  # doc pairs (d, d+1) with d % 25 == 0
SEG_TIERS = 3


ROUGE_SCHEMA = "d1 long, d2 long, lcs long, n1 long, n2 long"


def _rouge_batches(batches):
    """LCS length per (tokens1, tokens2) pair — O(n·m) DP per pair in
    numpy (docs are ~60 tokens; the kernel is bounded by the pairing,
    not the corpus)."""
    import numpy as np
    import pandas as pd

    def lcs(a, b):
        n, m = len(a), len(b)
        if not n or not m:
            return 0
        prev = np.zeros(m + 1, dtype=np.int32)
        for i in range(1, n + 1):
            cur = np.zeros(m + 1, dtype=np.int32)
            ai = a[i - 1]
            for j in range(1, m + 1):
                if ai == b[j - 1]:
                    cur[j] = prev[j - 1] + 1
                else:
                    cur[j] = max(prev[j], cur[j - 1])
            prev = cur
        return int(prev[m])

    for pdf in batches:
        out = {
            "d1": pdf["d1"].values,
            "d2": pdf["d2"].values,
            "lcs": [lcs(t1, t2) for t1, t2 in zip(pdf["t1"], pdf["t2"])],
            "n1": [len(t) for t in pdf["t1"]],
            "n2": [len(t) for t in pdf["t2"]],
        }
        yield pd.DataFrame(out)


@query(
    "tx_rouge_l",
    # Real oracle: the per-pair LCS DP as an anti-diagonal wavefront
    # recursive CTE (cells on diagonal d = i+j depend only on diagonals
    # d-1/d-2, so each step is one list_transform per pair with no
    # intra-row dependency). All pairs advance in the same recursion;
    # each stops at its own d = n1+n2, where cur[n1+1] is the LCS.
    # Values are small integers, so there is no float drift anywhere
    # before the final ratio round.
    oracle=f"""
    WITH RECURSIVE tok AS (SELECT doc_id, {DUCK_TOKENS} AS toks
                           FROM documents),
    pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
                     a.toks AS t1, b.toks AS t2,
                     CAST(len(a.toks) AS BIGINT) AS n1,
                     CAST(len(b.toks) AS BIGINT) AS n2
              FROM tok a JOIN tok b ON b.doc_id = a.doc_id + 1
              WHERE a.doc_id % {ROUGE_PAIRS_MOD} = 0),
    dp AS (
      SELECT d1, d2, t1, t2, n1, n2, 0 AS d,
             list_transform(range(0, n1 + 1), i -> 0) AS cur,
             list_transform(range(0, n1 + 1), i -> 0) AS prev
      FROM pairs
      UNION ALL
      SELECT d1, d2, t1, t2, n1, n2, d + 1,
             list_transform(range(0, n1 + 1), i ->
               CASE WHEN i >= 1 AND d + 1 - i >= 1 AND d + 1 - i <= n2
                    THEN CASE WHEN t1[i] = t2[d + 1 - i]
                              THEN prev[i] + 1
                              ELSE GREATEST(cur[i], cur[i + 1]) END
                    ELSE 0 END),
             cur
      FROM dp WHERE d < n1 + n2),
    fin AS (SELECT d1, d2, CAST(cur[n1 + 1] AS BIGINT) AS lcs, n1, n2,
                   CAST(cur[n1 + 1] AS DOUBLE) / GREATEST(n1, 1) AS rec,
                   CAST(cur[n1 + 1] AS DOUBLE) / GREATEST(n2, 1) AS prec
            FROM dp WHERE d = n1 + n2)
    SELECT d1, d2, lcs,
           FLOOR(rec * 10000 + 0.5) / 10000 AS rouge_recall,
           FLOOR(prec * 10000 + 0.5) / 10000 AS rouge_precision,
           FLOOR(CASE WHEN rec + prec > 0
                      THEN 2 * rec * prec / (rec + prec)
                      ELSE 0.0 END * 10000 + 0.5) / 10000 AS rouge_f1
    FROM fin ORDER BY d1
    """,
)
def tx_rouge_l(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-L for adjacent document pairs (d, d+1 with d ≡ 0 mod
    {m}): LCS-based recall/precision/F1 over token sequences — the
    order-aware overlap metric for summarization and paraphrase eval
    that Jaccard (order-blind) cannot express. The DP kernel runs as
    an Arrow-batched mapInPandas over pre-joined token-array pairs.

    Scale: pairing is an equi-join on doc_id+1 (no cross join); the
    quadratic DP is per-PAIR, bounded by document length, and
    embarrassingly parallel across pairs."""
    from mister_spark.functions.text import tokens

    docs = cat(spark, sf_dir)["documents"].select(
        "doc_id", tokens().alias("toks")
    )
    a = docs.filter(F.col("doc_id") % ROUGE_PAIRS_MOD == 0).select(
        F.col("doc_id").alias("d1"), F.col("toks").alias("t1")
    )
    b = docs.select(
        (F.col("doc_id") - 1).alias("d1"),
        F.col("doc_id").alias("d2"),
        F.col("toks").alias("t2"),
    )
    pairs = a.join(b, "d1").select("d1", "d2", "t1", "t2")
    r = pairs.mapInPandas(_rouge_batches, schema=ROUGE_SCHEMA)
    lcs, n1, n2 = F.col("lcs"), F.col("n1"), F.col("n2")
    rec = lcs / F.greatest(n1, F.lit(1))
    prec = lcs / F.greatest(n2, F.lit(1))
    return r.select(
        "d1",
        "d2",
        "lcs",
        ratio(rec).alias("rouge_recall"),
        ratio(prec).alias("rouge_precision"),
        ratio(
            F.when(rec + prec > 0, 2 * rec * prec / (rec + prec)).otherwise(0.0)
        ).alias("rouge_f1"),
    ).orderBy("d1")


tx_rouge_l.__doc__ = tx_rouge_l.__doc__.format(m=ROUGE_PAIRS_MOD)


@query(
    "ml_bandit_replay",
    oracle="""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS t,
                      event_type AS arm,
                      CAST(COUNT(*) AS DOUBLE) AS n, SUM(value) AS rew
               FROM events GROUP BY 1, 2),
    c AS (SELECT t, arm, n, rew,
                 SUM(n) OVER (PARTITION BY arm ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS cn,
                 SUM(rew) OVER (PARTITION BY arm ORDER BY t
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS crew
          FROM d),
    m AS (SELECT t, arm, n, rew,
                 CASE WHEN cn > 0 THEN crew / cn ELSE 0 END AS prior_mean
          FROM c),
    pick AS (SELECT t, arm AS policy_arm FROM (
               SELECT t, arm, ROW_NUMBER() OVER (
                 PARTITION BY t
                 ORDER BY FLOOR(prior_mean * 10000 + 0.5) / 10000 DESC, arm)
                 AS rn
               FROM m) WHERE rn = 1),
    day AS (SELECT m.t, SUM(m.rew) / SUM(m.n) AS uniform_mean,
                 MAX(CASE WHEN m.arm = p.policy_arm
                     THEN m.rew / m.n END) AS policy_mean
          FROM m JOIN pick p ON m.t = p.t GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           FLOOR(AVG(policy_mean) * 10000 + 0.5) / 10000 AS policy_reward,
           FLOOR(AVG(uniform_mean) * 10000 + 0.5) / 10000 AS uniform_reward,
           FLOOR((AVG(policy_mean) - AVG(uniform_mean)) * 10000 + 0.5)
             / 10000 AS lift
    FROM day WHERE policy_mean IS NOT NULL
    """,
)
def ml_bandit_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline bandit replay: a greedy policy picks each day's arm
    (event type) by the highest PRIOR cumulative mean reward, and the
    replay scores it with that arm's realized mean reward that day,
    against the uniform-logging baseline. The standard counterfactual
    eval for 'should we deploy the bandit' — no sequential state, the
    prior means are per-arm prefix sums on the day grid.

    Scale: one (day, arm) rollup; windows partition by arm over
    calendar-bounded frames; the daily argmax is a ≤|arms|-row
    window."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias("t"),
        F.col("event_type").alias("arm"),
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("value").alias("rew"),
    )
    wa = W.partitionBy("arm").orderBy("t").rowsBetween(
        W.unboundedPreceding, -1
    )
    m = d.select(
        "t",
        "arm",
        "n",
        "rew",
        F.when(
            F.sum("n").over(wa) > 0,
            F.sum("rew").over(wa) / F.sum("n").over(wa),
        )
        .otherwise(0.0)
        .alias("prior_mean"),
    )
    wd = W.partitionBy("t").orderBy(F.desc("pm"), "arm")
    pick = (
        m.withColumn("pm", ratio(F.col("prior_mean")))
        .withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select("t", F.col("arm").alias("policy_arm"))
    )
    day = (
        m.join(pick, "t")
        .groupBy("t")
        .agg(
            (F.sum("rew") / F.sum("n")).alias("uniform_mean"),
            F.max(
                F.when(
                    F.col("arm") == F.col("policy_arm"),
                    F.col("rew") / F.col("n"),
                )
            ).alias("policy_mean"),
        )
        .filter(F.col("policy_mean").isNotNull())
    )
    return day.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        ratio(F.avg("policy_mean")).alias("policy_reward"),
        ratio(F.avg("uniform_mean")).alias("uniform_reward"),
        ratio(F.avg("policy_mean") - F.avg("uniform_mean")).alias("lift"),
    )


@query(
    "ev_segment_migration",
    oracle=f"""
    WITH e AS (SELECT user_id, value, event_type,
                      date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS dn
               FROM events),
    b AS (SELECT (MIN(dn) + MAX(dn) + 1) // 2 AS mid FROM e),
    u AS (SELECT e.user_id,
                 CASE WHEN e.dn < b.mid THEN 0 ELSE 1 END AS period,
                 SUM(CASE WHEN e.event_type = 'purchase'
                     THEN e.value ELSE 0 END) AS spend
          FROM e CROSS JOIN b GROUP BY 1, 2),
    r AS (SELECT user_id, period,
                 NTILE({SEG_TIERS}) OVER (PARTITION BY period
                   ORDER BY FLOOR(spend * 100 + 0.5) / 100 DESC, user_id)
                   AS tier
          FROM u),
    m AS (SELECT p0.tier AS tier_from, p1.tier AS tier_to,
                 CAST(COUNT(*) AS BIGINT) AS n_users
          FROM r p0 JOIN r p1 ON p0.user_id = p1.user_id
          WHERE p0.period = 0 AND p1.period = 1
          GROUP BY 1, 2)
    SELECT CAST(tier_from AS BIGINT) AS tier_from,
           CAST(tier_to AS BIGINT) AS tier_to, n_users
    FROM m
    """,
)
def ev_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-tier migration matrix: users tier into {t} spend tertiles
    per half-period (rounded-spend order, user_id tiebreak — both
    engines cut identical tiles), and the matrix counts who moved
    where — the churn/upgrade read behind every CRM lifecycle program.

    Scale: user-period rollup, per-period ntile (small-dim exact form;
    the approx-boundary bucket join is the 100 TB path, as
    w_ntile_approx), |tiers|² matrix out."""
    ev = cat(spark, sf_dir)["events"]
    e = ev.select(
        "user_id",
        "value",
        "event_type",
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias("dn"),
    )
    b = e.agg(((F.min("dn") + F.max("dn") + 1) / 2).cast("long").alias("mid"))
    u = (
        e.join(F.broadcast(b))
        .groupBy(
            "user_id", (F.col("dn") >= F.col("mid")).cast("int").alias("period")
        )
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value"))
                .otherwise(0.0)
            ).alias("spend")
        )
    )
    wp = W.partitionBy("period").orderBy(
        F.desc(F.floor(F.col("spend") * 100 + F.lit(0.5)) / 100), "user_id"
    )
    r = u.withColumn("tier", F.ntile(SEG_TIERS).over(wp)).localCheckpoint()
    p0 = r.filter(F.col("period") == 0).select(
        "user_id", F.col("tier").alias("tier_from")
    )
    p1 = r.filter(F.col("period") == 1).select(
        "user_id", F.col("tier").alias("tier_to")
    )
    return (
        p0.join(p1, "user_id")
        .groupBy(
            F.col("tier_from").cast("bigint").alias("tier_from"),
            F.col("tier_to").cast("bigint").alias("tier_to"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


ev_segment_migration.__doc__ = ev_segment_migration.__doc__.format(t=SEG_TIERS)


@query(
    "io_schema_drift",
    # Real oracle: the drift report is a data-independent function of
    # the two planted schema versions — pinned literally.
    oracle="""
    SELECT * FROM (VALUES
      ('o_channel', CAST(NULL AS VARCHAR), 'string', 'added_safe'),
      ('o_custkey', 'bigint', 'int', 'narrowed'),
      ('o_orderkey', 'bigint', 'bigint', 'unchanged'),
      ('o_orderstatus', 'string', CAST(NULL AS VARCHAR),
       'dropped_breaking'),
      ('o_totalprice', 'double', 'double', 'unchanged'))
      t("column", type_v1, type_v2, verdict)
    """,
)
def io_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift alert between two versions of a staged table: v2
    adds a column (safe), drops one (breaking for readers that select
    it), and narrows a type long→int (narrowing). Every change is
    classified the way a catalog's schema-compatibility check would —
    the alert that runs at publish time, not at 3am in a reader.

    Scale: pure schema metadata, O(columns)."""
    import os
    import uuid

    from mister_spark.sources.staged import REPO_TMP

    orders = cat(spark, sf_dir)["orders"]
    v1 = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    v2 = orders.select(
        "o_orderkey",
        F.col("o_custkey").cast("int").alias("o_custkey"),  # narrowed
        "o_totalprice",
        F.lit("web").alias("o_channel"),  # added
        # o_orderstatus dropped
    )
    base = os.path.join(REPO_TMP, f"drift_{uuid.uuid4().hex[:8]}")
    v1.limit(10).write.mode("overwrite").parquet(f"{base}/v1")
    v2.limit(10).write.mode("overwrite").parquet(f"{base}/v2")
    s1 = {f.name: f.dataType.simpleString()
          for f in spark.read.parquet(f"{base}/v1").schema.fields}
    s2 = {f.name: f.dataType.simpleString()
          for f in spark.read.parquet(f"{base}/v2").schema.fields}
    widening = {("int", "bigint"), ("float", "double"), ("int", "double")}
    rows = []
    for col in sorted(set(s1) | set(s2)):
        if col not in s1:
            rows.append((col, None, s2[col], "added_safe"))
        elif col not in s2:
            rows.append((col, s1[col], None, "dropped_breaking"))
        elif s1[col] == s2[col]:
            rows.append((col, s1[col], s2[col], "unchanged"))
        elif (s2[col], s1[col]) in widening:
            rows.append((col, s1[col], s2[col], "narrowed"))
        elif (s1[col], s2[col]) in widening:
            rows.append((col, s1[col], s2[col], "widened_safe"))
        else:
            rows.append((col, s1[col], s2[col], "type_changed_breaking"))
    return spark.createDataFrame(
        rows, "column string, type_v1 string, type_v2 string, verdict string"
    ).orderBy("column")
