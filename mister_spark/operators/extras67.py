"""Wave 67: MR side inputs, game-theoretic attribution, dedup
explainability, and metadata-only queries.

mr_broadcast_side_input is mister's 'distributed cache' pattern done
the Spark way (a broadcast lookup joined into the map phase);
ev_shapley_attribution replaces last-touch heuristics with the exact
Shapley value over channel exposure sets (driver combinatorics are
O(2^k·k) on an aggregated 32-row game, never row-level);
dd_pair_explain answers "WHY was this pair flagged" with the overlap
evidence reviewers actually read; io_metadata_count demonstrates the
metadata-only fast path (row counts from parquet footers, zero data
scan) and proves it against the real scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens, trigrams
from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

SHAP_CONV = "purchase"
EXPLAIN_TOP = 15


@query(
    "mr_broadcast_side_input",
    oracle="""
    WITH n AS (SELECT n_nationkey, n_name FROM nation),
    c AS (SELECT c_nationkey, c_acctbal FROM customer)
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           FLOOR(SUM(c.c_acctbal) * 100 + 0.5) / 100 AS total_balance
    FROM c JOIN n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def mr_broadcast_side_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mister's 'distributed cache' (side data shipped to every map
    worker) re-expressed the Spark way: the nation lookup is a
    BROADCAST join into the fact scan — same semantics as stuffing a
    dict into every worker, but planned, spillable, and visible to the
    optimizer. The class-API map phase never sees a network call.

    Scale: the fact side streams; the lookup rides the broadcast.
    This is the pattern for every ≤10 MB reference table at 100 TB."""
    c = cat(spark, sf_dir)
    nation = c["nation"].select("n_nationkey", "n_name")
    cust = c["customer"].select("c_nationkey", "c_acctbal")
    return (
        cust.join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            money(F.sum("c_acctbal")).alias("total_balance"),
        )
    )


def shapley_game(spark: SparkSession, sf_dir: str):
    """Aggregate the per-user (exposure set, converted) rows into the
    coalition game v(S) = conversions among users whose exposure set
    is exactly S. Distributed part of ev_shapley_attribution."""
    ev = cat(spark, sf_dir)["events"]
    u = ev.groupBy("user_id").agg(
        F.sort_array(
            F.array_distinct(
                F.collect_list(
                    F.when(
                        F.col("event_type") != SHAP_CONV, F.col("event_type")
                    )
                )
            )
        ).alias("chans"),
        F.max((F.col("event_type") == SHAP_CONV).cast("int")).alias("conv"),
    )
    g = u.groupBy("chans").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("conv").cast("bigint").alias("n_conv"),
    )
    return g.collect()


@query(
    "ev_shapley_attribution",
    # Real oracle: channels get bit positions, coalitions are the
    # 2^k masks, v(S) sums conversions of exposure masks ⊆ S (bitwise
    # AND containment), and each channel's exact Shapley value is the
    # weighted marginal sum over the masks excluding its bit —
    # factorial() and bit_count() do the combinatorics.
    oracle=f"""
    WITH uu AS (
      SELECT user_id,
             list_sort(list_distinct(
               COALESCE(list(event_type)
                          FILTER (WHERE event_type <> '{SHAP_CONV}'), [])))
               AS chans,
             MAX(CASE WHEN event_type = '{SHAP_CONV}' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY user_id),
    g AS (SELECT chans, CAST(SUM(conv) AS DOUBLE) AS n_conv
          FROM uu GROUP BY chans),
    chidx AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS i FROM (
                SELECT DISTINCT unnest(chans) AS c FROM g)),
    kk AS (SELECT CAST(COUNT(*) AS INT) AS k FROM chidx),
    gm AS (SELECT g.n_conv,
                  COALESCE((SELECT SUM(1 << (ci.i - 1))
                            FROM chidx ci
                            WHERE list_contains(g.chans, ci.c)), 0) AS mask
           FROM g),
    allm AS (SELECT unnest(generate_series(0, (1 << k) - 1)) AS smask
             FROM kk),
    vs AS (SELECT a.smask,
                  COALESCE(SUM(CASE WHEN (m.mask & a.smask) = m.mask
                                    THEN m.n_conv END), 0.0) AS v
           FROM allm a CROSS JOIN gm m GROUP BY a.smask),
    shap AS (SELECT c.c AS channel,
                    SUM(CAST(factorial(bit_count(CAST(s.smask AS BIGINT)))
                             AS DOUBLE)
                        * CAST(factorial(kk.k - bit_count(CAST(s.smask
                                                          AS BIGINT)) - 1)
                               AS DOUBLE)
                        / CAST(factorial(kk.k) AS DOUBLE)
                        * (v1.v - v0.v)) AS sv
             FROM chidx c
             CROSS JOIN kk
             JOIN allm s ON (s.smask & (1 << (c.i - 1))) = 0
             JOIN vs v0 ON v0.smask = s.smask
             JOIN vs v1 ON v1.smask = (s.smask | (1 << (c.i - 1)))
             GROUP BY c.c),
    grand AS (SELECT v FROM vs CROSS JOIN kk
              WHERE smask = (1 << k) - 1)
    SELECT channel,
           FLOOR(sv * 10000 + 0.5) / 10000 AS shapley_conversions,
           FLOOR(CASE WHEN gr.v <> 0 THEN sv / gr.v ELSE 0.0 END
                 * 10000 + 0.5) / 10000 AS credit_share
    FROM shap CROSS JOIN grand gr
    """,
)
def ev_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value channel attribution: users' non-conversion
    event types form exposure coalitions, the game value v(S) is the
    conversion count of users exposed to a SUBSET of S (cumulative
    reach), and each channel's credit is its exact Shapley value —
    the provably-fair split last-touch and linear rules approximate.

    Scale: the data collapses to ≤2^k (exposure set → conversions)
    rows in one shuffle (k = 4 channels here); the Shapley sum is
    O(2^k·k) driver arithmetic on that aggregate — model-sized, like
    every *_train driver loop in this repo."""
    import math

    from itertools import combinations

    cells = shapley_game(spark, sf_dir)
    chans = sorted({c for r in cells for c in r["chans"]})
    k = len(chans)
    conv_by_set = {tuple(r["chans"]): r["n_conv"] for r in cells}

    def v(S: frozenset) -> float:
        # cumulative reach: conversions of users whose exposure ⊆ S
        return float(
            sum(
                n
                for s, n in conv_by_set.items()
                if set(s) <= S
            )
        )

    shap = {}
    for c in chans:
        others = [x for x in chans if x != c]
        total = 0.0
        for r in range(len(others) + 1):
            for S in combinations(others, r):
                Sf = frozenset(S)
                w = (
                    math.factorial(len(S))
                    * math.factorial(k - len(S) - 1)
                    / math.factorial(k)
                )
                total += w * (v(Sf | {c}) - v(Sf))
        shap[c] = total
    grand = v(frozenset(chans))
    rows = [
        (
            c,
            math.floor(shap[c] * 10000 + 0.5) / 10000,
            math.floor((shap[c] / grand if grand else 0.0) * 10000 + 0.5)
            / 10000,
        )
        for c in chans
    ]
    return spark.createDataFrame(
        rows, "channel string, shapley_conversions double, credit_share double"
    ).orderBy("channel")


@query(
    "dd_pair_explain",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct(list_transform(
                      generate_series(1, len(toks) - 2),
                      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
                    AS gs
           FROM t WHERE len(toks) >= 3),
    e AS (SELECT doc_id, unnest(gs) AS g FROM sh),
    sz AS (SELECT doc_id, CAST(len(gs) AS DOUBLE) AS n FROM sh),
    p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
                 CAST(COUNT(*) AS DOUBLE) AS inter
          FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
    x AS (SELECT p.d1, p.d2, p.inter, s1.n AS n1, s2.n AS n2,
                 p.inter / (s1.n + s2.n - p.inter) AS jac
          FROM p JOIN sz s1 ON p.d1 = s1.doc_id
                JOIN sz s2 ON p.d2 = s2.doc_id),
    top AS (SELECT *, ROW_NUMBER() OVER (
              ORDER BY FLOOR(jac * 10000 + 0.5) / 10000 DESC, d1, d2) AS rn
            FROM x)
    SELECT d1, d2,
           CAST(inter AS BIGINT) AS common_shingles,
           FLOOR(jac * 10000 + 0.5) / 10000 AS jaccard,
           FLOOR(inter / n1 * 10000 + 0.5) / 10000 AS contain_1in2,
           FLOOR(inter / n2 * 10000 + 0.5) / 10000 AS contain_2in1,
           FLOOR(LEAST(n1, n2) / GREATEST(n1, n2) * 10000 + 0.5) / 10000
             AS size_ratio
    FROM top WHERE rn <= {EXPLAIN_TOP}
    """,
)
def dd_pair_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup explainability: for the {n} most-similar document pairs,
    the evidence a reviewer reads — common shingle count, Jaccard,
    BOTH containments (asymmetric containment separates 'excerpt' from
    'near-copy'), and the size ratio. dd_minhash_lsh says WHICH pairs;
    this says WHY.

    Scale: the pair generation is the capped inverted-index join every
    dd_* op uses (hot-shingle-capped at production scale); evidence
    columns are arithmetic on the pair aggregates, no re-tokenization."""
    docs = cat(spark, sf_dir)["documents"]
    sh = (
        docs.select("doc_id", tokens().alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("doc_id", F.array_distinct(trigrams(F.col("toks"))).alias("gs"))
        .localCheckpoint()
    )
    e = sh.select("doc_id", F.explode("gs").alias("g"))
    sz = sh.select("doc_id", F.size("gs").cast("double").alias("n"))
    a = e.select(F.col("doc_id").alias("d1"), "g")
    b = e.select(F.col("doc_id").alias("d2"), "g")
    p = (
        a.join(b, "g")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).cast("double").alias("inter"))
    )
    x = (
        p.join(F.broadcast(sz.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1")), "d1")
        .join(F.broadcast(sz.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2")), "d2")
        .withColumn(
            "jac",
            F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")),
        )
    )
    from pyspark.sql import Window as W

    wr = W.orderBy(F.desc("jacr"), "d1", "d2")
    return (
        x.withColumn("jacr", ratio(F.col("jac")))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= EXPLAIN_TOP)
        .select(
            "d1",
            "d2",
            F.col("inter").cast("bigint").alias("common_shingles"),
            F.col("jacr").alias("jaccard"),
            ratio(F.col("inter") / F.col("n1")).alias("contain_1in2"),
            ratio(F.col("inter") / F.col("n2")).alias("contain_2in1"),
            ratio(
                F.least("n1", "n2") / F.greatest("n1", "n2")
            ).alias("size_ratio"),
        )
    )


dd_pair_explain.__doc__ = dd_pair_explain.__doc__.format(n=EXPLAIN_TOP)


@query(
    "io_metadata_count",
    oracle="""
    SELECT 'lineitem' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_rows_meta,
           CAST(1 AS BIGINT) AS agree
    FROM lineitem
    """,
)
def io_metadata_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only row count: read the answer from the parquet
    FOOTERS (pyarrow num_rows, zero data pages touched) next to the
    actual scan count, with the agreement bit — the fast path a
    catalog answers COUNT(*) from, and the audit that it's safe to.

    Scale: the footer path is O(files) metadata; the scan path exists
    here only as the proof. (Spark itself plans COUNT(*) over parquet
    as a metadata-only scan when no filter survives — this op makes
    the equivalence testable.)"""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "lineitem.parquet")
    files = (
        [os.path.join(path, f) for f in sorted(os.listdir(path))
         if f.endswith(".parquet")]
        if os.path.isdir(path)
        else [path]
    )
    meta_rows = sum(pq.ParquetFile(fp).metadata.num_rows for fp in files)
    scan = cat(spark, sf_dir)["lineitem"].count()
    return spark.createDataFrame(
        [("lineitem", int(scan), int(meta_rows), int(scan == meta_rows))],
        "tbl string, n_rows long, n_rows_meta long, agree long",
    )
