"""Wave 186: distribution distance, cross-source novelty, and
two-sample energy distance.

stat_wasserstein_1d is the
earth-mover drift metric between two value distributions — the
standard replacement for KS when the SIZE of the shift matters, not
just its existence. tx_ngram_novelty measures what share of each
source's n-grams appear nowhere else — the redundancy/contamination
signal that says whether a new feed adds content or re-crawls the
corpus. stat_energy_distance is the multivariate two-sample test over
embedding vectors (Szekely & Rizzo's E-statistic, public literature)
on deterministic hash-capped samples, so the pair space is
model-bounded at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import DUCK_TOKENS, cat, rnd, tokens
from mister_spark.registry import query

W1_BUCKETS = 32  # two-phase prefix-sum buckets for the ECDF frame
ENERGY_CAP = 200  # per-group deterministic sample cap (md5 order)


@query(
    "stat_wasserstein_1d",
    # Real oracle: W1 = integral |F1-F2| dx over the merged distinct
    # values. The cumulative counts are INTEGERS, so each term
    # |F1-F2|*(next_v - v) is bit-identical across engines (same ints,
    # same IEEE divisions); only the final summation order differs
    # (~1e-13), far inside the 1e-4 grid.
    oracle="""
    WITH e AS (SELECT value,
                      CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
               FROM events WHERE event_type IN ('click', 'view')),
    n AS (SELECT CAST(SUM(g) AS DOUBLE) AS n1,
                 CAST(SUM(1 - g) AS DOUBLE) AS n2 FROM e),
    c AS (SELECT value AS v, CAST(SUM(g) AS BIGINT) AS c1,
                 CAST(SUM(1 - g) AS BIGINT) AS c2
          FROM e GROUP BY 1),
    f AS (SELECT v,
                 SUM(c1) OVER (ORDER BY v) AS k1,
                 SUM(c2) OVER (ORDER BY v) AS k2,
                 LEAD(v) OVER (ORDER BY v) AS nxt
          FROM c)
    SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS distinct_values,
           FLOOR(SUM(ABS(k1 / n.n1 - k2 / n.n2)
                     * (COALESCE(nxt, v) - v)) * 10000 + 0.5) / 10000
             AS w1
    FROM f CROSS JOIN n GROUP BY n.n1, n.n2
    """,
)
def stat_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein (earth-mover) distance between click and view
    event-value distributions: W1 = integral |F1 - F2| dx, computed
    exactly over the merged distinct-value grid. KS answers "did the
    distribution move"; W1 answers "by how much" in value units — the
    drift metric monitoring actually pages on.

    Scale: one collapse to |distinct values| rows, then the two-phase
    bucketed prefix-sum (approx-percentile range buckets, parallel
    within-bucket windows, an O(buckets) carry — the stat_ks_test
    pattern) extended with a bucket-local LEAD whose last-row gap comes
    from the next bucket's broadcast min — NO global single-task sort
    anywhere, identical numbers to the global window."""
    ev = cat(spark, sf_dir)["events"].filter(
        F.col("event_type").isin("click", "view")
    )
    g = (F.col("event_type") == "click").cast("long")
    c = (
        ev.select(F.col("value").alias("v"), g.alias("g"))
        .groupBy("v")
        .agg(
            F.sum("g").cast("bigint").alias("c1"),
            F.sum(1 - F.col("g")).cast("bigint").alias("c2"),
        )
        .localCheckpoint()  # feeds buckets, totals and the count
    )
    n1 = c.agg(F.sum("c1")).collect()[0][0]
    n2 = c.agg(F.sum("c2")).collect()[0][0]
    m = c.count()
    fracs = [i / W1_BUCKETS for i in range(1, W1_BUCKETS)]
    bounds = c.agg(F.percentile_approx("v", fracs, 10000).alias("_bs"))
    bucket = F.aggregate(
        F.col("_bs"),
        F.lit(0),
        lambda acc, b: acc + F.when(F.col("v") > b, 1).otherwise(0),
    )
    b = c.crossJoin(F.broadcast(bounds)).withColumn("_b", bucket).drop("_bs")
    w_in = W.partitionBy("_b").orderBy("v")
    cum = b.select(
        "_b",
        "v",
        F.sum("c1").over(w_in.rowsBetween(W.unboundedPreceding, 0)).alias(
            "k1"
        ),
        F.sum("c2").over(w_in.rowsBetween(W.unboundedPreceding, 0)).alias(
            "k2"
        ),
        F.lead("v").over(w_in).alias("nxt_in"),
    )
    tot = b.groupBy("_b").agg(
        F.sum("c1").alias("t1"),
        F.sum("c2").alias("t2"),
        F.min("v").alias("vmin"),
    )
    w_b = W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
    offs = tot.select(
        "_b",
        F.coalesce(F.sum("t1").over(w_b), F.lit(0)).alias("o1"),
        F.coalesce(F.sum("t2").over(w_b), F.lit(0)).alias("o2"),
    )
    # each non-empty bucket's cross-bucket gap target is the NEXT
    # NON-EMPTY bucket's min value — tot holds only non-empty buckets,
    # so a lead over its O(buckets) rows skips empties (a duplicate
    # percentile boundary can leave a bucket index unpopulated; a
    # fixed "_b + 1" join would drop the gap spanning it)
    nxt_bucket = tot.select(
        "_b", F.lead("vmin").over(W.orderBy("_b")).alias("vnext")
    )
    term = (
        cum.join(F.broadcast(offs), "_b")
        .join(F.broadcast(nxt_bucket), "_b", "left")
        .select(
            (
                F.abs(
                    (F.col("k1") + F.col("o1")) / F.lit(float(n1))
                    - (F.col("k2") + F.col("o2")) / F.lit(float(n2))
                )
                * (
                    F.coalesce(F.col("nxt_in"), F.col("vnext"), F.col("v"))
                    - F.col("v")
                )
            ).alias("t")
        )
    )
    import math

    w1 = float(term.agg(F.sum("t")).collect()[0][0])
    return spark.createDataFrame(
        [(int(n1), int(n2), int(m), math.floor(w1 * 10000 + 0.5) / 10000)],
        "n1 bigint, n2 bigint, distinct_values bigint, w1 double",
    )


@query(
    "tx_ngram_novelty",
    # Real oracle: distinct-shingle set algebra per source — integer
    # counts and one integer-ratio division, no float path.
    oracle=f"""
    WITH tk AS (SELECT doc_id, source, {DUCK_TOKENS} AS ts
                FROM documents),
    sg AS (SELECT DISTINCT source, g FROM (
             SELECT source,
                    UNNEST(list_transform(
                      generate_series(1, len(ts) - 2),
                      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
             FROM tk)),
    spread AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS nsrc
               FROM sg GROUP BY g)
    SELECT sg.source,
           CAST(COUNT(*) AS BIGINT) AS distinct_ngrams,
           CAST(SUM(CASE WHEN spread.nsrc = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS novel_ngrams,
           FLOOR(SUM(CASE WHEN spread.nsrc = 1 THEN 1.0 ELSE 0.0 END)
                 / COUNT(*) * 10000 + 0.5) / 10000 AS novelty_share
    FROM sg JOIN spread USING (g)
    GROUP BY sg.source ORDER BY sg.source
    """,
)
def tx_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source n-gram novelty: per source, the share of its
    distinct 3-grams that appear in NO other source. A new feed whose
    novelty share is near zero re-crawls what the corpus already has
    (pay for dedup, gain no content); near one, it is genuinely new
    distribution. The complement of tx_source_vocab_overlap at the
    phrase level, and the cheap screen run before any per-pair dedup.

    Scale: ONE shingle-keyed exchange — collect_set(source) per
    hashed shingle dedupes (source, shingle) map-side AND yields the
    source-spread in the same pass (the former shape paid a distinct
    exchange, a second by-shingle exchange, a checkpoint, and a
    join-back of the spread) — then an explode back to (source,
    novel-flag) rows feeding one map-side-combinable source rollup.
    Shingles ride as xxhash64 ids so the exchange carries longs, not
    ~40-char strings (grouping modulo 2^-64 collision odds, the
    dd_exact argument). Integer arithmetic end to end."""
    from mister_spark.functions.text import hashed_shingles

    docs = cat(spark, sf_dir)["documents"]
    # hashed_shingles: 3-gram ids from hashed tokens (no per-shingle
    # string alloc + string hash — same grouping modulo 2^-64 collision
    # odds as the former xxhash64(string))
    spread = (
        docs.select(
            "source", F.explode(hashed_shingles(tokens())).alias("sid")
        )
        .groupBy("sid")
        .agg(F.collect_set("source").alias("srcs"))
        .select(
            F.explode("srcs").alias("source"),
            (F.size("srcs") == 1).cast("long").alias("novel"),
        )
    )
    return (
        spread.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("distinct_ngrams"),
            F.sum("novel").cast("bigint").alias("novel_ngrams"),
            (
                F.floor(
                    F.sum(F.col("novel").cast("double"))
                    / F.count(F.lit(1))
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("novelty_share"),
        )
        .orderBy("source")
    )


@query(
    "stat_energy_distance",
    # Real oracle: the md5-ordered sample caps are cross-engine
    # (bigint -> string -> md5), every pairwise euclidean distance is
    # bit-identical (same per-dimension fold order, same IEEE sqrt),
    # and only the final O(cap^2) summation order differs (~1e-12 on
    # the 1e-4 grid).
    oracle=f"""
    WITH lab AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                        CASE WHEN label < 5 THEN 1 ELSE 0 END AS grp,
                        md5(CAST(vec_id AS VARCHAR)) AS h
                 FROM embeddings),
    s1 AS (SELECT vec_id, v FROM lab WHERE grp = 1
           ORDER BY h, vec_id LIMIT {ENERGY_CAP}),
    s2 AS (SELECT vec_id, v FROM lab WHERE grp = 0
           ORDER BY h, vec_id LIMIT {ENERGY_CAP}),
    nn AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM s1) AS n1,
                  (SELECT CAST(COUNT(*) AS DOUBLE) FROM s2) AS n2),
    dxy AS (SELECT SUM(SQRT(list_aggregate(list_transform(range(1, 65),
                     i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])),
                     'sum'))) AS s
            FROM s1 a, s2 b),
    dxx AS (SELECT COALESCE(SUM(SQRT(list_aggregate(list_transform(
                     range(1, 65),
                     i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])),
                     'sum'))), 0.0) AS s
            FROM s1 a, s1 b),
    dyy AS (SELECT COALESCE(SUM(SQRT(list_aggregate(list_transform(
                     range(1, 65),
                     i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])),
                     'sum'))), 0.0) AS s
            FROM s2 a, s2 b)
    SELECT CAST(nn.n1 AS BIGINT) AS n1, CAST(nn.n2 AS BIGINT) AS n2,
           FLOOR(dxy.s / (nn.n1 * nn.n2) * 10000 + 0.5) / 10000
             AS mean_cross,
           FLOOR(dxx.s / (nn.n1 * nn.n1) * 10000 + 0.5) / 10000
             AS mean_within_1,
           FLOOR(dyy.s / (nn.n2 * nn.n2) * 10000 + 0.5) / 10000
             AS mean_within_2,
           FLOOR((2 * dxy.s / (nn.n1 * nn.n2) - dxx.s / (nn.n1 * nn.n1)
                  - dyy.s / (nn.n2 * nn.n2)) * 10000 + 0.5) / 10000
             AS energy_distance
    FROM nn, dxy, dxx, dyy
    """,
)
def stat_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample ENERGY DISTANCE between embedding groups (label < 5
    vs the rest): E = 2·E|X−Y| − E|X−X'| − E|Y−Y'| over euclidean
    distances (Szekely & Rizzo's E-statistic; zero iff the
    distributions match). The multivariate two-sample test that sees
    mean AND shape shifts where per-dimension KS screens miss joint
    structure.

    Scale: both groups are capped to {cap} rows by deterministic md5
    order BEFORE any pairing, so the three pair joins are O(cap^2) —
    model-bounded at any corpus size — and broadcast (each side is a
    {cap}-row frame); distances are JVM zip_with/aggregate expressions,
    no Python. The cap is the documented estimator contract (a fixed-
    budget subsample estimate, the standard production trade for
    pairwise statistics)."""
    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        # mirror the oracle's CASE WHEN exactly: a NULL label buckets
        # into group 0, whereas (label < 5).cast('int') would yield
        # NULL and silently drop the row from both groups
        F.when(F.col("label") < 5, 1).otherwise(0).alias("grp"),
        F.md5(F.col("vec_id").cast("string")).alias("h"),
    )

    def cap(grp: int) -> DataFrame:
        return (
            emb.filter(F.col("grp") == grp)
            .orderBy("h", "vec_id")
            .limit(ENERGY_CAP)
            .select("vec_id", "v")
            .localCheckpoint()  # each sample feeds two pair joins
        )

    s1, s2 = cap(1), cap(0)
    n1 = s1.count()
    n2 = s2.count()

    def pair_sum(a: DataFrame, b: DataFrame) -> float:
        d = F.sqrt(
            F.aggregate(
                F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        out = (
            a.select(F.col("v").alias("va"))
            .crossJoin(F.broadcast(b.select(F.col("v").alias("vb"))))
            .agg(F.sum(d))
            .collect()[0][0]
        )
        return float(out or 0.0)

    sxy = pair_sum(s1, s2)
    sxx = pair_sum(s1, s1)
    syy = pair_sum(s2, s2)
    import math

    mc = sxy / (n1 * n2)
    m1 = sxx / (n1 * n1)
    m2 = syy / (n2 * n2)
    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
    return spark.createDataFrame(
        [(n1, n2, r4(mc), r4(m1), r4(m2), r4(2 * mc - m1 - m2))],
        "n1 bigint, n2 bigint, mean_cross double, mean_within_1 double, "
        "mean_within_2 double, energy_distance double",
    )


stat_energy_distance.__doc__ = stat_energy_distance.__doc__.format(
    cap=ENERGY_CAP
)
