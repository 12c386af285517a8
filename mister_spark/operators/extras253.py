"""Wave 253: readability scoring, long-memory detection, median tests.

tx_flesch scores every document's Flesch reading ease and
Flesch-Kincaid grade from pure JVM-side regex counts (sentences by
terminal punctuation, syllables by vowel-group runs, min 1 per word) —
the classic readability gate a curation pipeline thresholds on, joining
tx_gopher_quality's repetition/length screens with a
comprehension-difficulty axis. ev_hurst estimates each event type's
Hurst exponent by rescaled-range (R/S) analysis over dyadic block sizes
on the gap-filled daily count series: H ≈ 0.5 is memoryless, H > 0.5
long-range persistent (bursts beget bursts — capacity planning must
size for runs, not days), H < 0.5 mean-reverting. stat_moods_median
runs Mood's median test across the five event types' values: counts
above/below the exact grand median per type and the k×2 chi-square —
the nonparametric 'same location?' screen that, unlike
stat_kruskal_wallis's rank sums, is robust to arbitrary tail shapes
because it only ever looks at one order statistic.

Exactness: words/sentences/syllables and above/below counts are
integers; the grand median is an exact order-statistic pick via the
two-phase prefix-sum machinery; R/S block moments divide identical
operands; outputs round on the 1e-4 grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

HURST_BLOCKS = (8, 16, 32, 64)


@query(
    "tx_flesch",
    # Real oracle: the identical regex counts — whitespace words,
    # [.!?]+ sentence splits (blank fragments dropped, min 1), per-word
    # [aeiouy]+ vowel-group runs (min 1 syllable) — then the two
    # closed-form readability scores.
    oracle=f"""
    WITH counts AS (
      SELECT doc_id,
             CAST(len({DUCK_TOKENS}) AS BIGINT) AS w,
             CAST(GREATEST(1, len(list_filter(
                    string_split_regex(text, '[.!?]+'),
                    s -> trim(s) <> ''))) AS BIGINT) AS sents,
             CAST(list_sum(list_transform({DUCK_TOKENS},
                    t -> GREATEST(1, len(regexp_extract_all(lower(t),
                                         '[aeiouy]+')))))
                  AS BIGINT) AS syl
      FROM documents)
    SELECT doc_id, w AS n_words, sents AS n_sentences, syl AS n_syllables,
           FLOOR((206.835 - 1.015 * (CAST(w AS DOUBLE) / sents)
                  - 84.6 * (CAST(syl AS DOUBLE) / w)) * 10000 + 0.5)
             / 10000 AS flesch_ease,
           FLOOR((0.39 * (CAST(w AS DOUBLE) / sents)
                  + 11.8 * (CAST(syl AS DOUBLE) / w) - 15.59)
                 * 10000 + 0.5) / 10000 AS fk_grade
    FROM counts WHERE w > 0
    ORDER BY doc_id
    """,
)
def tx_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease + Flesch–Kincaid grade per document from
    pure JVM regex counts: words (whitespace tokens), sentences
    ([.!?]+ splits with blank fragments dropped, floor 1), syllables
    (per-word [aeiouy]+ vowel-group runs, floor 1 — the standard
    heuristic). Ease below ~50 reads as college-level prose; a
    curation pipeline thresholds here the way it thresholds
    tx_gopher_quality, but on comprehension difficulty instead of
    degeneracy.

    Scale: one map-side projection per document — no joins, no
    shuffles beyond the output sort; every count is a higher-order
    array expression inside whole-stage codegen (no Python in the
    per-token path)."""
    docs = cat(spark, sf_dir)["documents"]
    toks = tokens()
    w = F.size(toks).cast("bigint")
    sents = F.greatest(
        F.lit(1),
        F.size(
            F.filter(
                F.split(F.col("text"), "[.!?]+"),
                lambda s: F.trim(s) != F.lit(""),
            )
        ),
    ).cast("bigint")
    syl = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc
        + F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(F.lower(t), F.lit("[aeiouy]+"), 0)),
        ).cast("bigint"),
    )
    base = docs.select(
        "doc_id",
        w.alias("n_words"),
        sents.alias("n_sentences"),
        syl.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return base.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        rnd(F.lit(206.835) - 1.015 * wps - 84.6 * spw, 4).alias(
            "flesch_ease"
        ),
        rnd(F.lit(0.39) * wps + 11.8 * spw - 15.59, 4).alias("fk_grade"),
    ).orderBy("doc_id")


@query(
    "ev_hurst",
    # Real oracle: identical gap-filled day spine, identical dyadic
    # blocks (full blocks only), per-block cumulative-deviation range
    # over population std, log-log OLS slope across block sizes.
    oracle=f"""
    WITH daily AS (SELECT event_type,
                          CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                          CAST(COUNT(*) AS DOUBLE) AS y
                   FROM events GROUP BY 1, 2),
    bounds AS (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
               FROM daily GROUP BY 1),
    spine AS (SELECT b.event_type,
                     unnest(generate_series(b.d0, b.d1)) AS day
              FROM bounds b),
    g AS (SELECT s.event_type, s.day - b.d0 AS i, COALESCE(d.y, 0.0) AS y
          FROM spine s
          JOIN bounds b ON b.event_type = s.event_type
          LEFT JOIN daily d ON d.event_type = s.event_type
                           AND d.day = s.day),
    sizes AS (SELECT unnest(ARRAY{list(HURST_BLOCKS)}) AS bn),
    blk AS (SELECT g.event_type, z.bn, g.i // z.bn AS b, g.i, g.y,
                   SUM(g.y) OVER (PARTITION BY g.event_type, z.bn,
                                  g.i // z.bn ORDER BY g.i) AS cy,
                   ROW_NUMBER() OVER (PARTITION BY g.event_type, z.bn,
                                      g.i // z.bn ORDER BY g.i) AS j
            FROM g CROSS JOIN sizes z),
    bm AS (SELECT event_type, bn, b,
                  CAST(COUNT(*) AS BIGINT) AS m,
                  SUM(y) AS s, SUM(y * y) AS s2
           FROM blk GROUP BY 1, 2, 3),
    dev AS (SELECT k.event_type, k.bn, k.b,
                   MAX(k.cy - k.j * (m.s / m.m))
                   - MIN(k.cy - k.j * (m.s / m.m)) AS rng,
                   SQRT((m.s2 - m.s * m.s / m.m) / m.m) AS sd
            FROM blk k JOIN bm m ON m.event_type = k.event_type
                                AND m.bn = k.bn AND m.b = k.b
            WHERE m.m = k.bn
            GROUP BY k.event_type, k.bn, k.b, m.s, m.m, m.s2),
    rs AS (SELECT event_type, bn, AVG(rng / sd) AS rsbar,
                  CAST(COUNT(*) AS BIGINT) AS nblk
           FROM dev WHERE sd > 0 GROUP BY 1, 2),
    fit AS (SELECT event_type,
                   CAST(COUNT(*) AS DOUBLE) AS k,
                   SUM(LN(CAST(bn AS DOUBLE))) AS sx,
                   SUM(LN(rsbar)) AS sy,
                   SUM(LN(CAST(bn AS DOUBLE)) * LN(rsbar)) AS sxy,
                   SUM(LN(CAST(bn AS DOUBLE)) * LN(CAST(bn AS DOUBLE)))
                     AS sxx
            FROM rs GROUP BY 1)
    SELECT event_type,
           FLOOR((sxy - sx * sy / k) / (sxx - sx * sx / k) * 10000 + 0.5)
             / 10000 AS hurst,
           CAST(k AS BIGINT) AS n_block_sizes
    FROM fit ORDER BY event_type
    """,
)
def ev_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent per event type by rescaled-range analysis: on
    the gap-filled daily count series, split into dyadic blocks
    (n = {b}), per block compute R/S = (range of cumulative deviations
    from the block mean) / population std, average per size, and fit
    ln(R/S) ~ H·ln(n). H ≈ 0.5 is a memoryless series; H > 0.5 means
    bursts beget bursts (size capacity for RUNS of hot days, not
    independent days); H < 0.5 mean-reverts. The long-memory
    diagnostic ev_autocorr's fixed-lag view can't see.

    Scale: one daily rollup shuffle (map-combinable); everything
    after rides the calendar-bounded (type, day) spine × 4 block
    sizes — the cumulative windows are partitioned per (type, size,
    block), never global."""
    sizes = spark.createDataFrame(
        [(b,) for b in HURST_BLOCKS], "bn long"
    )
    _KALMAN_DAILY = """
        SELECT event_type,
               CAST(unix_micros(ts) div 86400000000 AS BIGINT) AS day,
               CAST(COUNT(*) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2
    """
    cat(spark, sf_dir)["events"].createOrReplaceTempView("events")
    daily = spark.sql(_KALMAN_DAILY)
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "event_type",
        "d0",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    g = (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            (F.col("day") - F.col("d0")).alias("i"),
            F.coalesce(F.col("y"), F.lit(0.0)).alias("y"),
        )
        .localCheckpoint()
    )
    blk = g.crossJoin(F.broadcast(sizes)).withColumn(
        "b", F.expr("i div bn")
    )
    w_c = W.partitionBy("event_type", "bn", "b").orderBy("i")
    blk = blk.withColumn("cy", F.sum("y").over(w_c)).withColumn(
        "j", F.row_number().over(w_c)
    ).localCheckpoint()
    bm = blk.groupBy("event_type", "bn", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
    )
    dev = (
        blk.join(bm, ["event_type", "bn", "b"])
        .filter(F.col("m") == F.col("bn"))
        .groupBy("event_type", "bn", "b", "s", "m", "s2")
        .agg(
            (
                F.max(F.col("cy") - F.col("j") * (F.col("s") / F.col("m")))
                - F.min(F.col("cy") - F.col("j") * (F.col("s") / F.col("m")))
            ).alias("rng")
        )
        .withColumn(
            "sd",
            F.sqrt(
                (F.col("s2") - F.col("s") * F.col("s") / F.col("m"))
                / F.col("m")
            ),
        )
    )
    rs = (
        dev.filter(F.col("sd") > 0)
        .groupBy("event_type", "bn")
        .agg(F.avg(F.col("rng") / F.col("sd")).alias("rsbar"))
    )
    lx = F.log(F.col("bn").cast("double"))
    ly = F.log(F.col("rsbar"))
    fit = rs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * ly).alias("sxy"),
        F.sum(lx * lx).alias("sxx"),
    )
    return fit.select(
        "event_type",
        ratio(
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("k"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("k"))
        ).alias("hurst"),
        F.col("k").cast("bigint").alias("n_block_sizes"),
    ).orderBy("event_type")


ev_hurst.__doc__ = ev_hurst.__doc__.format(b=list(HURST_BLOCKS))


@query(
    "stat_moods_median",
    # Real oracle: exact grand median as the smallest value whose
    # cumulative count reaches ceil(n/2) over the collapsed value
    # groups, then the k×2 above/<=-median chi-square on integer
    # counts.
    oracle="""
    WITH v AS (SELECT event_type, value FROM events),
    cnt AS (SELECT value, CAST(COUNT(*) AS BIGINT) AS c
            FROM v GROUP BY 1),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt),
    med AS (SELECT MIN(value) AS m FROM (
              SELECT value,
                     SUM(c) OVER (ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cc
              FROM cnt) q CROSS JOIN tot
            WHERE q.cc >= CEIL(0.5 * tot.n)),
    tab AS (SELECT v.event_type,
                   CAST(SUM(CASE WHEN v.value > med.m THEN 1 ELSE 0 END)
                        AS BIGINT) AS above,
                   CAST(SUM(CASE WHEN v.value <= med.m THEN 1 ELSE 0 END)
                        AS BIGINT) AS below
            FROM v CROSS JOIN med GROUP BY 1),
    tt AS (SELECT CAST(SUM(above) AS BIGINT) AS ta,
                  CAST(SUM(below) AS BIGINT) AS tb,
                  CAST(SUM(above + below) AS BIGINT) AS n
           FROM tab),
    chi AS (SELECT SUM(
                     (above - CAST(above + below AS DOUBLE) * tt.ta / tt.n)
                     * (above - CAST(above + below AS DOUBLE) * tt.ta / tt.n)
                     / (CAST(above + below AS DOUBLE) * tt.ta / tt.n)
                   + (below - CAST(above + below AS DOUBLE) * tt.tb / tt.n)
                     * (below - CAST(above + below AS DOUBLE) * tt.tb / tt.n)
                     / (CAST(above + below AS DOUBLE) * tt.tb / tt.n))
                     AS x2
            FROM tab CROSS JOIN tt)
    SELECT tab.event_type, tab.above, tab.below,
           FLOOR(med.m * 10000 + 0.5) / 10000 AS grand_median,
           FLOOR(chi.x2 * 10000 + 0.5) / 10000 AS chi2
    FROM tab CROSS JOIN med CROSS JOIN chi
    ORDER BY tab.event_type
    """,
)
def stat_moods_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across the five event types' values: counts
    above/at-or-below the EXACT grand median per type and the k×2
    chi-square — the nonparametric 'same location?' screen that stays
    honest under arbitrary tail shapes because it reduces every value
    to one bit against a single order statistic.
    stat_kruskal_wallis uses full ranks (more power, more tail
    sensitivity); this is the robust cross-check.

    Scale: the grand median is the two-phase prefix-sum pick on the
    collapsed value groups (bucketed_cumsum — no single-task sort);
    the contingency pass is one conditional aggregation against the
    broadcast 1-row median."""
    ev = cat(spark, sf_dir)["events"].select("event_type", "value")
    cnt = ev.groupBy("value").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = cnt.agg(F.sum("c").cast("bigint").alias("n"))
    cum = bucketed_cumsum(cnt, "value", {"cc": F.col("c")})
    med = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("cc") >= F.ceil(F.lit(0.5) * F.col("n")))
        .agg(F.min("value").alias("m"))
    )
    tab = (
        ev.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("value") > F.col("m"), 1).otherwise(0))
            .cast("bigint")
            .alias("above"),
            F.sum(F.when(F.col("value") <= F.col("m"), 1).otherwise(0))
            .cast("bigint")
            .alias("below"),
        )
        .localCheckpoint()
    )
    tt = tab.agg(
        F.sum("above").cast("bigint").alias("ta"),
        F.sum("below").cast("bigint").alias("tb"),
        F.sum(F.col("above") + F.col("below")).cast("bigint").alias("n"),
    )
    ea = F.col("above_below").cast("double") * F.col("ta") / F.col("n")
    eb = F.col("above_below").cast("double") * F.col("tb") / F.col("n")
    chi = (
        tab.crossJoin(F.broadcast(tt))
        .withColumn("above_below", F.col("above") + F.col("below"))
        .agg(
            F.sum(
                (F.col("above") - ea) * (F.col("above") - ea) / ea
                + (F.col("below") - eb) * (F.col("below") - eb) / eb
            ).alias("x2")
        )
    )
    return (
        tab.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(chi))
        .select(
            "event_type",
            "above",
            "below",
            rnd(F.col("m"), 4).alias("grand_median"),
            rnd(F.col("x2"), 4).alias("chi2"),
        )
        .orderBy("event_type")
    )
