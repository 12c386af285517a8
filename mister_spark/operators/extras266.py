"""Wave 266: annotation reliability and cross-price elasticity.

- ds_krippendorff_alpha: inter-annotator reliability for a labeling
  pipeline — Krippendorff's alpha (nominal) over a 3-rater panel with
  missing ratings. Alpha is the reliability number annotation vendors
  are contracted on (chance-corrected, multi-rater,
  missing-tolerant — where plain percent-agreement and 2-rater kappa
  both fall short). The whole computation is EXACT INTEGER
  arithmetic: with m_u ∈ {2, 3} ratings per unit, scaling each
  per-unit disagreement term by 2 clears the (m_u − 1) denominator,
  so Do, the marginals, and the expected-disagreement sum are all
  int64 and alpha is a single final division on the 1e-4 grid — no
  float-summation-order hazard anywhere.
- ev_cross_elasticity: the own-price elasticity op's log-log OLS,
  lifted to brand PAIRS — how brand A's weekly revenue responds to
  brand B's weekly unit price (positive slope = substitutes,
  negative = complements). Sufficient-statistics aggregation per
  pair, the ev_price_elasticity discipline.

Rater construction: the panel is derived deterministically from the
embeddings table's label column (r1 = the label; r2 flips every 3rd
unit up one class; r3 skips every 7th unit and flips every 5th up
two classes) — a synthetic but fixed noise model, identical in both
engines, documented so the alpha value is interpretable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

KA_CLASSES = 4
XE_BRANDS = ("Brand#1", "Brand#10", "Brand#11", "Brand#12")
DAY_US = 86_400_000_000


@query(
    "ds_krippendorff_alpha",
    oracle=f"""
    WITH r1 AS (SELECT vec_id AS unit, label % {KA_CLASSES} AS v
                FROM embeddings),
    r2 AS (SELECT vec_id AS unit,
                  (label + CASE WHEN vec_id % 3 = 0 THEN 1 ELSE 0 END)
                    % {KA_CLASSES} AS v
           FROM embeddings),
    r3 AS (SELECT vec_id AS unit,
                  (label + CASE WHEN vec_id % 5 = 0 THEN 2 ELSE 0 END)
                    % {KA_CLASSES} AS v
           FROM embeddings WHERE vec_id % 7 <> 0),
    ratings AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
                UNION ALL SELECT * FROM r3),
    uc AS (SELECT unit, v, CAST(COUNT(*) AS BIGINT) AS nuc
           FROM ratings GROUP BY 1, 2),
    u AS (SELECT unit, CAST(SUM(nuc) AS BIGINT) AS mu,
                 CAST(SUM(nuc * (nuc - 1)) AS BIGINT) AS agree2
          FROM uc GROUP BY 1),
    per AS (SELECT unit, mu,
                   2 * (mu * (mu - 1) - agree2) / (mu - 1) AS do2
            FROM u WHERE mu >= 2),
    vc AS (SELECT v, CAST(SUM(nuc) AS BIGINT) AS nc
           FROM uc JOIN per USING (unit) GROUP BY v),
    g AS (SELECT CAST(SUM(do2) AS BIGINT) AS do2,
                 (SELECT CAST(SUM(mu) AS BIGINT) FROM per) AS n,
                 CAST(SUM(0) AS BIGINT) AS _z
          FROM per),
    g2 AS (SELECT g.do2, g.n,
                  (SELECT CAST(SUM(nc * nc) AS BIGINT) FROM vc) AS snc2
           FROM g)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM per) AS n_units,
           g2.n AS n_ratings,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM vc) AS n_values,
           FLOOR((1.0 - CAST((g2.n - 1) * g2.do2 AS DOUBLE)
                        / (2.0 * (g2.n * g2.n - g2.snc2)))
                 * 10000 + 0.5) / 10000 AS alpha_nominal
    FROM g2
    """,
)
def ds_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal) over the deterministic 3-rater
    panel: alpha = 1 − Do/De with per-unit disagreements weighted by
    1/(m_u − 1) and expected disagreement from the value marginals.
    The scaled-by-2 formulation keeps every intermediate an int64
    (m_u ∈ {{2, 3}} clears the denominator), so alpha is one exact
    division: alpha = 1 − (n−1)·Do₂ / (2(n² − Σ n_c²)). This is the
    reliability gate an annotation pipeline runs before trusting
    labels enough to train on them; missing ratings (rater 3 skips
    every 7th unit) are first-class, which is the reason to use
    alpha over kappa.

    Scale: one union of three narrow label maps, one (unit, value)
    count, one unit-level aggregate, then model-sized marginals —
    two data-sized shuffles total, both on the unit key."""
    emb = cat(spark, sf_dir)["embeddings"].select("vec_id", "label")
    r1 = emb.select(
        F.col("vec_id").alias("unit"),
        (F.col("label") % KA_CLASSES).alias("v"),
    )
    r2 = emb.select(
        F.col("vec_id").alias("unit"),
        (
            (
                F.col("label")
                + F.when(F.col("vec_id") % 3 == 0, 1).otherwise(0)
            )
            % KA_CLASSES
        ).alias("v"),
    )
    r3 = emb.filter(F.col("vec_id") % 7 != 0).select(
        F.col("vec_id").alias("unit"),
        (
            (
                F.col("label")
                + F.when(F.col("vec_id") % 5 == 0, 2).otherwise(0)
            )
            % KA_CLASSES
        ).alias("v"),
    )
    ratings = r1.unionByName(r2).unionByName(r3)
    uc = ratings.groupBy("unit", "v").agg(
        F.count(F.lit(1)).cast("long").alias("nuc")
    )
    u = (
        uc.groupBy("unit")
        .agg(
            F.sum("nuc").cast("long").alias("mu"),
            F.sum(F.col("nuc") * (F.col("nuc") - 1))
            .cast("long")
            .alias("agree2"),
        )
        .filter(F.col("mu") >= 2)
        .withColumn(
            "do2",
            2
            * (F.col("mu") * (F.col("mu") - 1) - F.col("agree2"))
            / (F.col("mu") - 1),
        )
        .localCheckpoint()  # read by the global sums AND the marginals
    )
    vc = uc.join(u.select("unit"), "unit").groupBy("v").agg(
        F.sum("nuc").cast("long").alias("nc")
    )
    g = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("do2").cast("long").alias("do2"),
        F.sum("mu").cast("long").alias("n"),
    )
    m = vc.agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.sum(F.col("nc") * F.col("nc")).cast("long").alias("snc2"),
    )
    return g.crossJoin(F.broadcast(m)).select(
        "n_units",
        F.col("n").alias("n_ratings"),
        "n_values",
        ratio(
            1.0
            - ((F.col("n") - 1) * F.col("do2")).cast("double")
            / (
                2.0
                * (F.col("n") * F.col("n") - F.col("snc2")).cast("double")
            )
        ).alias("alpha_nominal"),
    )


_XE_IN = ", ".join(f"'{b}'" for b in XE_BRANDS)


@query(
    "ev_cross_elasticity",
    oracle=f"""
    WITH wk AS (SELECT p.p_brand AS brand,
                       date_diff('day', DATE '1992-01-01', l.l_shipdate) // 7 AS w,
                       CAST(SUM(FLOOR(l.l_extendedprice * 100 + 0.5))
                            AS BIGINT) AS rev_cents,
                       CAST(SUM(CAST(FLOOR(l.l_quantity + 0.5) AS BIGINT))
                            AS BIGINT) AS qty
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                WHERE p.p_brand IN ({_XE_IN})
                GROUP BY 1, 2),
    lg AS (SELECT brand, w,
                  ln(rev_cents / 100.0) AS y,
                  ln(rev_cents / (100.0 * qty)) AS x
           FROM wk WHERE rev_cents > 0 AND qty > 0),
    pr AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
                  a.y AS y, b.x AS x
           FROM lg a JOIN lg b ON a.w = b.w AND a.brand <> b.brand),
    s AS (SELECT brand_a, brand_b, CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
                 SUM(x * y) AS sxy, SUM(y * y) AS syy
          FROM pr GROUP BY 1, 2)
    SELECT brand_a, brand_b, CAST(n AS BIGINT) AS n_weeks,
           FLOOR((n * sxy - sx * sy) / (n * sxx - sx * sx) * 10000 + 0.5)
             / 10000 AS cross_elasticity,
           FLOOR((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                 * 10000 + 0.5) / 10000 AS r2
    FROM s
    """,
)
def ev_cross_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-price elasticity matrix over the {b} focus brands: OLS of
    ln(weekly revenue of brand A) on ln(weekly unit price of brand B)
    for every ordered pair A ≠ B — positive slopes read as
    substitutes (B's price up, A's revenue up), negative as
    complements. Extends ev_price_elasticity's log-log
    sufficient-statistics discipline from own-price to the pair
    matrix a pricing team actually reviews.

    Scale: ONE fact-side aggregate to the (brand, week) grid (the
    only data-sized stage — brands broadcast into the lineitem
    scan); the pair join and the per-pair OLS run on the model-sized
    weekly grid ({b} brands × #weeks)."""
    li = cat(spark, sf_dir)["lineitem"]
    pt = cat(spark, sf_dir)["part"].filter(
        F.col("p_brand").isin(list(XE_BRANDS))
    )
    wk = (
        li.join(
            F.broadcast(pt.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            (F.datediff("l_shipdate", F.lit("1992-01-01")).cast("long")
             / F.lit(7)).cast("long").alias("w"),
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)))
            .cast("long")
            .alias("rev_cents"),
            F.sum(
                F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("qty"),
        )
        .filter((F.col("rev_cents") > 0) & (F.col("qty") > 0))
        .withColumn("y", F.log(F.col("rev_cents") / 100.0))
        .withColumn(
            "x", F.log(F.col("rev_cents") / (100.0 * F.col("qty")))
        )
        .localCheckpoint()  # model-sized weekly grid, read twice
    )
    a = wk.select(F.col("brand").alias("brand_a"), "w", "y")
    b = wk.select(F.col("brand").alias("brand_b"), "w", "x")
    pr = a.join(b, "w").filter(F.col("brand_a") != F.col("brand_b"))
    x, y = F.col("x"), F.col("y")
    s = pr.groupBy("brand_a", "brand_b").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    num = n * sxy - sx * sy
    return s.select(
        "brand_a",
        "brand_b",
        n.cast("bigint").alias("n_weeks"),
        ratio(num / (n * sxx - sx * sx)).alias("cross_elasticity"),
        ratio(
            num * num / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("r2"),
    )


ev_cross_elasticity.__doc__ = ev_cross_elasticity.__doc__.format(
    b=len(XE_BRANDS)
)
