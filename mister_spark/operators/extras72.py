"""Wave 72: multiscale energy, active learning, method agreement, and
orphan-file hygiene.

ev_haar_energy decomposes the daily series into Haar-wavelet detail
energy per dyadic scale (where the variance LIVES in time-scale, which
a periodogram's global frequencies blur); ds_uncertainty_sample is the
active-learning acquisition step (label what the model is least sure
about); stat_bland_altman is THE method-agreement analysis (two
instruments measuring the same thing — correlation is the wrong tool
and this is the right one); io_orphan_files sweeps the snapshot
table's storage for files no manifest references — the leak vacuum
can't see because it only walks manifests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

HAAR_SCALES = (2, 4, 8)
UNC_K = 20


@query(
    "ev_haar_energy",
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS t,
                      CAST(COUNT(*) AS DOUBLE) AS x
               FROM events GROUP BY 1),
    i AS (SELECT ROW_NUMBER() OVER (ORDER BY t) - 1 AS idx, x FROM d),
    m AS (SELECT unnest([{", ".join(str(s) for s in HAAR_SCALES)}]) AS s),
    c AS (SELECT m.s, i.idx // m.s AS blk, i.idx, i.x
          FROM i CROSS JOIN m),
    fb AS (SELECT s, blk FROM c GROUP BY 1, 2 HAVING COUNT(*) = MAX(s)),
    h AS (SELECT c.s, c.blk,
                 SUM(CASE WHEN (c.idx % c.s) * 2 < c.s THEN c.x ELSE 0 END)
                   / (c.s / 2)
                 - SUM(CASE WHEN (c.idx % c.s) * 2 >= c.s THEN c.x ELSE 0 END)
                   / (c.s / 2) AS detail
          FROM c JOIN fb ON c.s = fb.s AND c.blk = fb.blk
          GROUP BY 1, 2),
    e AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n_blocks,
                 SUM(detail * detail) AS energy
          FROM h GROUP BY 1),
    tot AS (SELECT SUM(energy) AS te FROM e)
    SELECT CAST(e.s AS BIGINT) AS scale_days, e.n_blocks,
           FLOOR(e.energy * 10000 + 0.5) / 10000 AS energy,
           FLOOR(e.energy / tot.te * 10000 + 0.5) / 10000 AS energy_share
    FROM e CROSS JOIN tot
    """,
)
def ev_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar-wavelet detail energy of the daily event series at dyadic
    scales {s}: each full block's detail coefficient is (mean of first
    half − mean of second half), and the per-scale energy share says
    WHERE the variability lives — day-to-day noise vs weekly swings —
    localized in time, which the periodogram's global sinusoids can't
    do.

    Scale: blocks partition the calendar-bounded day grid; per-scale
    state is |days/s| blocks."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias("t")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    i = d.select((F.row_number().over(W.orderBy("t")) - 1).alias("idx"), "x")
    m = spark.createDataFrame([(s,) for s in HAAR_SCALES], "s long")
    c = i.join(F.broadcast(m)).select(
        "s", (F.col("idx") / F.col("s")).cast("long").alias("blk"), "idx", "x"
    )
    fb = (
        c.groupBy("s", "blk")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("s").alias("ms"))
        .filter(F.col("cnt") == F.col("ms"))
        .select("s", "blk")
    )
    first_half = (F.col("idx") % F.col("s")) * 2 < F.col("s")
    h = (
        c.join(fb, ["s", "blk"])
        .groupBy("s", "blk")
        .agg(
            (
                F.sum(F.when(first_half, F.col("x")).otherwise(0.0))
                / (F.max("s") / 2)
                - F.sum(F.when(~first_half, F.col("x")).otherwise(0.0))
                / (F.max("s") / 2)
            ).alias("detail")
        )
    )
    e = h.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum(F.col("detail") * F.col("detail")).alias("energy"),
    ).localCheckpoint()
    tot = e.agg(F.sum("energy").alias("te"))
    return e.join(F.broadcast(tot)).select(
        F.col("s").cast("bigint").alias("scale_days"),
        "n_blocks",
        ratio(F.col("energy")).alias("energy"),
        ratio(F.col("energy") / F.col("te")).alias("energy_share"),
    )


ev_haar_energy.__doc__ = ev_haar_energy.__doc__.format(s=HAAR_SCALES)


@query(
    "ds_uncertainty_sample",
    oracle=f"""
    WITH s AS (SELECT vec_id,
                      1.0 / (1.0 + exp(-CAST(embedding[1] AS DOUBLE)))
                        AS prob
               FROM embeddings),
    u AS (SELECT vec_id, FLOOR(prob * 10000 + 0.5) / 10000 AS prob,
                 FLOOR(ABS(prob - 0.5) * 10000 + 0.5) / 10000 AS margin
          FROM s)
    SELECT vec_id, prob, margin
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY margin, vec_id) AS rn
          FROM u)
    WHERE rn <= {UNC_K}
    """,
)
def ds_uncertainty_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-learning acquisition: the {k} items the classifier is
    LEAST sure about (sigmoid score nearest 0.5) — the labeling batch
    that moves a model most per annotation dollar, vs labeling random
    or confident items.

    Scale: narrow score map + TakeOrdered on the margin — no global
    sort; the same plan as sketch_bottomk_sample."""
    emb = cat(spark, sf_dir)["embeddings"]
    prob = 1.0 / (1.0 + F.exp(-F.element_at("embedding", 1).cast("double")))
    u = emb.select(
        "vec_id",
        ratio(prob).alias("prob"),
        ratio(F.abs(prob - 0.5)).alias("margin"),
    )
    return u.orderBy("margin", "vec_id").limit(UNC_K)


ds_uncertainty_sample.__doc__ = ds_uncertainty_sample.__doc__.format(k=UNC_K)


@query(
    "stat_bland_altman",
    oracle="""
    WITH m AS (SELECT CAST(embedding[1] AS DOUBLE) AS m1,
                      CAST(embedding[2] AS DOUBLE) AS m2
               FROM embeddings),
    d AS (SELECT m1 - m2 AS diff, (m1 + m2) / 2 AS mean_m FROM m),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(diff) AS bias,
                 sqrt((SUM(diff * diff) - SUM(diff) * SUM(diff) / COUNT(*))
                      / (COUNT(*) - 1)) AS sd
          FROM d),
    o AS (SELECT CAST(SUM(CASE WHEN ABS(d.diff - s.bias) > 1.96 * s.sd
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_outside
          FROM d CROSS JOIN s)
    SELECT CAST(s.n AS BIGINT) AS n,
           FLOOR(s.bias * 10000 + 0.5) / 10000 AS bias,
           FLOOR((s.bias - 1.96 * s.sd) * 10000 + 0.5) / 10000 AS loa_lo,
           FLOOR((s.bias + 1.96 * s.sd) * 10000 + 0.5) / 10000 AS loa_hi,
           o.n_outside,
           FLOOR(CAST(o.n_outside AS DOUBLE) / s.n * 10000 + 0.5) / 10000
             AS outside_share
    FROM s CROSS JOIN o
    """,
)
def stat_bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bland–Altman agreement between two measurements of the same
    quantity (embedding dims 0 and 1 as the two 'instruments'): the
    mean difference (bias), the 95% limits of agreement bias ± 1.96·sd,
    and the share of points outside them (~5% when differences are
    normal) — the analysis that answers 'can method B replace method
    A', which correlation famously cannot.

    Scale: one sufficient-statistics pass + one outside-count pass
    with the 1-row stats broadcast."""
    emb = cat(spark, sf_dir)["embeddings"]
    m = emb.select(
        F.element_at("embedding", 1).cast("double").alias("m1"),
        F.element_at("embedding", 2).cast("double").alias("m2"),
    )
    d = m.select(
        (F.col("m1") - F.col("m2")).alias("diff"),
    ).localCheckpoint()
    df_ = F.col("diff")
    s = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(df_).alias("bias"),
        F.sqrt(
            (F.sum(df_ * df_) - F.sum(df_) * F.sum(df_) / F.count(F.lit(1)))
            / (F.count(F.lit(1)) - 1)
        ).alias("sd"),
    )
    o = d.join(F.broadcast(s)).agg(
        F.sum(
            (F.abs(df_ - F.col("bias")) > 1.96 * F.col("sd")).cast("int")
        )
        .cast("bigint")
        .alias("n_outside")
    )
    return s.join(F.broadcast(o)).select(
        F.col("n").cast("bigint").alias("n"),
        ratio(F.col("bias")).alias("bias"),
        ratio(F.col("bias") - 1.96 * F.col("sd")).alias("loa_lo"),
        ratio(F.col("bias") + 1.96 * F.col("sd")).alias("loa_hi"),
        "n_outside",
        ratio(F.col("n_outside").cast("double") / F.col("n")).alias(
            "outside_share"
        ),
    )


@query(
    "io_orphan_files",
    # Real oracle: the planted-debris audit is a fixed relation.
    oracle="""
    SELECT * FROM (VALUES
      ('data/c0-create', CAST(1 AS BIGINT)),
      ('data/c1-append', CAST(1 AS BIGINT)),
      ('data/c99-debris', CAST(0 AS BIGINT))) t(dir, referenced)
    """,
)
def io_orphan_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-file sweep for the snapshot table: list every data dir on
    storage, diff against the union of dirs referenced by ANY retained
    manifest, and report the unreachable ones (a failed write's debris,
    or a bug's leak) — the storage-side complement of vacuum, which
    only deletes what manifests REMEMBER. A planted orphan dir proves
    the sweep sees what the metadata can't.

    Scale: listing + set-diff is O(#dirs) driver metadata; on object
    storage this runs as a parallel listing job."""
    import os
    import uuid

    from mister_spark.sources.snapshots import SnapshotTable
    from mister_spark.sources.staged import REPO_TMP

    path = os.path.join(REPO_TMP, f"orphans_{uuid.uuid4().hex[:8]}")
    t = SnapshotTable(spark, path, stats_cols=["o_orderkey"])
    orders = cat(spark, sf_dir)["orders"].select("o_orderkey", "o_totalprice")
    t.create(orders.filter(F.col("o_orderkey") % 2 == 0))
    t.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    # plant an orphan: a data dir no manifest references
    orphan = os.path.join(path, "data", "c99-debris")
    orders.limit(5).write.mode("overwrite").parquet(orphan)
    referenced = set()
    for man in t.history():
        for e in man["entries"]:
            referenced.add(e["dir"])
    data_root = os.path.join(path, "data")
    on_disk = {
        os.path.join("data", d)
        for d in os.listdir(data_root)
        if os.path.isdir(os.path.join(data_root, d))
    }
    rows = [
        (d, int(d in referenced))
        for d in sorted(on_disk)
    ]
    return spark.createDataFrame(
        rows, "dir string, referenced long"
    ).orderBy("dir")
