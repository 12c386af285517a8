"""Wave 136: representation similarity, commit-protocol auditing, and
stream health.

ml_cka computes linear Centered Kernel Alignment between two halves
of the embedding space treated as two representations — the
rotation-invariant similarity that made 'do these layers learn the
same thing' a measurable question (and the robust cousin of the
Procrustes residual); io_commit_protocol_audit verifies what a
successful Spark write must leave behind — a _SUCCESS marker, no
orphan temporaries, and footer-valid files; ev_stream_health is the
one-row events-table health check: freshness, calendar gaps,
duplicate ids, and day-volume stability, all from one scan.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query


@query(
    "ml_cka",
    # Real oracle: all three Frobenius terms are plain cross-moment
    # sums over the two 32-dim halves — no eigen anywhere; the 1e-6
    # output grid absorbs partial-sum association differences, and the
    # denominator keeps the sqrt(S)*sqrt(S) structure so cka_self
    # lands on exactly 1.0 the same way.
    oracle="""
    WITH fa AS MATERIALIZED (
      SELECT vec_id, g.i AS i,
             CAST(embedding[CAST(g.i AS INT)] AS DOUBLE) AS x
      FROM embeddings,
           LATERAL (SELECT unnest(range(1, 33)) AS i) g),
    fb AS MATERIALIZED (
      SELECT vec_id, g.i AS i,
             CAST(embedding[CAST(g.i AS INT) + 32] AS DOUBLE) AS x
      FROM embeddings,
           LATERAL (SELECT unnest(range(1, 33)) AS i) g),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings),
    sx AS MATERIALIZED (SELECT i, SUM(x) AS s FROM fa GROUP BY i),
    sy AS MATERIALIZED (SELECT i, SUM(x) AS s FROM fb GROUP BY i),
    xx AS (SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS m
           FROM fa a JOIN fa b USING (vec_id) GROUP BY 1, 2),
    yy AS (SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS m
           FROM fb a JOIN fb b USING (vec_id) GROUP BY 1, 2),
    xy AS (SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS m
           FROM fa a JOIN fb b USING (vec_id) GROUP BY 1, 2),
    cxx AS (SELECT SUM(POWER(xx.m - sa.s * sb.s / nn.n, 2)) AS f2
            FROM xx JOIN sx sa ON sa.i = xx.i
                    JOIN sx sb ON sb.i = xx.j CROSS JOIN nn),
    cyy AS (SELECT SUM(POWER(yy.m - sa.s * sb.s / nn.n, 2)) AS f2
            FROM yy JOIN sy sa ON sa.i = yy.i
                    JOIN sy sb ON sb.i = yy.j CROSS JOIN nn),
    cxy AS (SELECT SUM(POWER(xy.m - sa.s * sb.s / nn.n, 2)) AS f2
            FROM xy JOIN sx sa ON sa.i = xy.i
                    JOIN sy sb ON sb.i = xy.j CROSS JOIN nn)
    SELECT CAST(nn.n AS BIGINT) AS n, CAST(32 AS BIGINT) AS half_dim,
           FLOOR(cxy.f2 / (SQRT(cxx.f2) * SQRT(cyy.f2)) * 1e6 + 0.5)
             / 1e6 AS cka_between,
           FLOOR(cxx.f2 / (SQRT(cxx.f2) * SQRT(cxx.f2)) * 1e6 + 0.5)
             / 1e6 AS cka_self
    FROM nn, cxx, cyy, cxy
    """,
)
def ml_cka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear CKA between the first and second 32 dimensions of the
    embeddings (two 'representations' of the same items):
    CKA = ‖X̄ᵀȲ‖²_F / (‖X̄ᵀX̄‖_F·‖ȲᵀȲ‖_F) on centered halves —
    invariant to rotation and isotropic scaling, which is exactly
    what weight-space comparisons are NOT. Independent halves score
    near 0; copies score 1 (both gated).

    Scale: all three Frobenius terms come from ONE Arrow pass of
    d×d cross-products — O(d²) per partition, nothing data-sized
    collected."""
    import numpy as np
    import pandas as pd

    emb = cat(spark, sf_dir)["embeddings"].select(
        F.col("embedding").cast("array<double>").alias("v")
    )

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(list(pdf["v"]), dtype=np.float64)
            X, Y = M[:, :32], M[:, 32:]
            yield pd.DataFrame(
                {
                    "n": [len(M)],
                    "sx": [X.sum(axis=0).tolist()],
                    "sy": [Y.sum(axis=0).tolist()],
                    "xx": [(X.T @ X).ravel().tolist()],
                    "yy": [(Y.T @ Y).ravel().tolist()],
                    "xy": [(X.T @ Y).ravel().tolist()],
                }
            )

    rows = emb.mapInPandas(
        partials,
        "n long, sx array<double>, sy array<double>, xx array<double>, "
        "yy array<double>, xy array<double>",
    ).collect()
    n = sum(r["n"] for r in rows)
    d = 32
    sx = np.sum([np.array(r["sx"]) for r in rows], axis=0)
    sy = np.sum([np.array(r["sy"]) for r in rows], axis=0)
    XX = np.sum([np.array(r["xx"]).reshape(d, d) for r in rows], axis=0)
    YY = np.sum([np.array(r["yy"]).reshape(d, d) for r in rows], axis=0)
    XY = np.sum([np.array(r["xy"]).reshape(d, d) for r in rows], axis=0)
    cXX = XX - np.outer(sx, sx) / n
    cYY = YY - np.outer(sy, sy) / n
    cXY = XY - np.outer(sx, sy) / n
    cka = float(
        (cXY * cXY).sum()
        / (np.linalg.norm(cXX) * np.linalg.norm(cYY))
    )
    # self-CKA sanity: first half vs itself must be exactly 1
    self_cka = float(
        (cXX * cXX).sum() / (np.linalg.norm(cXX) * np.linalg.norm(cXX))
    )
    import math

    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    row = (int(n), d, r6(cka), r6(self_cka))
    return spark.createDataFrame(
        [row], "n long, half_dim long, cka_between double, cka_self double"
    )


@query(
    "io_commit_protocol_audit",
    # Real oracle: the single-file orders input writes one part file
    # with a _SUCCESS marker and no temp debris; the footer and
    # readback must both account for every row.
    oracle="""
    WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders)
    SELECT CAST(1 AS BIGINT) AS has_success,
           CAST(0 AS BIGINT) AS temp_dirs,
           CAST(1 AS BIGINT) AS part_files,
           CAST(1 AS BIGINT) AS valid_footers,
           n AS footer_rows, n AS readback_rows,
           CAST(1 AS BIGINT) AS consistent
    FROM c
    """,
)
def io_commit_protocol_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-protocol audit: after a successful parquet write, the
    directory must contain a _SUCCESS marker, ZERO _temporary debris,
    and only footer-valid part files (each readable by pyarrow).
    Half-written directories from a failed committer are the classic
    silent corruption — this audit is the cheap post-write gate that
    catches them before a reader does.

    Scale: listing + footer reads only."""
    import pyarrow.parquet as pq

    repo_tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp"
    )
    loc = os.path.join(repo_tmp, "commit_audit_demo")
    shutil.rmtree(loc, ignore_errors=True)
    cat(spark, sf_dir)["orders"].write.mode("overwrite").parquet(loc)
    entries = os.listdir(loc)
    has_success = int("_SUCCESS" in entries)
    n_temp = sum(1 for e in entries if e.startswith("_temporary"))
    parts = [e for e in entries if e.endswith(".parquet")]
    valid = 0
    rows_total = 0
    for p in parts:
        try:
            md = pq.ParquetFile(os.path.join(loc, p)).metadata
            rows_total += md.num_rows
            valid += 1
        except Exception:
            pass
    readback = spark.read.parquet(loc).count()
    row = (
        has_success,
        int(n_temp),
        len(parts),
        int(valid),
        int(rows_total),
        int(readback),
        int(rows_total == readback),
    )
    return spark.createDataFrame(
        [row],
        "has_success long, temp_dirs long, part_files long, "
        "valid_footers long, footer_rows long, readback_rows long, "
        "consistent long",
    )


@query(
    "ev_stream_health",
    oracle="""
    WITH b AS (SELECT event_id, ts,
                      CAST(date_trunc('day', ts) AS DATE) AS day
               FROM events),
    days AS (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS active_days,
                    date_diff('day', MIN(day), MAX(day)) + 1 AS span_days
             FROM b),
    dup AS (SELECT CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
              AS dup_ids
            FROM b),
    vol AS (SELECT STDDEV_SAMP(n) / AVG(n) AS day_cv FROM (
              SELECT day, CAST(COUNT(*) AS DOUBLE) AS n FROM b GROUP BY 1))
    SELECT days.active_days,
           CAST(days.span_days AS BIGINT) AS span_days,
           CAST(days.span_days - days.active_days AS BIGINT) AS gap_days,
           dup.dup_ids,
           FLOOR(vol.day_cv * 10000 + 0.5) / 10000 AS day_volume_cv
    FROM days, dup, vol
    """,
)
def ev_stream_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-health row for the events table: active days vs calendar
    span (gap days = silent outages or ingest holes), duplicate
    event ids (delivery bug), and the day-volume coefficient of
    variation (stability). Four ingest failure modes, one scan, one
    row — the check a scheduled pipeline should emit before any
    metric built on this table is trusted.

    Scale: one rollup per component off a shared scan; all outputs
    are scalars."""
    ev = cat(spark, sf_dir)["events"]
    b = ev.select(
        "event_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).localCheckpoint()
    days = b.agg(
        F.countDistinct("day").cast("bigint").alias("active_days"),
        (F.datediff(F.max("day"), F.min("day")) + 1)
        .cast("bigint")
        .alias("span_days"),
    )
    dup = b.agg(
        (F.count(F.lit(1)) - F.countDistinct("event_id"))
        .cast("bigint")
        .alias("dup_ids")
    )
    vol = (
        b.groupBy("day")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .agg((F.stddev_samp("n") / F.avg("n")).alias("day_cv"))
    )
    return (
        days.crossJoin(F.broadcast(dup))
        .crossJoin(F.broadcast(vol))
        .select(
            "active_days",
            "span_days",
            (F.col("span_days") - F.col("active_days"))
            .cast("bigint")
            .alias("gap_days"),
            "dup_ids",
            ratio(F.col("day_cv")).alias("day_volume_cv"),
        )
    )
