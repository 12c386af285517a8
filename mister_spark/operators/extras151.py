"""Wave 151: clustered-write auditing, quantization sweeps, and
multi-ranker concordance.

io_clustered_write_audit measures what sortWithinPartitions before a
write buys: per-file key-range span under sorted vs unsorted layout
— tight non-overlapping spans are what make zone-map pruning
actually fire; ml_quantization_sweep prices embedding quantization
at 8/4/2 bits (cosine distortion and top-10 neighbor overlap vs
float) — the memory-vs-recall trade measured, not guessed;
stat_kendall_w is Kendall's coefficient of concordance across THREE
document rankers — the k-ranker generalization of rank correlation.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import global_rank
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

QZ_BITS = (8, 4, 2)
QZ_TOPK = 10


@query("io_clustered_write_audit")  # layout QA → rows-only
def io_clustered_write_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered-write audit: write orders 4-way (a) hash-partitioned
    unsorted and (b) range-partitioned + sortWithinPartitions on
    custkey, then measure from the footers the mean per-file key-span
    fraction and the file-overlap count. Sorted/clustered files carry
    tight disjoint ranges — the precondition for min/max zone-map
    skipping; unsorted files all span everything and prune nothing.

    Scale: two writes; the audit is footer metadata only."""
    import pyarrow.parquet as pq

    repo_tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp"
    )
    base = os.path.join(repo_tmp, "clustered_audit")
    shutil.rmtree(base, ignore_errors=True)
    orders = cat(spark, sf_dir)["orders"]
    (
        orders.repartition(4, "o_orderkey")
        .write.mode("overwrite")
        .parquet(os.path.join(base, "unsorted"))
    )
    (
        orders.repartitionByRange(4, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(os.path.join(base, "sorted"))
    )
    lo_g, hi_g = orders.agg(
        F.min("o_custkey"), F.max("o_custkey")
    ).collect()[0]
    span_g = float(hi_g - lo_g) or 1.0

    def audit(d):
        spans = []
        ranges = []
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            lo = hi = None
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if col.path_in_schema == "o_custkey" and col.statistics:
                        st = col.statistics
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
            if lo is not None:
                spans.append((hi - lo) / span_g)
                ranges.append((lo, hi))
        overlaps = 0
        for i in range(len(ranges)):
            for j in range(i + 1, len(ranges)):
                a, b = ranges[i], ranges[j]
                if a[0] <= b[1] and b[0] <= a[1]:
                    overlaps += 1
        return len(spans), sum(spans) / len(spans), overlaps

    nf_u, span_u, ov_u = audit(os.path.join(base, "unsorted"))
    nf_s, span_s, ov_s = audit(os.path.join(base, "sorted"))
    rows = [
        ("unsorted", nf_u, round(span_u, 4), ov_u),
        ("sorted", nf_s, round(span_s, 4), ov_s),
    ]
    return spark.createDataFrame(
        rows,
        "layout string, files long, mean_span_fraction double, "
        "overlapping_pairs long",
    )


def _qz_oracle() -> str:
    unit = (
        "list_transform({v}, x -> x / GREATEST(SQRT(list_reduce("
        "list_prepend(CAST(0 AS DOUBLE), list_transform({v}, y -> y * y)),"
        " (a, b) -> a + b)), 1e-12))"
    )
    dot = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        " list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])),"
        " (p, q) -> p + q)"
    )
    parts = [
        f"""e AS MATERIALIZED (
      SELECT vec_id, {unit.format(v="CAST(embedding AS DOUBLE[])")} AS x
      FROM embeddings)""",
        "q0 AS (SELECT x FROM e WHERE vec_id = 0)",
        f"""ex AS MATERIALIZED (SELECT e.vec_id,
               {dot.format(a="e.x", b="q0.x")} AS s
             FROM e, q0)""",
        """mx AS (SELECT MAX(m) AS mab FROM (
      SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(x, v -> ABS(v))),
             (a, b) -> GREATEST(a, b)) AS m FROM e) t)""",
        """ext AS (SELECT vec_id FROM (
      SELECT ex.vec_id,
             ROW_NUMBER() OVER (
               ORDER BY FLOOR(ex.s * 10000 + 0.5) / 10000 DESC,
                        ex.vec_id) AS rk
      FROM ex WHERE ex.vec_id <> 0) q WHERE rk <= 10)""",
    ]
    rows = []
    for bits in QZ_BITS:
        lev = 2 ** (bits - 1) - 1
        parts.append(f"""
    qz{bits} AS MATERIALIZED (
      SELECT vec_id,
             list_transform(x, v ->
               LEAST(GREATEST(FLOOR(v / (mx.mab / {lev}) + 0.5),
                              {-lev - 1}), {lev}) * (mx.mab / {lev}))
               AS qv
      FROM e, mx)""")
        parts.append(f"""
    sims{bits} AS MATERIALIZED (
      SELECT n.vec_id,
             {dot.format(a=unit.format(v="n.qv"), b=unit.format(v="qq.qv"))}
               AS s
      FROM qz{bits} n, (SELECT qv FROM qz{bits} WHERE vec_id = 0) qq)""")
        parts.append(f"""
    top{bits} AS (SELECT vec_id FROM (
      SELECT s.vec_id,
             ROW_NUMBER() OVER (
               ORDER BY FLOOR(s.s * 10000 + 0.5) / 10000 DESC,
                        s.vec_id) AS rk
      FROM sims{bits} s WHERE s.vec_id <> 0) q WHERE rk <= {QZ_TOPK})""")
        rows.append(f"""
    SELECT CAST({bits} AS BIGINT) AS bits,
           (SELECT FLOOR(AVG(ABS(s.s - ex.s)) * 1e6 + 0.5) / 1e6
            FROM sims{bits} s JOIN ex ON ex.vec_id = s.vec_id)
             AS mean_cosine_distortion,
           (SELECT FLOOR(COUNT(*) / {float(QZ_TOPK)!r} * 10000 + 0.5)
                   / 10000
            FROM top{bits} t JOIN ext ON ext.vec_id = t.vec_id)
             AS top10_overlap""")
    return "WITH " + ",\n".join(parts) + "\nUNION ALL\n".join(rows)


@query(
    "ml_quantization_sweep",
    # Real oracle: the half-up quantizer, fold-normalized cosines and
    # grid-stable top-10 cuts reproduce relationally; distortion means
    # round at 1e-6 and overlaps are integer intersections over K.
    oracle=_qz_oracle(),
)
def ml_quantization_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding quantization sweep: uniform symmetric quantization
    at {b} bits, measuring (a) mean cosine distortion vs float and
    (b) top-{k} nearest-neighbor overlap for a probe query — the
    memory-vs-recall curve that decides a vector index's storage
    format. 8-bit is usually free; THIS measures where 4- and 2-bit
    stop being.

    Scale: ONE full-table pass computes the normalized vector, the
    exact-probe similarity, and every bit-width's quantized
    similarity as codegen expressions (no driver collect of the
    corpus — only the probe vector and the global max-abs scalar,
    both O(1), come to the driver); distortion means are one
    aggregate and each top-{k} cut is a TakeOrdered of the rounded
    similarity."""
    from mister_spark.functions.vectors import dot as _dot

    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # unit-normalize with the oracle's exact fold: left-fold sum of
    # squares, sqrt, clamp at 1e-12 — bitwise identical per element.
    # The norm must be LET-BOUND (functions.vectors.unit): spelling it
    # as a withColumn does NOT protect it — CollapseProject inlines the
    # single-use column into the division lambda, where it re-runs the
    # whole fold once per element (verified in the optimized plan)
    from mister_spark.functions.vectors import unit as vunit

    un = (
        emb.select("vec_id", vunit(F.col("v")).alias("u"))
        .localCheckpoint()
    )
    # the two O(1) driver scalars: the probe's unit vector and the
    # corpus max-|component| (order-independent, exact)
    probe_rows = un.filter(F.col("vec_id") == 0).limit(1).collect()
    if not probe_rows:
        raise ValueError(
            "ml_quantization_sweep: probe vec_id=0 missing from the "
            "embeddings table (the op and its oracle both key the "
            "probe on vec_id 0)"
        )
    qrow = probe_rows[0]["u"]
    mab = float(
        un.agg(
            F.max(
                F.aggregate(
                    F.transform("u", F.abs),
                    F.lit(0.0),
                    lambda a, x: F.greatest(a, x),
                )
            )
        ).collect()[0][0]
    )

    def _unit(vec: list[float]) -> list[float]:
        s2 = 0.0
        for x in vec:  # left fold — matches the SQL/JVM fold order
            s2 += x * x
        n = max(math.sqrt(s2), 1e-12)
        return [x / n for x in vec]

    def _qz(vec: list[float], scale: float, lev: int) -> list[float]:
        return [
            min(max(math.floor(x / scale + 0.5), -lev - 1), lev) * scale
            for x in vec
        ]

    # one pass: exact similarity + per-bit-width quantized similarity.
    # Each bit width materializes its quantized vector as a column
    # (used twice — norm fold + division — so CollapseProject cannot
    # duplicate it) and unit-normalizes through the let-bound helper
    # (the former qn{bits} norm COLUMNS were single-use and inlined
    # into the division lambdas at O(d^2) per row)
    step = un
    qprobes = {}
    for bits in QZ_BITS:
        lev = 2 ** (bits - 1) - 1
        scale = mab / lev

        def _mk_qv(s=scale, l=lev):
            return F.transform(
                "u",
                lambda x: F.least(
                    F.greatest(F.floor(x / F.lit(s) + 0.5), F.lit(-l - 1)),
                    F.lit(l),
                ).cast("double")
                * F.lit(s),
            )

        qprobes[bits] = _unit(_qz(qrow, scale, lev))
        step = step.withColumn(f"qv{bits}", _mk_qv())

    cols = [F.col("vec_id"), _dot("u", F.lit(qrow)).alias("sx")]
    for bits in QZ_BITS:
        cols.append(
            _dot(vunit(F.col(f"qv{bits}")), F.lit(qprobes[bits])).alias(
                f"s{bits}"
            )
        )
    sims = step.select(*cols).localCheckpoint()

    def grid_top(col: str) -> set[int]:
        # top-K on the ROUNDED similarity with a vec_id tie-break —
        # the grid-stable cut every cross-engine boundary in this repo
        # uses (raw-float sort boundaries flip on ulp drift)
        rows = (
            sims.filter(F.col("vec_id") != 0)
            .select("vec_id", rnd(F.col(col), 4).alias("g"))
            .orderBy(F.desc("g"), "vec_id")
            .limit(QZ_TOPK)
            .collect()
        )
        return {int(r["vec_id"]) for r in rows}

    exact_top = grid_top("sx")
    dist = sims.agg(
        *[
            F.avg(F.abs(F.col(f"s{bits}") - F.col("sx"))).alias(f"d{bits}")
            for bits in QZ_BITS
        ]
    ).collect()[0]
    out = []
    for bits in QZ_BITS:
        top = grid_top(f"s{bits}")
        out.append(
            (
                bits,
                math.floor(float(dist[f"d{bits}"]) * 1e6 + 0.5) / 1e6,
                math.floor(len(top & exact_top) / QZ_TOPK * 10000 + 0.5)
                / 10000,
            )
        )
    return spark.createDataFrame(
        out, "bits long, mean_cosine_distortion double, top10_overlap double"
    )


ml_quantization_sweep.__doc__ = ml_quantization_sweep.__doc__.format(
    b=QZ_BITS, k=QZ_TOPK
)


@query(
    "stat_kendall_w",
    oracle=f"""
    WITH t AS (SELECT doc_id, n_chars,
                      CAST(len({DUCK_TOKENS}) AS BIGINT) AS tok_n,
                      CAST(len(list_distinct({DUCK_TOKENS})) AS DOUBLE)
                        / NULLIF(len({DUCK_TOKENS}), 0) AS dr
               FROM documents WHERE len({DUCK_TOKENS}) > 0),
    r AS (SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS r1,
                 ROW_NUMBER() OVER (ORDER BY tok_n, doc_id) AS r2,
                 ROW_NUMBER() OVER (ORDER BY dr, doc_id) AS r3
          FROM t),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(CAST(r1 + r2 + r3 AS DOUBLE)
                     * (r1 + r2 + r3)) AS ssum,
                 SUM(CAST(r1 + r2 + r3 AS DOUBLE)) AS stot
          FROM r)
    SELECT CAST(n AS BIGINT) AS docs,
           FLOOR((12 * (ssum - stot * stot / n))
                 / (9 * (n * n * n - n)) * 10000 + 0.5) / 10000
             AS kendall_w
    FROM s
    """,
)
def stat_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's W concordance across THREE document rankers (chars,
    tokens, distinct ratio): W = 12·S/(k²(n³−n)) over rank-sum
    deviations — 1 means the rankers agree perfectly, 0 means no
    agreement beyond chance. The panel version of rank correlation:
    one number for 'do our quality signals even point the same way'.

    Scale: each axis is a two-phase `global_rank` (tie-broken by
    doc_id for a total order); the S statistic is one aggregate of
    exact integer rank sums."""
    toks = tokens()
    t = (
        cat(spark, sf_dir)["documents"]
        .select(
            "doc_id",
            "n_chars",
            F.size(toks).cast("long").alias("tok_n"),
            (
                F.size(F.array_distinct(toks)).cast("double")
                / F.nullif(F.size(toks).cast("double"), F.lit(0.0))
            ).alias("dr"),
        )
        .filter(F.col("tok_n") > 0)
        .localCheckpoint()
    )
    r1 = global_rank(t, "n_chars", "doc_id", rank_col="r1")
    r2 = global_rank(r1.localCheckpoint(), "tok_n", "doc_id", rank_col="r2")
    r3 = global_rank(r2.localCheckpoint(), "dr", "doc_id", rank_col="r3")
    rsum = (F.col("r1") + F.col("r2") + F.col("r3")).cast("double")
    s = r3.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(rsum * rsum).alias("ssum"),
        F.sum(rsum).alias("stot"),
    )
    n = F.col("n")
    w = (12 * (F.col("ssum") - F.col("stot") * F.col("stot") / n)) / (
        9 * (n * n * n - n)
    )
    return s.select(
        n.cast("bigint").alias("docs"), ratio(w).alias("kendall_w")
    )
