"""Wave 102: deterministic heavy hitters, schema compatibility
auditing, embedding-space alignment, and peak-to-mean capacity.

sketch_misra_gries is the Misra–Gries heavy-hitter summary — k
counters per partition, merged by counter addition + decrement, with
the deterministic guarantee (anything with frequency > n/k SURVIVES)
that sampling and CMS can only promise probabilistically;
io_schema_compat_audit classifies schema changes into
backward/forward/breaking compatibility classes — the registry check
that belongs in CI, not in an incident review; ml_procrustes_align
finds the orthogonal map between two embedding 'runs' and reports the
residual — 'did the new encoder rotate the space or actually change
it'; ev_peak_to_mean is the peak-hour-to-mean load ratio per event
type — the one number capacity planning starts from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.duck_linalg import duck_jacobi_eigvals
from mister_spark.registry import query

MG_K = 8  # Misra-Gries counters
PROC_RIDGE = 0.0


@query(
    "sketch_misra_gries",
    # Round-11 rows-only conversion (same move as stat_freq_items):
    # the per-partition counter STATE is order-dependent, but the MG
    # merge guarantee (every item with frequency > n/(k+1) survives
    # the merged summary) makes sketch-candidates → exact-verify
    # deterministic. The emitted set and counts — strict heavy
    # hitters at the n/(k+1) threshold, plus the closed-form
    # worst-case MG floor — replay exactly in DuckDB. A merge that
    # ever violated the retention guarantee now fails the hash check.
    oracle=f"""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM events),
    c AS (SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1)
    SELECT c.item, c.cnt AS exact_count, n.total AS n_total,
           c.cnt - n.total // {MG_K + 1} AS mg_count_floor
    FROM c CROSS JOIN n
    WHERE c.cnt * {MG_K + 1} > n.total
    """,
)
def sketch_misra_gries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries heavy hitters over the event-type stream with
    k = {k} counters: each partition maintains the classic
    counter-decrement summary in one pass; summaries MERGE by adding
    counters then decrementing by the (k+1)-th largest — preserving
    the deterministic guarantee that every item with true frequency
    > n/(k+1) survives the merged summary, undercounted by at most
    n/(k+1). The merged survivors are then verified with ONE exact
    aggregation restricted to them, and the emitted rows are the
    strict heavy hitters at the n/(k+1) threshold with exact counts
    and the closed-form worst-case MG floor — fully deterministic,
    which is what upgraded this key from rows-only to an exact
    DuckDB oracle in r11 (the run-dependent mg_count column is the
    one thing that had to go; the pytest gate still checks it on the
    raw summary).

    Scale: one narrow Arrow pass with O(k) state per partition and an
    O(partitions·k) driver merge — no shuffle of the data at all; the
    verify is one partial-agg rollup over candidate-filtered rows."""
    import pandas as pd

    ev = cat(spark, sf_dir)["events"].select("event_type")

    def mg(batches):
        counters: dict[str, int] = {}
        n = 0
        for pdf in batches:
            for v in pdf["event_type"]:
                n += 1
                if v in counters:
                    counters[v] += 1
                elif len(counters) < MG_K:
                    counters[v] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {
                "item": list(counters) + ["__n__"],
                "cnt": list(counters.values()) + [n],
            }
        )

    parts = ev.mapInPandas(mg, "item string, cnt long").collect()
    merged: dict[str, int] = {}
    n_total = 0
    for r in parts:
        if r["item"] == "__n__":
            n_total += int(r["cnt"])
        else:
            merged[r["item"]] = merged.get(r["item"], 0) + int(r["cnt"])
    if len(merged) > MG_K:
        cut = sorted(merged.values(), reverse=True)[MG_K]
        merged = {
            k2: v - cut for k2, v in merged.items() if v - cut > 0
        }
    # exact verify restricted to the model-sized survivor list; the
    # MG retention guarantee makes the filtered result equal to the
    # exact strict heavy hitters at the n/(k+1) threshold
    floor_bound = n_total // (MG_K + 1)
    return (
        ev.filter(F.col("event_type").isin(list(merged)))
        .groupBy(F.col("event_type").alias("item"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
        .filter(F.col("exact_count") * (MG_K + 1) > F.lit(n_total))
        .withColumn("n_total", F.lit(n_total).cast("bigint"))
        .withColumn(
            "mg_count_floor",
            (F.col("exact_count") - F.lit(floor_bound)).cast("bigint"),
        )
    )


sketch_misra_gries.__doc__ = sketch_misra_gries.__doc__.format(k=MG_K)


@query(
    "io_schema_compat_audit",
    # Real oracle: the audit is a data-independent function of the
    # orders schema and the three planted changes — the expected
    # classification is a fixed relation, pinned literally.
    oracle="""
    SELECT * FROM (VALUES
      ('o_channel', 'added', '', 'string', 'backward_compatible'),
      ('o_custkey', 'type_changed', 'bigint', 'string', 'breaking'),
      ('o_orderdate', 'unchanged', 'timestamp_ntz', 'timestamp_ntz',
       'compatible'),
      ('o_orderkey', 'unchanged', 'bigint', 'bigint', 'compatible'),
      ('o_orderpriority', 'dropped', 'string', '', 'forward_breaking'),
      ('o_orderstatus', 'unchanged', 'string', 'string', 'compatible'),
      ('o_totalprice', 'unchanged', 'double', 'double', 'compatible'))
      t("column", change, v1, v2, compat)
    """,
)
def io_schema_compat_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution compatibility audit between the orders schema
    v1 (as stored) and a candidate v2 (drops o_orderpriority, adds a
    nullable o_channel, widens o_custkey long→string): each change is
    classified — ADD nullable = backward-compatible (old readers
    ignore it), DROP = forward-breaking (old writers' consumers lose
    a column), TYPE change = breaking both ways unless widening along
    the promotion lattice. The registry-compat check that belongs in
    CI before any writer ships.

    Scale: pure schema metadata — no data read at all beyond the
    footer."""
    orders = cat(spark, sf_dir)["orders"]
    v1 = {f.name: f.dataType.simpleString() for f in orders.schema.fields}
    v2 = dict(v1)
    del v2["o_orderpriority"]
    v2["o_channel"] = "string"
    v2["o_custkey"] = "string"
    promotions = {("int", "bigint"), ("float", "double"), ("bigint", "double")}
    rows = []
    for col in sorted(set(v1) | set(v2)):
        if col in v1 and col not in v2:
            rows.append((col, "dropped", v1[col], "", "forward_breaking"))
        elif col not in v1 and col in v2:
            rows.append((col, "added", "", v2[col], "backward_compatible"))
        elif v1[col] != v2[col]:
            cls = (
                "widening_compatible"
                if (v1[col], v2[col]) in promotions
                else "breaking"
            )
            rows.append((col, "type_changed", v1[col], v2[col], cls))
        else:
            rows.append((col, "unchanged", v1[col], v2[col], "compatible"))
    return spark.createDataFrame(
        rows, "column string, change string, v1 string, v2 string, "
        "compat string"
    )


@query(
    "ml_procrustes_align",
    # Real oracle: the residuals need only tr(M) and the NUCLEAR norm
    # Σσ(M) of the 64×64 cross-covariance — never the rotation itself —
    # and σᵢ(M) = sqrt(λᵢ(MᵀM)), which the shared tournament-Jacobi
    # recursion (duck_linalg.duck_jacobi_eigvals, 10 sweeps for this
    # 6-decade spectrum) reproduces to ~5e-14 vs LAPACK's SVD; all
    # grids sit ≥ 2e-7 from their nearest boundary at both compare
    # scales. The rotation R = UVᵀ stays un-oracled: like
    # eigenvectors, its columns are direction-conditioned.
    oracle=f"""
    WITH RECURSIVE
    pr AS (SELECT a.vec_id // 2 AS pid,
                  CAST(a.embedding AS DOUBLE[]) AS va,
                  CAST(b.embedding AS DOUBLE[]) AS vb
           FROM embeddings a JOIN embeddings b
             ON b.vec_id = a.vec_id + 1
           WHERE a.vec_id % 2 = 0),
    m_ss AS (SELECT p.i AS i, p.j AS j, SUM(e.va[p.i] * e.vb[p.j]) AS m
        FROM pr e
        CROSS JOIN LATERAL (
          SELECT i.i AS i, j.j AS j
          FROM (SELECT unnest(range(1, 65)) AS i) i,
               (SELECT unnest(range(1, 65)) AS j) j) p
        GROUP BY p.i, p.j),
    mm AS (SELECT list(row ORDER BY i) AS m FROM (
        SELECT q.i AS i, list(q.m ORDER BY q.j) AS row
        FROM m_ss q GROUP BY q.i) g),
    mat AS (SELECT list_transform(range(1, 65), i ->
              list_transform(range(1, 65), j ->
                list_aggregate(list_transform(range(1, 65), k ->
                  mm.m[k][i] * mm.m[k][j]), 'sum'))) AS a
            FROM mm),
    norms AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     SUM(list_aggregate(list_transform(va, x -> x * x),
                                        'sum')) AS na,
                     SUM(list_aggregate(list_transform(vb, x -> x * x),
                                        'sum')) AS nb
              FROM pr),
    trm AS (SELECT list_aggregate(list_transform(range(1, 65), i ->
                     mm.m[i][i]), 'sum') AS tr FROM mm),
    {duck_jacobi_eigvals(64, 10)},
    sv AS (SELECT list_aggregate(list_transform(eig.ev, x ->
                    SQRT(GREATEST(x, 0.0))), 'sum') AS s FROM eig)
    SELECT norms.n AS pairs, CAST(64 AS BIGINT) AS dim,
           FLOOR((norms.na + norms.nb - 2 * trm.tr)
                 / (norms.na + norms.nb) * 1e6 + 0.5) / 1e6
             AS resid_share_before,
           FLOOR((norms.na + norms.nb - 2 * sv.s)
                 / (norms.na + norms.nb) * 1e6 + 0.5) / 1e6
             AS resid_share_after,
           FLOOR(sv.s * 1e4 + 0.5) / 1e4 AS trace_norm
    FROM norms, trm, sv
    """,
)
def ml_procrustes_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orthogonal Procrustes alignment between two embedding 'runs'
    (vectors of even vs odd vec_ids, paired by vec_id // 2): find the
    rotation R minimizing ‖A·R − B‖_F via SVD of AᵀB and report the
    residual share before/after. If a re-embedding only ROTATED the
    space, after-alignment residual collapses; if it truly moved
    content, it doesn't — the check before declaring two encoder
    versions 'compatible'.

    Scale: AᵀB and the norms come from ONE Arrow pass of paired rows
    emitting O(d²) partials; the d×d SVD is driver-side; nothing
    data-sized is collected."""
    import numpy as np
    import pandas as pd

    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.filter(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") / 2).cast("long").alias("pid"),
        F.col("v").alias("va"),
    )
    b = emb.filter(F.col("vec_id") % 2 == 1).select(
        ((F.col("vec_id") - 1) / 2).cast("long").alias("pid"),
        F.col("v").alias("vb"),
    )
    pairs = a.join(b, "pid")

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(list(pdf["va"]), dtype=np.float64)
            B = np.array(list(pdf["vb"]), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(A)],
                    "ab": [(A.T @ B).ravel().tolist()],
                    "na": [float((A * A).sum())],
                    "nb": [float((B * B).sum())],
                }
            )

    rows = pairs.mapInPandas(
        partials, "n long, ab array<double>, na double, nb double"
    ).collect()
    n = sum(r["n"] for r in rows)
    d = int(len(rows[0]["ab"]) ** 0.5)
    M = np.sum([np.array(r["ab"]).reshape(d, d) for r in rows], axis=0)
    na = sum(r["na"] for r in rows)
    nb = sum(r["nb"] for r in rows)
    U, sv, Vt = np.linalg.svd(M)
    # ||A R - B||^2 = ||A||^2 + ||B||^2 - 2 tr(R^T A^T B); optimum R=UV^T
    before = na + nb - 2 * float(np.trace(M))
    after = na + nb - 2 * float(sv.sum())
    row = (
        int(n),
        d,
        round(before / (na + nb), 6),
        round(after / (na + nb), 6),
        round(float(sv.sum()), 4),
    )
    return spark.createDataFrame(
        [row],
        "pairs long, dim long, resid_share_before double, "
        "resid_share_after double, trace_norm double",
    )


@query(
    "ev_peak_to_mean",
    oracle="""
    WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                      CAST(COUNT(*) AS DOUBLE) AS n
               FROM events GROUP BY 1, 2)
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS peak_hour_events,
           FLOOR(AVG(n) * 10000 + 0.5) / 10000 AS mean_hour_events,
           FLOOR(MAX(n) / AVG(n) * 10000 + 0.5) / 10000 AS peak_to_mean
    FROM h GROUP BY 1
    """,
)
def ev_peak_to_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-to-mean hourly load ratio per event type (over observed
    hours): the burstiness number capacity planning divides by —
    provisioning for the mean × this ratio instead of the mean is the
    difference between an SLO and an outage.

    Scale: one hourly partial-agg rollup, then a |types|-row
    aggregate."""
    ev = cat(spark, sf_dir)["events"]
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    return h.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("peak_hour_events"),
        ratio(F.avg("n")).alias("mean_hour_events"),
        ratio(F.max("n") / F.avg("n")).alias("peak_to_mean"),
    )
