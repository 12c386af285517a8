"""Wave 71: spectral centrality, factorial ANOVA, canary auditing, and
semantic outlier detection.

graph_eigencentrality brings the spectral ranking (power iteration on
the adjacency) next to PageRank and HITS; stat_two_way_anova
decomposes value variance over the event-type × weekday factorial
(main effects AND the interaction — the piece one-way ANOVA can't
see); tx_canary_detect is the data-provenance audit for planted canary
strings (reporting provable ZEROS is the point); tx_semantic_outliers
flags documents far from their source's embedding centroid — the
misfiled-content detector that pure text stats miss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import DUCK_COPURCHASE_SYM
from mister_spark.registry import query

EIG_ITERS = 12
EIG_TOP = 15
CANARIES = ("scan", "melonberry", "canary_xyzzy_7")  # 1 real + 2 absent
OUTLIER_PER_SOURCE = 2


@query(
    "graph_eigencentrality",
    # Real oracle: x ← Ax / ‖Ax‖ as a recursive CTE — the neighbor-sum
    # aggregate and the L2 window normalization both run inside the
    # recursive term; output rounded to 6dp under the shared
    # floor-rounding rule, ordered by (rounded score, node) exactly
    # like the Spark frame.
    oracle=f"""
    WITH RECURSIVE {DUCK_COPURCHASE_SYM},
    eig AS (
      -- CAST: the base term fixes the recursive column's type, and a
      -- bare 1.0 is DECIMAL(2,1) — every later score would be
      -- truncated to one decimal digit
      SELECT 0 AS it, p1 AS node, CAST(1.0 AS DOUBLE) AS s
      FROM (SELECT DISTINCT p1 FROM csym)
      UNION ALL
      SELECT it + 1, node, s FROM (
        SELECT r.it, r.node,
               r.s / SQRT(SUM(r.s * r.s) OVER (PARTITION BY r.it)) AS s
        FROM (SELECT x.it, e.p1 AS node, SUM(x.s) AS s
              FROM eig x JOIN csym e ON e.p2 = x.node
              WHERE x.it < {EIG_ITERS}
              GROUP BY x.it, e.p1) r) n
    )
    SELECT CAST(node AS BIGINT) AS node,
           FLOOR(s * 1e6 + 0.5) / 1e6 AS centrality
    FROM eig WHERE it = {EIG_ITERS}
    ORDER BY centrality DESC, node LIMIT {EIG_TOP}
    """,
)
def graph_eigencentrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eigenvector centrality of the co-purchase graph: {it} power
    iterations of x ← Ax / ‖Ax‖ on the symmetric adjacency — a node is
    central when its neighbors are central (the recursive definition
    PageRank dampens and HITS splits). Top {top} nodes reported.

    Scale: each iteration is one edges⋈scores equi-join + a node
    rollup, L2 norm via 1-row broadcast, `localCheckpoint` per round —
    identical plan shape to graph_hits."""
    from mister_spark.operators.extras47 import _copurchase_edges

    e0 = _copurchase_edges(spark, sf_dir).select("p1", "p2")
    e = e0.unionAll(
        e0.select(F.col("p2").alias("p1"), F.col("p1").alias("p2"))
    ).localCheckpoint()
    x = e.select(F.col("p1").alias("node")).distinct().withColumn(
        "s", F.lit(1.0)
    )
    for _ in range(EIG_ITERS):
        nx = (
            e.join(x, e["p2"] == x["node"])
            .groupBy("p1")
            .agg(F.sum("s").alias("s"))
            .select(F.col("p1").alias("node"), "s")
        )
        nrm = nx.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("n"))
        x = (
            nx.join(F.broadcast(nrm))
            .select("node", (F.col("s") / F.col("n")).alias("s"))
            .localCheckpoint()
        )
    from mister_spark.operators.common import rnd

    return (
        x.select(
            F.col("node").cast("bigint").alias("node"),
            rnd(F.col("s"), 6).alias("centrality"),
        )
        .orderBy(F.desc("centrality"), "node")
        .limit(EIG_TOP)
    )


graph_eigencentrality.__doc__ = graph_eigencentrality.__doc__.format(
    it=EIG_ITERS, top=EIG_TOP
)


@query(
    "stat_two_way_anova",
    oracle=f"""
    WITH e AS (SELECT event_type AS a,
                      CAST(isodow(CAST(date_trunc('day', ts) AS DATE))
                           AS BIGINT) AS b,
                      value AS y
               FROM events),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(y) AS sy,
                   SUM(y * y) AS syy
            FROM e),
    ca AS (SELECT a, CAST(COUNT(*) AS DOUBLE) AS n, SUM(y) AS s
           FROM e GROUP BY 1),
    cb AS (SELECT b, CAST(COUNT(*) AS DOUBLE) AS n, SUM(y) AS s
           FROM e GROUP BY 1),
    cab AS (SELECT a, b, CAST(COUNT(*) AS DOUBLE) AS n, SUM(y) AS s
            FROM e GROUP BY 1, 2),
    ss AS (SELECT
             (SELECT SUM(s * s / n) FROM ca) - tot.sy * tot.sy / tot.n AS ssa,
             (SELECT SUM(s * s / n) FROM cb) - tot.sy * tot.sy / tot.n AS ssb,
             (SELECT SUM(s * s / n) FROM cab) - tot.sy * tot.sy / tot.n
               AS sscells,
             tot.syy - tot.sy * tot.sy / tot.n AS sst,
             (SELECT CAST(COUNT(*) AS DOUBLE) FROM ca) - 1 AS dfa,
             (SELECT CAST(COUNT(*) AS DOUBLE) FROM cb) - 1 AS dfb,
             (SELECT CAST(COUNT(*) AS DOUBLE) FROM cab) - 1 AS dfcells,
             tot.n AS n
           FROM tot),
    fx AS (SELECT 'event_type' AS effect, ssa AS ss, dfa AS df1,
                  n - dfcells - 1 AS df2,
                  (ssa / dfa) / ((sst - sscells) / (n - dfcells - 1)) AS f
           FROM ss
           UNION ALL
           SELECT 'weekday', ssb, dfb, n - dfcells - 1,
                  (ssb / dfb) / ((sst - sscells) / (n - dfcells - 1))
           FROM ss
           UNION ALL
           SELECT 'interaction', sscells - ssa - ssb,
                  dfcells - dfa - dfb, n - dfcells - 1,
                  ((sscells - ssa - ssb) / (dfcells - dfa - dfb))
                  / ((sst - sscells) / (n - dfcells - 1))
           FROM ss)
    SELECT effect, CAST(df1 AS BIGINT) AS df1, CAST(df2 AS BIGINT) AS df2,
           FLOOR(f * 10000 + 0.5) / 10000 AS f_stat,
           FLOOR(2 * {normal_sf_sql("sqrt(GREATEST(f, 0.0))")}
                 * 10000 + 0.5) / 10000 AS p_approx
    FROM fx
    """,
)
def stat_two_way_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way factorial ANOVA of event value over event-type ×
    ISO-weekday: main-effect and interaction sums of squares from the
    cell-mean decomposition (SS_AB = SS_cells − SS_A − SS_B), F ratios
    against the within-cell error. p_approx uses the shared χ²₁-style
    normal tail on √F — a monotone screen, exact F quantiles need an
    incomplete beta neither engine exposes (documented approximation,
    identical in both engines so parity is exact).

    Scale: three rollups (|A|, |B|, |A·B| groups) + one total row —
    the factorial never materializes row-level state."""
    ev = cat(spark, sf_dir)["events"]
    e = ev.select(
        F.col("event_type").alias("a"),
        (F.expr("weekday(date_trunc('day', ts))") + 1)
        .cast("bigint")
        .alias("b"),
        F.col("value").alias("y"),
    ).localCheckpoint()
    y = F.col("y")
    tot = e.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
    )
    ca = e.groupBy("a").agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.sum(y).alias("s")
    )
    cb = e.groupBy("b").agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.sum(y).alias("s")
    )
    cab = e.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.sum(y).alias("s")
    )
    def _ssq(df):
        return df.agg(
            F.sum(F.col("s") * F.col("s") / F.col("n")).alias("ssq"),
            F.count(F.lit(1)).cast("double").alias("k"),
        )

    sa, sb, sab = _ssq(ca), _ssq(cb), _ssq(cab)
    ss = (
        tot.join(F.broadcast(sa.select(F.col("ssq").alias("qa"), F.col("k").alias("ka"))))
        .join(F.broadcast(sb.select(F.col("ssq").alias("qb"), F.col("k").alias("kb"))))
        .join(F.broadcast(sab.select(F.col("ssq").alias("qab"), F.col("k").alias("kab"))))
    )
    n, sy, syy = F.col("n"), F.col("sy"), F.col("syy")
    cm = sy * sy / n
    ssa = F.col("qa") - cm
    ssb = F.col("qb") - cm
    sscells = F.col("qab") - cm
    sst = syy - cm
    dfa = F.col("ka") - 1
    dfb = F.col("kb") - 1
    dfcells = F.col("kab") - 1
    df2 = n - dfcells - 1
    mse = (sst - sscells) / df2
    rows = []
    for name, ssx, dfx in [
        ("event_type", ssa, dfa),
        ("weekday", ssb, dfb),
        ("interaction", sscells - ssa - ssb, dfcells - dfa - dfb),
    ]:
        fstat = (ssx / dfx) / mse
        rows.append(
            ss.select(
                F.lit(name).alias("effect"),
                dfx.cast("bigint").alias("df1"),
                df2.cast("bigint").alias("df2"),
                ratio(fstat).alias("f_stat"),
                ratio(
                    2 * normal_sf(F.sqrt(F.greatest(fstat, F.lit(0.0))))
                ).alias("p_approx"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@query(
    "tx_canary_detect",
    oracle=f"""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split(text, ' '), x -> x <> '')
                        AS toks
               FROM documents),
    c AS (SELECT unnest(['{CANARIES[0]}', '{CANARIES[1]}',
                         '{CANARIES[2]}']) AS canary),
    h AS (SELECT c.canary, t.doc_id,
                 CAST(len(list_filter(t.toks, x -> x = c.canary)) AS BIGINT)
                   AS occ
          FROM c CROSS JOIN t)
    SELECT canary,
           CAST(SUM(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs,
           CAST(SUM(occ) AS BIGINT) AS n_occurrences
    FROM h GROUP BY canary
    """,
)
def tx_canary_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canary-string audit: exact-token sweep for a configured canary
    list — one real token plus two planted canaries that MUST report
    zero (memorization canaries, poisoning markers, copyright traps).
    The zeros are the product: 'we looked, with this exact query, and
    it is not there'.

    Scale: the canary list broadcasts; matching is a JVM array filter
    per row — one scan for any number of canaries, no token shuffle."""
    from mister_spark.functions.text import tokens

    docs = cat(spark, sf_dir)["documents"].select(
        "doc_id", tokens().alias("toks")
    )
    c = spark.createDataFrame([(x,) for x in CANARIES], "canary string")
    h = docs.join(F.broadcast(c)).select(
        "canary",
        F.size(
            F.filter(F.col("toks"), lambda x: x == F.col("canary"))
        ).cast("bigint").alias("occ"),
    )
    return h.groupBy("canary").agg(
        F.sum((F.col("occ") > 0).cast("int")).cast("bigint").alias("n_docs"),
        F.sum("occ").cast("bigint").alias("n_occurrences"),
    )


@query(
    "tx_semantic_outliers",
    oracle=f"""
    WITH dv AS (SELECT d.source, e.vec_id AS doc_id,
                       CAST(e.embedding AS DOUBLE[]) AS v
                FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
    dims AS (SELECT source, doc_id, u.i AS dim,
                    v[u.i] AS x
             FROM dv, unnest(generate_series(1, len(v))) AS u(i)),
    cent AS (SELECT source, dim, AVG(x) AS m FROM dims GROUP BY 1, 2),
    dots AS (SELECT d.source, d.doc_id,
                    SUM(d.x * c.m) AS dp,
                    SUM(d.x * d.x) AS nx,
                    SUM(c.m * c.m) AS nc
             FROM dims d JOIN cent c ON d.source = c.source AND d.dim = c.dim
             GROUP BY 1, 2),
    sc AS (SELECT source, doc_id,
                  FLOOR(dp / sqrt(nx * nc) * 10000 + 0.5) / 10000 AS cos
           FROM dots),
    rk AS (SELECT source, doc_id, cos,
                  ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY cos, doc_id) AS rn
           FROM sc)
    SELECT source, doc_id, cos, CAST(rn AS BIGINT) AS rn
    FROM rk WHERE rn <= {OUTLIER_PER_SOURCE}
    """,
)
def tx_semantic_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic outlier detection: each document's cosine to its
    SOURCE's embedding centroid, reporting the {k} least-typical docs
    per source — the misfiled/contaminated-content detector that
    lexical stats can't see (the text looks fine; it's just in the
    wrong bucket).

    Scale: centroids are a (source, dim) rollup (|sources|·d cells);
    the cosine recomputes through the same exploded-dims frame so both
    engines sum in identical group structure; the per-source window is
    {k}-bounded."""
    c = cat(spark, sf_dir)
    dv = c["documents"].select("doc_id", "source").join(
        c["embeddings"].select(
            F.col("vec_id").alias("doc_id"),
            F.col("embedding").cast("array<double>").alias("v"),
        ),
        "doc_id",
    )
    dims = dv.select(
        "source", "doc_id", F.posexplode("v").alias("dim0", "x")
    ).select("source", "doc_id", (F.col("dim0") + 1).alias("dim"), "x")
    cent = dims.groupBy("source", "dim").agg(F.avg("x").alias("m"))
    dots = (
        dims.join(cent, ["source", "dim"])
        .groupBy("source", "doc_id")
        .agg(
            F.sum(F.col("x") * F.col("m")).alias("dp"),
            F.sum(F.col("x") * F.col("x")).alias("nx"),
            F.sum(F.col("m") * F.col("m")).alias("nc"),
        )
    )
    sc = dots.select(
        "source",
        "doc_id",
        ratio(F.col("dp") / F.sqrt(F.col("nx") * F.col("nc"))).alias("cos"),
    )
    wr = W.partitionBy("source").orderBy("cos", "doc_id")
    return (
        sc.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= OUTLIER_PER_SOURCE)
        .select("source", "doc_id", "cos", F.col("rn").cast("bigint").alias("rn"))
    )


tx_semantic_outliers.__doc__ = tx_semantic_outliers.__doc__.format(
    k=OUTLIER_PER_SOURCE
)
