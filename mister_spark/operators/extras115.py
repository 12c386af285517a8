"""Wave 115: collation-aware SQL, mRMR feature selection, and greedy
matching.

sql_collations pins Spark 4's string collation surface — grouping and
equality under UTF8_LCASE without scattering lower() everywhere (and
without breaking pushdown the way expression-wrapped keys do);
ml_mrmr_selection picks features by max-relevance-min-redundancy from
ONE O(d²) moments pass — the selection that refuses ten copies of the
same good feature, which univariate screens happily keep;
graph_greedy_matching builds a maximal matching on the co-purchase
graph deterministically — the assignment primitive, with the 1/2-
approximation guarantee checked by its own invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import (
    DUCK_COPURCHASE_SYM,
    _copurchase_edges,
)
from mister_spark.registry import query

MRMR_K = 6
MATCH_ROUNDS = 6


@query(
    "sql_collations",
    oracle="""
    WITH t AS (SELECT CASE WHEN o_orderkey % 3 = 0
                           THEN UPPER(o_orderpriority)
                           WHEN o_orderkey % 3 = 1
                           THEN LOWER(o_orderpriority)
                           ELSE o_orderpriority END AS pri_mixed
               FROM orders)
    SELECT LOWER(pri_mixed) AS pri_ci,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM t GROUP BY 1
    """,
)
def sql_collations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collation surface: priorities deliberately mixed-cased,
    then grouped under a UTF8_LCASE collation — 'URGENT', 'urgent',
    'Urgent' land in ONE group without a lower() wrapped around the
    key. Collations carry case semantics in the TYPE, so comparisons,
    joins, and groupings inherit them (and the optimizer still sees a
    plain column). The oracle mirrors with explicit lower().

    Scale: collation comparison is JVM-side; the rollup is one
    partial-agg shuffle; the output key is normalized to lower for
    cross-engine comparison."""
    orders = cat(spark, sf_dir)["orders"]
    mixed = (
        F.when(
            F.col("o_orderkey") % 3 == 0, F.upper("o_orderpriority")
        )
        .when(F.col("o_orderkey") % 3 == 1, F.lower("o_orderpriority"))
        .otherwise(F.col("o_orderpriority"))
    )
    orders.select(mixed.alias("pri_mixed")).createOrReplaceTempView(
        "_coll_t"
    )
    return spark.sql(
        """
        SELECT LOWER(MIN(pri_mixed)) AS pri_ci,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT pri_mixed,
                     pri_mixed COLLATE UTF8_LCASE AS grp
              FROM _coll_t)
        GROUP BY grp
        """
    )


def _mrmr_mi_sql(n11: str, n1_: str, n_1: str) -> str:
    """Binary-pair mutual information with the exact term order and
    guards of the Python mi_from_counts: (a,b) in (0,0),(0,1),(1,0),
    (1,1), each CASE-gated on pab/pa/pb > 0. All counts are
    integer-valued doubles, so the four-term left-to-right sum is the
    same on both engines."""
    terms = []
    for a in (0, 1):
        for b in (0, 1):
            if a and b:
                nab = n11
            elif a:
                nab = f"({n1_} - {n11})"
            elif b:
                nab = f"({n_1} - {n11})"
            else:
                nab = f"(nn - {n1_} - {n_1} + {n11})"
            pa = f"({n1_} / nn)" if a else f"(1 - {n1_} / nn)"
            pb = f"({n_1} / nn)" if b else f"(1 - {n_1} / nn)"
            pab = f"({nab} / nn)"
            terms.append(
                f"CASE WHEN {pab} > 0 AND {pa} > 0 AND {pb} > 0"
                f" THEN {pab} * LN({pab} / ({pa} * {pb})) ELSE 0 END"
            )
    return "(" + " + ".join(terms) + ")"


def _mrmr_oracle() -> str:
    """The 6-step greedy unrolled: relevance/pairwise MI from exact
    integer count tables, each step's redundancy written as the
    selection-ordered mean over the prior picks (the Python np.mean
    order), and the pick rule replicated as 'lowest dim within 1e-15
    of the max score'."""
    parts = [
        """feat AS MATERIALIZED (SELECT vec_id,
                    CAST(label % 2 AS DOUBLE) AS y, g.i AS dim,
                    CASE WHEN CAST(embedding[CAST(g.i AS INT) + 1]
                              AS DOUBLE) >= 0
                         THEN 1.0 ELSE 0.0 END AS x
             FROM embeddings,
                  LATERAL (SELECT unnest(range(0, 64)) AS i) g)""",
        """tot AS MATERIALIZED (SELECT CAST(COUNT(DISTINCT vec_id) AS DOUBLE) AS nn,
                    SUM(CASE WHEN dim = 0 THEN y ELSE 0 END) AS sy
             FROM feat)""",
        """sx AS MATERIALIZED (SELECT dim, SUM(x) AS sx, SUM(x * y) AS sxy
             FROM feat GROUP BY dim)""",
        f"""rel AS MATERIALIZED (SELECT s.dim,
                    {_mrmr_mi_sql("s.sxy", "s.sx", "t.sy")} AS r
             FROM sx s, tot t)""",
        f"""mi AS MATERIALIZED (SELECT p.di AS i, p.dj AS j,
                   {_mrmr_mi_sql("p.sxx", "sa.sx", "sb.sx")} AS m
             FROM (SELECT fa.dim AS di, fb.dim AS dj,
                          SUM(fa.x * fb.x) AS sxx
                   FROM feat fa JOIN feat fb ON fa.vec_id = fb.vec_id
                   GROUP BY 1, 2) p
             JOIN sx sa ON sa.dim = p.di
             JOIN sx sb ON sb.dim = p.dj
             CROSS JOIN tot t)""",
    ]
    for r in range(1, MRMR_K + 1):
        if r == 1:
            score = "rel.r"
            frm = "rel"
        else:
            red = " + ".join(
                f"m{k}.m" for k in range(1, r)
            )
            joins = " ".join(
                f"JOIN mi m{k} ON m{k}.i = rel.dim"
                f" AND m{k}.j = s{k}.dim"
                for k in range(1, r)
            )
            crosses = "".join(f", s{k}" for k in range(1, r))
            score = f"rel.r - ({red}) / {r - 1}"
            frm = f"rel{crosses} {joins}"
        parts.append(f"""
    c{r} AS (SELECT rel.dim, rel.r, {score} AS sc
             FROM {frm}
             WHERE rel.dim NOT IN ({", ".join(f"(SELECT dim FROM s{k})" for k in range(1, r)) or "-1"}))""")
        parts.append(f"""
    s{r} AS (SELECT dim, r, sc FROM c{r},
                  (SELECT MAX(sc) AS mx FROM c{r}) m
             WHERE sc >= m.mx - 1e-15
             ORDER BY dim LIMIT 1)""")
    unions = "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS BIGINT) AS rank,
               CAST(s{r}.dim AS BIGINT) AS dim,
               FLOOR(s{r}.r * 1e6 + 0.5) / 1e6 AS relevance,
               FLOOR(s{r}.sc * 1e6 + 0.5) / 1e6 AS mrmr_score
        FROM s{r}"""
        for r in range(1, MRMR_K + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + unions


@query("ml_mrmr_selection", oracle=_mrmr_oracle())
def ml_mrmr_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mRMR feature selection over the binarized embedding dims
    (feature = sign bit, label = label%2): relevance = MI(f, y),
    redundancy = mean MI(f, already-selected); greedily pick {k}
    features maximizing relevance − redundancy. All pairwise MIs come
    from ONE O(d²) moments pass (binary features: every 2×2 table is
    reconstructible from E[fi], E[fj], E[fi·fj]); the greedy loop is
    driver arithmetic on the d×d MI matrix. The selector that refuses
    ten correlated copies of one signal.

    Scale: the moments pass emits O(d²) partials per partition —
    model-sized; no second scan, no per-feature jobs."""
    import math

    import numpy as np
    import pandas as pd

    emb = cat(spark, sf_dir)["embeddings"].select(
        F.col("embedding").cast("array<double>").alias("v"),
        (F.col("label") % 2).cast("double").alias("y"),
    )

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = (np.array(list(pdf["v"]), dtype=np.float64) >= 0).astype(
                np.float64
            )
            y = pdf["y"].to_numpy()
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "sx": [X.sum(axis=0).tolist()],
                    "sxx": [(X.T @ X).ravel().tolist()],
                    "sxy": [(X.T @ y).tolist()],
                    "sy": [float(y.sum())],
                }
            )

    rows = emb.mapInPandas(
        partials,
        "n long, sx array<double>, sxx array<double>, sxy array<double>, "
        "sy double",
    ).collect()
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["sx"])
    sx = np.sum([np.array(r["sx"]) for r in rows], axis=0)
    sxx = np.sum([np.array(r["sxx"]).reshape(d, d) for r in rows], axis=0)
    sxy = np.sum([np.array(r["sxy"]) for r in rows], axis=0)
    sy = sum(r["sy"] for r in rows)

    def mi_from_counts(n11, n1_, n_1, n):
        # MI of two binary vars from joint/marginal counts
        total = 0.0
        for a in (0, 1):
            for b in (0, 1):
                if a and b:
                    nab = n11
                elif a:
                    nab = n1_ - n11
                elif b:
                    nab = n_1 - n11
                else:
                    nab = n - n1_ - n_1 + n11
                pa = n1_ / n if a else 1 - n1_ / n
                pb = n_1 / n if b else 1 - n_1 / n
                pab = nab / n
                if pab > 0 and pa > 0 and pb > 0:
                    total += pab * math.log(pab / (pa * pb))
        return total

    rel = np.array(
        [mi_from_counts(sxy[i], sx[i], sy, n) for i in range(d)]
    )
    selected: list[int] = []
    out = []
    for step in range(MRMR_K):
        best, best_score = -1, -1e18
        for i in range(d):
            if i in selected:
                continue
            red = (
                np.mean(
                    [
                        mi_from_counts(sxx[i, j], sx[i], sx[j], n)
                        for j in selected
                    ]
                )
                if selected
                else 0.0
            )
            score = rel[i] - red
            if score > best_score + 1e-15 or (
                abs(score - best_score) <= 1e-15 and i < best
            ):
                best, best_score = i, score
        selected.append(best)
        out.append(
            (
                step + 1,
                best,
                math.floor(float(rel[best]) * 1e6 + 0.5) / 1e6,
                math.floor(float(best_score) * 1e6 + 0.5) / 1e6,
            )
        )
    return spark.createDataFrame(
        out, "rank long, dim long, relevance double, mrmr_score double"
    )


ml_mrmr_selection.__doc__ = ml_mrmr_selection.__doc__.format(k=MRMR_K)


@query(
    "graph_greedy_matching",
    # Real oracle: each greedy round in ONE window scan over the
    # symmetric edge list — pv(u) = MIN(v) OVER (PARTITION BY u) and
    # pv(v) = MIN(u) OVER (PARTITION BY v) (symmetry puts both
    # directions in the relation), a handshake row has pv(u)=v AND
    # pv(v)=u, and 'endpoint is matched' is a MAX of the handshake
    # flag over each endpoint partition (the mirror row carries v's
    # handshake into the PARTITION BY v group). Matched pairs are
    # recomputed per round stamp from the CTE's cumulative output. A
    # nonempty graph always has a handshake (the global-min node's
    # proposal is always returned), so the Spark loop's hs-empty break
    # never fires and the round cap is the only stop — identical
    # control flow.
    oracle=f"""
    WITH RECURSIVE {DUCK_COPURCHASE_SYM},
    live AS (
      SELECT 0 AS it, p1 AS u, p2 AS v FROM csym
      UNION ALL
      SELECT it + 1, u, v FROM (
        SELECT it, u, v,
               MAX(hs) OVER (PARTITION BY u) AS mu,
               MAX(hs) OVER (PARTITION BY v) AS mv
        FROM (SELECT it, u, v,
                     CASE WHEN MIN(v) OVER (PARTITION BY u) = v
                           AND MIN(u) OVER (PARTITION BY v) = u
                          THEN 1 ELSE 0 END AS hs
              FROM live) t1) t2
      WHERE it < {MATCH_ROUNDS} AND mu = 0 AND mv = 0
    ),
    hs_all AS (SELECT DISTINCT u AS a, v AS b FROM (
                 SELECT it, u, v,
                        CASE WHEN MIN(v) OVER (PARTITION BY it, u) = v
                              AND MIN(u) OVER (PARTITION BY it, v) = u
                             THEN 1 ELSE 0 END AS hs
                 FROM live) h
               WHERE hs = 1 AND u < v AND it < {MATCH_ROUNDS}),
    nn AS (SELECT CAST(COUNT(DISTINCT p1) AS BIGINT) AS n FROM csym),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS e FROM ce),
    nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM hs_all)
    SELECT nn.n AS nodes, ne.e AS edges, nm.m AS matched_pairs,
           CASE WHEN nn.n > 0
                THEN FLOOR((2.0 * nm.m) / nn.n * 10000 + 0.5) / 10000
                ELSE 0.0 END AS matched_node_share
    FROM nn, ne, nm
    """,
)
def graph_greedy_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal matching on the co-purchase graph by deterministic
    greedy rounds: every unmatched node proposes its min-key
    neighbor; an edge joins the matching when BOTH endpoints propose
    each other (handshake), matched nodes leave the graph, repeat.
    Maximal matching ≥ ½ maximum matching — the assignment primitive
    behind task-pairing and conflict-free scheduling.

    Scale: each round is a proposal aggregate + a self-join handshake
    + two anti-joins to remove matched nodes — all equi-joins on node
    keys, localCheckpoint-ed per round."""
    e = _copurchase_edges(spark, sf_dir).select("p1", "p2")
    sym = e.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionByName(
        e.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    ).localCheckpoint()
    live = sym
    matched = None
    for _ in range(MATCH_ROUNDS):
        if live.limit(1).count() == 0:
            break
        prop = live.groupBy("u").agg(F.min("v").alias("pv"))
        hs = (
            prop.join(
                prop.select(
                    F.col("u").alias("pv"), F.col("pv").alias("u2")
                ),
                "pv",
            )
            .filter(F.col("u") == F.col("u2"))
            .filter(F.col("u") < F.col("pv"))
            .select(F.col("u").alias("a"), F.col("pv").alias("b"))
            .localCheckpoint()
        )
        if hs.limit(1).count() == 0:
            break
        matched = hs if matched is None else matched.unionByName(hs)
        matched = matched.localCheckpoint()
        gone = matched.select(F.col("a").alias("n")).unionByName(
            matched.select(F.col("b").alias("n"))
        ).distinct()
        live = (
            live.join(gone.withColumnRenamed("n", "u"), "u", "left_anti")
            .join(gone.withColumnRenamed("n", "v"), "v", "left_anti")
            .localCheckpoint()
        )
    n_nodes = (
        sym.select(F.col("u").alias("n")).distinct().count()
    )
    n_edges = e.count()
    n_matched = matched.count() if matched is not None else 0
    row = (
        int(n_nodes),
        int(n_edges),
        int(n_matched),
        ratio_f((2.0 * n_matched) / n_nodes) if n_nodes else 0.0,
    )
    return spark.createDataFrame(
        [row],
        "nodes long, edges long, matched_pairs long, matched_node_share "
        "double",
    )


def ratio_f(x: float) -> float:
    import math

    return math.floor(x * 10000 + 0.5) / 10000
