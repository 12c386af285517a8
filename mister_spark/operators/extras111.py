"""Wave 111: k-truss graph mining, time-to-value analytics, and
dedup-method comparison.

graph_k_truss peels the co-purchase graph to its 3-truss (every
surviving edge sits in ≥1 triangle among surviving edges) — the
cohesion filter that kills bridge/noise edges k-core keeps;
ev_time_to_value measures, per customer, the days from first order
until cumulative spend crosses a value threshold — the
time-to-value funnel metric — and summarizes its exact quartiles;
dd_method_venn overlays lexical (3-gram Jaccard) and semantic
(embedding cosine) near-dup PAIRS as a Venn report — the evidence
for whether the two dedup families are redundant or complementary on
this corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.functions.text import DUCK_TOKENS
from mister_spark.operators.common import cat, money, ratio
from mister_spark.operators.dedup import COSINE_T, HOT_SHINGLE_CAP, JACCARD_T
from mister_spark.operators.extras47 import (
    COP_SUPPORT,
    _DUCK_BASKETS,
    _copurchase_edges,
)
from mister_spark.registry import query

TRUSS_K = 3  # 3-truss: every edge in >= 1 triangle
TRUSS_ROUNDS = 5
TTV_THRESHOLD = 300000.0  # cumulative spend threshold (dollars)


@query(
    "graph_k_truss",
    # Real oracle: the truss peel as a stamped recursive CTE — DuckDB
    # permits multiple references to the working table in the
    # recursive term, so each iteration recomputes edge support with
    # the same oriented x<y<z wedge join, unpivots each triangle to
    # its three edges, and keeps edges with support >= K-2. Stamps run
    # to round 6 (a fixpoint just re-emits itself); the final select
    # rebuilds the per-round (before, after) rows and cuts at the
    # FIRST fixpoint round exactly like the Spark loop's break.
    oracle=f"""
    WITH RECURSIVE {_DUCK_BASKETS},
    ce AS (SELECT p1, p2 FROM (
             SELECT x.l_partkey AS p1, y.l_partkey AS p2, COUNT(*) AS w
             FROM bk x JOIN bk y ON x.l_orderkey = y.l_orderkey
                                AND x.l_partkey < y.l_partkey
             GROUP BY 1, 2) q WHERE w >= {COP_SUPPORT}),
    trs AS (
      SELECT 1 AS it, p1 AS u, p2 AS v FROM ce
      UNION ALL
      SELECT e.it + 1, e.u, e.v
      FROM trs e
      JOIN (SELECT it, eu, ev, COUNT(*) AS sup FROM (
              SELECT x.it, x.u AS eu, x.v AS ev
              FROM trs x JOIN trs y ON y.it = x.it AND y.u = x.v
                         JOIN trs z ON z.it = x.it AND z.u = x.u
                                   AND z.v = y.v
              UNION ALL
              SELECT y.it, y.u, y.v
              FROM trs x JOIN trs y ON y.it = x.it AND y.u = x.v
                         JOIN trs z ON z.it = x.it AND z.u = x.u
                                   AND z.v = y.v
              UNION ALL
              SELECT z.it, z.u, z.v
              FROM trs x JOIN trs y ON y.it = x.it AND y.u = x.v
                         JOIN trs z ON z.it = x.it AND z.u = x.u
                                   AND z.v = y.v) t3
            GROUP BY 1, 2, 3) s
        ON s.it = e.it AND s.eu = e.u AND s.ev = e.v
      WHERE e.it <= {TRUSS_ROUNDS} AND s.sup >= {TRUSS_K} - 2),
    cnt AS (SELECT g.r, COALESCE(c.c, 0) AS c
            FROM (SELECT unnest(generate_series(1, {TRUSS_ROUNDS} + 1))
                    AS r) g
            LEFT JOIN (SELECT it, CAST(COUNT(*) AS BIGINT) AS c
                       FROM trs GROUP BY it) c ON c.it = g.r),
    pairs AS (SELECT a.r, a.c AS before, b.c AS after
              FROM cnt a JOIN cnt b ON b.r = a.r + 1
              WHERE a.r <= {TRUSS_ROUNDS}),
    fix AS (SELECT COALESCE(MIN(r), {TRUSS_ROUNDS}) AS f
            FROM pairs WHERE before = after)
    SELECT CAST(p.r AS BIGINT) AS round, p.before AS edges_before,
           p.after AS edges_after
    FROM pairs p, fix WHERE p.r <= fix.f ORDER BY p.r
    """,
)
def graph_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k}-truss of the co-purchase graph: iteratively delete edges
    supported by fewer than {k}−2 triangles (support recomputed after
    each peel) until a fixpoint — what survives is the
    triangle-reinforced core, a strictly stronger cohesion filter
    than degree-based k-core (a star hub has high degree and zero
    triangles). Emits per-round edge counts and the final truss size.

    Scale: each round recomputes edge support with the standard
    oriented wedge join (u<v<w once per triangle, fan-out bounded by
    the basket cap) and one anti-join peel; localCheckpoint cuts the
    lineage per round (components precedent)."""
    e = (
        _copurchase_edges(spark, sf_dir)
        .select(F.col("p1").alias("u"), F.col("p2").alias("v"))
        .localCheckpoint()
    )
    rounds = []
    cur = e
    for rnd_i in range(TRUSS_ROUNDS):
        n_edges = cur.count()
        # triangle support per edge: oriented wedge join
        ab = cur.select(F.col("u").alias("a"), F.col("v").alias("b"))
        bc = cur.select(F.col("u").alias("b"), F.col("v").alias("c"))
        ac = cur.select(F.col("u").alias("a"), F.col("v").alias("c"))
        tri = (
            ab.join(bc, "b")
            .join(ac, ["a", "c"])
            .select("a", "b", "c")
            .localCheckpoint()
        )
        sup = (
            tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionByName(
                tri.select(F.col("b").alias("u"), F.col("c").alias("v"))
            )
            .unionByName(
                tri.select(F.col("a").alias("u"), F.col("c").alias("v"))
            )
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("sup"))
        )
        keep = cur.join(sup, ["u", "v"]).filter(
            F.col("sup") >= TRUSS_K - 2
        ).select("u", "v").localCheckpoint()
        n_keep = keep.count()
        rounds.append((rnd_i + 1, int(n_edges), int(n_keep)))
        if n_keep == n_edges:
            cur = keep
            break
        cur = keep
    return spark.createDataFrame(
        rounds, "round long, edges_before long, edges_after long"
    )


graph_k_truss.__doc__ = graph_k_truss.__doc__.format(k=TRUSS_K)


@query(
    "ev_time_to_value",
    oracle=f"""
    WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
                      o_totalprice,
                      SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey)
                        AS cum
               FROM orders),
    first_o AS (SELECT o_custkey, MIN(d) AS d0 FROM o GROUP BY 1),
    crossed AS (SELECT o.o_custkey,
                       MIN(date_diff('day', f.d0, o.d)) AS ttv_days
                FROM o JOIN first_o f ON o.o_custkey = f.o_custkey
                WHERE o.cum >= {TTV_THRESHOLD}
                GROUP BY 1),
    t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_customers FROM first_o),
    g AS (SELECT ttv_days, CAST(COUNT(*) AS DOUBLE) AS c
          FROM crossed GROUP BY 1),
    e AS (SELECT ttv_days, SUM(c) OVER (ORDER BY ttv_days) AS cum FROM g),
    nn AS (SELECT SUM(c) AS reached FROM g),
    q AS (SELECT (SELECT MIN(ttv_days) FROM e, nn
                  WHERE cum >= CEIL(0.25 * reached)) AS p25,
                 (SELECT MIN(ttv_days) FROM e, nn
                  WHERE cum >= CEIL(0.50 * reached)) AS p50,
                 (SELECT MIN(ttv_days) FROM e, nn
                  WHERE cum >= CEIL(0.75 * reached)) AS p75)
    SELECT CAST(t.n_customers AS BIGINT) AS customers,
           CAST(nn.reached AS BIGINT) AS reached,
           FLOOR(nn.reached / t.n_customers * 10000 + 0.5) / 10000
             AS reach_rate,
           CAST(q.p25 AS BIGINT) AS p25_days,
           CAST(q.p50 AS BIGINT) AS p50_days,
           CAST(q.p75 AS BIGINT) AS p75_days
    FROM t, nn, q
    """,
)
def ev_time_to_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-value: days from a customer's first order until their
    cumulative spend crosses ${t:,.0f}, with the reach rate and the
    EXACT quartiles of the crossing time — the onboarding metric
    ('how long until a customer becomes valuable') that averages
    obscure and approx sketches blur at the tails.

    Scale: ONE orders pass — the running sum and the first-order date
    share one customer-partitioned window, and the per-customer
    crossing day is a conditional min in a groupBy that reuses the
    window's partitioning (no exchange; the former shape paid a
    second orders scan + exchange for the first-order join and a
    third full scan for the customer count — guide §2.4). The
    checkpointed per-customer frame is customer-sized; crossing-day
    quartiles use the |distinct day-values| prefix frame via
    `bucketed_cumsum` — exact order statistics, no single-task
    sort."""
    orders = cat(spark, sf_dir)["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cust = (
        orders.select(
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("d"),
            F.sum("o_totalprice").over(w).alias("cum"),
            F.first(F.col("o_orderdate").cast("date")).over(w).alias("d0"),
        )
        .groupBy("o_custkey")
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= TTV_THRESHOLD, F.datediff("d", "d0")
                )
            ).alias("ttv_days")
        )
        .localCheckpoint()  # one row per customer: null = never crossed
    )
    n_customers = cust.count()
    crossed = cust.filter(F.col("ttv_days").isNotNull())
    g = crossed.groupBy("ttv_days").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    e = bucketed_cumsum(g, "ttv_days", {"cum": F.col("c")})
    nn = g.agg(F.sum("c").alias("reached"))
    picks = []
    for q in (0.25, 0.50, 0.75):
        picks.append(
            e.crossJoin(F.broadcast(nn))
            .filter(F.col("cum") >= F.ceil(F.lit(q) * F.col("reached")))
            .agg(F.min("ttv_days").alias(f"p{int(q * 100)}"))
        )
    out = nn
    for p in picks:
        out = out.crossJoin(F.broadcast(p))
    return out.select(
        F.lit(n_customers).cast("bigint").alias("customers"),
        F.col("reached").cast("bigint").alias("reached"),
        ratio(F.col("reached") / F.lit(float(n_customers))).alias(
            "reach_rate"
        ),
        F.col("p25").cast("bigint").alias("p25_days"),
        F.col("p50").cast("bigint").alias("p50_days"),
        F.col("p75").cast("bigint").alias("p75_days"),
    )


ev_time_to_value.__doc__ = ev_time_to_value.__doc__.format(t=TTV_THRESHOLD)


@query(
    "dd_method_venn",
    # Real oracle: both pair sets are already oracle-exact operators
    # (dd_ngram_jaccard / dd_embedding_cosine) — this composes their
    # SQL verbatim (same thresholds via the shared constants) and
    # takes the three set counts with anti joins; the only float is
    # the final Venn-jaccard ratio on the floor grid.
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(generate_series(1, len(toks) - 2),
                         i -> toks[i] || ' ' || toks[i+1] || ' '
                              || toks[i+2])) AS s
           FROM t),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    cold AS (SELECT s FROM sh GROUP BY s
             HAVING COUNT(*) <= {HOT_SHINGLE_CAP}),
    shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN cold USING (s)),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     COUNT(*) AS i
              FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    lex AS (SELECT DISTINCT doc_a AS a, doc_b AS b
            FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                       JOIN sizes sb ON doc_b = sb.doc_id
            WHERE FLOOR((i / (sa.n + sb.n - i)) * 10000 + 0.5) / 10000
                  >= {JACCARD_T}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
    sem AS (SELECT DISTINCT ea.vec_id AS a, eb.vec_id AS b
            FROM e ea JOIN e eb ON ea.vec_id < eb.vec_id
            WHERE FLOOR((list_cosine_similarity(ea.v, eb.v))
                        * 10000 + 0.5) / 10000 >= {COSINE_T}),
    bo AS (SELECT CAST(COUNT(*) AS BIGINT) AS c
           FROM lex JOIN sem USING (a, b)),
    lo AS (SELECT CAST(COUNT(*) AS BIGINT) AS c
           FROM lex ANTI JOIN sem USING (a, b)),
    so AS (SELECT CAST(COUNT(*) AS BIGINT) AS c
           FROM sem ANTI JOIN lex USING (a, b))
    SELECT bo.c + lo.c AS lexical_pairs, bo.c + so.c AS semantic_pairs,
           bo.c AS "both", lo.c AS lexical_only, so.c AS semantic_only,
           FLOOR(CAST(bo.c AS DOUBLE)
                 / GREATEST(bo.c + lo.c + so.c, 1) * 10000 + 0.5) / 10000
             AS jaccard
    FROM bo, lo, so
    """,
)
def dd_method_venn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-method Venn: the near-dup PAIRS found by lexical 3-gram
    Jaccard (dd_ngram_jaccard) overlaid with those found by embedding
    cosine (dd_embedding_cosine, pairs mapped through the doc→vector
    pairing) — both-methods / lexical-only / semantic-only counts.
    Complementary sets argue for running both stages; a contained set
    says one method is paying for nothing.

    Scale: reuses both operators' own bucketed candidate generation;
    the Venn is two anti-joins over the (small) pair sets."""
    from mister_spark.operators.dedup import dd_embedding_cosine, dd_ngram_jaccard

    lex = (
        dd_ngram_jaccard(spark, sf_dir)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .distinct()
    )
    sem = (
        dd_embedding_cosine(spark, sf_dir)
        .select(F.col("vec_a").alias("a"), F.col("vec_b").alias("b"))
        .distinct()
    )
    both = lex.join(sem, ["a", "b"]).count()
    lex_only = lex.join(sem, ["a", "b"], "left_anti").count()
    sem_only = sem.join(lex, ["a", "b"], "left_anti").count()
    row = (
        int(both + lex_only),
        int(both + sem_only),
        int(both),
        int(lex_only),
        int(sem_only),
        __import__("math").floor(
            both / max(both + lex_only + sem_only, 1) * 10000 + 0.5
        )
        / 10000,
    )
    return spark.createDataFrame(
        [row],
        "lexical_pairs long, semantic_pairs long, both long, "
        "lexical_only long, semantic_only long, jaccard double",
    )
