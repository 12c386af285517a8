"""Wave 201: symbolic series vocabulary and bipartite 4-cycles.

ev_sax_symbolic is SAX (Symbolic Aggregate approXimation) over daily
event volume: PAA-compress 4-day segments, discretize against the
Gaussian quartile breakpoints, and count the 4-symbol WORDS — the
hashable shape vocabulary that scales motif queries to corpora where
ev_matrix_profile's exact pairwise scan (which answers "where is the
single closest window?") is the wrong tool; SAX answers "what shapes
recur and how often", by counting, not by distance. graph_squares
counts 4-cycles (rectangles) in the bipartite customer-part purchase
graph — the bipartite analogue of graph_triangles (triangles cannot
exist across a bipartition): two customers sharing TWO parts is the
smallest unit of co-behavior, the signal behind co-purchase
recommenders and collusion/fraud rings alike.

Exactness: SAX's PAA means divide integer sums and compare against
shared literal breakpoints; every 4-cycle quantity is an exact
integer count (sum of C(cn,2) over BIGINT co-citation counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
SAX_SEG_DAYS = 4  # PAA segment length (days)
SAX_WORD = 4  # symbols per word
SAX_TOP = 5
# N(0,1) quartile breakpoints for a 4-letter alphabet
SAX_BP = (-0.6745, 0.0, 0.6745)

_SYM_SQL = (
    f"CASE WHEN z < {SAX_BP[0]} THEN 'a' WHEN z < {SAX_BP[1]} THEN 'b'"
    f" WHEN z < {SAX_BP[2]} THEN 'c' ELSE 'd' END"
)


@query(
    "ev_sax_symbolic",
    # Real oracle: PAA means are integer-sum/count divisions, the
    # z-scores standardize by integer global moments, symbols come
    # from comparing those identical doubles against shared literal
    # breakpoints, and word counts are integers; the top-5 cut sorts
    # on (count DESC, word) — fully deterministic.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy,
                 SUM(y * y) AS syy, MIN(t) AS t0
          FROM d),
    seg AS (SELECT (d.t - m.t0) // {SAX_SEG_DAYS} AS g,
                   SUM(d.y) AS s, CAST(COUNT(*) AS BIGINT) AS c
            FROM d, m GROUP BY 1),
    sym AS (SELECT g, {_SYM_SQL} AS sym
            FROM (SELECT seg.g,
                         (CAST(seg.s AS DOUBLE) / seg.c
                          - CAST(m.sy AS DOUBLE) / m.n)
                         / SQRT(CAST(m.n * m.syy - m.sy * m.sy AS DOUBLE)
                                / (m.n * (m.n - 1))) AS z
                  FROM seg, m WHERE m.n > 1) q),
    words AS (SELECT s0.sym || s1.sym || s2.sym || s3.sym AS word
              FROM sym s0 JOIN sym s1 ON s1.g = s0.g + 1
                          JOIN sym s2 ON s2.g = s0.g + 2
                          JOIN sym s3 ON s3.g = s0.g + 3),
    wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS occurrences
           FROM words GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nw FROM words)
    SELECT wc.word, wc.occurrences,
           FLOOR(wc.occurrences / tot.nw * 1e4 + 0.5) / 1e4 AS support
    FROM wc, tot
    ORDER BY wc.occurrences DESC, wc.word
    LIMIT {SAX_TOP}
    """,
)
def ev_sax_symbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX shape vocabulary of daily event volume: 4-day PAA segments
    standardized by the global mean/sd, discretized into the
    {{a,b,c,d}} alphabet at the N(0,1) quartile breakpoints, then
    joined into 4-segment (16-day) words. The top-5 words ARE the
    series' recurring shapes — 'dddd' = a sustained high regime,
    'adda' = dip-recover — countable, indexable, and comparable
    across series, which is what makes SAX the scale path for motif
    mining: counting hashable words is a groupBy, not a pairwise
    distance scan (that exact tool is ev_matrix_profile).

    Scale: ONE day-grain count, ONE segment-grain rollup (both
    map-side combinable), three integer lag equi-joins on the
    segment frame (|days|/{seg} rows), one word count, TakeOrdered(5).
    Nothing beyond the calendar-bounded frame ever materializes."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint()  # feeds moments + segment rollup
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.min("t").alias("t0"),
    )
    seg = (
        d.crossJoin(F.broadcast(m))
        .filter(F.col("n") > 1)
        .groupBy(
            F.floor((F.col("t") - F.col("t0")) / SAX_SEG_DAYS).alias("g")
        )
        .agg(
            F.sum("y").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.first("sy").alias("sy"),
            F.first("n").alias("n"),
            F.first("syy").alias("syy"),
        )
    )
    z = (
        F.col("s").cast("double") / F.col("c")
        - F.col("sy").cast("double") / F.col("n")
    ) / F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
        / (F.col("n") * (F.col("n") - 1))
    )
    sym = seg.select(
        "g",
        F.when(z < SAX_BP[0], "a")
        .when(z < SAX_BP[1], "b")
        .when(z < SAX_BP[2], "c")
        .otherwise("d")
        .alias("sym"),
    ).localCheckpoint()  # feeds four lag aliases
    w = sym.select(F.col("g"), F.col("sym").alias("s0"))
    for k in range(1, SAX_WORD):
        w = w.join(
            sym.select(
                (F.col("g") - k).alias("g"), F.col("sym").alias(f"s{k}")
            ),
            "g",
        )
    words = w.select(
        F.concat(*[F.col(f"s{k}") for k in range(SAX_WORD)]).alias("word")
    ).localCheckpoint()  # feeds the count and the total
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("occurrences"))
    tot = words.agg(F.count(F.lit(1)).cast("double").alias("nw"))
    return (
        wc.crossJoin(F.broadcast(tot))
        .select(
            "word",
            "occurrences",
            rnd(F.col("occurrences") / F.col("nw"), 4).alias("support"),
        )
        .orderBy(F.col("occurrences").desc(), "word")
        .limit(SAX_TOP)
    )


ev_sax_symbolic.__doc__ = ev_sax_symbolic.__doc__.format(seg=SAX_SEG_DAYS)


@query(
    "graph_squares",
    # Real oracle: everything is an exact integer count — distinct
    # bipartite edges, customer-side wedges C(deg,2), co-citation
    # counts per part pair, and squares = sum C(cn,2); the single
    # ratio divides identical BIGINTs, inside the grid.
    oracle="""
    WITH e AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
               FROM orders o JOIN lineitem l
                 ON l.l_orderkey = o.o_orderkey),
    deg AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS dc FROM e GROUP BY 1),
    wed AS (SELECT SUM(dc * (dc - 1) / 2) AS wedges FROM deg),
    pp AS (SELECT a.p AS p1, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS cn
           FROM e a JOIN e b ON a.c = b.c AND a.p < b.p
           GROUP BY 1, 2),
    sq AS (SELECT CAST(COUNT(*) AS BIGINT) AS cocited_pairs,
                  CAST(COUNT(*) FILTER (WHERE cn >= 2) AS BIGINT)
                    AS square_pairs,
                  SUM(cn * (cn - 1) / 2) AS squares
           FROM pp),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
    SELECT ne.n_edges,
           CAST(wed.wedges AS BIGINT) AS n_wedges,
           sq.cocited_pairs,
           sq.square_pairs,
           CAST(COALESCE(sq.squares, 0) AS BIGINT) AS squares,
           FLOOR(CAST(COALESCE(sq.squares, 0) AS DOUBLE)
                 / NULLIF(wed.wedges, 0) * 1e6 + 0.5) / 1e6
             AS squares_per_wedge
    FROM ne, wed, sq
    """,
)
def graph_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-cycle (rectangle) census of the bipartite customer-part
    purchase graph: enumerate customer-side wedges (two parts bought
    by one customer), count how many customers co-cite each part
    pair, and sum C(cn, 2) — each pair of co-citing customers closes
    one rectangle. squares_per_wedge is the bipartite closure rate:
    how often does a wedge find a SECOND customer confirming it?
    Triangles can't exist across a bipartition, so this is the
    bipartite sibling of graph_triangles and the statistical floor
    under every co-purchase recommender (graph_copurchase reports the
    pairs; this reports whether the co-citation structure is denser
    than its degree sequence implies).

    Scale: the wedge enumeration is the per-customer edge self-join —
    volume sum(deg_c^2), the known cost of rectangle counting, kept
    distributed by hash-partitioning on customer (skewed hub
    customers are the salting candidates, same knob as
    graph_triangles); co-citation collapse and the C(cn,2) sum are
    map-side-combinable groupBys. No driver state."""
    e = (
        cat(spark, sf_dir)["orders"]
        .select(F.col("o_custkey").alias("c"), "o_orderkey")
        .join(
            cat(spark, sf_dir)["lineitem"].select(
                F.col("l_orderkey").alias("o_orderkey"),
                F.col("l_partkey").alias("p"),
            ),
            "o_orderkey",
        )
        .select("c", "p")
        .distinct()
        .localCheckpoint()  # bipartite edges; feeds degrees + both wedge aliases
    )
    deg = e.groupBy("c").agg(F.count(F.lit(1)).alias("dc"))
    wed = deg.agg(
        F.sum(F.col("dc") * (F.col("dc") - 1) / 2).cast("bigint").alias(
            "wedges"
        )
    )
    a = e.select("c", F.col("p").alias("p1"))
    b = e.select("c", F.col("p").alias("p2"))
    pp = (
        a.join(b, "c")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    sq = pp.agg(
        F.count(F.lit(1)).alias("cocited_pairs"),
        F.sum(F.when(F.col("cn") >= 2, 1).otherwise(0)).alias(
            "square_pairs"
        ),
        F.sum(F.col("cn") * (F.col("cn") - 1) / 2).alias("squares"),
    )
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    fin = ne.crossJoin(F.broadcast(wed)).crossJoin(F.broadcast(sq))
    squares = F.coalesce(F.col("squares"), F.lit(0)).cast("bigint")
    return fin.select(
        F.col("n_edges").cast("bigint").alias("n_edges"),
        F.col("wedges").cast("bigint").alias("n_wedges"),
        F.col("cocited_pairs").cast("bigint").alias("cocited_pairs"),
        F.col("square_pairs").cast("bigint").alias("square_pairs"),
        squares.alias("squares"),
        rnd(
            squares.cast("double")
            / F.nullif(F.col("wedges").cast("double"), F.lit(0.0)),
            6,
        ).alias("squares_per_wedge"),
    )
