"""Wave 228: leakage-free model stacking and pairwise BLEU scoring.

ml_oof_stacking is the ensemble workflow done honestly: two base
predictors of order value (weekday mean, priority mean) are scored
OUT-OF-FOLD — each row's group means are recomputed EXCLUDING the
row's own md5-hash fold, closed-form from per-(group, fold) sums, so
no row ever sees itself — then a 2-feature OLS learns the stacking
weights on those OOF predictions. Reports each base's OOF RMSE, the
stack's, and the learned weights: the measurement that decides
whether an ensemble is worth shipping, without the leakage that
makes naive stacking look better than it is. tx_bleu_pairs scores
the verified near-duplicate pairs (dd_ngram_jaccard's output) with
BLEU-2 — clipped n-gram precision plus brevity penalty — the
ASYMMETRIC containment view set-based Jaccard can't give: a doc that
copies half of another scores high BLEU against it but low Jaccard,
which is exactly the partial-plagiarism signature a dedup rerank
wants.

Exactness: fold assignment is an md5 hex character (identical both
engines), all group/fold sums are exact, the stack solve is a
centered 2x2 Cramer closed form, and BLEU counts are integers with
shared sqrt/exp arithmetic on the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, bigrams, tokens
from mister_spark.operators.common import cat, rnd
from mister_spark.operators.dedup import DD_NGRAM_ORACLE, dd_ngram_jaccard
from mister_spark.registry import query

OOF_FOLDS = 5
BLEU_TOP = 20

_FOLD_SQL = (
    "(strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)),"
    f" 1, 1)) - 1) % {OOF_FOLDS}"
)


@query(
    "ml_oof_stacking",
    # Real oracle: folds are md5 hex characters, leave-fold-out group
    # means are closed forms of exact (group, fold) sums, the 2x2
    # centered Cramer stack solve and all three RMSEs evaluate
    # identical expressions on the grid.
    oracle=f"""
    WITH d AS (SELECT ((dayofweek(o_orderdate) + 6) % 7) + 1 AS f1,
                      CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS f2,
                      CAST(o_totalprice AS DOUBLE) AS y,
                      {_FOLD_SQL} AS fold
               FROM orders),
    g1 AS (SELECT f1, fold, CAST(COUNT(*) AS DOUBLE) AS n, SUM(y) AS s
           FROM d GROUP BY 1, 2),
    g1t AS (SELECT f1, SUM(n) AS tn, SUM(s) AS ts FROM g1 GROUP BY 1),
    g2 AS (SELECT f2, fold, CAST(COUNT(*) AS DOUBLE) AS n, SUM(y) AS s
           FROM d GROUP BY 1, 2),
    g2t AS (SELECT f2, SUM(n) AS tn, SUM(s) AS ts FROM g2 GROUP BY 1),
    oof AS (SELECT d.y,
                   (g1t.ts - COALESCE(g1.s, 0))
                     / (g1t.tn - COALESCE(g1.n, 0)) AS m1,
                   (g2t.ts - COALESCE(g2.s, 0))
                     / (g2t.tn - COALESCE(g2.n, 0)) AS m2
            FROM d
            JOIN g1t ON g1t.f1 = d.f1
            LEFT JOIN g1 ON g1.f1 = d.f1 AND g1.fold = d.fold
            JOIN g2t ON g2t.f2 = d.f2
            LEFT JOIN g2 ON g2.f2 = d.f2 AND g2.fold = d.fold),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 AVG(y) AS my, AVG(m1) AS a1, AVG(m2) AS a2,
                 SUM(m1 * m1) AS x11, SUM(m1 * m2) AS x12,
                 SUM(m2 * m2) AS x22,
                 SUM(m1 * y) AS xy1, SUM(m2 * y) AS xy2,
                 SUM((y - m1) * (y - m1)) AS e1,
                 SUM((y - m2) * (y - m2)) AS e2,
                 SUM(y * y) AS yy
          FROM oof),
    c AS (SELECT s.*,
                 x11 - n * a1 * a1 AS c11, x12 - n * a1 * a2 AS c12,
                 x22 - n * a2 * a2 AS c22,
                 xy1 - n * a1 * my AS cy1, xy2 - n * a2 * my AS cy2
          FROM s),
    b AS (SELECT c.*,
                 (cy1 * c22 - cy2 * c12) / (c11 * c22 - c12 * c12)
                   AS w1,
                 (c11 * cy2 - c12 * cy1) / (c11 * c22 - c12 * c12)
                   AS w2
          FROM c),
    o AS (SELECT b.*,
                 (yy - n * my * my) - 2 * (w1 * cy1 + w2 * cy2)
                 + (w1 * (c11 * w1 + c12 * w2)
                    + w2 * (c12 * w1 + c22 * w2)) AS sse_stack
          FROM b)
    SELECT CAST(n AS BIGINT) AS n_rows,
           FLOOR(SQRT(e1 / n) * 100 + 0.5) / 100 AS rmse_weekday,
           FLOOR(SQRT(e2 / n) * 100 + 0.5) / 100 AS rmse_priority,
           FLOOR(SQRT(sse_stack / n) * 100 + 0.5) / 100 AS rmse_stack,
           FLOOR(w1 * 1e4 + 0.5) / 1e4 AS weight_weekday,
           FLOOR(w2 * 1e4 + 0.5) / 1e4 AS weight_priority
    FROM o
    """,
)
def ml_oof_stacking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold stacking of two base predictors of order value
    (weekday mean, priority mean): {k} md5-hash folds, each row
    scored by its groups' means with the row's OWN FOLD removed
    (leave-fold-out = (group_sum - fold_sum)/(group_n - fold_n), no
    refits), then a centered 2-feature OLS learns the blend on the
    OOF predictions. rmse_stack vs the base RMSEs is the honest
    ensemble gain; the weights say which signal carries it. The
    leakage discipline that separates a real stacking win from a
    self-fulfilling one.

    Scale: two (group x fold) sufficient-sums passes (tiny grids),
    one broadcast join back, one 12-sum aggregate — map-side
    combinable; the solve is a 1-row closed form."""
    d = cat(spark, sf_dir)["orders"].select(
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).alias("f1"),
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("f2"),
        F.col("o_totalprice").cast("double").alias("y"),
        F.expr(
            "(locate(substr(md5(CAST(o_orderkey AS STRING)), 1, 1),"
            f" '0123456789abcdef') - 1) % {OOF_FOLDS}"
        ).alias("fold"),
    )
    g1 = d.groupBy("f1", "fold").agg(
        F.count(F.lit(1)).cast("double").alias("n1"), F.sum("y").alias("s1")
    )
    g1t = g1.groupBy("f1").agg(
        F.sum("n1").alias("tn1"), F.sum("s1").alias("ts1")
    )
    g2 = d.groupBy("f2", "fold").agg(
        F.count(F.lit(1)).cast("double").alias("n2"), F.sum("y").alias("s2")
    )
    g2t = g2.groupBy("f2").agg(
        F.sum("n2").alias("tn2"), F.sum("s2").alias("ts2")
    )
    oof = (
        d.join(F.broadcast(g1t), "f1")
        .join(F.broadcast(g1), ["f1", "fold"], "left")
        .join(F.broadcast(g2t), "f2")
        .join(F.broadcast(g2), ["f2", "fold"], "left")
        .select(
            "y",
            (
                (F.col("ts1") - F.coalesce(F.col("s1"), F.lit(0.0)))
                / (F.col("tn1") - F.coalesce(F.col("n1"), F.lit(0.0)))
            ).alias("m1"),
            (
                (F.col("ts2") - F.coalesce(F.col("s2"), F.lit(0.0)))
                / (F.col("tn2") - F.coalesce(F.col("n2"), F.lit(0.0)))
            ).alias("m2"),
        )
    )
    s = oof.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("y").alias("my"), F.avg("m1").alias("a1"),
        F.avg("m2").alias("a2"),
        F.sum(F.col("m1") * F.col("m1")).alias("x11"),
        F.sum(F.col("m1") * F.col("m2")).alias("x12"),
        F.sum(F.col("m2") * F.col("m2")).alias("x22"),
        F.sum(F.col("m1") * F.col("y")).alias("xy1"),
        F.sum(F.col("m2") * F.col("y")).alias("xy2"),
        F.sum((F.col("y") - F.col("m1")) * (F.col("y") - F.col("m1"))).alias(
            "e1"
        ),
        F.sum((F.col("y") - F.col("m2")) * (F.col("y") - F.col("m2"))).alias(
            "e2"
        ),
        F.sum(F.col("y") * F.col("y")).alias("yy"),
    )
    c11 = F.col("x11") - F.col("n") * F.col("a1") * F.col("a1")
    c12 = F.col("x12") - F.col("n") * F.col("a1") * F.col("a2")
    c22 = F.col("x22") - F.col("n") * F.col("a2") * F.col("a2")
    cy1 = F.col("xy1") - F.col("n") * F.col("a1") * F.col("my")
    cy2 = F.col("xy2") - F.col("n") * F.col("a2") * F.col("my")
    det = c11 * c22 - c12 * c12
    w1 = (cy1 * c22 - cy2 * c12) / det
    w2 = (c11 * cy2 - c12 * cy1) / det
    sse = (
        (F.col("yy") - F.col("n") * F.col("my") * F.col("my"))
        - 2 * (w1 * cy1 + w2 * cy2)
        + (w1 * (c11 * w1 + c12 * w2) + w2 * (c12 * w1 + c22 * w2))
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_rows"),
        rnd(F.sqrt(F.col("e1") / F.col("n")), 2).alias("rmse_weekday"),
        rnd(F.sqrt(F.col("e2") / F.col("n")), 2).alias("rmse_priority"),
        rnd(F.sqrt(sse / F.col("n")), 2).alias("rmse_stack"),
        rnd(w1, 4).alias("weight_weekday"),
        rnd(w2, 4).alias("weight_priority"),
    )


ml_oof_stacking.__doc__ = ml_oof_stacking.__doc__.format(k=OOF_FOLDS)


@query(
    "tx_bleu_pairs",
    # Real oracle: the pair set is dd_ngram_jaccard's oracle reused
    # as a CTE; clipped n-gram counts and lengths are integers, and
    # the brevity penalty / geometric mean use shared exp/sqrt on
    # identical rationals, cut on the rounded grid with full
    # tiebreaks.
    oracle=f"""
    WITH pairs AS ({DD_NGRAM_ORACLE}),
    toks AS (SELECT doc_id, {DUCK_TOKENS} AS tk FROM documents),
    uni AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c FROM (
              SELECT doc_id, unnest(tk) AS w FROM toks) GROUP BY 1, 2),
    bi AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c FROM (
             SELECT doc_id, unnest(list_transform(
                      range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1]))
                      AS w
             FROM toks) GROUP BY 1, 2),
    lens AS (SELECT doc_id, len(tk) AS l1,
                    GREATEST(len(tk) - 1, 0) AS l2
             FROM toks),
    p1 AS (SELECT p.doc_a, p.doc_b,
                  CAST(SUM(LEAST(ub.c, COALESCE(ua.c, 0))) AS BIGINT)
                    AS clip
           FROM pairs p JOIN uni ub ON ub.doc_id = p.doc_b
                LEFT JOIN uni ua ON ua.doc_id = p.doc_a
                                AND ua.w = ub.w
           GROUP BY 1, 2),
    p2 AS (SELECT p.doc_a, p.doc_b,
                  CAST(COALESCE(SUM(LEAST(bb.c, COALESCE(ba.c, 0))), 0)
                       AS BIGINT) AS clip
           FROM pairs p JOIN bi bb ON bb.doc_id = p.doc_b
                LEFT JOIN bi ba ON ba.doc_id = p.doc_a
                                AND ba.w = bb.w
           GROUP BY 1, 2),
    sc AS (SELECT p1.doc_a, p1.doc_b,
                  CAST(p1.clip AS DOUBLE) / lb.l1 AS prec1,
                  CAST(COALESCE(p2.clip, 0) AS DOUBLE)
                    / GREATEST(lb.l2, 1) AS prec2,
                  CASE WHEN lb.l1 >= la.l1 THEN 1.0
                       ELSE EXP(1.0 - CAST(la.l1 AS DOUBLE) / lb.l1)
                  END AS bp
           FROM p1 LEFT JOIN p2 ON p2.doc_a = p1.doc_a
                               AND p2.doc_b = p1.doc_b
                JOIN lens la ON la.doc_id = p1.doc_a
                JOIN lens lb ON lb.doc_id = p1.doc_b),
    out AS (SELECT doc_a, doc_b,
                   FLOOR(prec1 * 1e4 + 0.5) / 1e4 AS precision_1g,
                   FLOOR(prec2 * 1e4 + 0.5) / 1e4 AS precision_2g,
                   FLOOR(bp * SQRT(GREATEST(prec1, 1e-9)
                         * GREATEST(prec2, 1e-9)) * 1e4 + 0.5) / 1e4
                     AS bleu2
            FROM sc)
    SELECT * FROM out
    ORDER BY bleu2 DESC, doc_a, doc_b LIMIT {BLEU_TOP}
    """,
)
def tx_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 over the verified near-duplicate pairs: hypothesis =
    doc_b scored against reference doc_a with clipped unigram/bigram
    precision and the brevity penalty, top-{t} pairs by score.
    Jaccard is symmetric set overlap; BLEU is DIRECTIONAL sequence
    precision — a page that lifted half its text from another reads
    high BLEU / middling Jaccard, the partial-plagiarism shape a
    dedup rerank or attribution pass is actually hunting.

    Scale: per-doc n-gram COUNT MAPS (keyed by xxhash64 of the gram)
    are built IN-ROW — sort the hashed gram array once, then a
    run-length pass over the sorted array yields the same (hash ->
    count) map with ZERO token-level shuffles — and only for docs that
    appear in a verified pair (broadcast semi-join of the document
    scan against the checkpointed pair ids, legal here because the
    pair list is already materialized; the corpus-wide count-map
    passes were 4 exchanges of every doc's grams). The clip is a JVM
    fold over the hypothesis's keys — candidate-pair-local, so no
    per-(pair, gram) rows ever shuffle. The top-{t} cut is a
    TakeOrdered on the rounded score with full tiebreaks."""
    pairs = (
        dd_ngram_jaccard(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint()  # verified near-dup pairs only
    )
    ids = pairs.select(
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    ).distinct()

    # (hash -> count) map from a sorted hash array s via run-length
    # encoding: i is a run start iff i = 1 or s[i] != s[i-1] (IF, not
    # OR, so ANSI element_at(s, 0) can never evaluate); run j covers
    # [st[j], next start). The starts array is LET-BOUND as a lambda
    # variable through a single-element transform — referencing its
    # expression directly inside the entries lambda would re-evaluate
    # the whole filter per element (no CSE across lambda boundaries,
    # and CollapseProject inlines single-use projection aliases into
    # lambdas — PERF.md). Empty arrays are guarded because
    # sequence(1, 0) is a DESCENDING range, not an empty one.
    def _runs_map(s: str) -> Column:
        starts = (
            f"filter(sequence(1, size({s})), i -> if(i = 1, true,"
            f" element_at({s}, i) != element_at({s}, i - 1)))"
        )
        return F.when(
            F.size(F.col(s)) > 0,
            F.element_at(
                F.expr(
                    f"transform(array({starts}), st -> map_from_entries("
                    f"transform(sequence(1, size(st)), j -> struct("
                    f"element_at({s}, element_at(st, j)) AS k,"
                    f" CAST(if(j = size(st), size({s}) + 1,"
                    f" element_at(st, j + 1)) - element_at(st, j)"
                    f" AS BIGINT) AS c))))"
                ),
                1,
            ),
        ).otherwise(
            F.map_from_arrays(
                F.array().cast("array<bigint>"),
                F.array().cast("array<bigint>"),
            )
        )

    dm = (
        cat(spark, sf_dir)["documents"]
        .join(F.broadcast(ids), "doc_id", "semi")
        .select("doc_id", tokens().alias("tk"))
        .select(
            "doc_id",
            F.size("tk").alias("l1"),
            F.greatest(F.size("tk") - 1, F.lit(0)).alias("l2"),
            F.array_sort(
                F.transform(F.col("tk"), lambda x: F.xxhash64(x))
            ).alias("s1"),
            F.array_sort(
                F.transform(bigrams(F.col("tk")), lambda x: F.xxhash64(x))
            ).alias("s2"),
        )
        # the old shape's unigram INNER joins dropped token-less docs
        .filter(F.col("l1") >= 1)
        .select(
            "doc_id", "l1", "l2",
            _runs_map("s1").alias("m1"),
            _runs_map("s2").alias("m2"),
        )
        .localCheckpoint()  # pair-participating docs only; read twice
    )
    sc0 = (
        pairs.join(
            F.broadcast(
                dm.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("m1").alias("ub"), F.col("m2").alias("vb"),
                    F.col("l1").alias("lb1"), F.col("l2").alias("lb2"),
                )
            ),
            "doc_b",
        )
        .join(
            F.broadcast(
                dm.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("m1").alias("ua"), F.col("m2").alias("va"),
                    F.col("l1").alias("la1"),
                )
            ),
            "doc_a",
        )
        .withColumn(
            "clip1",
            F.expr(
                "aggregate(map_keys(ub), 0L, (acc, k) -> acc +"
                " least(ub[k], coalesce(ua[k], 0L)))"
            ),
        )
        .withColumn(
            "clip2",
            F.coalesce(
                F.expr(
                    "aggregate(map_keys(vb), 0L, (acc, k) -> acc +"
                    " least(vb[k], coalesce(va[k], 0L)))"
                ),
                F.lit(0),
            ),
        )
    )
    sc = (
        sc0.select(
            "doc_a", "doc_b",
            (F.col("clip1").cast("double") / F.col("lb1")).alias("prec1"),
            (
                F.coalesce(F.col("clip2"), F.lit(0)).cast("double")
                / F.greatest(F.col("lb2"), F.lit(1))
            ).alias("prec2"),
            F.when(F.col("lb1") >= F.col("la1"), F.lit(1.0))
            .otherwise(
                F.exp(1.0 - F.col("la1").cast("double") / F.col("lb1"))
            )
            .alias("bp"),
        )
    )
    out = sc.select(
        "doc_a", "doc_b",
        rnd(F.col("prec1"), 4).alias("precision_1g"),
        rnd(F.col("prec2"), 4).alias("precision_2g"),
        rnd(
            F.col("bp")
            * F.sqrt(
                F.greatest(F.col("prec1"), F.lit(1e-9))
                * F.greatest(F.col("prec2"), F.lit(1e-9))
            ),
            4,
        ).alias("bleu2"),
    )
    return out.orderBy(F.col("bleu2").desc(), "doc_a", "doc_b").limit(
        BLEU_TOP
    )


tx_bleu_pairs.__doc__ = tx_bleu_pairs.__doc__.format(t=BLEU_TOP)
