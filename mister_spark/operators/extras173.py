"""Wave 173: perplexity-based corpus filtering and NMF topics.

ds_perplexity_filter is the CCNet/GPT-3-style cleaning step: score
every document by its per-token negative log-likelihood under a
corpus-trained add-one bigram LM and report, per source, how much of
that source a perplexity gate would drop — the signal that separates
fluent prose from boilerplate and lorem-noise. tx_topic_nmf factorizes
the document-term matrix with multiplicative-update NMF (Lee & Seung,
public literature) into k nonnegative topics, H distributed per-doc,
W model-sized on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

PPL_GATE = 1.02  # relative-perplexity gate (corpus is homogeneous synthetic)
NMF_K = 4
NMF_ITERS = 6
NMF_VOCAB_CAP = 4096  # model vocabulary: top-N corpus terms by frequency


@query(
    "ds_perplexity_filter",
    oracle=f"""
    WITH tk AS (SELECT doc_id, source, {DUCK_TOKENS} AS ts
                FROM documents),
    bg AS (SELECT doc_id, source, UNNEST(ts[1:len(ts) - 1]) AS v,
                  UNNEST(ts[2:len(ts)]) AS w FROM tk),
    tr AS (SELECT v, w, CAST(COUNT(*) AS BIGINT) AS c FROM bg
           GROUP BY 1, 2),
    ctx AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cv FROM tr GROUP BY 1),
    vocab AS (SELECT CAST(COUNT(DISTINCT v) AS BIGINT) AS vsz FROM tr),
    wt AS (SELECT tr.v, tr.w,
                  CAST(FLOOR(-1e6 * LN(
                    (tr.c + 1) / CAST(ctx.cv + vocab.vsz AS DOUBLE)
                  ) + 0.5) AS BIGINT) AS micro
           FROM tr JOIN ctx ON tr.v = ctx.v, vocab),
    sc AS (SELECT bg.doc_id, bg.source,
                  CAST(COUNT(*) AS BIGINT) AS bigrams,
                  SUM(wt.micro) AS micro_sum
           FROM bg JOIN wt ON bg.v = wt.v AND bg.w = wt.w
           GROUP BY 1, 2),
    m AS (SELECT CAST(SUM(micro_sum) AS DOUBLE) / SUM(bigrams)
                   AS corpus_micro
          FROM sc)
    SELECT sc.source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           FLOOR(SUM(sc.micro_sum) / CAST(SUM(sc.bigrams) AS DOUBLE)
                 / 100 + 0.5) / 10000 AS avg_nll_per_tok,
           CAST(SUM(CASE WHEN sc.micro_sum
                          > 1.02 * m.corpus_micro * sc.bigrams
                     THEN 1 ELSE 0 END) AS BIGINT) AS flagged,
           FLOOR(SUM(CASE WHEN sc.micro_sum
                           > 1.02 * m.corpus_micro * sc.bigrams
                      THEN 1.0 ELSE 0.0 END) / COUNT(*) * 10000 + 0.5)
             / 10000 AS flagged_share
    FROM sc, m GROUP BY 1 ORDER BY 1
    """,
)
def ds_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity gate report: per-bigram NLL under the add-one bigram
    LM (trained on the whole corpus), snapped to an integer 1e-6 grid
    per bigram so every per-doc and per-source sum is exact integer
    arithmetic; a document is FLAGGED when its total NLL exceeds 1.02x
    what the corpus-average per-bigram NLL predicts for its length
    (the relative-perplexity gate of CCNet-style pipelines — an
    absolute cut would just proxy document length). Emits per source:
    docs, average per-token NLL, flagged count and share — the
    dashboard that says WHICH feeds are fluent and which are noise.

    Scale: bigram counts are one shuffle; the LM table is
    vocab^2-bounded and broadcast into the bigram stream; per-doc sums
    are one partial-agg shuffle; the corpus mean is a 1-row broadcast.
    No ranks, no windows — the gate is closed-form."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", "source", tokens().alias("ts"))
    n = F.size("ts")
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice("ts", 1, n - 1),
            F.slice("ts", 2, n - 1),
            lambda x, y: F.struct(x.alias("v"), y.alias("w")),
        ),
    ).otherwise(F.array().cast("array<struct<v:string,w:string>>"))
    bg = t.select(
        "doc_id", "source", F.explode(pairs).alias("p")
    ).select("doc_id", "source", F.col("p.v").alias("v"), F.col("p.w").alias("w"))
    tr = (
        bg.groupBy("v", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()  # vocab^2-bounded; read by 3 branches
    )
    ctx = tr.groupBy("v").agg(F.sum("c").cast("bigint").alias("cv"))
    vocab = tr.agg(F.countDistinct("v").cast("bigint").alias("vsz"))
    wt = (
        tr.join(F.broadcast(ctx), "v")
        .crossJoin(F.broadcast(vocab))
        .select(
            "v",
            "w",
            F.floor(
                -1e6
                * F.log(
                    (F.col("c") + 1)
                    / (F.col("cv") + F.col("vsz")).cast("double")
                )
                + 0.5
            )
            .cast("bigint")
            .alias("micro"),
        )
    )
    sc = (
        bg.join(F.broadcast(wt), ["v", "w"])
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("bigrams"),
            F.sum("micro").alias("micro_sum"),
        )
    )
    m = sc.agg(
        (
            F.sum("micro_sum").cast("double") / F.sum("bigrams")
        ).alias("corpus_micro")
    )
    flagged = F.col("micro_sum") > PPL_GATE * F.col("corpus_micro") * F.col(
        "bigrams"
    )
    return (
        sc.crossJoin(F.broadcast(m))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            (
                F.floor(
                    F.sum("micro_sum") / F.sum("bigrams").cast("double") / 100
                    + 0.5
                )
                / 10000
            ).alias("avg_nll_per_tok"),
            F.sum(F.when(flagged, 1).otherwise(0))
            .cast("bigint")
            .alias("flagged"),
            (
                F.floor(
                    F.sum(F.when(flagged, 1.0).otherwise(0.0))
                    / F.count(F.lit(1))
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("flagged_share"),
        )
        .orderBy("source")
    )


@query("tx_topic_nmf")  # iterative multiplicative updates → rows-only
def tx_topic_nmf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative-update NMF topic model over the document-term
    matrix: V (docs x vocab, TF counts) ~= H W^T with k={k} topics,
    {it} Lee-Seung update pairs. The MODELED vocabulary is capped to
    the top-{cap} corpus terms by frequency (one TakeOrdered — the
    standard topic-model truncation), so W (vocab x k) is genuinely
    model-sized on the driver — O(cap * k) — regardless of Heaps-law
    vocab growth at 100x the corpus; H (doc x k) stays DISTRIBUTED as
    an array column, exactly the k-means centroid pattern.
    Deterministic seed-free init (doc-id / word-index phase offsets).
    Emits one row per topic: its mass (share of total H weight) and
    top-3 words by W.

    Scale per iteration: H update is a broadcast-W map over the
    sparse (doc, word, c) rows + one doc-keyed partial-agg shuffle
    (numerator V W), with the k x k Gram W^T W broadcast; the W
    update aggregates V^T H by word (vocab-bounded shuffle) and
    H^T H (k x k) — no step moves more than the sparse matrix once."""
    docs = cat(spark, sf_dir)["documents"]
    tf = (
        docs.select("doc_id", F.explode(tokens()).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    top = (
        tf.groupBy("w")
        .agg(F.sum("c").alias("cf"))
        .orderBy(F.desc("cf"), "w")
        .limit(NMF_VOCAB_CAP)  # TakeOrderedAndProject, never a full sort
    )
    vocab = sorted(r["w"] for r in top.collect())
    vidx = {w: i for i, w in enumerate(vocab)}
    nv, k = len(vocab), NMF_K
    vmap = F.broadcast(
        spark.createDataFrame(
            [(w, i) for w, i in vidx.items()], "w string, widx int"
        )
    )
    V = tf.join(vmap, "w").select("doc_id", "widx", "c").localCheckpoint()
    # deterministic strictly-positive init
    W = [
        [1.0 + 0.1 * ((wi * 7 + j * 3) % 5) for j in range(k)]
        for wi in range(nv)
    ]
    H = (
        V.select("doc_id")
        .distinct()
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda j: 1.0
                + 0.1 * ((F.col("doc_id") * 5 + j * 7) % 4).cast("double"),
            ).alias("h"),
        )
        .localCheckpoint()
    )
    eps = 1e-9
    for _ in range(NMF_ITERS):
        wdf = F.broadcast(
            spark.createDataFrame(
                [(i, row) for i, row in enumerate(W)],
                "widx int, wrow array<double>",
            )
        )
        # numerator_d = sum_w c * W_w  (k-vector per doc)
        num = (
            V.join(wdf, "widx")
            .groupBy("doc_id")
            .agg(
                F.array(
                    *[
                        F.sum(F.col("c") * F.col("wrow")[j]).alias(f"n{j}")
                        for j in range(k)
                    ]
                ).alias("num")
            )
        )
        # Gram = W^T W (k x k, driver-side)
        gram = [
            [sum(W[w][a] * W[w][b] for w in range(nv)) for b in range(k)]
            for a in range(k)
        ]
        gflat = [x for row in gram for x in row]
        H = (
            H.join(num, "doc_id")
            .select(
                "doc_id",
                F.transform(
                    F.sequence(F.lit(0), F.lit(k - 1)),
                    lambda j: F.col("h")[j]
                    * F.col("num")[j]
                    / (
                        F.aggregate(
                            F.sequence(F.lit(0), F.lit(k - 1)),
                            F.lit(0.0),
                            lambda acc, b: acc
                            + F.col("h")[b]
                            * F.element_at(
                                F.array(*[F.lit(x) for x in gflat]),
                                j * k + b + 1,
                            ),
                        )
                        + eps
                    ),
                ).alias("h"),
            )
            .localCheckpoint()
        )
        # V^T H by word (vocab-bounded) and H^T H (k x k)
        vth_rows = (
            V.join(H, "doc_id")
            .groupBy("widx")
            .agg(
                *[
                    F.sum(F.col("c") * F.col("h")[j]).alias(f"v{j}")
                    for j in range(k)
                ]
            )
            .collect()
        )
        vth = {r["widx"]: [r[f"v{j}"] for j in range(k)] for r in vth_rows}
        hth_row = H.agg(
            *[
                F.sum(F.col("h")[a] * F.col("h")[b]).alias(f"g{a}_{b}")
                for a in range(k)
                for b in range(k)
            ]
        ).collect()[0]
        hth = [
            [hth_row[f"g{a}_{b}"] for b in range(k)] for a in range(k)
        ]
        W = [
            [
                W[wi][j]
                * vth.get(wi, [0.0] * k)[j]
                / (
                    sum(W[wi][b] * hth[b][j] for b in range(k)) + eps
                )
                for j in range(k)
            ]
            for wi in range(nv)
        ]
    mass = H.agg(
        *[F.sum(F.col("h")[j]).alias(f"m{j}") for j in range(k)]
    ).collect()[0]
    total = sum(mass[f"m{j}"] for j in range(k))
    rows = []
    for j in range(k):
        top = sorted(range(nv), key=lambda wi: (-W[wi][j], wi))[:3]
        rows.append(
            (
                j,
                round(mass[f"m{j}"] / total, 4),
                vocab[top[0]],
                vocab[top[1]],
                vocab[top[2]],
            )
        )
    return spark.createDataFrame(
        rows,
        "topic int, mass_share double, top_word_1 string, "
        "top_word_2 string, top_word_3 string",
    )


tx_topic_nmf.__doc__ = tx_topic_nmf.__doc__.format(
    k=NMF_K, it=NMF_ITERS, cap=NMF_VOCAB_CAP
)
