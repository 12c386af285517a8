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
    # tokenized once: the bigram stream is exploded from this frame by
    # BOTH the LM-count branch and the scoring join (guide §1.2)
    t = docs.select(
        "doc_id", "source", tokens().alias("ts")
    ).localCheckpoint()
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
        # doc-sized and narrow; read by the corpus mean AND the final
        # rollup — without this the scoring join runs twice
        .localCheckpoint()
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



def _nmf_replay(Ws: "list", nv: int, k: int):
    """mapInPandas factory for iteration len(Ws)-1: per batch, H is
    REPLAYED from its deterministic init through every Lee-Seung update
    in ``Ws`` (H depends only on the doc's own rows and the W sequence,
    so it never needs to be materialized or shipped back through Arrow
    — guide §4: the only bytes crossing the boundary OUT are one
    partials row per partition), and the W-step partials (V^T H,
    H^T H, column sums) accumulate from the final updated H. The
    replay is bit-identical to the former store-H-per-iteration chain:
    same numpy expressions over the same batch slices in the same
    order, with the H init computed from doc_id by the same IEEE ops
    the former JVM expression used."""
    import numpy as np

    Gs = [W.T @ W for W in Ws]  # k x k per iteration

    def f(batches):
        import pandas as pd

        vth = np.zeros((nv, k))
        hth = np.zeros((k, k))
        hsum = np.zeros(k)
        j_off = np.arange(k, dtype=np.int64) * 7
        for pdf in batches:
            if not len(pdf):
                continue
            lens = pdf["wi"].map(len).to_numpy()
            off = np.concatenate(([0], np.cumsum(lens)[:-1]))
            wi = np.concatenate(pdf["wi"].to_list()).astype(np.int64)
            c = np.concatenate(pdf["c"].to_list())
            ids = pdf["doc_id"].to_numpy().astype(np.int64)
            # deterministic strictly-positive init (same as the former
            # JVM transform expression, bit-for-bit: 1.0 + 0.1 * m)
            H = 1.0 + 0.1 * ((ids[:, None] * 5 + j_off[None, :]) % 4)
            cw = c[:, None]
            for W, G in zip(Ws, Gs):
                num = np.add.reduceat(cw * W[wi], off, axis=0)
                H = H * num / (H @ G + 1e-9)
            Hrep = np.repeat(H, lens, axis=0)
            np.add.at(vth, wi, cw * Hrep)
            hth += H.T @ H
            hsum += H.sum(axis=0)
        yield pd.DataFrame(
            {
                "vth": [vth.ravel().tolist()],
                "hth": [hth.ravel().tolist()],
                "hsum": [hsum.tolist()],
            }
        )

    return f



NMF_ORACLE = f"""
WITH RECURSIVE
tf AS (SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS c FROM (
         SELECT doc_id, UNNEST({DUCK_TOKENS}) AS w FROM documents)
       GROUP BY 1, 2),
top AS (SELECT w FROM (SELECT w, SUM(c) AS cf FROM tf GROUP BY 1
                       ORDER BY cf DESC, w LIMIT {NMF_VOCAB_CAP})),
vmap AS (SELECT w, CAST(ROW_NUMBER() OVER (ORDER BY w) - 1 AS BIGINT)
           AS widx FROM top),
v AS (SELECT tf.doc_id, vmap.widx, tf.c FROM tf JOIN vmap USING (w)),
dj AS (SELECT d.doc_id, j.j FROM (SELECT DISTINCT doc_id FROM v) d,
        (SELECT UNNEST(range(0, {NMF_K})) AS j) j),
wj AS (SELECT w.widx, j.j FROM vmap w,
        (SELECT UNNEST(range(0, {NMF_K})) AS j) j),
fac AS (
  SELECT 0 AS it, 'H' AS kind, doc_id AS a, j AS b,
         1.0 + 0.1 * CAST((doc_id * 5 + j * 7) % 4 AS DOUBLE) AS val
  FROM dj
  UNION ALL
  SELECT 0, 'W', widx, j,
         1.0 + 0.1 * CAST((widx * 7 + j * 3) % 5 AS DOUBLE)
  FROM wj
  UNION ALL
  SELECT it + 1, kind, a, b, val FROM (
    SELECT s0.it, u.kind, u.a, u.b, u.val
    FROM (SELECT DISTINCT it FROM fac) s0,
    LATERAL (
      SELECT h.a AS a, h.b AS b, 'H' AS kind,
             h.val * nm.num / (dn.den + 1e-9) AS val
      FROM fac h
      JOIN (SELECT v.doc_id AS a, w.b, SUM(v.c * w.val) AS num
            FROM v JOIN fac w ON w.kind = 'W' AND w.it = s0.it
                             AND w.a = v.widx
            GROUP BY 1, 2) nm ON nm.a = h.a AND nm.b = h.b
      JOIN (SELECT h2.a, g.j2 AS b, SUM(h2.val * g.gv) AS den
            FROM fac h2
            JOIN (SELECT wi.b AS i2, wjj.b AS j2,
                         SUM(wi.val * wjj.val) AS gv
                  FROM fac wi JOIN fac wjj
                    ON wi.kind = 'W' AND wjj.kind = 'W'
                   AND wi.it = s0.it AND wjj.it = s0.it
                   AND wi.a = wjj.a
                  GROUP BY 1, 2) g ON g.i2 = h2.b
            WHERE h2.kind = 'H' AND h2.it = s0.it
            GROUP BY 1, 2) dn ON dn.a = h.a AND dn.b = h.b
      WHERE h.kind = 'H' AND h.it = s0.it AND s0.it % 2 = 0
      UNION ALL
      SELECT w.a, w.b, 'W',
             w.val * vth.x / (wh.y + 1e-9)
      FROM fac w
      JOIN (SELECT v.widx AS a, h.b, SUM(v.c * h.val) AS x
            FROM v JOIN fac h ON h.kind = 'H' AND h.it = s0.it
                             AND h.a = v.doc_id
            GROUP BY 1, 2) vth ON vth.a = w.a AND vth.b = w.b
      JOIN (SELECT w2.a, ht.j2 AS b, SUM(w2.val * ht.hv) AS y
            FROM fac w2
            JOIN (SELECT hi.b AS i2, hj.b AS j2,
                         SUM(hi.val * hj.val) AS hv
                  FROM fac hi JOIN fac hj
                    ON hi.kind = 'H' AND hj.kind = 'H'
                   AND hi.it = s0.it AND hj.it = s0.it
                   AND hi.a = hj.a
                  GROUP BY 1, 2) ht ON ht.i2 = w2.b
            WHERE w2.kind = 'W' AND w2.it = s0.it
            GROUP BY 1, 2) wh ON wh.a = w.a AND wh.b = w.b
      WHERE w.kind = 'W' AND w.it = s0.it AND s0.it % 2 = 1
      UNION ALL
      SELECT c.a, c.b, c.kind, c.val
      FROM fac c
      WHERE c.it = s0.it
        AND ((s0.it % 2 = 0 AND c.kind = 'W')
             OR (s0.it % 2 = 1 AND c.kind = 'H'))
    ) u
    WHERE s0.it < {2 * NMF_ITERS}
  )
),
fin AS (SELECT kind, a, b, val FROM fac WHERE it = {2 * NMF_ITERS}),
hs AS (SELECT b AS j, SUM(val) AS hsum FROM fin WHERE kind = 'H'
       GROUP BY 1),
tot AS (SELECT SUM(hsum) AS t FROM hs),
tw AS (SELECT f.b AS j, vm.w, ROW_NUMBER() OVER (
         PARTITION BY f.b ORDER BY f.val DESC, f.a) AS rk
       FROM fin f JOIN vmap vm ON vm.widx = f.a
       WHERE f.kind = 'W')
SELECT CAST(hs.j AS INT) AS topic,
       FLOOR(hs.hsum / tot.t * 1e4 + 0.5) / 1e4 AS mass_share,
       MAX(CASE WHEN tw.rk = 1 THEN tw.w END) AS top_word_1,
       MAX(CASE WHEN tw.rk = 2 THEN tw.w END) AS top_word_2,
       MAX(CASE WHEN tw.rk = 3 THEN tw.w END) AS top_word_3
FROM hs CROSS JOIN tot JOIN tw ON tw.j = hs.j
GROUP BY 1, 2 ORDER BY 1
"""


@query(
    "tx_topic_nmf",
    # Real oracle: the op is seed-free and hash-free (deterministic
    # doc-id / word-index phase-offset inits, top-cap vocabulary with
    # a total (cf DESC, w) tie-break), so the full Lee-Seung training
    # loop replays as a recursive CTE alternating H steps (even
    # recursion steps) and W steps (odd), 2*NMF_ITERS steps total, exactly
    # the op's update order (W fits against the freshly updated H).
    # Reported values are robust to cross-engine float-summation
    # drift: mass shares sit >= 0.065 grid units from their 1e-4
    # boundaries and the top-3 word ranking has >= 0.0026 W-gaps at
    # the cut (measured at sf0.01).
    oracle=NMF_ORACLE,
)
def tx_topic_nmf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative-update NMF topic model over the document-term
    matrix: V (docs x vocab, TF counts) ~= H W^T with k={k} topics,
    {it} Lee-Seung update pairs. The MODELED vocabulary is capped to
    the top-{cap} corpus terms by frequency (one TakeOrdered — the
    standard topic-model truncation), so W (vocab x k) is genuinely
    model-sized on the driver — O(cap * k) — regardless of Heaps-law
    vocab growth at 100x the corpus; H (doc x k) stays DISTRIBUTED,
    exactly the k-means centroid pattern. Deterministic seed-free
    init (doc-id / word-index phase offsets). Emits one row per
    topic: its mass (share of total H weight) and top-3 words by W.

    Scale: the sparse doc rows (wi, c) are checkpointed ONCE; each
    iteration is ONE shuffle-free vectorized pass over that fixed
    frame in which H is REPLAYED from its deterministic init through
    the W sequence (all W's ride the closure — O(iters·cap·k) bytes,
    model-sized) and only the O(cap·k) V^T H + k×k H^T H partials the
    driver-side W step needs come back: one row per partition, no
    per-iteration checkpoint, no corpus-sized Arrow output (round-11;
    the former chain shipped wi/c/h out of Python and re-materialized
    the whole frame every iteration). The replay recompute is
    O(iters²·nnz·k) flops of in-task numpy — noise next to one
    boundary crossing of the same rows. Nothing corpus-sized ever
    moves after the build; the final mass report reuses the last
    pass's column sums."""
    import numpy as np

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
    nv, k = len(vocab), NMF_K
    vmap = F.broadcast(
        spark.createDataFrame(
            [(w, i) for i, w in enumerate(vocab)], "w string, widx int"
        )
    )
    # one fixed frame: the sparse doc rows, checkpointed once — every
    # iteration re-reads these cached blocks; H never materializes
    vh = (
        tf.join(vmap, "w")
        .groupBy("doc_id")
        .agg(
            F.collect_list("widx").alias("wi"),
            F.collect_list("c").alias("c"),
        )
        .localCheckpoint()
    )
    W = np.array(
        [
            [1.0 + 0.1 * ((wi * 7 + j * 3) % 5) for j in range(k)]
            for wi in range(nv)
        ]
    )
    Ws = [W]
    hsum = np.zeros(k)
    parts_schema = "vth array<double>, hth array<double>, hsum array<double>"
    for _ in range(NMF_ITERS):
        # ONE pass per iteration: replay H through the W sequence
        # in-task and collect only the partition partials (one row per
        # partition, model-sized) — same math and batch order as the
        # former store-H chain, so W and hsum are bit-identical.
        parts = vh.mapInPandas(
            _nmf_replay(list(Ws), nv, k), parts_schema
        ).collect()
        vth = sum(
            (np.array(p["vth"]).reshape(nv, k) for p in parts),
            np.zeros((nv, k)),
        )
        hth = sum(
            (np.array(p["hth"]).reshape(k, k) for p in parts),
            np.zeros((k, k)),
        )
        hsum = sum((np.array(p["hsum"]) for p in parts), np.zeros(k))
        Ws.append(Ws[-1] * vth / (Ws[-1] @ hth + 1e-9))
    W = Ws[-1]
    # hsum describes H AFTER the final H step (the partials pass reads
    # the updated frame), i.e. the H the final W was fit against
    total = float(hsum.sum())
    rows = []
    for j in range(k):
        order = sorted(range(nv), key=lambda i: (-W[i][j], i))[:3]
        rows.append(
            (
                j,
                round(float(hsum[j]) / total, 4),
                vocab[order[0]],
                vocab[order[1]],
                vocab[order[2]],
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
