"""Wave 50: training-data pipeline round-out — span corruption,
tokenizer fertility, label-noise audit, and LSH parameter tuning.

ds_span_corruption builds the T5-style denoising objective's masking
manifest with deterministic arithmetic (no RNG to disagree on);
ds_bpe_fertility evaluates the trained BPE tokenizer the way tokenizer
teams do (tokens-per-word by language — the number that decides vocab
size per language); ml_label_noise is confident-learning-style label
auditing (kNN disagreement) for labeled eval sets; dd_lsh_param_sweep
turns MinHash banding from folklore into a measured (bands × rows)
tradeoff table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.hashing import (
    FP_MOD,
    FP_MUL,
    duck_minhash_mins,
)
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.functions.vectors import dot as _dot, norm as _norm
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.operators.bpe import N_MERGES, _duck_bpe_chain
from mister_spark.registry import query

MASK_MOD = 100
MASK_PCT = 15  # mask ~15% of token positions
MASK_A = 1_000_003  # doc mix multiplier
MASK_B = 7_919  # position mix multiplier
NOISE_K = 10
NOISE_OWN_MAX = 2  # own label among <= this many of K neighbors => flag
SWEEP_CONFIGS = [(8, 2), (4, 4), (2, 8)]  # (bands, rows) over 16 minhashes
SWEEP_K = 16


@query(
    "ds_span_corruption",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {DUCK_TOKENS} AS toks FROM documents),
    p AS (SELECT doc_id, source,
                 unnest(generate_series(1, len(toks))) AS pos
          FROM t),
    mk AS (SELECT doc_id, source, pos,
                  CASE WHEN (doc_id * {MASK_A} + pos * {MASK_B})
                            % {MASK_MOD} < {MASK_PCT}
                       THEN 1 ELSE 0 END AS m
           FROM p),
    sp AS (SELECT doc_id, source, pos, m,
                  CASE WHEN m = 1 AND COALESCE(LAG(m) OVER
                         (PARTITION BY doc_id ORDER BY pos), 0) = 0
                       THEN 1 ELSE 0 END AS span_start
           FROM mk)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(m) AS BIGINT) AS n_masked,
           FLOOR(CAST(SUM(m) AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000
             AS mask_rate,
           CAST(SUM(span_start) AS BIGINT) AS n_spans,
           FLOOR(CAST(SUM(m) AS DOUBLE) / SUM(span_start) * 10000 + 0.5)
             / 10000 AS avg_span_len
    FROM sp GROUP BY source
    """,
)
def ds_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption manifest: mask token positions where
    (doc_id·{MASK_A} + pos·{MASK_B}) mod {MASK_MOD} < {MASK_PCT} — a
    deterministic arithmetic mask both engines replay bit-for-bit (the
    reason this ISN'T rand(): a corruption schedule must be
    reproducible across reruns and engines or the denoising targets
    drift). Reports per-source token/mask counts and the span
    structure (count + mean length) the sentinel-token budget needs.

    Scale: posexplode is corpus-linear and never shuffled raw — the
    span-start lag runs in per-DOC windows (doc-sized partitions,
    fully parallel), then everything partial-aggs to |sources| rows."""
    docs = cat(spark, sf_dir)["documents"]
    p = docs.select(
        "doc_id", "source", F.posexplode(tokens()).alias("pos0", "tok")
    ).select("doc_id", "source", (F.col("pos0") + 1).alias("pos"))
    mk = p.withColumn(
        "m",
        F.when(
            (F.col("doc_id") * MASK_A + F.col("pos") * MASK_B) % MASK_MOD
            < MASK_PCT,
            1,
        ).otherwise(0),
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    sp = mk.withColumn(
        "span_start",
        F.when(
            (F.col("m") == 1)
            & (F.coalesce(F.lag("m").over(w), F.lit(0)) == 0),
            1,
        ).otherwise(0),
    )
    return sp.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("m").cast("bigint").alias("n_masked"),
        ratio(F.sum("m").cast("double") / F.count(F.lit(1))).alias(
            "mask_rate"
        ),
        F.sum("span_start").cast("bigint").alias("n_spans"),
        ratio(F.sum("m").cast("double") / F.sum("span_start")).alias(
            "avg_span_len"
        ),
    )


@query(
    "ds_bpe_fertility",
    # Real oracle: reuses the BPE chain (bpe._duck_bpe_chain) — each
    # word's piece count is its row count in the final segmentation,
    # joined to per-(lang, word) frequencies; ratios on the floor grid.
    oracle="WITH "
    + _duck_bpe_chain()
    + f"""
    , nsub AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_sub
               FROM segs{N_MERGES} GROUP BY word),
    lw AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
             SELECT lang, unnest({DUCK_TOKENS}) AS word
             FROM documents) q GROUP BY 1, 2)
    SELECT lang,
           CAST(SUM(freq) AS BIGINT) AS n_words,
           CAST(SUM(freq * n_sub) AS BIGINT) AS n_tokens,
           FLOOR(CAST(SUM(freq * n_sub) AS DOUBLE) / SUM(freq)
                 * 10000 + 0.5) / 10000 AS fertility,
           FLOOR(CAST(SUM(freq * len(word)) AS DOUBLE)
                 / SUM(freq * n_sub) * 10000 + 0.5) / 10000
             AS chars_per_token
    FROM lw JOIN nsub USING (word) GROUP BY lang
    """,
)
def ds_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language under the trained BPE merges:
    tokens-per-word (Σ freq·|pieces| / Σ freq) and chars-per-token —
    THE tokenizer-evaluation numbers (a language with fertility 2×
    another pays 2× the sequence length for the same text, which is
    why production vocabs are sized per-language). Uses the same
    10-merge table ds_bpe_merges ships.

    Scale: encoding runs over distinct (lang, word) TYPES — vocabulary-
    sized, not corpus-sized — with the merge list broadcast into an
    Arrow-batched mapInPandas; per-lang sums are integer partial aggs.
    Gated in tests/test_wave50.py: fertility ≥ 1 and merges strictly
    reduce fertility vs char-level."""
    from mister_spark.operators.bpe import bpe_encode_word, bpe_train

    merges = [(l, r) for l, r, _ in bpe_train(spark, sf_dir)]
    docs = cat(spark, sf_dir)["documents"]
    wt = (
        docs.select("lang", F.explode(tokens()).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )

    def encode(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["n_pieces"] = [
                len(bpe_encode_word(w, merges)) for w in pdf["word"]
            ]
            pdf["n_chars"] = [len(w) for w in pdf["word"]]
            yield pdf[["lang", "freq", "n_pieces", "n_chars"]]

    enc = wt.mapInPandas(
        encode, schema="lang string, freq long, n_pieces long, n_chars long"
    )
    return enc.groupBy("lang").agg(
        F.sum("freq").cast("bigint").alias("n_words"),
        F.sum(F.col("freq") * F.col("n_pieces")).cast("bigint").alias(
            "n_tokens"
        ),
        ratio(
            F.sum(F.col("freq") * F.col("n_pieces")).cast("double")
            / F.sum("freq")
        ).alias("fertility"),
        ratio(
            F.sum(F.col("freq") * F.col("n_chars")).cast("double")
            / F.sum(F.col("freq") * F.col("n_pieces"))
        ).alias("chars_per_token"),
    )


@query(
    "ml_label_noise",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                      CAST(label AS BIGINT) AS label
               FROM embeddings),
    sc AS (SELECT a.vec_id, a.label, b.vec_id AS t_id, b.label AS t_label,
                  FLOOR(list_cosine_similarity(a.v, b.v) * 10000 + 0.5)
                    / 10000 AS cos
           FROM e a, e b WHERE a.vec_id <> b.vec_id),
    nn AS (SELECT vec_id, label, t_label,
                  ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, t_id) AS r
           FROM sc),
    votes AS (SELECT vec_id, label, t_label,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM nn WHERE r <= {NOISE_K} GROUP BY 1, 2, 3),
    own AS (SELECT vec_id, label,
                   COALESCE(MAX(CASE WHEN t_label = label THEN n END), 0)
                     AS n_own
            FROM votes GROUP BY 1, 2),
    maj AS (SELECT vec_id, t_label AS majority_label, n AS n_majority,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY n DESC, t_label) AS r
            FROM votes)
    SELECT own.vec_id, own.label, maj.majority_label,
           CAST(own.n_own AS BIGINT) AS n_own, maj.n_majority
    FROM own JOIN maj ON own.vec_id = maj.vec_id AND maj.r = 1
    WHERE own.n_own <= {NOISE_OWN_MAX} AND maj.majority_label <> own.label
    ORDER BY own.vec_id
    """,
)
def ml_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning-style label-noise audit: flag vectors whose
    own label appears in ≤ {NOISE_OWN_MAX} of their {NOISE_K} cosine
    nearest neighbors AND whose neighborhood majority disagrees — the
    candidates a labeled eval set's re-annotation queue should see
    first (training on noisy eval labels silently corrupts every
    downstream metric). Cosines round before ranking; every tiebreak
    explicit (ml_knn_classify conventions).

    Scale: the labeled-eval table is model-sized by construction, so
    all-pairs scoring is bounded; at corpus scale the same audit runs
    on sim_ivf's bucketed candidates instead of the cross join (same
    vote/flag tail)."""
    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        F.col("label").cast("long").alias("label"),
    )
    a = emb.select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("label").alias("q_label"),
    )
    sc = emb.join(F.broadcast(a)).filter(
        F.col("vec_id") != F.col("q_id")
    ).withColumn("cos", rnd(_dot("v", "qv") / (_norm("v") * _norm("qv")), 4))
    w_nn = W.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    nn = sc.withColumn("r", F.row_number().over(w_nn)).filter(
        F.col("r") <= NOISE_K
    )
    votes = nn.groupBy("q_id", "q_label", F.col("label").alias("t_label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).localCheckpoint()  # |vectors| x labels; feeds own + majority branches
    own = votes.groupBy("q_id", "q_label").agg(
        F.coalesce(
            F.max(F.when(F.col("t_label") == F.col("q_label"), F.col("n"))),
            F.lit(0),
        ).alias("n_own")
    )
    w_m = W.partitionBy("q_id").orderBy(F.col("n").desc(), "t_label")
    maj = (
        votes.withColumn("r", F.row_number().over(w_m))
        .filter(F.col("r") == 1)
        .select(
            "q_id",
            F.col("t_label").alias("majority_label"),
            F.col("n").alias("n_majority"),
        )
    )
    return (
        own.join(maj, "q_id")
        .filter(
            (F.col("n_own") <= NOISE_OWN_MAX)
            & (F.col("majority_label") != F.col("q_label"))
        )
        .select(
            F.col("q_id").alias("vec_id"),
            F.col("q_label").alias("label"),
            "majority_label",
            F.col("n_own").cast("bigint").alias("n_own"),
            "n_majority",
        )
        .orderBy("vec_id")
    )


def _sweep_oracle() -> str:
    import math

    parts = [duck_minhash_mins(SWEEP_K, DUCK_TOKENS)]
    rows = []
    for b, r in SWEEP_CONFIGS:
        parts.append(f"""
    bands_{b}_{r} AS (
      SELECT doc_id, i // {r} AS band,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                                      list(m ORDER BY i)),
                         (a, x) -> (a * {FP_MUL} + x) % {FP_MOD}) AS bh
      FROM mins WHERE i < {b * r} GROUP BY doc_id, band)""")
        s50 = math.floor((1.0 / b) ** (1.0 / r) * 10000 + 0.5) / 10000
        rows.append(f"""
    SELECT CAST({b} AS BIGINT) AS bands,
           CAST({r} AS BIGINT) AS rows_per_band,
           {s50!r} AS s50_threshold,
           CAST(COALESCE(SUM(m * (m - 1) / 2), 0) AS BIGINT)
             AS n_collisions
    FROM (SELECT COUNT(*) AS m FROM bands_{b}_{r}
          GROUP BY band, bh) q""")
    return "WITH " + ",\n".join(parts) + "\nUNION ALL\n".join(rows)


@query(
    "dd_lsh_param_sweep",
    # Real oracle: one shared 16-perm universal-hash signature table,
    # each banding config a GROUP BY over its i-order polynomial band
    # folds, collisions counted as sum m(m-1)/2 over bucket sizes.
    oracle=_sweep_oracle(),
)
def dd_lsh_param_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding tradeoff table: for (bands × rows) splits of
    a {SWEEP_K}-hash signature, the measured band-collision count (Σ C(bucket,2), an upper bound
    on distinct candidate pairs — pairs sharing several bands count
    once per band) plus
    the theoretical s-curve midpoint s₅₀ = (1/b)^(1/r) — the table a
    dedup pipeline reads before picking its banding (more rows/band →
    higher similarity threshold → fewer candidates; this makes the
    recall/cost knob measurable instead of folkloric).

    Scale: ONE signature computation is shared across configs; each
    config adds only a slim (doc, band-hash) explode + equi-join
    self-count — the same linear band-join shape as dd_minhash_lsh,
    never all-pairs. Candidate counts come from groupBy(band,hash)
    bucket sizes (Σ m·(m−1)/2), so no pair materialization at all."""
    from mister_spark.functions.hashing import (
        band_fingerprint,
        mh_hash60,
        minhash_signatures,
    )
    from mister_spark.operators.dedup import _doc_shingles

    ds = _doc_shingles(spark, sf_dir)
    # no size(sh) > 0 gate: explode drops empty arrays anyway, and the
    # pushed-down filter would inline (re-evaluate) the whole
    # tokenize+trigram subtree a second time per doc
    hashed = ds.select(
        "doc_id",
        F.explode(F.transform("sh", lambda s: mh_hash60(s))).alias("h"),
    )
    sigs = minhash_signatures(hashed, SWEEP_K).localCheckpoint()
    frames = []
    for b, r in SWEEP_CONFIGS:
        bands = F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    band_fingerprint(
                        [f"m{i * r + j}" for j in range(r)]
                    ).alias("bh"),
                )
                for i in range(b)
            ]
        )
        buckets = (
            sigs.select("doc_id", F.explode(bands).alias("e"))
            .select("doc_id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))
            .groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("m"))
        )
        cand = buckets.agg(
            F.coalesce(
                F.sum(F.col("m") * (F.col("m") - 1) / 2), F.lit(0.0)
            )
            .cast("bigint")
            .alias("n_collisions")
        ).select(
            F.lit(b).cast("bigint").alias("bands"),
            F.lit(r).cast("bigint").alias("rows_per_band"),
            F.lit(
                __import__("math").floor(
                    (1.0 / b) ** (1.0 / r) * 10000 + 0.5
                )
                / 10000
            ).alias("s50_threshold"),
            "n_collisions",
        )
        frames.append(cand)
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out
