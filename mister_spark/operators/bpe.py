"""BPE (byte-pair-encoding) vocabulary training, Spark-native.

The tokenizer-training step of a pretraining pipeline (Sennrich et al.
2016): start from characters, repeatedly merge the most frequent
adjacent symbol pair. The corpus statistics are distributed (pair
counting is a partial-agg shuffle over the word-type table); only the
argmax pair — one row — comes back to the driver per merge, mirroring
how the k-means model loop works (model driver-sized, data
distributed).

The merge rewrite is genuinely imperative (left-to-right greedy
within each word), so it runs as an Arrow-batched mapInPandas over the
word-type table — NOT over the corpus: BPE statistics only need
(distinct word, frequency), which is Zipf-small relative to raw text.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat
from mister_spark.registry import query

N_MERGES = 10


def _word_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq, syms) — the distinct-word table with char symbols."""
    docs = cat(spark, sf_dir)["documents"]
    words = (
        docs.select(F.explode(tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    syms = F.filter(F.split("word", ""), lambda s: s != F.lit(""))
    return words.select("word", "freq", syms.alias("syms"))


def _pair_counts(wt: DataFrame) -> DataFrame:
    n = F.size("syms")
    pairs = F.arrays_zip(
        F.slice("syms", 1, n - 1).alias("l"), F.slice("syms", 2, n - 1).alias("r")
    )
    return (
        wt.filter(n >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").cast("long").alias("c"))
    )


def _merge_batch(left: str, right: str):
    def fn(it):
        for pdf in it:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                merged, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        merged.append(left + right)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                out.append(merged)
            yield pd.DataFrame(
                {"word": pdf["word"], "freq": pdf["freq"], "syms": out}
            )

    return fn


def bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> list[tuple[str, str, int]]:
    """Run `n_merges` BPE merge steps; returns [(left, right, freq)].
    Ties break on lexicographically smallest (left, right) so the merge
    sequence is fully deterministic.

    Scale: each step = one partial-agg shuffle over word TYPES (not
    corpus tokens) + a 1-row argmax to the driver + a map-side Arrow
    rewrite. localCheckpoint truncates lineage so 50k merges don't
    stack 50k plans."""
    wt = _word_types(spark, sf_dir).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(wt)
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((l, r, c))
        wt = wt.mapInPandas(
            _merge_batch(l, r), schema="word string, freq long, syms array<string>"
        ).localCheckpoint()
    return merges


def _duck_bpe_chain() -> str:
    """The 10-merge BPE training loop as chained CTEs over word-type
    SEGMENTATIONS (word, pos, sym). Per round: pair counts with the
    (c DESC, l, r) argmax, then the greedy left-to-right rewrite as a
    boundary-parity rule — for l != r candidate boundaries can never
    be adjacent, and for l == r a run of k consecutive candidates
    greedily merges at its odd ranks, so 'keep odd rank within each
    island' IS the sequential scan. Pure integer/string arithmetic.
    Exposes wt (word, freq), m1..m{N} (l, r, c) and segs{N} (the
    final segmentation) for the three BPE oracles to build on."""
    parts = [
        f"""wt AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest({DUCK_TOKENS}) AS word FROM documents) q
      GROUP BY word)""",
        """segs0 AS MATERIALIZED (
      SELECT word, g.i AS pos, substr(word, CAST(g.i AS INT), 1) AS sym
      FROM wt, LATERAL (SELECT unnest(generate_series(1, len(word)))
                        AS i) g)""",
    ]
    for k in range(1, N_MERGES + 1):
        p = k - 1
        parts.append(f"""
    m{k} AS MATERIALIZED (
      SELECT a.sym AS l, b.sym AS r, CAST(SUM(w.freq) AS BIGINT) AS c
      FROM segs{p} a JOIN segs{p} b ON b.word = a.word
                                   AND b.pos = a.pos + 1
      JOIN wt w ON w.word = a.word
      GROUP BY 1, 2 ORDER BY c DESC, l, r LIMIT 1)""")
        parts.append(f"""
    kept{k} AS MATERIALIZED (
      SELECT word, pos FROM (
        SELECT word, pos,
               ROW_NUMBER() OVER (PARTITION BY word, grp
                                  ORDER BY pos) AS rix
        FROM (
          SELECT s.word, s.pos,
                 s.pos - ROW_NUMBER() OVER (PARTITION BY s.word
                                            ORDER BY s.pos) AS grp
          FROM segs{p} s JOIN segs{p} t ON t.word = s.word
                                       AND t.pos = s.pos + 1
          JOIN m{k} m ON s.sym = m.l AND t.sym = m.r) q1) q2
      WHERE rix % 2 = 1)""")
        parts.append(f"""
    segs{k} AS MATERIALIZED (
      SELECT word, ROW_NUMBER() OVER (PARTITION BY word
                                      ORDER BY pos) AS pos, sym
      FROM (
        SELECT s.word, s.pos,
               CASE WHEN kk.pos IS NOT NULL THEN s.sym || t.sym
                    ELSE s.sym END AS sym
        FROM segs{p} s
        LEFT JOIN kept{k} kk ON kk.word = s.word AND kk.pos = s.pos
        LEFT JOIN kept{k} k2 ON k2.word = s.word AND k2.pos = s.pos - 1
        LEFT JOIN segs{p} t ON t.word = s.word AND t.pos = s.pos + 1
        WHERE k2.pos IS NULL) q)""")
    return ",\n".join(parts)


@query(
    "ds_bpe_merges",
    # Real oracle: the shared 10-round segmentation chain — each m{k}
    # is that round's (count DESC, l, r) argmax pair.
    oracle="WITH "
    + _duck_bpe_chain()
    + "\n"
    + "\nUNION ALL\n".join(
        f"""SELECT CAST({k - 1} AS BIGINT) AS step, m{k}.l AS "left",
               m{k}.r AS "right", m{k}.c AS freq FROM m{k}"""
        for k in range(1, N_MERGES + 1)
    ),
)
def ds_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table (step, left, right, freq) — the
    artifact a tokenizer ships. Verified in pytest against a pure-
    Python reference implementation on the same corpus."""
    merges = bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        [(i, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "step long, left string, right string, freq long",
    )


def bpe_encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word with an ordered merge list: apply each learned
    merge fully (left-to-right greedy) in rank order — the same rewrite
    rule training uses, so training and inference tokenize alike."""
    syms = list(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                merged.append(left + right)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


@query(
    "ds_tokenize_apply",
    # Real oracle: applying the ranked merge list to a word IS the
    # training rewrite sequence, so each word's subtoken count is its
    # row count in the chain's final segmentation.
    oracle="WITH "
    + _duck_bpe_chain()
    + f""",
    nsub AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_sub
             FROM segs{N_MERGES} GROUP BY word),
    pdw AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS c FROM (
              SELECT doc_id, unnest({DUCK_TOKENS}) AS word
              FROM documents) q GROUP BY 1, 2)
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
           CAST(SUM(c * n_sub) AS BIGINT) AS n_tokens
    FROM pdw JOIN nsub USING (word) GROUP BY doc_id
    """,
)
def ds_tokenize_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained BPE tokenizer to the corpus: per document, the
    word count and the encoded subword-token count — the pretraining
    "tokenize everything" pass that turns a curated corpus into model
    input (token counts are also what the data mixture is budgeted in).

    Scale: the merge table is driver-trained (model-sized) and rides
    the task closure. Encoding runs once per distinct WORD TYPE
    (Zipf-small), not per corpus token: an Arrow-batched mapInPandas
    over the word-type table produces (word → n_subtokens), which joins
    back to per-doc word counts — AQE broadcasts the type table when it
    fits. The corpus-sized steps are the two partial-agg shuffles.
    Verified in pytest against a pure-Python encode of the same docs."""
    merges = [(l, r) for l, r, _ in bpe_train(spark, sf_dir)]
    docs = cat(spark, sf_dir)["documents"]
    tok = docs.select("doc_id", F.explode(tokens()).alias("word"))
    per_doc_word = tok.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wt = per_doc_word.select("word").distinct()

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_sub": [
                        len(bpe_encode_word(w, merges)) for w in pdf["word"]
                    ],
                }
            )

    lens = wt.mapInPandas(encode, schema="word string, n_sub long")
    return (
        per_doc_word.join(lens, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_words"),
            F.sum(F.col("c") * F.col("n_sub")).cast("bigint").alias("n_tokens"),
        )
    )
