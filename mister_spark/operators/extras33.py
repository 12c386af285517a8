"""Wave 33: code-vs-prose detection, PMI co-occurrence mining,
Cramér's V effect size, and small-file compaction.

tx_code_detect is the 'drop the JavaScript from the web crawl' gate
every text pipeline runs; tx_pmi_pairs mines the collocations that
feed phrase-aware tokenizers; stat_cramers_v turns stat_chi2's
'dependent?' into 'how strongly'; io_small_files_compaction
demonstrates the operational fix for the small-files problem that
kills listing/scan performance long before compute does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

PMI_MIN_PAIR_DOCS = 5  # report pairs co-occurring in ≥ this many docs
COMPACT_TARGET_FILES = 4


@query(
    "tx_code_detect",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CAST(length(regexp_replace(text, '[^{}();=\\[\\]<>]', '', 'g'))
                  AS BIGINT) AS n_sym,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
               AS n_digit
      FROM documents)
    SELECT doc_id, n_bytes,
           FLOOR(CAST(n_sym AS DOUBLE) / n_bytes * 10000 + 0.5) / 10000
             AS sym_ratio,
           FLOOR(CAST(n_digit AS DOUBLE) / n_bytes * 10000 + 0.5) / 10000
             AS digit_ratio,
           CAST(CASE WHEN CAST(n_sym AS DOUBLE) / n_bytes > 0.05
                     THEN 1 ELSE 0 END AS BIGINT) AS is_code
    FROM f WHERE n_bytes > 0
    """,
)
def tx_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose heuristic per document: the ratio of code-ish
    symbols ({}();=[]<>) and digits to total bytes, with a threshold
    flag — the cheap first gate a web-crawl pipeline uses to route
    source code away from the prose corpus (a real router would add a
    trained classifier; the features here are its standard inputs).
    Ratios are integer-count divisions rounded on the shared grid.

    Scale: pure per-row regexp counting in codegen — no shuffle at
    all; the filter on empty docs prunes map-side."""
    docs = cat(spark, sf_dir)["documents"]
    n_bytes = F.octet_length("text").cast("long")
    n_sym = F.length(F.regexp_replace("text", r"[^{}();=\[\]<>]", "")).cast("long")
    n_digit = F.length(F.regexp_replace("text", r"[^0-9]", "")).cast("long")
    f = docs.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        n_sym.alias("n_sym"),
        n_digit.alias("n_digit"),
    ).filter(F.col("n_bytes") > 0)
    sym_ratio = F.col("n_sym").cast("double") / F.col("n_bytes")
    return f.select(
        "doc_id",
        "n_bytes",
        ratio(sym_ratio).alias("sym_ratio"),
        ratio(F.col("n_digit").cast("double") / F.col("n_bytes")).alias(
            "digit_ratio"
        ),
        F.when(sym_ratio > 0.05, 1).otherwise(0).cast("bigint").alias("is_code"),
    )


@query(
    "tx_pmi_pairs",
    oracle=f"""
    WITH dt AS (SELECT DISTINCT doc_id, unnest({DUCK_TOKENS}) AS tk
                FROM documents),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM dt),
    tc AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS c FROM dt GROUP BY 1),
    pr AS (SELECT a.tk AS tok_a, b.tk AS tok_b,
                  CAST(COUNT(*) AS BIGINT) AS c_ab
           FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tk < b.tk
           GROUP BY 1, 2
           HAVING COUNT(*) >= {PMI_MIN_PAIR_DOCS})
    SELECT pr.tok_a, pr.tok_b, pr.c_ab, ca.c AS c_a, cb.c AS c_b,
           FLOOR(ln(pr.c_ab * nd.n / (CAST(ca.c AS DOUBLE) * cb.c))
                 * 10000 + 0.5) / 10000 AS pmi
    FROM pr JOIN tc ca ON pr.tok_a = ca.tk
            JOIN tc cb ON pr.tok_b = cb.tk, nd
    """,
)
def tx_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs at the document
    level: PMI = ln(P(a,b) / (P(a)·P(b))) over document co-occurrence —
    the collocation score that feeds phrase-aware tokenizers and topic
    seeds (high-PMI pairs are phrases, PMI≈0 pairs are independent).
    Pairs come from the distinct (doc, token) index self-joined ON
    doc_id, so fan-out per doc is (distinct tokens per doc)² — bounded
    by vocabulary, never raw token count; the ≥{PMI_MIN_PAIR_DOCS}-doc
    support filter runs in the pair aggregate.

    Scale: the distinct index is one shuffle; the doc-keyed self-join
    shuffles the index once more; token marginals broadcast."""
    docs = cat(spark, sf_dir)["documents"]
    dt = (
        docs.select("doc_id", F.explode(tokens()).alias("tk"))
        .distinct()
        .localCheckpoint()
    )
    nd = dt.agg(F.countDistinct("doc_id").cast("double").alias("n"))
    tc = dt.groupBy("tk").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = dt.select("doc_id", F.col("tk").alias("tok_a"))
    b = dt.select("doc_id", F.col("tk").alias("tok_b"))
    pr = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_PAIR_DOCS)
    )
    ca = tc.select(F.col("tk").alias("tok_a"), F.col("c").alias("c_a"))
    cb = tc.select(F.col("tk").alias("tok_b"), F.col("c").alias("c_b"))
    return (
        pr.join(F.broadcast(ca), "tok_a")
        .join(F.broadcast(cb), "tok_b")
        .crossJoin(F.broadcast(nd))
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            "c_a",
            "c_b",
            ratio(
                F.log(
                    F.col("c_ab") * F.col("n")
                    / (F.col("c_a").cast("double") * F.col("c_b"))
                )
            ).alias("pmi"),
        )
    )


@query(
    "stat_cramers_v",
    oracle="""
    WITH o AS (
      SELECT event_type AS et, CAST(isodow(ts) AS BIGINT) AS dw,
             CAST(COUNT(*) AS DOUBLE) AS obs
      FROM events GROUP BY 1, 2),
    tot AS (SELECT SUM(obs) AS n FROM o),
    rt AS (SELECT et, SUM(obs) AS r FROM o GROUP BY 1),
    ct AS (SELECT dw, SUM(obs) AS c FROM o GROUP BY 1),
    s AS (SELECT SUM((obs - r * c / n) * (obs - r * c / n) / (r * c / n))
                   AS chi2,
                 CAST(MAX(tot.n) AS DOUBLE) AS n,
                 COUNT(DISTINCT o.et) AS nr, COUNT(DISTINCT o.dw) AS nc
          FROM o JOIN rt ON o.et = rt.et JOIN ct ON o.dw = ct.dw, tot)
    SELECT FLOOR(chi2 * 10000 + 0.5) / 10000 AS chi2,
           CAST(n AS BIGINT) AS n,
           FLOOR(SQRT(chi2 / (n * LEAST(nr - 1, nc - 1))) * 10000 + 0.5)
             / 10000 AS cramers_v
    FROM s
    """,
)
def stat_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for the event-type × ISO-weekday contingency table —
    the [0,1]-normalized effect size that makes stat_chi2's statistic
    comparable across table shapes and sample sizes (χ² says
    'dependent?', V says 'how strongly', MI says 'how many nats').

    Scale: identical shape to stat_chi2 — one contingency partial-agg,
    broadcast marginals, scalar fold."""
    ev = cat(spark, sf_dir)["events"]
    o = (
        ev.select(
            F.col("event_type").alias("et"),
            (((F.dayofweek("ts") + 5) % 7) + 1).cast("long").alias("dw"),
        )
        .groupBy("et", "dw")
        .agg(F.count(F.lit(1)).cast("double").alias("obs"))
        .localCheckpoint()
    )
    tot = o.agg(F.sum("obs").alias("n"))
    rt = o.groupBy("et").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("dw").agg(F.sum("obs").alias("c"))
    exp = F.col("r") * F.col("c") / F.col("n")
    s = (
        o.join(F.broadcast(rt), "et")
        .join(F.broadcast(ct), "dw")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum((F.col("obs") - exp) * (F.col("obs") - exp) / exp).alias("chi2"),
            F.max("n").alias("nn"),
            F.countDistinct("et").alias("nr"),
            F.countDistinct("dw").alias("nc"),
        )
    )
    return s.select(
        ratio(F.col("chi2")).alias("chi2"),
        F.col("nn").cast("bigint").alias("n"),
        ratio(
            F.sqrt(
                F.col("chi2")
                / (F.col("nn") * F.least(F.col("nr") - 1, F.col("nc") - 1))
            )
        ).alias("cramers_v"),
    )


@query("io_small_files_compaction")  # filesystem-dependent → rows-only; pytest gate
def io_small_files_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The small-files problem, demonstrated and fixed: the events
    table is staged as 64 tiny parquet files (the pathological landing
    layout every streaming ingest produces), then compacted with one
    coalesce({COMPACT_TARGET_FILES}) rewrite — no shuffle, just
    partition concatenation. The single output row reports file counts
    and bytes before/after plus the row count, which pytest pins equal
    across layouts (compaction must be storage-only).

    Scale: at 100 TB the win is listing + open() amortization and
    full-size row groups (better compression and pushdown); a resident
    pipeline runs this as a scheduled job per landing partition.
    coalesce (not repartition) keeps the rewrite shuffle-free."""
    import os

    from mister_spark.sources.staged import stage_small_files_events

    small_dir, compact_dir = stage_small_files_events(spark, sf_dir)

    def _stats(d: str):
        fs = [
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        ]
        return len(fs), sum(os.path.getsize(f) for f in fs)

    nf_small, bytes_small = _stats(small_dir)
    nf_comp, bytes_comp = _stats(compact_dir)
    n_rows = spark.read.parquet(compact_dir).count()
    return spark.createDataFrame(
        [(nf_small, bytes_small, nf_comp, bytes_comp, n_rows)],
        "files_before long, bytes_before long, files_after long, "
        "bytes_after long, n_rows long",
    )
