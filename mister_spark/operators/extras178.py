"""Wave 178: trainable corpus quality classifier.

ds_quality_classifier is the DCLM/fastText-style filter pipeline: a
logistic regression over standardized bag-of-words features trained
to recognize a target slice, then scored on a held-out quarter. This
is the learned sibling of the rule-based gates (tx_gopher_quality,
ds_perplexity_filter): rules encode priors, the classifier learns the
discriminating vocabulary from examples — the filter family most
modern pretraining pipelines end with. The synthetic corpus has no
semantic quality label (every language shares one 31-word vocabulary,
so language itself is NOT separable from BoW — verified), so the
target slice is 'length above the train median': vocabulary COVERAGE
is the genuine signal (corr 0.9 with length), and the pipeline shape
— train / standardize / held-out gate — is exactly what a production
reference-corpus label would reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import tokens
from mister_spark.operators.common import cat
from mister_spark.registry import query

QC_ITERS = 40
QC_LR = 1.0


@query("ds_quality_classifier")  # iterative GD → rows-only
def ds_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words logistic quality classifier: binary token-presence
    features standardized by the TRAIN split's mean/std, label =
    document length above the train median, {it} full-batch gradient
    steps (lr={lr}, zero init — deterministic, seed-free) on the
    doc_id%4!=0 split, scored on the held-out quarter at threshold
    0.5. Emits split sizes, held-out accuracy / precision / recall /
    F1, the majority baseline it must beat (pytest gates accuracy
    above it), and train NLL.

    Scale: the model and the standardization vectors are O(|vocab|)
    driver state (the k-means/NMF pattern); each gradient step is ONE
    partial aggregate — per-dimension sums of (p - y) * x_i, no
    shuffle beyond the single-row agg — over the once-checkpointed
    feature frame. The exact train median would become
    approx_percentile at corpus scale (same gate, sketched
    threshold)."""
    docs = cat(spark, sf_dir)["documents"]
    tf = (
        docs.select("doc_id", F.explode(tokens()).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = sorted(r["w"] for r in tf.select("w").distinct().collect())
    vmap = F.broadcast(
        spark.createDataFrame(list(enumerate(vocab)), "idx int, w string")
    )
    dim = len(vocab)
    feats = (
        tf.join(vmap, "w")
        .groupBy("doc_id")
        .agg(F.collect_set("idx").alias("present"))
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.array_contains("present", i).cast("double"),
            ).alias("x"),
        )
        .join(
            docs.select(
                "doc_id",
                F.col("n_chars").cast("double").alias("nc"),
                (F.col("doc_id") % 4 == 0).alias("heldout"),
            ),
            "doc_id",
        )
        .localCheckpoint()
    )
    train = feats.filter(~F.col("heldout"))
    med = train.agg(F.median("nc")).collect()[0][0]
    stats = train.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[F.sum(F.col("x")[i]).alias(f"s{i}") for i in range(dim)],
        *[
            F.sum(F.col("x")[i] * F.col("x")[i]).alias(f"ss{i}")
            for i in range(dim)
        ],
    ).collect()[0]
    n_train = stats["n"]
    mu = [stats[f"s{i}"] / n_train for i in range(dim)]
    sd = [
        max(
            (stats[f"ss{i}"] / n_train - mu[i] * mu[i]) ** 0.5, 1e-9
        )
        for i in range(dim)
    ]
    mulit = F.array(*[F.lit(v) for v in mu])
    sdlit = F.array(*[F.lit(v) for v in sd])
    std = feats.select(
        "heldout",
        (F.col("nc") > med).cast("double").alias("y"),
        F.zip_with(
            F.zip_with(F.col("x"), mulit, lambda xi, m: xi - m),
            sdlit,
            lambda d, s: d / s,
        ).alias("xs"),
    ).localCheckpoint()
    tr = std.filter(~F.col("heldout"))
    w = [0.0] * dim
    b = 0.0
    for _ in range(QC_ITERS):
        wlit = F.array(*[F.lit(v) for v in w])
        z = (
            F.aggregate(
                F.zip_with(F.col("xs"), wlit, lambda xi, wi: xi * wi),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            + F.lit(b)
        )
        pm = (F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")).alias("pm")
        g = tr.select(pm, "xs").agg(
            *[
                F.sum(F.col("pm") * F.col("xs")[i]).alias(f"g{i}")
                for i in range(dim)
            ],
            F.sum("pm").alias("gb"),
        ).collect()[0]
        w = [w[i] - QC_LR * g[f"g{i}"] / n_train for i in range(dim)]
        b = b - QC_LR * g["gb"] / n_train
    wlit = F.array(*[F.lit(v) for v in w])
    z = (
        F.aggregate(
            F.zip_with(F.col("xs"), wlit, lambda xi, wi: xi * wi),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        + F.lit(b)
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    scored = std.select(
        "heldout", "y", p.alias("p"), (p >= 0.5).cast("double").alias("yhat")
    ).localCheckpoint()
    ev = scored.filter(F.col("heldout"))
    m = ev.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("yhat") == F.col("y"), 1.0).otherwise(0.0)).alias(
            "correct"
        ),
        F.sum(
            F.when((F.col("yhat") == 1.0) & (F.col("y") == 1.0), 1.0).otherwise(
                0.0
            )
        ).alias("tp"),
        F.sum(F.when(F.col("yhat") == 1.0, 1.0).otherwise(0.0)).alias(
            "pred_pos"
        ),
        F.sum(F.when(F.col("y") == 1.0, 1.0).otherwise(0.0)).alias(
            "actual_pos"
        ),
    ).collect()[0]
    nll = (
        scored.filter(~F.col("heldout"))
        .agg(
            F.avg(
                -(
                    F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                    + (1 - F.col("y"))
                    * F.log(F.greatest(1 - F.col("p"), F.lit(1e-12)))
                )
            )
        )
        .collect()[0][0]
    )
    acc = m["correct"] / m["n"]
    prec = m["tp"] / m["pred_pos"] if m["pred_pos"] else 0.0
    rec = m["tp"] / m["actual_pos"] if m["actual_pos"] else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    base = max(m["actual_pos"], m["n"] - m["actual_pos"]) / m["n"]
    return spark.createDataFrame(
        [
            (
                int(n_train),
                int(m["n"]),
                round(acc, 4),
                round(prec, 4),
                round(rec, 4),
                round(f1, 4),
                round(base, 4),
                round(float(nll), 4),
            )
        ],
        "train_docs long, heldout_docs long, accuracy double, "
        "precision double, recall double, f1 double, "
        "majority_baseline double, train_nll double",
    )


ds_quality_classifier.__doc__ = ds_quality_classifier.__doc__.format(
    it=QC_ITERS, lr=QC_LR
)
