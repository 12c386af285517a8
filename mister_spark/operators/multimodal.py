"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic stub — but everything Spark-side is real:
binary column construction, JVM byte-level functions, Arrow-batched
mapInPandas with a stable output schema, and partition-sized batching.
Swapping `_fake_decode` for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat
from mister_spark.registry import query


@query(
    "mm_binary_stats",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
)
def mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass, fully JVM-side: encode text → bytes
    (standing in for an image/audio payload), then byte length + md5.
    At 100 TB this is the 'stat pass' that runs before any decode."""
    docs = cat(spark, sf_dir)["documents"]
    blob = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(blob).cast("long").alias("n_bytes"),
        F.md5(blob).alias("digest"),
    )


FEATURE_SCHEMA = "doc_id long, n_bytes long, width int, height int, feat array<double>"


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """DECODER STUB — deterministic stand-in for image decode.

    Real deployments replace this with PIL/libvips/ffmpeg; the container
    has no codecs, so we derive a fake (width, height, feature[4]) from
    the bytes. Deterministic: same payload → same features.
    """
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    s = sum(payload) if n else 0
    feat = [
        float(n),
        float(s % 256),
        float(payload[0]) if n else 0.0,
        float(payload[-1]) if n else 0.0,
    ]
    return width, height, feat


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        decoded = [_fake_decode(b) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": [len(b) for b in pdf["payload"]],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "feat": [d[2] for d in decoded],
            }
        )


@query("mm_feature_extract")  # decode stub → rows-only; pytest checks shape
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched decode+featurize over a binary column via mapInPandas
    (Arrow batches, not per-row Python). The stub keeps the exact
    plumbing — schema, batch iteration, binary handling — of a real
    image/audio featurizer."""
    docs = cat(spark, sf_dir)["documents"]
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)


@query(
    "mm_frame_sample",
    # Real oracle: pure chunk arithmetic on the ASCII byte length —
    # ceil(n/64) chunks, every 4th kept, frame_idx is the position in
    # the SAMPLED array and the last chunk is n - 64*orig clipped.
    oracle="""
    WITH d AS (SELECT doc_id,
                      CAST(octet_length(encode(text)) AS BIGINT) AS n
               FROM documents),
    fr AS (SELECT doc_id, n, g.i AS frame_idx
           FROM d, LATERAL (SELECT unnest(range(0,
                  CAST(CEIL(CAST(n AS DOUBLE) / 64 / 4) AS BIGINT)))
                  AS i) g
           WHERE 4 * g.i < CEIL(CAST(n AS DOUBLE) / 64))
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(LEAST(64, n - 64 * (4 * frame_idx)) AS INT) AS frame_bytes
    FROM fr
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Frame sampling' over binary payloads: split each blob into
    fixed-size chunks and keep every 4th (as a video pipeline samples
    frames). JVM-side: substring over binary inside a transform — no
    Python, no explode amplification beyond the kept frames."""
    docs = cat(spark, sf_dir)["documents"]
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    chunk = 64
    n_chunks = F.ceil(F.octet_length("payload") / chunk).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.substring(F.col("payload"), i * chunk + 1, chunk),
    )
    sampled = F.filter(frames, lambda fr, i: i % 4 == 0)
    return payloads.select(
        "doc_id",
        F.posexplode(sampled).alias("frame_idx", "frame"),
    ).select("doc_id", "frame_idx", F.octet_length("frame").alias("frame_bytes"))
