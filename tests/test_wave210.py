"""Wave 210 behavior gates beyond the registry oracle parity.

The watermark screen must flag constructively-watermarked documents
(every bigram chosen green) and pass natural hash-random text; Bowker
must read symmetric on balanced two-way flows and fire on a planted
one-way funnel, naming the worst pair.
"""

from __future__ import annotations

import datetime
import hashlib
import os

from pyspark.sql import functions as F


def _green(prev, cand):
    return hashlib.md5(f"{prev} {cand}".encode()).hexdigest()[0] < "8"


def _make_watermarked(n_tokens, seed):
    toks = [f"w{seed}s"]
    for i in range(n_tokens - 1):
        # pick the first candidate whose bigram hashes green
        for j in range(64):
            cand = f"t{seed}x{i}c{j}"
            if _green(toks[-1], cand):
                toks.append(cand)
                break
    return " ".join(toks)


def _make_natural(n_tokens, seed):
    return " ".join(f"n{seed}q{i}" for i in range(n_tokens))


def _write_documents(spark, tmp_path, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "documents.parquet"))


def test_watermark_screen_separates_green_biased_text(spark, tmp_path):
    from mister_spark.operators.extras210 import tx_watermark_detect

    texts = [_make_natural(60, s) for s in range(12)] + [
        _make_watermarked(60, s) for s in range(3)
    ]
    _write_documents(spark, tmp_path, texts)
    r = tx_watermark_detect(spark, str(tmp_path)).collect()[0]
    assert r["n_docs_scored"] == 15, r
    # the 3 watermarked docs run 100% green: z = sqrt(59) ~ 7.7
    assert r["flagged_docs"] == 3, r
    assert r["max_doc_z"] > 7, r

    # all natural: nothing flagged, corpus share near 1/2
    _write_documents(
        spark, tmp_path, [_make_natural(80, s) for s in range(20)]
    )
    r = tx_watermark_detect(spark, str(tmp_path)).collect()[0]
    assert r["flagged_docs"] == 0, r
    assert abs(r["corpus_green_share"] - 0.5) < 0.05, r


def _write_user_events(spark, tmp_path, transitions):
    """transitions: list of (user_id, [event_type sequence])."""
    rows, eid = [], 0
    d0 = datetime.datetime(2024, 1, 1, 8, 0, 0)
    for uid, seq in transitions:
        for k, etype in enumerate(seq):
            ts = (d0 + datetime.timedelta(minutes=k)).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            rows.append((eid, ts, uid, etype))
            eid += 1
    (
        spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long,"
            " event_type string"
        )
        .select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(str(tmp_path), "events.parquet"))
    )


def test_bowker_reads_symmetry_and_planted_funnel(spark, tmp_path):
    from mister_spark.operators.extras210 import stat_bowker_symmetry

    # balanced: equal a->b and b->a traffic -> chi2 = 0
    seqs = [(u, ["a", "b"]) for u in range(20)] + [
        (u, ["b", "a"]) for u in range(20, 40)
    ]
    _write_user_events(spark, tmp_path, seqs)
    r = stat_bowker_symmetry(spark, str(tmp_path)).collect()[0]
    assert r["bowker_chi2"] == 0.0 and r["p_value"] > 0.4, r

    # funnel: 30 users click->purchase, only 2 go back; plus a
    # balanced view<->error pair as background
    seqs = (
        [(u, ["click", "purchase"]) for u in range(30)]
        + [(u, ["purchase", "click"]) for u in range(30, 32)]
        + [(u, ["view", "error"]) for u in range(40, 50)]
        + [(u, ["error", "view"]) for u in range(50, 60)]
    )
    _write_user_events(spark, tmp_path, seqs)
    r = stat_bowker_symmetry(spark, str(tmp_path)).collect()[0]
    assert r["p_value"] < 0.01, r
    assert r["worst_from"] == "click" and r["worst_to"] == "purchase", r
