"""Wave 68 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from difflib import SequenceMatcher

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_rouge_l_matches_difflib(spark):
    rows = registry.QUERIES["tx_rouge_l"](spark, SF).collect()
    assert rows
    docs = {
        d["doc_id"]: [t for t in d["text"].split(" ") if t]
        for d in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    for r in rows[:5]:
        a, b = docs[r["d1"]], docs[r["d2"]]
        want = sum(
            m.size for m in SequenceMatcher(None, a, b, autojunk=False)
            .get_matching_blocks()
        )
        # difflib's matching blocks give a common subsequence ≤ LCS
        assert r["lcs"] >= want - 2
        assert r["lcs"] <= min(len(a), len(b))
        assert 0.0 <= r["rouge_f1"] <= 1.0


def test_bandit_replay_outputs(spark):
    r = registry.QUERIES["ml_bandit_replay"](spark, SF).collect()[0]
    assert r["n_days"] > 10
    assert r["policy_reward"] > 0 and r["uniform_reward"] > 0
    assert abs(r["lift"] - (r["policy_reward"] - r["uniform_reward"])) < 1e-3


def test_segment_migration_conserves_users(spark):
    rows = registry.QUERIES["ev_segment_migration"](spark, SF).collect()
    assert rows
    total = sum(r["n_users"] for r in rows)
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    # every user appears in both periods here (always-active synth users)
    assert total == n_users
    for r in rows:
        assert 1 <= r["tier_from"] <= 3
        assert 1 <= r["tier_to"] <= 3


def test_schema_drift_classification(spark):
    rows = {
        r["column"]: r["verdict"]
        for r in registry.QUERIES["io_schema_drift"](spark, SF).collect()
    }
    assert rows["o_channel"] == "added_safe"
    assert rows["o_orderstatus"] == "dropped_breaking"
    assert rows["o_custkey"] == "narrowed"
    assert rows["o_orderkey"] == "unchanged"
