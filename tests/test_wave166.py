"""Wave 166 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_kneser_ney(spark):
    r = registry.QUERIES["tx_kneser_ney"](spark, SF).collect()[0]
    assert r["eval_pairs"] > 100
    assert r["kn_nll"] > 0 and r["addone_nll"] > 0
    # with a 31-word vocab add-one's smearing is mild, so the two
    # smoothers land close; the gate pins sane magnitudes, not a win
    assert r["kn_wins"] in (0, 1)
    assert abs(r["kn_nll"] - r["addone_nll"]) / r["addone_nll"] < 0.1


def test_next_word(spark):
    rows = registry.QUERIES["tx_next_word"](spark, SF).collect()
    assert len(rows) == 15  # 5 contexts x 3 suggestions
    by_ctx = {}
    for r in rows:
        by_ctx.setdefault(r["context"], []).append(r)
    assert len(by_ctx) == 5
    for ctx, rs in by_ctx.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3]
        ps = [r["prob"] for r in rs]
        assert ps == sorted(ps, reverse=True)
        assert sum(ps) <= 1.001
