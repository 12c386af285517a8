"""Wave 185 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_zip_fit_moments(spark):
    r = registry.QUERIES["stat_zip_fit"](spark, SF).collect()[0]
    # MoM identities: lambda = (v + m^2 - m)/m, pi = 1 - m/lambda
    lam = (r["variance"] + r["mean"] ** 2 - r["mean"]) / r["mean"]
    assert abs(r["lambda_hat"] - lam) < 0.001
    assert abs(r["pi_hat"] - (1 - r["mean"] / lam)) < 0.001
    # fitted zero share reproduces the observed one closely on
    # near-Poisson data (pi ~ 0 here — the fit honestly reports it)
    assert abs(r["zero_share_fitted"] - r["zero_share"]) < 0.02
    assert -0.1 <= r["pi_hat"] <= 1.0
    assert r["cells"] > 0 and 0 < r["zero_share"] < 1


def test_capture_recapture_identities(spark):
    r = registry.QUERIES["stat_capture_recapture"](spark, SF).collect()[0]
    n1, n2, m = r["first_capture"], r["second_capture"], r["recaptured"]
    want = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert abs(r["chapman_estimate"] - want) < 0.01
    # the estimate can never fall below what both captures jointly saw
    assert r["chapman_estimate"] >= max(n1, n2) - 0.01
    assert m <= min(n1, n2)
    assert r["distinct_seen"] >= max(n1, n2)
