"""Special functions expressible identically in Spark and DuckDB.

Neither engine exposes lgamma/erf as portable SQL, so exact-test
operators (Fisher, BH-FDR) evaluate the SAME closed-form approximation
on both sides: any approximation error is shared, so the driver's
value-hash comparison still matches bit-for-bit after the house
4-decimal floor-rounding.

- ``ln_fact``: ln(n!) by Stirling's series on lgamma(n+9) minus the
  8-term shift product — |error| < 2e-10 for all n ≥ 0, far inside the
  rounding grid.
- ``normal_sf``: upper-tail P(Z > z) for z ≥ 0 via the
  Abramowitz–Stegun 7.1.26 erf polynomial (|error| ≤ 1.5e-7).

Each helper has a Column form (Spark) and a ``*_SQL`` string form
(DuckDB oracle) generated from one shared template, so the formulas
cannot drift apart.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

_HALF_LN_2PI = 0.5 * math.log(2.0 * math.pi)

# A&S 7.1.26 erf coefficients
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def ln_fact(n: Column) -> Column:
    """ln(n!) for an integer column n ≥ 0, exact to ~2e-10."""
    z = n.cast("double") + F.lit(9.0)  # lgamma argument n+9 ≥ 9
    stirling = (
        (z - 0.5) * F.log(z)
        - z
        + F.lit(_HALF_LN_2PI)
        + 1.0 / (12.0 * z)
        - 1.0 / (360.0 * z * z * z)
        + 1.0 / (1260.0 * z * z * z * z * z)
    )
    shift = sum(
        (F.log(n.cast("double") + F.lit(float(i))) for i in range(1, 9)),
        F.lit(0.0),
    )
    return stirling - shift


def ln_fact_sql(expr: str) -> str:
    """DuckDB mirror of ``ln_fact`` — same Stirling formula, same
    constants; pass a simple column/alias name as ``expr``."""
    z = f"(CAST({expr} AS DOUBLE) + 9.0)"
    stirling = (
        f"(({z} - 0.5) * LN({z}) - {z} + {_HALF_LN_2PI!r}"
        f" + 1.0/(12.0*{z}) - 1.0/(360.0*{z}*{z}*{z})"
        f" + 1.0/(1260.0*{z}*{z}*{z}*{z}*{z}))"
    )
    shift = " + ".join(
        f"LN(CAST({expr} AS DOUBLE) + {float(i)!r})" for i in range(1, 9)
    )
    return f"({stirling} - ({shift}))"


def normal_sf(z: Column) -> Column:
    """P(Z > z) for z ≥ 0 (pass |z| and double for two-sided)."""
    x = z * F.lit(_INV_SQRT2)  # erf argument
    t = 1.0 / (1.0 + F.lit(_AS_P) * x)
    a1, a2, a3, a4, a5 = _AS_A
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    erf = 1.0 - poly * F.exp(-x * x)
    return 0.5 * (1.0 - erf)


def normal_sf_sql(expr: str) -> str:
    """DuckDB mirror of ``normal_sf``; pass a simple expression ≥ 0."""
    x = f"(({expr}) * {_INV_SQRT2!r})"
    t = f"(1.0 / (1.0 + {_AS_P!r} * {x}))"
    a1, a2, a3, a4, a5 = _AS_A
    poly = (
        f"({t} * ({a1!r} + {t} * ({a2!r} + {t} * ({a3!r}"
        f" + {t} * ({a4!r} + {t} * {a5!r})))))"
    )
    return f"(0.5 * (1.0 - (1.0 - {poly} * EXP(-{x}*{x}))))"


# Acklam inverse-normal-CDF rational approximation (|err| < 1.15e-9):
# identical decimal literals on both engines so normal scores match
# bit-for-bit up to shared-libm exp/ln/sqrt
_ACK_A = (-3.969683028665376e+01, 2.209460984245205e+02,
          -2.759285104469687e+02, 1.383577518672690e+02,
          -3.066479806614716e+01, 2.506628277459239e+00)
_ACK_B = (-5.447609879822406e+01, 1.615858368580409e+02,
          -1.556989798598866e+02, 6.680131188771972e+01,
          -1.328068155288572e+01)
_ACK_C = (-7.784894002430293e-03, -3.223964580411365e-01,
          -2.400758277161838e+00, -2.549732539343734e+00,
          4.374664141464968e+00, 2.938163982698783e+00)
_ACK_D = (7.784695709041462e-03, 3.224671290700398e-01,
          2.445134137142996e+00, 3.754408661907416e+00)
_ACK_PLOW = 0.02425


def norm_ppf(p: Column) -> Column:
    """Inverse standard-normal CDF (Acklam); p must be in (0, 1)."""
    a1, a2, a3, a4, a5, a6 = _ACK_A
    b1, b2, b3, b4, b5 = _ACK_B
    c1, c2, c3, c4, c5, c6 = _ACK_C
    d1, d2, d3, d4 = _ACK_D
    ql = F.sqrt(-2.0 * F.log(p))
    low = (
        (((((c1 * ql + c2) * ql + c3) * ql + c4) * ql + c5) * ql + c6)
        / ((((d1 * ql + d2) * ql + d3) * ql + d4) * ql + 1.0)
    )
    qh = F.sqrt(-2.0 * F.log(1.0 - p))
    high = -(
        (((((c1 * qh + c2) * qh + c3) * qh + c4) * qh + c5) * qh + c6)
        / ((((d1 * qh + d2) * qh + d3) * qh + d4) * qh + 1.0)
    )
    qc = p - 0.5
    r = qc * qc
    cen = (
        (((((a1 * r + a2) * r + a3) * r + a4) * r + a5) * r + a6) * qc
        / (((((b1 * r + b2) * r + b3) * r + b4) * r + b5) * r + 1.0)
    )
    return (
        F.when(p < _ACK_PLOW, low)
        .when(p > 1.0 - _ACK_PLOW, high)
        .otherwise(cen)
    )


def norm_ppf_sql(expr: str) -> str:
    """DuckDB mirror of ``norm_ppf``; pass an expression in (0, 1)."""
    a1, a2, a3, a4, a5, a6 = _ACK_A
    b1, b2, b3, b4, b5 = _ACK_B
    c1, c2, c3, c4, c5, c6 = _ACK_C
    d1, d2, d3, d4 = _ACK_D
    p = f"({expr})"
    ql = f"SQRT(-2.0 * LN({p}))"
    low = (
        f"(((((({c1!r} * {ql} + {c2!r}) * {ql} + {c3!r}) * {ql}"
        f" + {c4!r}) * {ql} + {c5!r}) * {ql} + {c6!r})"
        f" / (((({d1!r} * {ql} + {d2!r}) * {ql} + {d3!r}) * {ql}"
        f" + {d4!r}) * {ql} + 1.0))"
    )
    qh = f"SQRT(-2.0 * LN(1.0 - {p}))"
    high = (
        f"(-(((((({c1!r} * {qh} + {c2!r}) * {qh} + {c3!r}) * {qh}"
        f" + {c4!r}) * {qh} + {c5!r}) * {qh} + {c6!r})"
        f" / (((({d1!r} * {qh} + {d2!r}) * {qh} + {d3!r}) * {qh}"
        f" + {d4!r}) * {qh} + 1.0)))"
    )
    qc = f"({p} - 0.5)"
    r = f"({qc} * {qc})"
    cen = (
        f"(((((({a1!r} * {r} + {a2!r}) * {r} + {a3!r}) * {r}"
        f" + {a4!r}) * {r} + {a5!r}) * {r} + {a6!r}) * {qc}"
        f" / ((((({b1!r} * {r} + {b2!r}) * {r} + {b3!r}) * {r}"
        f" + {b4!r}) * {r} + {b5!r}) * {r} + 1.0))"
    )
    return (
        f"(CASE WHEN {p} < {_ACK_PLOW!r} THEN {low}"
        f" WHEN {p} > 1.0 - {_ACK_PLOW!r} THEN {high}"
        f" ELSE {cen} END)"
    )
