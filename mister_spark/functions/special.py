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
