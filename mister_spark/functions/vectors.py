"""Vector math over array<double> columns — codegen-friendly
aggregate/zip_with expressions, no UDFs."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def unit(a, eps: float = 1e-12) -> Column:
    """Unit-normalized copy of array column `a` with the clamped norm
    LET-BOUND through a 1-element transform (same re-evaluation trap
    as unit_cos below: norm(a) spelled inside the division lambda is
    O(d) per element). Per-element arithmetic is unchanged."""
    na = F.greatest(norm(a), F.lit(eps))
    return F.element_at(
        F.transform(
            F.array(na), lambda n: F.transform(a, lambda x: x / n)
        ),
        1,
    )


def unit_cos(a, b, eps: float = 1e-12) -> Column:
    """dot(unit(a), unit(b)) with each clamped norm LET-BOUND as a
    zip_with lambda variable: a scalar expression referenced inside a
    transform lambda re-evaluates per element (no CSE across lambda
    boundaries — PERF.md), so the naive transform(a, x -> x / norm(a))
    is O(d^2) per row. Binding the norms through a 1-element zip_with
    keeps each evaluated once while the per-element arithmetic (divide
    by clamped norm, multiply, left-fold sum) stays bit-identical to
    the unit-then-dot form the DuckDB oracles spell out."""
    na = F.greatest(norm(a), F.lit(eps))
    nb = F.greatest(norm(b), F.lit(eps))
    return F.element_at(
        F.zip_with(
            F.array(na),
            F.array(nb),
            lambda x, y: dot(
                F.transform(a, lambda v: v / x),
                F.transform(b, lambda w: w / y),
            ),
        ),
        1,
    )
