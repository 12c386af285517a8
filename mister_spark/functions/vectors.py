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
