"""Text expressions: tokenization, n-grams, shingles.

All built with slice + zip_with rather than element_at-in-lambda — a
higher-order lambda re-evaluates its array argument per element (no CSE
across lambda boundaries in Catalyst), which turns n-gram construction
O(n²) per row. See PERF.md.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# DuckDB fragment mirroring tokens() — substitute into oracle SQL.
DUCK_TOKENS = "list_filter(string_split(text, ' '), t -> t <> '')"


def tokens(col: str = "text") -> Column:
    """Whitespace tokens, empties dropped — mirrors DUCK_TOKENS exactly."""
    return F.filter(F.split(F.col(col), " "), lambda t: t != F.lit(""))


def bigrams(toks: Column) -> Column:
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
    ).otherwise(F.array().cast("array<string>"))


def trigrams(toks: Column) -> Column:
    n = F.size(toks)
    tri = F.zip_with(
        F.zip_with(
            F.slice(toks, 1, n - 2),
            F.slice(toks, 2, n - 2),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
        F.slice(toks, 3, n - 2),
        lambda xy, z: F.concat_ws(" ", xy, z),
    )
    return F.when(n >= 3, tri).otherwise(F.array().cast("array<string>"))


def shingles(toks: Column) -> Column:
    """Distinct token 3-grams — the dedup unit."""
    return F.array_distinct(trigrams(toks))
