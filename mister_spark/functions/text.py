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


def let1(arr: Column, f) -> Column:
    """Let-bind an expression through a 1-element ``transform`` so the
    lambda body references it as an O(1) lambda variable instead of
    re-evaluating the full subtree per use (Catalyst has no CSE across
    higher-order-function boundaries, and interpreted HOF evaluation
    has none at all — see PERF.md)."""
    return F.transform(F.array(arr), f)[0]


def _trigram_ids(ha: Column) -> Column:
    """Distinct 3-gram ids over an already-hashed token array: id =
    xxhash64 chained over the three 8-byte token hashes. ``ha`` must be
    a bound lambda variable (see ``sized_hashed_shingles``) or the
    slices re-evaluate it per call."""
    n = F.size(ha)
    tri = F.zip_with(
        F.zip_with(
            F.slice(ha, 1, n - 2),
            F.slice(ha, 2, n - 2),
            lambda x, y: F.xxhash64(x, y),
        ),
        F.slice(ha, 3, n - 2),
        lambda xy, z: F.xxhash64(xy, z),
    )
    return F.array_distinct(
        F.when(n >= 3, tri).otherwise(F.array().cast("array<bigint>"))
    )


def hashed_shingles(toks: Column) -> Column:
    """Distinct 3-gram ids (array<bigint>) built from hashed tokens —
    the array-only sibling of ``sized_hashed_shingles`` for consumers
    that explode without needing the per-doc count. Same equivalence
    argument (ids match xxhash64-of-string grouping modulo 2^-64
    collision odds); same single-evaluation let-binding."""
    ha = F.transform(toks, lambda x: F.xxhash64(x))
    return let1(ha, lambda a: _trigram_ids(a))


def sized_hashed_shingles(toks: Column) -> Column:
    """``struct<n int, sh array<bigint>>``: per-doc distinct 3-gram
    count and the 64-bit shingle ids, each subexpression evaluated
    exactly ONCE per row.

    Two deliberate equivalences (both the dd_exact argument —
    identical modulo 2^-64 hash collision odds, and collisions only
    merge ids, which the oracle comparison at every SF arbitrates):

    - ids are xxhash64 chained over HASHED tokens instead of xxhash64
      of the ``"t1 t2 t3"`` string — tokens are hashed once each,
      and the per-trigram work is two 8-byte hashes instead of a
      ~40-char string allocation + concat + string hash;
    - ``n`` rides INSIDE the struct (a let-bound ``size``), because the
      former ``select(size(sh), explode(sh))`` split the array between
      a Project and a Generate node, and Catalyst re-evaluated the
      entire tokenize+trigram subtree once per node (no CSE across
      that boundary): the exploded-postings stage of dd_ngram_jaccard
      measured 12.9 s at sf1 against 1.4 s for this shape (identical
      2,603,880 output rows).

    Prefix-filter safety: downstream (df, sid) orderings change with
    the id values, but the pigeonhole completeness proof holds under
    ANY shared total order, so the surviving pairs are identical."""
    ha = F.transform(toks, lambda x: F.xxhash64(x))
    return let1(
        ha,
        lambda a: let1(
            _trigram_ids(a),
            lambda sh: F.struct(F.size(sh).alias("n"), sh.alias("sh")),
        ),
    )
