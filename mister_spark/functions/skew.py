"""Skew-aware join: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles sort-merge
skew at runtime; explicit salting is the planner-independent fallback —
replicate the small side SALT times and scatter the big side's hot keys
across salt buckets, so one hot key fans out to SALT tasks instead of
one straggler."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `key` with the big side salted.

    Correctness-equivalent to a plain join (tests assert equality); the
    physical difference is the shuffle key (key, salt_bucket), which
    splits each hot key's rows across `salt` reducers. The small side is
    replicated `salt` times — keep it the dimension side."""
    salted_big = big.withColumn("_salt", (F.xxhash64(F.monotonically_increasing_id()) % salt + salt) % salt)
    exploded_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(salt)]))
    )
    joined = salted_big.join(exploded_small, [key, "_salt"], how)
    return joined.drop("_salt")
