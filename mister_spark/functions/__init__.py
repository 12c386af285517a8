"""Reusable column-function library (all JVM-side expressions).

The building blocks the operator suites compose: text tokenization and
shingling, vector math over array columns, and hash-sketch primitives.
Import as `from mister_spark.functions import text, vectors, hashing`.
"""

from mister_spark.functions import hashing, text, vectors  # noqa: F401

__all__ = ["hashing", "text", "vectors"]
