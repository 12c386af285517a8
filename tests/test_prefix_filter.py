"""dd_ngram_jaccard prefix-filter boundary behavior.

The operator rounds jaccard to 1e-4 BEFORE the >= 0.5 filter, so a pair
with true jaccard exactly 0.49995 must SURVIVE (rounds to 0.5000) and
one at 0.49988 must not (rounds to 0.4999). The prefix filter prunes
candidates with the slackened threshold t' = 0.49995 (JACCARD_T_SLACK);
this test pins that the pruning cannot lose the boundary pair.

Construction: doc pairs share a contiguous token block X and diverge in
unique suffixes, so the shared trigram count is |X|-2 exactly (boundary
trigrams crossing into the suffix differ between the docs, and every
token is unique within a doc so array_distinct is a no-op):
  pair (1,2): x=10001, p=5001, q=5000 -> i=9999, na=15000, nb=14999,
              union=20000, j=9999/20000=0.49995  -> rounds IN
  pair (3,4): x=10000, p=5002, q=5001 -> i=9998, na=15000, nb=14999,
              union=20001, j=0.499875               -> rounds OUT
"""

from __future__ import annotations

import pytest


def _doc(prefix_words, suffix_tag, n_suffix):
    return " ".join(prefix_words + [f"{suffix_tag}{i}" for i in range(n_suffix)])


@pytest.fixture(scope="module")
def boundary_sf(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("jacc_boundary")
    x1 = [f"x{i}" for i in range(10001)]
    x2 = [f"y{i}" for i in range(10000)]
    rows = [
        (1, _doc(x1, "a", 5001), "s1"),
        (2, _doc(x1, "b", 5000), "s1"),
        (3, _doc(x2, "c", 5002), "s1"),
        (4, _doc(x2, "d", 5001), "s1"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_boundary_pair_survives_rounding(spark, boundary_sf):
    from mister_spark.operators.dedup import dd_ngram_jaccard

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd_ngram_jaccard(spark, boundary_sf).collect()
    }
    assert got == {(1, 2): 0.5}, got
