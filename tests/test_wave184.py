"""Wave 184 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import numpy as np

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_pipe_syntax_equals_classic_sql(spark):
    from mister_spark.catalog import Catalog

    got = registry.QUERIES["sql_pipe_syntax"](spark, SF).collect()
    Catalog(spark, SF)["lineitem"].createOrReplaceTempView("pl_classic")
    want = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
               FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5)
                 / 100 AS disc_revenue,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM pl_classic
        WHERE l_shipdate <= DATE '1998-09-01'
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_hbos_matches_numpy(spark):
    from mister_spark.catalog import Catalog
    from mister_spark.operators.extras184 import (
        HBOS_BINS,
        HBOS_DIMS,
        HBOS_TOP,
    )

    emb = Catalog(spark, SF)["embeddings"].select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in emb])
    X = np.array([[float(x) for x in r["embedding"][:HBOS_DIMS]] for r in emb])
    n = len(X)
    score = np.zeros(n)
    for d in range(HBOS_DIMS):
        mn, mx = X[:, d].min(), X[:, d].max()
        b = np.minimum(
            np.floor((X[:, d] - mn) / ((mx - mn) / HBOS_BINS)).astype(int),
            HBOS_BINS - 1,
        )
        counts = np.bincount(b, minlength=HBOS_BINS).astype(float)
        score += -np.log(counts[b] / n)
    order = sorted(range(n), key=lambda i: (-score[i], ids[i]))[:HBOS_TOP]
    want = [(int(ids[i]), round(float(score[i]), 3)) for i in order]
    got = [
        (r["vec_id"], round(r["hbos"], 3))
        for r in registry.QUERIES["ml_hbos_outliers"](spark, SF).collect()
    ]
    assert got == want
