"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed twice: a cold run that includes plan+IO, then a
timed run; the reported per-query time is the timed run (steady-state,
what a resident cluster would see), and "value" is the total timed
seconds across all headline queries.
"""

from __future__ import annotations

import json
import os
import time

from mister_spark import get_session, registry

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q13_order_distribution",
    "q18_large_orders",
    "w_topn_per_group",
    "ev_sessionize",
    "ev_asof_join",
    "ev_range_join",
    "dd_exact",
    "dd_minhash_lsh",
    "dd_embedding_cosine",
    "sim_topk_join",
    "sim_rp_lsh",
    "tx_quality",
    "tx_repetition",
    "tx_gopher_quality",
    "mr_wordcount",
    "mr_pagerank",
    "q9_profit_proxy",
    "q21_blocking_supplier",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_session("mister_spark_bench")
    names = [n for n in HEADLINE if n in registry.QUERIES]
    times: dict[str, float] = {}
    for name in names:
        fn = registry.QUERIES[name]
        fn(spark, sf_dir).count()  # warm: plan + file listing + page cache
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
