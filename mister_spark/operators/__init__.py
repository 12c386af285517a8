"""Operator families (SURVEY.md §2). Importing registers queries."""

from __future__ import annotations

_LOADED = False


def load() -> None:
    global _LOADED
    if _LOADED:
        return
    from mister_spark.operators import (  # noqa: F401
        mapreduce,
        tpch,
        tpch2,
        tpch3,
        extras,
        extras2,
        extras3,
        extras4,
        extras5,
        extras6,
        extras7,
        extras8,
        extras9,
        extras10,
        extras11,
        extras12,
        extras13,
        extras14,
        extras15,
        extras16,
        extras17,
        extras18,
        extras19,
        extras20,
        extras21,
        extras22,
        extras23,
        extras24,
        extras25,
        extras26,
        extras27,
        extras28,
        extras29,
        extras30,
        extras31,
        extras32,
        extras33,
        extras34,
        extras35,
        extras36,
        extras37,
        extras38,
        extras39,
        extras40,
        extras41,
        extras42,
        extras43,
        extras44,
        extras45,
        extras46,
        pipeline,
        pipeline2,
        windows,
        joins_sets,
        stats,
        events,
        textstats,
        dedup,
        similarity,
        multimodal,
        streaming_queries,
        ml,
        sql_api,
        bpe,
    )

    _LOADED = True
