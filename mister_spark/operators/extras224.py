"""Wave 224: time-respecting reachability and tamper-evident manifests.

graph_temporal_reachability distinguishes "connected on the static
map" from "connected in time": trade edges carry their order month,
and u reaches v TEMPORALLY only along paths whose months never
decrease (influence, contagion and supply propagation all obey this
arrow). The op computes the earliest-arrival closure by iterated
min-relaxation and reports how many statically-reachable pairs are
time-BLOCKED — the gap between the picture graph_components paints
and what could actually have propagated. io_merkle_manifest builds
the Merkle root over per-nation content digests (row-level md5s
folded in sorted order, leaves paired level by level): one 32-char
root certifies the whole dataset, any single-row tamper flips it,
and an inclusion proof is log2(leaves) hashes — the integrity
receipt a lakehouse manifest should carry
(io_file_checksums lists digests; the tree makes them CHECKABLE
without re-reading everything).

Exactness: months, pair counts and arrival minima are integers; the
Merkle construction is pure md5 string arithmetic with sorted,
deterministic fold orders in both engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

TR_ROUNDS = 6  # earliest-arrival relaxation rounds (diameter cover)


@query(
    "graph_temporal_reachability",
    # Real oracle: monthly edges, the earliest-arrival relaxation
    # (self-edge trick keeps the recursive reference single-use) and
    # the static closure are all integer recursions; every output is
    # a count or one rounded ratio.
    oracle=f"""
    WITH RECURSIVE e AS (
      SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst,
             CAST(date_part('year', CAST(o.o_orderdate AS DATE)) * 12
                  + date_part('month', CAST(o.o_orderdate AS DATE))
                  AS BIGINT) AS m
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey),
    nodes AS (SELECT DISTINCT node FROM (
                SELECT src AS node FROM e
                UNION ALL SELECT dst FROM e)),
    ea AS (
      SELECT 0 AS it, node AS u, node AS v, CAST(0 AS BIGINT) AS t
      FROM nodes
      UNION ALL
      SELECT it, u, v, MIN(t) FROM (
        SELECT p.it + 1 AS it, p.u,
               CASE WHEN x.is_self THEN p.v ELSE x.dst END AS v,
               CASE WHEN x.is_self THEN p.t ELSE x.m END AS t
        FROM ea p JOIN (
          SELECT src, dst, m, FALSE AS is_self FROM e
          UNION ALL
          SELECT node, node, CAST(0 AS BIGINT), TRUE FROM nodes) x
          ON (x.is_self AND x.src = p.v)
             OR ((NOT x.is_self) AND x.src = p.v AND x.m >= p.t)
        WHERE p.it < {TR_ROUNDS}) q
      GROUP BY it, u, v),
    tempo AS (SELECT u, v FROM ea
              WHERE it = {TR_ROUNDS} AND u <> v GROUP BY u, v),
    st AS (
      SELECT src AS u, dst AS v FROM e
      UNION
      SELECT s.u, e.dst FROM st s JOIN e ON e.src = s.v),
    stp AS (SELECT u, v FROM st WHERE u <> v GROUP BY u, v)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM stp) AS static_pairs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tempo)
             AS temporal_pairs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM stp)
             - (SELECT CAST(COUNT(*) AS BIGINT) FROM tempo)
             AS blocked_pairs,
           FLOOR((SELECT CAST(COUNT(*) AS DOUBLE) FROM tempo)
                 / GREATEST((SELECT COUNT(*) FROM stp), 1)
                 * 1e4 + 0.5) / 1e4 AS temporal_ratio
    """,
)
def graph_temporal_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest-arrival closure of the monthly trade graph: u reaches
    v temporally iff some path's edge months never decrease;
    relaxation EA(u,v) = min over (w -> v at month m >= EA(u,w)) of
    m, iterated {r} rounds from EA(u,u) = 0. temporal_pairs vs the
    static closure counts the pairs the ARROW OF TIME disconnects —
    the honest propagation map for anything (influence, contamination,
    recalls) that can only flow forward. blocked_pairs is the gap a
    static analysis silently overstates.

    Scale: the one fact-scan shuffle builds the (nation, nation,
    month) edge list; the relaxation is dimension-bounded (~25 nodes
    x months) per round, checkpointed. On a big graph the identical
    relaxation runs as an edge-join + min-agg per round
    (graph_sssp_weighted's loop with month as the cost carrier)."""
    c = cat(spark, sf_dir)
    sup = c["supplier"].select("s_suppkey", F.col("s_nationkey").alias("src"))
    cus = c["customer"].select("c_custkey", F.col("c_nationkey").alias("dst"))
    e = (
        c["lineitem"]
        .select("l_suppkey", "l_orderkey")
        .join(
            c["orders"].select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cus), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src", "dst",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("m"),
        )
        .distinct()
        .localCheckpoint()  # (nation, nation, month) — bounded
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    ea = nodes.select(
        F.col("node").alias("u"), F.col("node").alias("v"),
        F.lit(0).cast("bigint").alias("t"),
    ).localCheckpoint()
    for _ in range(TR_ROUNDS):
        ext = (
            ea.join(e, ea.v == e.src)
            .filter(F.col("m") >= F.col("t"))
            .select("u", F.col("dst").alias("v"), F.col("m").alias("t"))
        )
        ea = (
            ea.unionByName(ext)
            .groupBy("u", "v")
            .agg(F.min("t").alias("t"))
            .localCheckpoint()
        )
    tempo = ea.filter(F.col("u") != F.col("v")).select("u", "v")
    # static closure by DOUBLING composition (r ∘ r per round, the
    # graph_scc_bowtie pattern): TR_ROUNDS rounds cover paths of up to
    # 2^TR_ROUNDS = 64 edges — a guaranteed fixpoint on the ≤25-node
    # nation graph, matching the oracle's recurse-to-fixpoint st CTE.
    # (Single-edge extension covered only TR_ROUNDS+1 = 7 hops and
    # would diverge from the oracle on a graph with diameter > 7.)
    r = e.select(F.col("src").alias("u"), F.col("dst").alias("v")).distinct()
    for _ in range(TR_ROUNDS):
        ext = (
            r.alias("a")
            .join(
                r.select(F.col("u").alias("v2"), F.col("v").alias("w")),
                F.col("a.v") == F.col("v2"),
            )
            .select(F.col("a.u").alias("u"), F.col("w").alias("v"))
        )
        r = r.unionByName(ext).distinct().localCheckpoint()
    stp = r.filter(F.col("u") != F.col("v"))
    n = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    sp = stp.agg(F.count(F.lit(1)).alias("static_pairs"))
    tp = tempo.agg(F.count(F.lit(1)).alias("temporal_pairs"))
    return (
        n.crossJoin(F.broadcast(sp))
        .crossJoin(F.broadcast(tp))
        .select(
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("static_pairs").cast("bigint").alias("static_pairs"),
            F.col("temporal_pairs").cast("bigint").alias("temporal_pairs"),
            (F.col("static_pairs") - F.col("temporal_pairs"))
            .cast("bigint")
            .alias("blocked_pairs"),
            rnd(
                F.col("temporal_pairs").cast("double")
                / F.greatest(F.col("static_pairs"), F.lit(1)),
                4,
            ).alias("temporal_ratio"),
        )
    )


graph_temporal_reachability.__doc__ = (
    graph_temporal_reachability.__doc__.format(r=TR_ROUNDS)
)


@query(
    "io_merkle_manifest",
    # Real oracle: row digests are md5 of identical strings, leaves
    # fold row digests in sorted order (string_agg ORDER BY), and the
    # tree recursion pairs sorted leaves level by level with the
    # identical odd-promotion rule — pure string arithmetic.
    oracle="""
    WITH RECURSIVE rowd AS (
      SELECT c_nationkey AS z,
             md5(CAST(c_custkey AS VARCHAR) || ':' ||
                 CAST(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
                      AS VARCHAR)) AS h
      FROM customer),
    leaves AS (SELECT z, md5(string_agg(h, '' ORDER BY h)) AS h
               FROM rowd GROUP BY z),
    lv AS (
      SELECT 0 AS depth, ROW_NUMBER() OVER (ORDER BY z) - 1 AS pos,
             h
      FROM leaves
      UNION ALL
      SELECT q.depth + 1, q.pos2,
             CASE WHEN COUNT(*) = 2
                  THEN md5(string_agg(q.h, '' ORDER BY q.pos))
                  ELSE MAX(q.h) END
      FROM (SELECT l.depth, l.pos, l.h, l.pos // 2 AS pos2,
                   COUNT(*) OVER () AS cl
            FROM lv l) q
      WHERE q.cl > 1
      GROUP BY q.depth + 1, q.pos2),
    root AS (SELECT h FROM lv ORDER BY depth DESC, pos LIMIT 1),
    d AS (SELECT MAX(depth) AS tree_depth FROM lv)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM leaves) AS n_leaves,
           CAST(d.tree_depth AS BIGINT) AS tree_depth,
           root.h AS root_hash,
           CAST(d.tree_depth AS BIGINT) AS proof_hashes
    FROM d, root
    """,
)
def io_merkle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle manifest over the customer table partitioned by nation:
    row digest = md5(custkey:balance-cents), leaf = md5 of the
    nation's row digests folded in sorted order, tree = sorted leaves
    paired level by level (odd node promotes). The 32-char root
    certifies every row; flipping one cent anywhere flips it, and
    membership of any nation's data is provable with tree_depth
    hashes instead of a full re-read — the integrity layer a
    snapshot manifest (io_file_checksums' digests) needs to be
    CHECKABLE at audit time.

    Scale: row digests and leaf folds are one grouped pass
    (string_agg per nation); the tree lives on the nation-bounded
    leaf list. On a million-file lakehouse the identical pairing
    loop runs over the file-manifest frame — log2(files) rounds of
    tiny aggregations."""
    rowd = cat(spark, sf_dir)["customer"].select(
        F.col("c_nationkey").alias("z"),
        F.md5(
            F.concat_ws(
                ":",
                F.col("c_custkey").cast("string"),
                F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
                .cast("bigint")
                .cast("string"),
            )
        ).alias("h"),
    )
    leaves = (
        rowd.groupBy("z")
        .agg(F.md5(F.concat_ws("", F.sort_array(F.collect_list("h")))).alias("h"))
        .orderBy("z")
        .collect()  # nation-bounded leaf list (documented)
    )
    hs = [r["h"] for r in leaves]
    depth = 0
    level = hs[:]
    while len(level) > 1:
        nxt = []
        for i in range(0, len(level), 2):
            if i + 1 < len(level):
                nxt.append(hashlib.md5((level[i] + level[i + 1]).encode()).hexdigest())
            else:
                nxt.append(level[i])
        level = nxt
        depth += 1
    return spark.createDataFrame(
        [(len(hs), depth, level[0], depth)],
        "n_leaves long, tree_depth long, root_hash string, "
        "proof_hashes long",
    )
