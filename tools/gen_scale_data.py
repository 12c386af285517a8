"""Generate a larger scale factor from the driver's sf0.1 testdata.

The driver ships sf0.001/0.01/0.1 only, so the 0.1 -> 1 decade — the
one where data cost finally dominates Spark's fixed per-query overhead
— has no measurement point. This tool scales the sf0.1 tables K-fold
(default 10x -> "sf1") DETERMINISTICALLY with duckdb, preserving each
copy's internal join structure while keeping copies disjoint:

- fact/entity keys (custkey, orderkey, suppkey, partkey, doc_id,
  vec_id, event_id, user_id) shift by copy * (max_key + 1), so every
  foreign key still resolves within its copy and key spaces never
  collide across copies — join fan-outs are exactly the sf0.1 ones,
  10x over;
- dimension tables (region, nation) are shared, as TPC-H scales them;
- document TEXT tokens get a per-copy suffix (copy 0 = original), so
  the vocabulary grows ~linearly (Heaps-ish) and near-duplicate /
  shingle structure repeats per copy instead of exploding across
  copies (appending 9 near-identical copies of every doc would
  manufacture a quadratic duplicate blow-up the real corpus does not
  have);
- embeddings get a small per-copy deterministic offset so vectors are
  not byte-identical across copies.

Timings at the generated SF measure PLAN SCALING, not oracle
correctness — correctness is gated at the driver's sf0.01.

Usage:
  python tools/gen_scale_data.py [--factor 10] \
      [--src /root/testdata/sf0.1] [--dest .testdata/sf1]

Also links the driver's sf dirs into the dest's parent so
`SPARK_GRAFT_SF_ROOT=<parent> python bench.py --scaling` sees every
scale point.
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb


def _max_key(con, path: str, col: str) -> int:
    return con.sql(
        f"SELECT MAX({col}) FROM read_parquet('{path}')"
    ).fetchone()[0]


def generate(src: str, dest: str, factor: int) -> None:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    con.sql("SET threads TO 16")

    def p(name: str) -> str:
        return os.path.join(src, f"{name}.parquet")

    off = {
        "cust": _max_key(con, p("customer"), "c_custkey") + 1,
        "ord": _max_key(con, p("orders"), "o_orderkey") + 1,
        "supp": _max_key(con, p("supplier"), "s_suppkey") + 1,
        "part": _max_key(con, p("part"), "p_partkey") + 1,
        "doc": _max_key(con, p("documents"), "doc_id") + 1,
        "vec": _max_key(con, p("embeddings"), "vec_id") + 1,
        "ev": _max_key(con, p("events"), "event_id") + 1,
        "user": _max_key(con, p("events"), "user_id") + 1,
    }
    copies = f"(SELECT UNNEST(RANGE({factor})) AS k)"

    def emit(name: str, select_sql: str) -> None:
        out = os.path.join(dest, f"{name}.parquet")
        con.sql(
            f"COPY ({select_sql}) TO '{out}' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"  {name}: {n} rows", file=sys.stderr)

    # shared dimensions: copy through unchanged
    for dim in ("region", "nation"):
        emit(dim, f"SELECT * FROM read_parquet('{p(dim)}')")

    emit(
        "customer",
        f"""SELECT c_custkey + k * {off['cust']} AS c_custkey,
                   CASE WHEN k = 0 THEN c_name ELSE c_name || '-' || k END AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM read_parquet('{p('customer')}'), {copies}""",
    )
    emit(
        "supplier",
        f"""SELECT s_suppkey + k * {off['supp']} AS s_suppkey,
                   CASE WHEN k = 0 THEN s_name ELSE s_name || '-' || k END AS s_name,
                   s_nationkey, s_acctbal
            FROM read_parquet('{p('supplier')}'), {copies}""",
    )
    emit(
        "part",
        f"""SELECT p_partkey + k * {off['part']} AS p_partkey,
                   CASE WHEN k = 0 THEN p_name ELSE p_name || ' c' || k END AS p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM read_parquet('{p('part')}'), {copies}""",
    )
    emit(
        "orders",
        f"""SELECT o_orderkey + k * {off['ord']} AS o_orderkey,
                   o_custkey + k * {off['cust']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{p('orders')}'), {copies}""",
    )
    emit(
        "lineitem",
        f"""SELECT l_orderkey + k * {off['ord']} AS l_orderkey,
                   l_partkey + k * {off['part']} AS l_partkey,
                   l_suppkey + k * {off['supp']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{p('lineitem')}'), {copies}""",
    )
    emit(
        "events",
        f"""SELECT event_id + k * {off['ev']} AS event_id, ts,
                   user_id + k * {off['user']} AS user_id,
                   event_type, value, props
            FROM read_parquet('{p('events')}'), {copies}""",
    )
    emit(
        "documents",
        f"""SELECT doc_id + k * {off['doc']} AS doc_id,
                   CASE WHEN k = 0 THEN text
                        ELSE regexp_replace(text, '([A-Za-z0-9]+)',
                                            '\\1' || k, 'g')
                   END AS text,
                   lang, source,
                   CAST(LENGTH(CASE WHEN k = 0 THEN text
                        ELSE regexp_replace(text, '([A-Za-z0-9]+)',
                                            '\\1' || k, 'g') END) AS BIGINT)
                     AS n_chars
            FROM read_parquet('{p('documents')}'), {copies}""",
    )
    emit(
        "embeddings",
        f"""SELECT vec_id + k * {off['vec']} AS vec_id,
                   list_transform(embedding,
                                  x -> CAST(x + 0.001 * k AS FLOAT))
                     AS embedding,
                   label
            FROM read_parquet('{p('embeddings')}'), {copies}""",
    )


def link_driver_sfs(dest_parent: str, driver_root: str = "/root/testdata") -> None:
    """Symlink the driver's sf dirs next to the generated one so one
    SPARK_GRAFT_SF_ROOT covers every scale point."""
    for d in sorted(os.listdir(driver_root)):
        if not d.startswith("sf"):
            continue
        link = os.path.join(dest_parent, d)
        target = os.path.join(driver_root, d)
        if not os.path.exists(link):
            os.symlink(target, link)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap.add_argument("--dest", default=os.path.join(repo, ".testdata", "sf1"))
    args = ap.parse_args()
    generate(args.src, args.dest, args.factor)
    link_driver_sfs(os.path.dirname(args.dest))
    print(f"wrote {args.dest}", file=sys.stderr)


if __name__ == "__main__":
    main()
