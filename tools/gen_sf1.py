"""Generate an sf1 slice (10x sf0.1) for the scale smoke — round-4
verdict item #7: push the execution smoke one decade past the bench
scale for the scale-shaped operators.

The driver's testdata is read-only and tops out at sf0.1, so sf1 is
synthesized HERE by replicating sf0.1 ten times with key shifting —
the point of the smoke is plan execution and growth shape, not value
parity, so fidelity to the driver's generator is not required, only
schema identity and realistic key relationships:

- fact/dim keys shift by copy * (max_key + 1), so FK joins keep exactly
  the same fan-out per key as sf0.1 (selectivities preserved, data 10x)
- dates/timestamps keep their range (copies overlay in time — the
  temporal windows see 10x density, which is the stressful direction)
- documents get a per-copy suffix token so exact-dedup families keep
  the same duplicate-rate SHAPE within a copy but don't collapse the
  10 copies into one giant duplicate class; embeddings perturb one
  coordinate per copy (deterministic arithmetic) for the same reason
- region/nation stay fixed (dimension tables of fixed cardinality)

Output: .scaledata/sf1/*.parquet under the repo root (gitignored).
Run: python tools/gen_sf1.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scaledata", "sf1",
)
COPIES = 10


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW c AS SELECT unnest(range({COPIES})) AS i")

    def src(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t, sql):
        con.execute(
            f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t:<10} {n}")

    # fixed-cardinality dims: copy through
    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {src(t)}")

    write("customer", f"""
        SELECT c_custkey + i * 20000 AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {src('customer')}, c""")
    write("supplier", f"""
        SELECT s_suppkey + i * 2000 AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM {src('supplier')}, c""")
    write("part", f"""
        SELECT p_partkey + i * 30000 AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM {src('part')}, c""")
    write("orders", f"""
        SELECT o_orderkey + i * 200000 AS o_orderkey,
               o_custkey + i * 20000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, c""")
    write("lineitem", f"""
        SELECT l_orderkey + i * 200000 AS l_orderkey,
               l_partkey + i * 30000 AS l_partkey,
               l_suppkey + i * 2000 AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, c""")
    write("events", f"""
        SELECT event_id + i * 200000 AS event_id, ts,
               user_id + i * 10000 AS user_id,
               event_type, value, props
        FROM {src('events')}, c""")
    write("documents", f"""
        SELECT doc_id + i * 10000 AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE text || ' copyt' || CAST(i AS VARCHAR) END AS text,
               lang, source,
               n_chars + CASE WHEN i = 0 THEN 0
                              ELSE 7 + len(CAST(i AS VARCHAR)) END AS n_chars
        FROM {src('documents')}, c""")
    write("embeddings", f"""
        SELECT vec_id + i * 10000 AS vec_id,
               CASE WHEN i = 0 THEN embedding
                    ELSE list_transform(
                        embedding,
                        x -> CAST(x + 0.001 * i AS FLOAT))
               END AS embedding,
               label
        FROM {src('embeddings')}, c""")


if __name__ == "__main__":
    main()
