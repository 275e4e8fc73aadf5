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
- documents PREFIX EVERY TOKEN with a per-copy marker: real 10x data
  brings new content, so per-shingle document frequency must stay
  ~constant while the corpus grows 10x (a suffix-only copy would
  multiply every df by 10 and make candidate joins artificially
  quadratic — a data artifact, not a plan property); within-copy
  duplicate structure is preserved, so dedup rates keep their shape
- embeddings circular-shift by the copy index (distinct directions,
  norm preserved) for the same reason: copies must not be near-dups
  of each other
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
        WITH t AS (
            SELECT doc_id, i,
                   CASE WHEN i = 0 THEN text
                        ELSE 'z' || CAST(i AS VARCHAR) ||
                            replace(text, ' ', ' z' || CAST(i AS VARCHAR))
                   END AS text,
                   lang, source
            FROM {src('documents')}, c
        )
        SELECT doc_id + i * 10000 AS doc_id, text, lang, source,
               CAST(len(text) AS BIGINT) AS n_chars
        FROM t""")
    write("embeddings", f"""
        SELECT vec_id + i * 10000 AS vec_id,
               CASE WHEN i = 0 THEN embedding
                    ELSE list_concat(embedding[i + 1:64],
                                     embedding[1:i])
               END AS embedding,
               label
        FROM {src('embeddings')}, c""")


if __name__ == "__main__":
    main()
