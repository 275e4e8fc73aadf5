"""Full driver-contract replay with per-query wall timing.

Mirrors the external harness: loads __spark_entry__.py by path, runs
entry(), then every queries()[name] at sf0.01 compared against
oracle_sql()[name] via DuckDB (column-sorted, string-canonicalized rows).
Prints one line per query with elapsed seconds so slow queries (driver
wall-cap hazard) are visible.
"""
import importlib.util
import os
import sys
import time
import datetime as dt

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master(os.environ.get("REPLAY_MASTER", "local[8]"))
    .config("spark.sql.shuffle.partitions", os.environ.get("REPLAY_SHUFFLE", "16"))
    .config(
        "spark.sql.adaptive.enabled", os.environ.get("REPLAY_AQE", "true")
    )
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

t0 = time.time()
df = mod.entry(spark)
print(f"entry rows: {len(df.collect())}  ({time.time()-t0:.2f}s)")

con = duckdb.connect()
# Keep DuckDB spill OUT of the repo tree (r8 committed 14 GB of
# duckdb_temp_storage-*.tmp by accident; never again).
_spill = os.environ.get("DUCKDB_SPILL_DIR", "/tmp/duckdb_spill")
os.makedirs(_spill, exist_ok=True)
con.execute(f"SET temp_directory='{_spill}'")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def c(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            return f"{v+0.0:.6f}"
        if isinstance(v, (dt.datetime, dt.date)):
            return v.isoformat()
        return str(v)

    return [cols[i] for i in order], sorted(
        tuple(c(r[i]) for i in order) for r in rows
    )


qs, osql = mod.queries(), mod.oracle_sql()
fails, timings = [], []
for name in sorted(qs, reverse=os.environ.get("REPLAY_REVERSE") == "1"):
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF)
        scols, srows = canon(sdf.columns, [tuple(r) for r in sdf.collect()])
    except Exception as e:  # noqa: BLE001
        print(f"{name:<34} ERROR {type(e).__name__}: {e}")
        fails.append(name)
        continue
    el = time.time() - t0
    timings.append((el, name))
    if name in osql:
        cur = con.execute(osql[name])
        dcols, drows = canon([d[0] for d in cur.description], cur.fetchall())
        ok = scols == dcols and srows == drows
        if not ok:
            fails.append(name)
        print(f"{name:<34} hash={'OK ' if ok else 'FAIL'} rows={len(srows):<6} {el:6.2f}s")
    else:
        print(f"{name:<34} rows-only rows={len(srows):<6} {el:6.2f}s")

print("\n== slowest 12 ==")
for el, name in sorted(timings, reverse=True)[:12]:
    print(f"  {el:6.2f}s  {name}")
print(f"\ntotal queries: {len(timings)}  total query time: {sum(t for t,_ in timings):.1f}s")
print("FAILS:", fails if fails else "none")
