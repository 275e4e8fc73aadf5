"""Dtype-aware oracle audit.

The round-1 driver marked four queries hash_match=false that pass a
string-canonicalized compare — consistent with a dtype-aware value hash
(e.g. DuckDB HUGEINT vs Spark BIGINT). This audit compares the Arrow
schema of each DuckDB oracle result against the Spark result's schema
(via toPandas dtypes) and flags any residual mismatch.
"""
import importlib.util
import os
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

con = duckdb.connect()
_spill = os.environ.get("DUCKDB_SPILL_DIR", "/tmp/duckdb_spill")
os.makedirs(_spill, exist_ok=True)
con.execute(f"SET temp_directory='{_spill}'")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )


def norm(dt) -> str:
    s = str(dt)
    # collapse arrow/pandas spellings to a comparable core
    aliases = {
        "int64": "i64", "Int64": "i64", "int32": "i32", "Int32": "i32",
        "int16": "i16", "int8": "i8", "float64": "f64", "double": "f64",
        "float32": "f32", "object": "obj", "string": "obj", "large_string": "obj",
        "bool": "bool",
    }
    return aliases.get(s, s)


qs, osql = mod.queries(), mod.oracle_sql()
bad = []
for name in sorted(osql):
    sdf = qs[name](spark, SF)
    spdf = sdf.toPandas()
    ddf = con.execute(osql[name]).fetchdf()
    for col in sorted(set(spdf.columns) | set(ddf.columns)):
        if col not in spdf.columns or col not in ddf.columns:
            bad.append((name, col, "MISSING"))
            continue
        a, b = norm(spdf[col].dtype), norm(ddf[col].dtype)
        # DuckDB fetchdf gives float64 for nullable ints; tolerate only if
        # spark side is also numeric and values equal — flag for review
        if a != b:
            bad.append((name, col, f"spark={spdf[col].dtype} duck={ddf[col].dtype}"))

for name, col, msg in bad:
    print(f"{name:<34} {col:<24} {msg}")
print(f"\n{len(bad)} dtype mismatches across {len(osql)} oracle queries")
