"""Spark-only scale smoke: run EVERY registry query at a given sf_dir
(default sf0.1) and report rows + wall seconds — no DuckDB compare.

The oracle gate runs at sf0.01 (tools/replay.py, the driver contract);
several oracles are deliberately O(n^2) SQL recomputations that DuckDB
cannot finish at 10x scale, so the 10x check is Spark-side only: does
every plan EXECUTE at scale without blowup, and how does per-query time
grow. Usage: python tools/scale_smoke.py [sf_dir] [only,names]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from vectorsearch_image_embeddings_databricks_spark import registry  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

spark = (
    SparkSession.builder.master(os.environ.get("REPLAY_MASTER", "local[8]"))
    .config("spark.sql.shuffle.partitions", os.environ.get("REPLAY_SHUFFLE", "16"))
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

timings, fails = {}, []
for name, fn in registry.ordered_queries().items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        n = fn(spark, SF).count()
        timings[name] = time.time() - t0
        print(f"{name:35s} rows={n:<8d} {timings[name]:6.2f}s", flush=True)
    except Exception as e:
        fails.append(name)
        print(f"{name:35s} ERROR {type(e).__name__}: {str(e)[:120]}", flush=True)

print("== slowest 12 ==")
for n, t in sorted(timings.items(), key=lambda kv: -kv[1])[:12]:
    print(f"{t:8.2f}s  {n}")
print(f"total: {len(timings)} queries  {sum(timings.values()):.1f}s")
print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
