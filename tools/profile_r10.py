"""Round-10 optimization harness: isolate named queries in a
bench-identical session (local[32], 32 shuffle partitions, AQE on,
noop sink), print per-run wall times, and optionally dump
`.explain('formatted')` to plans/r10/.

Usage:
    python tools/profile_r10.py q1,q2,...            # time (3 runs each)
    python tools/profile_r10.py q1,... --plans before  # also write
        plans/r10/<q>_before.txt (or _after.txt)
    SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored like bench.py.
"""
import contextlib
import io
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

names = sys.argv[1].split(",")
plans_tag = None
if "--plans" in sys.argv:
    plans_tag = sys.argv[sys.argv.index("--plans") + 1]

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("r10-profile")
    .config("spark.sql.shuffle.partitions", str(int(CPUS)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "32g")
    .config(
        "spark.driver.extraJavaOptions",
        "-Xms32g -XX:ReservedCodeCacheSize=1g",
    )
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from vectorsearch_image_embeddings_databricks_spark import registry  # noqa: E402

# same warmups as bench.py so run-1 numbers are comparable
spark.range(1_000_000).selectExpr("sum(id)").collect()
from pyspark.sql.functions import pandas_udf  # noqa: E402


@pandas_udf("long")
def _noop(s):
    return s


spark.range(1_000, numPartitions=int(CPUS)).select(_noop("id")).write.format(
    "noop"
).mode("overwrite").save()

for q in ("pricing_summary", "top_orders_per_customer", "rollup_revenue",
          "token_counts", "knn_exact"):
    try:
        registry.QUERIES[q](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass

import gc  # noqa: E402

for name in names:
    runs = []
    for i in range(3):
        spark.sparkContext.setJobDescription(f"{name} run{i}")
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
        if plans_tag and i == 0:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            out = os.path.join(REPO, "plans", "r10", f"{name}_{plans_tag}.txt")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w") as f:
                f.write(buf.getvalue())
        df = None
        gc.collect()
    print(f"{name:35s} " + "  ".join(f"{t:7.3f}" for t in runs), flush=True)
spark.stop()
