"""One-off sf1 receipt for the graph-mutation family (VERDICT r9 #3):
time knn_graph_append / knn_graph_update / knn_graph_delete at the
synthesized sf1 (20k vectors) in the bench_sf1 session shape
(local[16]) so the lane budgets are measured, not guessed. The exact
tier is quadratic BY CONTRACT (oracle machinery) — the point here is
that the block-matmul engine holds its per-task memory bound and
finishes, proving the r9/r10 scoring rewrites scale past the bench sf.
"""
import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from vectorsearch_image_embeddings_databricks_spark import registry  # noqa: E402

SF_DIR = os.environ.get("BENCH_SF1_DIR", os.path.join(REPO, ".scaledata", "sf1"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "16")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("r10-sf1-graph-mutations")
    .config("spark.sql.shuffle.partitions", str(int(CPUS)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "24g")
    .config(
        "spark.driver.extraJavaOptions",
        "-Xms24g -XX:ReservedCodeCacheSize=512m",
    )
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

for pass_no in (1, 2):
    for name in ("knn_graph_update", "knn_graph_append", "knn_graph_delete"):
        gc.collect()
        t0 = time.time()
        registry.QUERIES[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"pass{pass_no} {name:20s} {time.time() - t0:7.2f}s", flush=True)
spark.stop()
