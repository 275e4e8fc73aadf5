"""Round-10 receipt for VERDICT r9 #2 ("job count per update run drops
measurably — record it"): execute the knn_graph_update registry row
once in a bench-identical session and report how many Spark JOBS it
triggered (statusTracker job ids before vs after). The r9 shape was
four eager localCheckpoint barriers plus the final action; the r10
shape is the single `appended` checkpoint plus one job computing
refine + rebuild + audit (AQE may add internal shuffle-query jobs —
they are part of the count and of the latency, so they belong in the
receipt).
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("r10-update-jobcount")
    .config("spark.sql.shuffle.partitions", str(int(CPUS)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "32g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

from vectorsearch_image_embeddings_databricks_spark import registry  # noqa: E402

fn = registry.QUERIES["knn_graph_update"]
for rep in range(2):
    before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    nb = max(before) if before else -1
    t0 = time.time()
    df = fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    jobs = [j for j in after if j > nb]
    print(f"rep{rep}: jobs={len(jobs)} wall={dt:.2f}s ids={sorted(jobs)}")
