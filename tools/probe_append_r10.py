"""Probe the internals of the knn_graph_update build+append stage
(guide §1): time each scoring branch separately in a fresh
bench-identical session, FIRST thing after warmup (same-session
degradation pollutes later samples — measure early, repeat few)."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("r10-probe-append")
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
from vectorsearch_image_embeddings_databricks_spark.registry.hybrid_ann_streaming import (  # noqa: E402
    GRAPH_DEGREE,
    GRAPH_UPD_CAP,
    GRAPH_UPD_LO,
    GRAPH_UPD_SPLIT,
    load_embeddings,
)
from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import (  # noqa: E402
    _exact_block_topk,
    _pair_topk,
    _top_degree_edges,
    build_knn_graph,
)

spark.range(1_000_000).selectExpr("sum(id)").collect()
from pyspark.sql.functions import pandas_udf  # noqa: E402


@pandas_udf("long")
def _noop(s):
    return s


spark.range(1_000, numPartitions=int(CPUS)).select(_noop("id")).write.format(
    "noop"
).mode("overwrite").save()
for q in ("pricing_summary", "knn_exact"):
    try:
        registry.QUERIES[q](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass


def noop(df):
    df.write.format("noop").mode("overwrite").save()


emb = (
    load_embeddings(spark, SF_DIR)
    .filter(F.col("vec_id") < GRAPH_UPD_CAP)
    .select("vec_id", "embedding")
)
old = emb.filter(F.col("vec_id") < GRAPH_UPD_SPLIT)
updated = emb.filter(
    (F.col("vec_id") >= GRAPH_UPD_LO) & (F.col("vec_id") < GRAPH_UPD_SPLIT)
).select(
    "vec_id",
    F.concat(F.slice("embedding", 2, 63), F.slice("embedding", 1, 1)).alias(
        "embedding"
    ),
)
inserts = emb.filter(F.col("vec_id") >= GRAPH_UPD_SPLIT)
new = updated.unionByName(inserts)
news = new.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
olds = old.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")).join(
    news.select("id"), "id", "left_anti"
)
alls = olds.unionByName(news)

for rep in range(2):
    t0 = time.perf_counter()
    pts = old.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    noop(_top_degree_edges(_exact_block_topk(pts, pts, GRAPH_DEGREE), GRAPH_DEGREE))
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    noop(_exact_block_topk(olds, news, GRAPH_DEGREE))
    t_p1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    noop(_exact_block_topk(news, alls, GRAPH_DEGREE))
    t_p2 = time.perf_counter() - t0

    g_old = build_knn_graph(old, "vec_id", "embedding", degree=GRAPH_DEGREE)
    g_old_ck = g_old.localCheckpoint(eager=True)
    t0 = time.perf_counter()
    noop(
        _pair_topk(
            g_old_ck.select("src", "dst").filter(F.col("src") != F.col("dst")),
            alls,
            GRAPH_DEGREE,
        )
    )
    t_stored = time.perf_counter() - t0
    print(
        f"rep{rep}: build(exec)={t_build:.2f}  prod_old_new={t_p1:.2f}  "
        f"prod_new_all={t_p2:.2f}  stored_pair_topk={t_stored:.2f}",
        flush=True,
    )

spark.stop()
