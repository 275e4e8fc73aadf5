"""Stage decomposition of knn_graph_update at sf0.1 in a bench-identical
session (guide §1: measure first). Reimplements the registry row stage by
stage with explicit timing fences so the 5.8 s bench row is attributed to
build / append / refine / rebuild+agg rather than guessed at.

Usage: python tools/decompose_update_r10.py
"""
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
    .appName("r10-decompose-update")
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
    append_knn_graph,
    build_knn_graph,
    refine_knn_graph,
)

# warmups matching bench.py
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


njobs0 = None


def jobs():
    st = spark.sparkContext.statusTracker()
    return len(st.getJobIdsForGroup(None) or [])


for rep in range(3):
    t_all0 = time.perf_counter()
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
        F.concat(
            F.slice("embedding", 2, 63), F.slice("embedding", 1, 1)
        ).alias("embedding"),
    )
    inserts = emb.filter(F.col("vec_id") >= GRAPH_UPD_SPLIT)
    new = updated.unionByName(inserts)

    t0 = time.perf_counter()
    g_old = build_knn_graph(old, "vec_id", "embedding", degree=GRAPH_DEGREE)
    appended = append_knn_graph(
        g_old, old, new, "vec_id", "embedding", degree=GRAPH_DEGREE
    ).localCheckpoint(eager=True)
    t_append = time.perf_counter() - t0

    effective = old.filter(F.col("vec_id") < GRAPH_UPD_LO).unionByName(new)

    t0 = time.perf_counter()
    repaired = refine_knn_graph(
        appended, effective, "vec_id", "embedding",
        degree=GRAPH_DEGREE, rounds=1,
    )
    t_refine_lazy = time.perf_counter() - t0  # ~0 if refine stops checkpointing
    t0 = time.perf_counter()
    noop(repaired)
    t_refine_exec = time.perf_counter() - t0

    t0 = time.perf_counter()
    rebuild = build_knn_graph(
        effective, "vec_id", "embedding", degree=GRAPH_DEGREE
    )
    noop(rebuild)
    t_rebuild = time.perf_counter() - t0

    t0 = time.perf_counter()
    category = (
        F.when(F.col("src") < GRAPH_UPD_LO, "stored")
        .when(F.col("src") < GRAPH_UPD_SPLIT, "updated")
        .otherwise("inserted")
    )
    agg = (
        repaired.join(
            rebuild.withColumn("__m", F.lit(1)), ["src", "dst"], "left"
        )
        .select(
            category.alias("category"),
            F.coalesce("__m", F.lit(0)).alias("__m"),
        )
        .groupBy("category")
        .agg(
            F.count("*").cast("long").alias("n_edges"),
            F.sum("__m").cast("long").alias("n_match"),
        )
    )
    agg = agg.select(
        "category", "n_edges", "n_match",
        F.expr("(n_match * 1000000) div n_edges").cast("long").alias(
            "overlap_micro"
        ),
    )
    noop(agg)
    t_agg = time.perf_counter() - t0
    t_all = time.perf_counter() - t_all0
    print(
        f"rep{rep}: build+append(ckpt)={t_append:.2f}  "
        f"refine_plan={t_refine_lazy:.2f} refine_exec={t_refine_exec:.2f}  "
        f"rebuild_exec={t_rebuild:.2f}  agg(re-exec of repaired+rebuild)="
        f"{t_agg:.2f}  stagewise_total={t_all:.2f}",
        flush=True,
    )

# and the actual registry row, same session, 3 runs
for rep in range(3):
    t0 = time.perf_counter()
    noop(registry.QUERIES["knn_graph_update"](spark, SF_DIR))
    print(f"full row rep{rep}: {time.perf_counter() - t0:.2f}s", flush=True)

spark.stop()
