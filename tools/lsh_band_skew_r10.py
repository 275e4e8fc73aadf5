"""Round-10 band-skew audit for cosine_lsh_near_dup (VERDICT r9 #4).

The LSH candidate stage self-joins the banded postings on (band, bh).
A hot bucket (many ids sharing one band hash) would dominate the join:
candidate volume per bucket is c*(c-1)/2, so one bucket of 10k rows
costs as much as ~24 million balanced 64-row buckets. This audit
materializes the postings exactly as the registry row does (same
corpus construction, same auto-sized banding) and reports the
bucket-population distribution and each bucket's share of the total
candidate-pair volume — the receipt that decides salt-or-close.

Usage: python tools/lsh_band_skew_r10.py [sf_dir ...]
Defaults to /root/testdata/sf0.1 and .scaledata/sf1 when present.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("r10-lsh-band-skew")
    .config("spark.sql.shuffle.partitions", str(int(CPUS)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "32g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from vectorsearch_image_embeddings_databricks_spark.index.ann import (  # noqa: E402
    CosineLSHIndex,
)
from vectorsearch_image_embeddings_databricks_spark.registry.hybrid_ann_streaming import (  # noqa: E402
    _LSH_TWIN_OFFSET,
    load_embeddings,
)

dirs = sys.argv[1:] or [
    d
    for d in ("/root/testdata/sf0.1", os.path.join(REPO, ".scaledata", "sf1"))
    if os.path.isdir(d)
]

for sf_dir in dirs:
    emb = load_embeddings(spark, sf_dir)
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    nxt = base.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("embedding").alias("__next"),
    )
    twins = (
        base.join(nxt, "vec_id")
        .filter(F.col("vec_id") % 10 == 0)
        .select(
            (F.col("vec_id") + F.lit(_LSH_TWIN_OFFSET)).alias("vec_id"),
            F.zip_with(
                "embedding",
                "__next",
                lambda x, y: F.lit(0.9) * x + F.lit(0.1) * y,
            ).alias("embedding"),
        )
    )
    corpus = base.unionByName(twins).localCheckpoint(eager=True)
    n = corpus.count()
    lsh = CosineLSHIndex(
        corpus, key="vec_id", vector_col="embedding", dim=64, n_rows=n
    )
    posts = (
        lsh.signed.select(
            F.col("vec_id").alias("id"), F.explode("__bands").alias("bk")
        )
        .select("id", "bk.band", "bk.bh")
    )
    buckets = posts.groupBy("band", "bh").agg(F.count("*").alias("c"))
    stats = buckets.agg(
        F.count("*").alias("n_buckets"),
        F.sum("c").alias("postings"),
        F.max("c").alias("max_c"),
        F.expr("percentile(c, 0.5)").alias("p50"),
        F.expr("percentile(c, 0.99)").alias("p99"),
        F.expr("percentile(c, 0.999)").alias("p999"),
        F.sum(F.expr("c * (c - 1) / 2")).alias("pair_volume"),
    ).collect()[0]
    top = (
        buckets.orderBy(F.desc("c"))
        .limit(10)
        .select("band", "bh", "c", F.expr("c * (c - 1) / 2").alias("pairs"))
        .collect()
    )
    tot_pairs = float(stats["pair_volume"]) or 1.0
    top1_share = float(top[0]["pairs"]) / tot_pairs if top else 0.0
    top10_share = sum(float(r["pairs"]) for r in top) / tot_pairs
    print(
        f"{sf_dir}: n={n} band_bits={lsh.band_bits} bands={lsh.num_bits // lsh.band_bits} "
        f"buckets={stats['n_buckets']} postings={stats['postings']}"
    )
    print(
        f"  bucket pop: max={stats['max_c']} p50={stats['p50']:.1f} "
        f"p99={stats['p99']:.1f} p99.9={stats['p999']:.1f} "
        f"mean={stats['postings'] / max(stats['n_buckets'], 1):.1f}"
    )
    print(
        f"  candidate volume: total={tot_pairs:.0f} pairs; "
        f"top-1 bucket {100 * top1_share:.2f}%  top-10 {100 * top10_share:.2f}%"
    )
    for r in top[:5]:
        print(f"    band={r['band']} bh={r['bh']} c={r['c']} pairs={r['pairs']:.0f}")
