"""Regenerate the operator trees embedded in PLANS.md.

Prints `##### <name>` + the formatted-plan tree for each flagship query
at sf0.001; paste into PLANS.md (commentary is maintained by hand).
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

FLAGSHIPS = [
    "knn_exact",
    "knn_batch_bigcorpus",
    "pricing_summary",
    "hybrid_rrf",
    "near_dup_pairs_jaccard",
    "pack_sequences",
    "lm_perplexity_buckets",
    "events_gapfill_hourly",
    "salted_priority_revenue",
    "semantic_dedup",
    "dedup_keep_best",
    "chunk_documents",
    "zorder_layout",
    "ivf_adc_topk",
    "boilerplate_ngrams",
    "source_drift_chi2",
    "events_ohlc_hourly",
    "segment_dedup_docs",
    "cms_heavy_hitters",
    "knn_graph_beam",
    "sq8_quant_topk",
    "window_funnel_steps",
    "cdc_apply_orders",
    # round 5
    "knn_graph_beam_adaptive",
    "brp_lsh_recall",
    "bpe_train_merges",
    "quantile_sketch_audit",
]

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from vectorsearch_image_embeddings_databricks_spark import registry  # noqa: E402

for name in FLAGSHIPS:
    df = registry.QUERIES[name](spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    print(f"##### {name}")
    print(buf.getvalue().split("\n\n")[0])
    print()
