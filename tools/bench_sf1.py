"""sf1 bench lane for the heavy family (r8 verdict #5).

The per-round bench (bench.py) runs at sf0.1 — it cannot see a
scale-shape regression in the operators whose cost is dominated by
corpus-sized joins/matmuls. This lane times the ~15 most expensive
scale-shaped rows at the synthesized sf1 (tools/gen_sf1.py: 6M
lineitem / 50k docs / 20k vectors) Spark-only (no DuckDB compare —
value parity at sf1 is SF1_VALUES.md's job) and writes BENCH_SF1.json
at the repo root, so the NEXT scale regression shows up as an artifact
diff instead of a sweep anecdote.

Budgets are the documented receipts (SCALE_SF1.md / SF1_VALUES.md
timings, which INCLUDE the DuckDB oracle side; Spark-only should come
in under them) with ~2x host-drift headroom. A row over budget is
reported in "over_budget" — investigate, don't hand-wave.

Excluded by documented receipt: knn_graph_ivf_delete_recall (567 s at
sf1 — the one-time delete-audit receipt lives in SF1_VALUES.md; too
heavy for a recurring lane). The exact-tier graph SERVE rows
(knn_graph_beam etc.) are excluded by construction: their build is
deliberately quadratic oracle machinery, measured at sf0.1 in bench.py
only. The graph MUTATION trio joined in r10 (VERDICT r9 #3): their
builds are equally quadratic by contract, but they are exactly the
rows the r9/r10 block-matmul/pair-engine rewrites rewired, so the lane
proves the per-task-bounded scoring engine holds one decade past the
bench sf instead of arguing it (receipt 2026-08-18, local[16]:
update 14.0/5.1 s, append 9.3/8.8 s, delete 7.0/3.7 s across two
passes — tools/graph_sf1_mutations_r10.py).

Usage: python tools/bench_sf1.py   (run on a QUIET host; ~8-12 min)
"""
import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from vectorsearch_image_embeddings_databricks_spark import registry  # noqa: E402

SF_DIR = os.environ.get("BENCH_SF1_DIR", os.path.join(REPO, ".scaledata", "sf1"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "16")
OUT = os.path.join(REPO, "BENCH_SF1.json")

#: (query, budget seconds). Budgets = documented sf1 receipt x ~2 headroom.
HEAVY = [
    ("knn_graph_ivf_recall", 250.0),     # SF1_VALUES 125.3 s (with oracle)
    ("cosine_lsh_near_dup", 110.0),      # SCALE_SF1 55.9 s
    ("semantic_dedup", 65.0),            # SCALE_SF1 31.9 s
    ("near_dedup_keep_best", 40.0),      # SCALE_SF1 19.2 s
    ("leakage_safe_split", 35.0),        # SF1 smoke 16.3 s
    ("pagerank_trade_graph", 30.0),      # SCALE_SF1 15.2 s
    ("triangle_count_parts", 25.0),      # SCALE_SF1 10.5 s
    ("simhash_near_dup", 20.0),          # SCALE_SF1 8.9 s
    ("near_dup_pairs_ppjoin", 20.0),     # SCALE_SF1 8.4 s
    ("kcenter_coreset", 15.0),           # SF1_VALUES 6.9 s
    ("minhash_near_dedup", 12.0),        # SCALE_SF1 5.0 s
    ("exact_substring_dedup", 12.0),     # SCALE_SF1 5.0 s
    ("lm_perplexity_buckets", 12.0),     # SCALE_SF1 4.9 s
    ("boilerplate_ngrams", 8.0),         # SCALE_SF1 3.3 s
    ("bpe_train_merges", 8.0),           # SF1_VALUES 3.0 s
    # graph mutation trio (r10, VERDICT r9 #3): receipts above
    ("knn_graph_append", 20.0),          # r10 receipt 8.8 s best-of-2
    ("knn_graph_update", 12.0),          # r10 receipt 5.1 s best-of-2
    ("knn_graph_delete", 15.0),          # r10 receipt 3.7 s best-of-2
]


def main() -> None:
    if not os.path.isdir(SF_DIR):
        sys.exit(f"{SF_DIR} missing — run tools/gen_sf1.py first")
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("vectorlake-bench-sf1")
        .config("spark.sql.shuffle.partitions", str(int(CPUS)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # same rationale as bench.py: pin the heap (no growth stalls),
        # keep the JIT code cache from silently disabling codegen
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
    # JVM + python-worker warmup (bench.py's recipe, abbreviated)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Two interleaved passes, keep the faster sample (bench.py's
    # stall-independence rationale); noop sink = full computation,
    # no driver-side transfer.
    best: dict[str, float] = {}
    for pass_no in (1, 2):
        for name, _budget in HEAVY:
            gc.collect()
            t0 = time.time()
            registry.QUERIES[name](spark, SF_DIR).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.time() - t0
            best[name] = min(best.get(name, float("inf")), dt)
            print(f"pass{pass_no} {name:32s} {dt:7.2f}s", flush=True)

    over = [
        n for n, b in HEAVY if best[n] > b
    ]
    result = {
        "sf_dir": SF_DIR,
        "cpus": int(CPUS),
        "passes": 2,
        "queries": {n: round(best[n], 2) for n, _ in HEAVY},
        "total": round(sum(best.values()), 2),
        "budgets": {n: b for n, b in HEAVY},
        "over_budget": over,
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"total": result["total"], "over_budget": over}))


if __name__ == "__main__":
    main()
