"""Graph-ANN tier at sf1 (20k vectors): the corpus-scale build path.

knn_graph_beam's registry row uses the EXACT graph build — the
SQL-replayable oracle tier, quadratic by design (the correctness gate
runs it at sf0.01/500 rows; at 20k vectors it would score 400M pairs).
The scale path is ``strategy='ivf'``: edge candidates from a
shared-quantizer cell join, bounded by cell products. This script
measures that tier one decade past the bench scale — build time, search
time, recall@5 vs exact, and rows scored per query — and appends the
numbers to SCALE_SF1.md's graph section.

Run: python tools/graph_sf1.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scaledata", "sf1",
)


def main() -> None:
    from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import (
        beam_search,
        build_knn_graph,
    )
    from vectorsearch_image_embeddings_databricks_spark.index.vector_index import (
        VectorIndex,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    t0 = time.time()
    exact = {
        (r["query_id"], r["vec_id"])
        for r in VectorIndex(emb, key="vec_id", vector_col="embedding")
        .search_batch(queries, k=5)
        .select("query_id", "vec_id")
        .collect()
    }
    t_exact = time.time() - t0

    t0 = time.time()
    graph = build_knn_graph(
        emb, "vec_id", "embedding", degree=12,
        strategy="ivf", nlist=64, nprobe=8,
    ).localCheckpoint(eager=True)
    n_edges = graph.count()
    t_build = time.time() - t0

    print(
        f"corpus={n}  edges={n_edges}  "
        f"build(ivf nlist=64 nprobe=8)={t_build:.1f}s  "
        f"exact_batch={t_exact:.1f}s"
    )
    for beam, hops in ((16, 4), (32, 5), (48, 6)):
        t0 = time.time()
        stats: list[int] = []
        res = beam_search(
            graph, emb, queries, "vec_id", "embedding",
            k=5, beam=beam, hops=hops,
            entry_ids=[0, 1, 2, 3, 4, 5, 6, 7], stats=stats,
        )
        got = {(r["query_id"], r["vec_id"]) for r in res.collect()}
        t_search = time.time() - t0
        recall = len(exact & got) / len(exact)
        print(
            f"search(b{beam} h{hops})={t_search:.1f}s  "
            f"recall@5={recall:.4f}  rows_scored={sum(stats)} "
            f"({sum(stats) / (32 * n):.4%} of 32x corpus)"
        )

    # ---- round-5 additions: adaptive entries + NN-descent refine ---- #
    from vectorsearch_image_embeddings_databricks_spark.index.ann import (
        IVFIndex,
    )
    from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import (
        ivf_entry_points,
        refine_knn_graph,
    )

    # exact ground-truth GRAPH via the single-cell blocked matmul
    # (nlist=1 puts the whole corpus in one cell; the block guard keeps
    # the allocation bounded) — for edge-overlap measurements.
    t0 = time.time()
    exact_graph = build_knn_graph(
        emb, "vec_id", "embedding", degree=12,
        strategy="ivf", nlist=1, nprobe=1,
    ).localCheckpoint(eager=True)
    n_exact_edges = exact_graph.count()
    t_exact_graph = time.time() - t0

    t0 = time.time()
    refined = refine_knn_graph(
        graph, emb, "vec_id", "embedding", degree=12, rounds=1
    )
    t_refine = time.time() - t0
    ov_raw = graph.join(exact_graph, ["src", "dst"]).count() / n_exact_edges
    ov_ref = refined.join(exact_graph, ["src", "dst"]).count() / n_exact_edges
    print(
        f"exact_graph(blocked single-cell)={t_exact_graph:.1f}s  "
        f"refine(1 round)={t_refine:.1f}s  "
        f"edge_overlap raw={ov_raw:.4f} refined={ov_ref:.4f}"
    )

    entry_ivf = IVFIndex(
        emb, key="vec_id", vector_col="embedding",
        nlist=64, replication=1, seed=42,
    )
    entries = ivf_entry_points(
        entry_ivf, queries, "vec_id", nprobe=8, per_cell=1
    ).localCheckpoint(eager=True)
    for label, g in (("raw", graph), ("nnd1", refined)):
        for mode in ("fixed", "adaptive"):
            for beam, hops in ((32, 5), (48, 6)):
                t0 = time.time()
                stats = []
                res = beam_search(
                    g, emb, queries, "vec_id", "embedding",
                    k=5, beam=beam, hops=hops,
                    entry_ids=(
                        [0, 1, 2, 3, 4, 5, 6, 7]
                        if mode == "fixed" else None
                    ),
                    entries=(entries if mode == "adaptive" else None),
                    stats=stats,
                )
                got = {(r["query_id"], r["vec_id"]) for r in res.collect()}
                recall = len(exact & got) / len(exact)
                print(
                    f"search({label} {mode} b{beam} h{hops})="
                    f"{time.time() - t0:.1f}s  recall@5={recall:.4f}  "
                    f"rows_scored={sum(stats)} "
                    f"({sum(stats) / (32 * n):.4%} of 32x corpus)"
                )
    spark.stop()


if __name__ == "__main__":
    main()
