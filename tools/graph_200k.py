"""Graph-ANN hop-growth frontier at 200k vectors (r5 verdict #6).

Flat NSW needs beam/hops to grow with graph diameter: at sf0.1 (2k) the
0.95-recall config was d12/b16/h4; at sf1 (20k) it took b32/h5 (+0.05
with adaptive entries). This script pushes ONE more decade — 200k
synthesized structure-free unit vectors (the honest hard case from
ANN_FRONTIER.md: no cluster structure for the quantizer to exploit) —
and records recall@5 vs (beam, hops) for fixed and adaptive entries, so
the "do hops keep climbing, i.e. do we need a hierarchical entry
layer?" question gets a measured answer in ANN_FRONTIER.md.

Corpus: deterministic numpy gaussian directions (seed 42), dim 64 —
matching the fixture embedding shape; written once to
.scaledata/synth200k/embeddings.parquet (gitignored).

r8 addition (r7 verdict #5): GRAPH200K_CLUSTERS=<k> switches the
synthesis to a PLANTED-CLUSTER mixture — k unit-direction centers
(seed 43), each point = normalize(center + GRAPH200K_SIGMA * gaussian)
with the cluster drawn uniformly (seed 42). sigma=0.1 at dim 64 puts
points at cos ≈ 0.78 to their center — the strongly-clustered regime
real embedding corpora live in, vs the structure-free worst case the
default measures. Written to .scaledata/synth<N>k_c<k>/.

Run: python tools/graph_200k.py [n_vectors]
     GRAPH200K_CLUSTERS=64 python tools/graph_200k.py   # clustered
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
DIM = 64
CLUSTERS = int(os.environ.get("GRAPH200K_CLUSTERS", "0"))
SIGMA = float(os.environ.get("GRAPH200K_SIGMA", "0.1"))
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scaledata",
    f"synth{N // 1000}k" + (f"_c{CLUSTERS}" if CLUSTERS else ""),
)
NQ = 32  # query panel (corpus members, ids 0..NQ-1)
DEGREE = int(os.environ.get("GRAPH200K_DEGREE", "16"))
NLIST = max(64, N // 512)
NPROBE = 8  # build replication AND entry routing
REFINE = int(os.environ.get("GRAPH200K_REFINE", "0"))  # NN-descent rounds
ENT_NPROBE = int(os.environ.get("GRAPH200K_ENT_NPROBE", str(NPROBE)))
ENT_PC = int(os.environ.get("GRAPH200K_ENT_PC", "2"))  # reps per cell
GRID = [
    tuple(map(int, bh.split("x")))
    for bh in os.environ.get(
        "GRAPH200K_GRID", "16x4,32x5,48x6,64x8,96x10"
    ).split(",")
]


def gen() -> str:
    path = os.path.join(DST, "embeddings.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(DST, exist_ok=True)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    if CLUSTERS:
        centers = np.random.default_rng(43).standard_normal(
            (CLUSTERS, DIM)
        )
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        assign = rng.integers(0, CLUSTERS, size=N)
        X = centers[assign] + SIGMA * rng.standard_normal((N, DIM))
        X = X.astype(np.float32)
    else:
        X = rng.standard_normal((N, DIM)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(N), pa.int64()),
            "embedding": pa.array(
                [row for row in X.tolist()], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(tbl, path)
    return path


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from vectorsearch_image_embeddings_databricks_spark.index.ann import IVFIndex
    from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import (
        beam_search,
        build_knn_graph,
        cell_representatives,
        ivf_entry_points,
    )
    from vectorsearch_image_embeddings_databricks_spark.index.vector_index import (
        VectorIndex,
    )

    path = gen()
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # the pyarrow writer emits ONE row group -> one scan task; spread
    # the cached corpus across cores before anything else reads it
    emb = spark.read.parquet(path).repartition(32).cache()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < NQ).select(
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
    ivf = IVFIndex(
        emb, key="vec_id", vector_col="embedding",
        nlist=NLIST, replication=NPROBE, seed=42,
    )
    graph = build_knn_graph(
        emb, "vec_id", "embedding", degree=DEGREE,
        strategy="ivf", nlist=NLIST, nprobe=NPROBE, ivf=ivf,
    ).localCheckpoint(eager=True)
    n_edges = graph.count()
    t_build = time.time() - t0
    if REFINE:
        from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import (
            refine_knn_graph,
        )

        t0 = time.time()
        graph = refine_knn_graph(
            graph, emb, "vec_id", "embedding",
            degree=DEGREE, rounds=REFINE,
        ).localCheckpoint(eager=True)
        graph.count()
        print(f"refine({REFINE} round)={time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    reps = cell_representatives(ivf, ENT_PC).localCheckpoint(eager=True)
    t_reps = time.time() - t0
    print(
        f"corpus={n}  edges={n_edges}  "
        f"build(ivf nlist={NLIST} nprobe={NPROBE} d={DEGREE})={t_build:.1f}s  "
        f"reps={t_reps:.1f}s  exact_batch={t_exact:.1f}s",
        flush=True,
    )

    for beam, hops in GRID:
        for mode in ("fixed", "adaptive"):
            t0 = time.time()
            stats: list[int] = []
            kw = (
                {"entry_ids": list(range(8))}
                if mode == "fixed"
                else {
                    "entries": ivf_entry_points(
                        ivf, queries, "vec_id", nprobe=ENT_NPROBE, reps=reps
                    )
                }
            )
            res = beam_search(
                graph, emb, queries, "vec_id", "embedding",
                k=5, beam=beam, hops=hops, stats=stats, **kw,
            )
            got = {(r["query_id"], r["vec_id"]) for r in res.collect()}
            recall = len(exact & got) / len(exact)
            print(
                f"search({mode:8s} b{beam} h{hops})={time.time() - t0:5.1f}s  "
                f"recall@5={recall:.4f}  rows_scored={sum(stats)} "
                f"({sum(stats) / (NQ * n):.4%} of {NQ}x corpus)",
                flush=True,
            )


if __name__ == "__main__":
    main()
