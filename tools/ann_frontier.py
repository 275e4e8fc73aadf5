"""ANN recall/probe-cost frontier sweep (round-4 verdict item #4).

The reference delegates its ANN path to a closed HNSW-class service
(NMR:315-323). This repo's tiers are quantization-family indexes
(IVF-flat, IVFADC, PQ/ADC, SQ8, binary) — the DataFrame-native choice:
bounded driver state, partition-pruned probes, no per-row pointer
chasing. What that choice costs at high recall is an empirical
question; this sweep measures it instead of guessing.

For each configuration it reports, over a 32-query batch at sf0.1
(2000 corpus vectors, dim 64):
  - recall@5 vs the exact cosine top-k (mean over queries)
  - rows_scored: candidate rows actually scored, summed over queries —
    the probe cost (the exact tier scores |corpus| rows per query)
  - rows_scored / exact-cost ratio (fraction of the corpus touched)

Sweeps:
  - IVF-flat (trained spherical-kmeans quantizer, nlist=16) at
    nprobe 1, 2, 4, 8, 16 and replication 1 and 2 (SPANN-style
    boundary replication: recall at fixed nprobe for 2x storage)
  - IVFADC (seeded centroids + seeded PQ codebooks, m=8) at the same
    nprobe ladder — the compressed tier (codes only, 8 bytes/vector)

Writes ANN_FRONTIER.md (table + one-line JSON) at the repo root.
Run: python tools/ann_frontier.py [sf_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_QUERIES = 32
K = 5
NLIST = 16


def main() -> None:
    from vectorsearch_image_embeddings_databricks_spark.index.ann import IVFIndex
    from vectorsearch_image_embeddings_databricks_spark.index import pq
    from vectorsearch_image_embeddings_databricks_spark.index.vector_index import VectorIndex

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    # exact ground truth: one batch kNN join
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding")
    exact = {
        (r["query_id"], r["vec_id"])
        for r in idx.search_batch(queries, k=K)
        .select("query_id", "vec_id")
        .collect()
    }
    exact_cost = N_QUERIES * n_corpus

    results = []

    def record(tier, nprobe, repl, hit_pairs, rows_scored, secs):
        recall = len(exact & hit_pairs) / (N_QUERIES * K)
        results.append(
            {
                "tier": tier,
                "nprobe": nprobe,
                "replication": repl,
                "recall_at_5": round(recall, 4),
                "rows_scored": rows_scored,
                "corpus_fraction": round(rows_scored / exact_cost, 4),
                "sweep_secs": round(secs, 2),
            }
        )

    # ---------------- IVF-flat (trained quantizer) ---------------- #
    for repl in (1, 2):
        ivf = IVFIndex(
            emb, nlist=NLIST, replication=repl, seed=42
        )
        cell_sizes = {
            r["centroid_id"]: r["n"]
            for r in ivf.assigned.groupBy("centroid_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        qrows = queries.collect()
        for nprobe in (1, 2, 4, 8, 16):
            t0 = time.time()
            import numpy as np

            hits = set()
            rows_scored = 0
            # same per-query search path the production index uses
            for qr in qrows:
                q = qr["query_vec"]
                dots = np.array(
                    [float(np.dot(c, np.asarray(q, dtype=float)))
                     for c in ivf.centroids]
                )
                probes = [
                    int(p) for p in np.argsort(-dots, kind="stable")[:nprobe]
                ]
                rows_scored += sum(cell_sizes.get(p, 0) for p in probes)
                for r in ivf.search(q, k=K, nprobe=nprobe).collect():
                    hits.add((qr["query_id"], r["vec_id"]))
            record("ivf_flat", nprobe, repl, hits, rows_scored,
                   time.time() - t0)

    # ---------------- IVFADC (seeded, compressed codes) ------------ #
    PQ_M, PQ_K = 8, 16
    seed_rows = (
        emb.filter(F.col("vec_id") < max(NLIST, PQ_K))
        .orderBy("vec_id")
        .collect()
    )
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in seed_rows[:NLIST]
    ]
    sub = 64 // PQ_M
    books = []
    for j in range(PQ_M):
        books.append(
            [
                (int(r["vec_id"]),
                 [float(x) for x in r["embedding"][j * sub:(j + 1) * sub]])
                for r in seed_rows[:PQ_K]
            ]
        )
    enc = pq.encode_ivfadc(
        emb, "vec_id", "embedding", cents, books, dim=64, replication=1
    ).cache()
    adc_cells = {
        r["cell"]: r["n"]
        for r in enc.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    qrows = queries.collect()
    for nprobe in (1, 2, 4, 8, 16):
        t0 = time.time()
        hits = set()
        rows_scored = 0
        for qr in qrows:
            q = qr["query_vec"]
            probes = pq.probe_cells(q, cents, nprobe)
            rows_scored += sum(adc_cells.get(p, 0) for p in probes)
            res = pq.ivfadc_search(
                enc, q, cents, books, dim=64, nprobe=nprobe, k=K
            )
            for r in res.collect():
                hits.add((qr["query_id"], r["id"]))
        record("ivfadc_pq8", nprobe, 1, hits, rows_scored, time.time() - t0)

    # ---------------- graph tier (kNN graph + beam search) --------- #
    from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import (
        beam_search,
        build_knn_graph,
        ivf_entry_points,
        refine_knn_graph,
    )

    # adaptive entries share the IVF coarse quantizer already swept
    # above: 8 probed cells x 1 central member = 8 entries per query,
    # the same entry count as the fixed [0..7] list — an apples-to-
    # apples comparison of WHERE the walk starts.
    entry_ivf = IVFIndex(emb, nlist=NLIST, replication=1, seed=42)
    adaptive_entries = ivf_entry_points(
        entry_ivf, queries, "vec_id", nprobe=8, per_cell=1
    ).localCheckpoint(eager=True)

    for degree, beam, hops in (
        (8, 8, 3), (8, 24, 4),
        (12, 16, 4), (12, 24, 4), (12, 24, 5), (12, 32, 5),
    ):
        graph = build_knn_graph(
            emb, "vec_id", "embedding", degree=degree
        ).localCheckpoint(eager=True)
        for mode in ("fixed", "adaptive"):
            t0 = time.time()
            stats: list[int] = []
            res = beam_search(
                graph, emb, queries, "vec_id", "embedding",
                k=K, beam=beam, hops=hops,
                entry_ids=(
                    [0, 1, 2, 3, 4, 5, 6, 7] if mode == "fixed" else None
                ),
                entries=(adaptive_entries if mode == "adaptive" else None),
                stats=stats,
            )
            hits = {
                (r["query_id"], r["vec_id"])
                for r in res.collect()
            }
            suffix = "" if mode == "fixed" else "_adapt"
            record(
                f"knn_graph_d{degree}_b{beam}_h{hops}{suffix}", hops, 1,
                hits, sum(stats), time.time() - t0,
            )

    # ------- production build path: ivf-built graph + NN-descent ---- #
    # The rows above walk the EXACT-built graph (the oracle tier). The
    # corpus-scale build is strategy='ivf' (blocked per-cell matmul);
    # one NN-descent round then recovers cross-cell edges. Both walked
    # at the same beam/hops with adaptive entries.
    ivf_graph = build_knn_graph(
        emb, "vec_id", "embedding", degree=12,
        strategy="ivf", nlist=NLIST, nprobe=4,
    ).localCheckpoint(eager=True)
    refined = refine_knn_graph(
        ivf_graph, emb, "vec_id", "embedding", degree=12, rounds=1
    )
    for tier, g in (("ivfgraph_d12", ivf_graph), ("ivfgraph_nnd1_d12", refined)):
        t0 = time.time()
        stats = []
        res = beam_search(
            g, emb, queries, "vec_id", "embedding",
            k=K, beam=24, hops=4, entries=adaptive_entries, stats=stats,
        )
        hits = {(r["query_id"], r["vec_id"]) for r in res.collect()}
        record(f"{tier}_b24_h4_adapt", 4, 1, hits, sum(stats),
               time.time() - t0)

    # ---------------- write the artifact ---------------- #
    lines = [
        "# ANN recall / probe-cost frontier",
        "",
        f"Measured at `{SF_DIR}` ({n_corpus} vectors, dim 64), "
        f"{N_QUERIES} queries, recall@{K} vs exact cosine top-{K}. "
        "`rows_scored` = candidate rows scored across all queries; the "
        f"exact tier scores {exact_cost} "
        f"({N_QUERIES} x {n_corpus}). Produced by tools/ann_frontier.py; "
        "numbers are deterministic (seeded quantizers, id tie-breaks) "
        "and pinned by tests/test_ann_frontier.py.",
        "",
        "| tier | nprobe | repl | recall@5 | rows_scored | corpus frac |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['tier']} | {r['nprobe']} | {r['replication']} "
            f"| {r['recall_at_5']} | {r['rows_scored']} "
            f"| {r['corpus_fraction']} |"
        )
    lines += [
        "",
        "## Reading",
        "",
        "- The corpus is the synthetic fixture (near-uniform directions "
        "— the hardest regime for any cell-pruning index: there is no "
        "cluster structure to exploit, so these recalls are a LOWER "
        "bound on real-corpus behavior, where embeddings cluster "
        "heavily).",
        "- IVF-flat with replication=2 is the storage-for-recall knob: "
        "compare its recall to replication=1 at the same nprobe.",
        "- IVFADC adds PQ compression loss on top of cell pruning; its "
        "recall ceiling at nprobe=nlist measures pure quantization "
        "error (8 bytes/vector vs 256).",
        "- HNSW-class graph indexes win when recall > ~0.95 is needed "
        "at < ~10% corpus scans on UNclustered data. Whether that gap "
        "is live here is read off the table: the row where IVF recall "
        "crosses 0.95 tells the corpus fraction it costs.",
        "- The knn_graph rows are this repo's answer to that gap "
        "(index.graph_ann: exact-built kNN graph, batched NSW beam "
        "search): rows_scored there counts candidates actually scored "
        "during the walk — entries + per-hop frontier expansions — "
        "which is bounded by entries + hops*beam*degree per query and "
        "does NOT grow with the corpus, unlike every cell-pruning row "
        "above. Headline: degree-12/beam-16/4-hop crosses 0.95 recall "
        "at ~0.29 of this 2000-vector corpus (an ABSOLUTE ~580 rows "
        "per query — 0.06% of a 1M-vector corpus), where IVF needs "
        "~the whole corpus; the hash-verified registry row is "
        "knn_graph_beam.",
        "- `_adapt` rows (round 5) swap the fixed entry list for "
        "QUERY-ADAPTIVE entries routed through the IVF coarse "
        "quantizer (index.graph_ann.ivf_entry_points — HNSW's routing "
        "layer as a cell join; same entry count per query). At every "
        "config the walk starts inside the query's neighborhood: "
        "recall is >= the fixed-entry row at <= rows scored where the "
        "budget was the binding constraint (d8_b8_h3 0.59 -> 0.66, "
        "d8_b24_h4 0.88 -> 0.93 with fewer rows, d12_b16_h4 0.96 -> "
        "0.99) and identical at saturation. The hash-verified registry "
        "row is knn_graph_beam_adaptive (seeded-centroid entry "
        "derivation + unrolled walk, all in SQL).",
        "- `ivfgraph_*` rows walk the PRODUCTION-BUILT graph "
        "(strategy='ivf' blocked matmul) rather than the exact build: "
        "at this corpus the nlist=16/nprobe=4 build already matches "
        "exact-build recall (0.9875 at b24 h4), and one NN-descent "
        "round (`refine_knn_graph`) holds it while repairing the "
        "coarse-build edge set (strict overlap improvement is "
        "pytest-pinned on a deliberately coarse graph; the sf1 "
        "measurement is in SCALE_SF1.md).",
        "",
        "```json",
        json.dumps({"sf_dir": SF_DIR, "results": results}),
        "```",
    ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ANN_FRONTIER.md",
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
