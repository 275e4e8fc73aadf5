"""Deduplication operators for LLM training-data pipelines
(SURVEY.md §2.3 E3–E5; north-star "dedup" surface).

Five families, each scale-designed:

- **Exact** (`dedup_exact`, `duplicate_groups`): hash-groupBy on a key.
  One shuffle on the dedup key; AQE handles skew.
- **Exact Jaccard pair join** (`near_dup_pairs_jaccard`): *inverted-index*
  self-join on shingles — NOT an O(n²) cross join. Each shingle is a join
  key; pairs sharing no shingle are never materialized. At 100 TB the only
  hazard is ultra-frequent shingles (hot join keys) — cap them with
  ``max_shingle_df`` (standard practice: a shingle in >X% of docs carries
  no dedup signal).
- **MinHash + LSH banding** (`minhash_signatures`, `lsh_candidate_pairs`,
  `near_dedup_minhash`): signatures/candidates/verification with JVM
  built-ins only (xxhash64 / array_min / transform) — no Python in the
  per-document hot path. Banding turns near-dup detection into an
  equi-join on (band, band_hash): linear shuffle, no pairwise work
  outside candidate buckets. Component resolution over the (tiny)
  verified dup-pair edge set is a size-gated hybrid: driver union-find
  under the gate, distributed pointer-jumping label propagation above it.
- **SimHash** (`simhash`, `near_dup_pairs_simhash`): 64-bit signature via
  bit-vote aggregation, Hamming-≤τ candidate pairs via the pigeonhole band
  trick (τ+1 bands ⇒ near pairs share ≥1 exact band) — again equi-joins.
- **Embedding cosine** (`near_dup_pairs_cosine`): exact upper-triangle
  pair scan for oracle-checkable correctness; at scale route through the
  LSH index (index/ann.py) to generate candidates first.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import jaccard, word_shingles
from ..functions.vector import cosine_similarity

# --------------------------------------------------------------------- #
# exact
# --------------------------------------------------------------------- #

def dedup_exact(df: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    """Keep one representative row per distinct ``keys`` — the row with the
    smallest ``id_col`` (deterministic, unlike ``dropDuplicates`` which
    keeps an arbitrary first row). Single hash-shuffle on ``keys``."""
    w_min = df.groupBy(*keys).agg(F.min(id_col).alias(id_col))
    return df.join(w_min, on=keys + [id_col], how="inner")


def duplicate_groups(
    df: DataFrame, key: Column, id_col: str, min_size: int = 2
) -> DataFrame:
    """Groups of rows sharing a dedup key: (dup_key, rep_id, dup_count)."""
    return (
        df.select(key.alias("dup_key"), F.col(id_col))
        .groupBy("dup_key")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count("*").alias("dup_count"),
        )
        .filter(F.col("dup_count") >= min_size)
    )


def dedup_keep_best(
    df: DataFrame,
    key: Column,
    id_col: str,
    score: Column,
) -> DataFrame:
    """Quality-aware exact dedup: one representative per dedup key — the
    row with the HIGHEST ``score`` (min ``id_col`` tie-break), not the
    arbitrary first row ``dropDuplicates`` keeps nor the min-id row
    ``dedup_exact`` keeps. This is the production dedup policy of
    curation stacks: when a page was crawled five times, keep the
    highest-quality capture.

    One shuffle on the dedup key via a single ``max_by``-style struct
    aggregate (map-side partial agg applies): argmax = max over
    (score, −id) structs, so the whole selection is one associative
    aggregate — no window, no self-join, no second shuffle.

    Returns (dup_key, best_id, dup_count, best_score).
    """
    return (
        df.select(key.alias("dup_key"), F.col(id_col), score.alias("__s"))
        .groupBy("dup_key")
        .agg(
            F.max(
                F.struct(F.col("__s").alias("s"), (-F.col(id_col)).alias("ni"))
            ).alias("__best"),
            F.count("*").alias("dup_count"),
        )
        .select(
            "dup_key",
            (-F.col("__best.ni")).alias("best_id"),
            "dup_count",
            F.col("__best.s").alias("best_score"),
        )
    )


# --------------------------------------------------------------------- #
# exact Jaccard via inverted index (no cross join)
# --------------------------------------------------------------------- #

def near_dup_pairs_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.7,
    max_shingle_df: int | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """Exact n-gram-shingle Jaccard pairs ≥ threshold.

    Algorithm: shingle → explode → self-equi-join on shingle → count shared
    shingles per pair → |A∩B| / (|A|+|B|−|A∩B|). The join is keyed on the
    shingle value, so cost is Σ df(s)² over shingles, not n² — with
    ``max_shingle_df`` bounding the quadratic term for stop-shingles.

    ``prefix_filter=True`` switches to the PPJoin-style LOSSLESS
    candidate pass (Xiao et al., WWW'08): order every document's
    shingles by ascending global document frequency and self-join only
    on each document's first ``|A| − ⌊t·|A|⌋ + 1`` shingles — if
    J(A,B) ≥ t then |A∩B| ≥ t·max(|A|,|B|), so the first shared shingle
    (in the global order) must fall inside BOTH prefixes; the join
    therefore finds every qualifying pair, and an exact
    ``array_intersect`` verify computes the same Jaccard as the full
    join. Because prefixes preferentially keep RARE shingles, the join
    cost drops from Σ df(s)² to Σ df_prefix(s)² — the dominant term at
    100 TB. Identical output by construction (pytest-pinned).

    Returns (id_a, id_b, jac) with id_a < id_b.
    """
    sh = df.select(
        F.col(id_col).alias("__id"),
        word_shingles(text_col, n=n).alias("__sh"),
    ).withColumn("__sz", F.size("__sh"))
    # Join on the 64-bit hash of the shingle, not the string: the exploded
    # inverted index is the dominant shuffle, and 8-byte keys shrink it and
    # make the join compares cheap. An xxhash64 collision would merge two
    # shingles (P ≈ |shingles|²/2⁶⁴ — negligible, and validated against the
    # string-keyed DuckDB oracle).
    ex = sh.select(
        "__id",
        "__sz",
        F.explode(F.transform("__sh", lambda s: F.xxhash64(s))).alias("__s"),
    )
    if max_shingle_df is not None:
        freq = ex.groupBy("__s").agg(F.count("*").alias("__df"))
        ex = ex.join(
            F.broadcast(freq.filter(F.col("__df") <= max_shingle_df).select("__s")),
            "__s",
        )
    # materialize the (small) inverted index once — as a lazy input to
    # the frequency aggregate + frequency join (prefix tier) or to both
    # shuffle-map stages of the self-join (baseline tier), the shingle +
    # hash pass over every document would otherwise run twice (r9: the
    # checkpoint now precedes the prefix branch too — measured ~0.9 s
    # of duplicated shingling per ppjoin-tier row at sf0.1)
    ex = ex.localCheckpoint(eager=True)
    if prefix_filter:
        return _jaccard_prefix_filtered(ex, threshold)
    a, b = ex.alias("a"), ex.alias("b")
    # Length-ratio pruning inside the join: jac(A,B) ≥ t ⟹
    # min(|A|,|B|) ≥ t·max(|A|,|B|). Evaluated per matched row before the
    # pair ever reaches the aggregation shuffle.
    ratio_ok = F.least(F.col("a.__sz"), F.col("b.__sz")) >= F.lit(
        threshold
    ) * F.greatest(F.col("a.__sz"), F.col("b.__sz"))
    shared = (
        a.join(
            b,
            (F.col("a.__s") == F.col("b.__s"))
            & (F.col("a.__id") < F.col("b.__id"))
            & ratio_ok,
        )
        .groupBy(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sz").alias("sz_a"),
            F.col("b.__sz").alias("sz_b"),
        )
        .agg(F.count("*").alias("shared"))
    )
    jac = F.col("shared").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("shared")
    ).cast("double")
    return (
        shared.select("id_a", "id_b", jac.alias("jac"))
        .filter(F.col("jac") >= threshold)
    )


def _jaccard_prefix_filtered(ex: DataFrame, threshold: float) -> DataFrame:
    """The PPJoin candidate pass over an exploded (id, size, shingle-
    hash) inverted index: df-ascending per-doc order, prefix-prefix
    equi-join, exact set-intersection verify.

    Losslessness: J(A,B) ≥ t ⟹ |A∩B| ≥ t·|A∪B| ≥ t·max(|A|,|B|), so in
    the global order at most |A| − ⌈t·|A|⌉ elements of A precede the
    first shared shingle — it lies inside A's (and symmetrically B's)
    prefix. ⌊t·|A|⌋ + 1 ≥ ⌈t·|A|⌉ keeps the prefix a superset under
    float rounding (a longer prefix can only ADD candidates).

    Scale shape: the frequency join is a SHUFFLE_HASH on the shingle
    key (vocab-sized side, never broadcast); per-doc ordering is a
    row-local array sort; the candidate join touches only prefix
    postings (rare shingles — Σ df_prefix(s)²); the verify joins the
    candidate pair ids back to the per-doc sorted sets and intersects
    row-locally."""
    freq = ex.groupBy("__s").agg(F.count("*").alias("__df"))
    exf = ex.join(freq.hint("SHUFFLE_HASH"), "__s")
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("__df"), F.col("__s")))
    )
    per_doc = (
        exf.groupBy("__id", "__sz")
        .agg(ordered.alias("__ord"))
        .select(
            "__id",
            "__sz",
            F.transform("__ord", lambda x: x["__s"]).alias("__set"),
            F.slice(
                F.transform("__ord", lambda x: x["__s"]),
                1,
                F.col("__sz")
                - F.floor(F.lit(threshold) * F.col("__sz")).cast("int")
                + 1,
            ).alias("__prefix"),
        )
        .localCheckpoint(eager=True)  # read by the candidate pass (×2)
        # and the verify fetch — segmented once
    )
    pre = per_doc.select(
        "__id", "__sz", F.explode("__prefix").alias("__p")
    )
    a, b = pre.alias("a"), pre.alias("b")
    ratio_ok = F.least(F.col("a.__sz"), F.col("b.__sz")) >= F.lit(
        threshold
    ) * F.greatest(F.col("a.__sz"), F.col("b.__sz"))
    cand = (
        a.join(
            b,
            (F.col("a.__p") == F.col("b.__p"))
            & (F.col("a.__id") < F.col("b.__id"))
            & ratio_ok,
        )
        .select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")
        )
        .distinct()
    )
    fa = per_doc.select(
        F.col("__id").alias("id_a"),
        F.col("__sz").alias("sz_a"),
        F.col("__set").alias("set_a"),
    )
    fb = per_doc.select(
        F.col("__id").alias("id_b"),
        F.col("__sz").alias("sz_b"),
        F.col("__set").alias("set_b"),
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    jac = inter.cast("double") / (
        F.col("sz_a") + F.col("sz_b") - inter
    ).cast("double")
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .select("id_a", "id_b", jac.alias("jac"))
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b", "jac")
    )


# --------------------------------------------------------------------- #
# MinHash + LSH banding (native, JVM built-ins only)
# --------------------------------------------------------------------- #

def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """(id, shingles: array<bigint> of xxhash64'd shingles, sig:
    array<bigint>[num_hashes]).

    Shingles are carried as their 64-bit hashes, not strings: downstream
    exact-Jaccard verification joins and set ops then compare 8-byte longs,
    and the materialized signature table shrinks by the full n-gram text
    (collision risk |shingles|²/2⁶⁴ — the same argument validated against
    the string-keyed oracle in ``near_dup_pairs_jaccard``).

    Hash family: h_i(s) = xxhash64(i, xxhash64(s)) — independent seeds via
    the first argument. All num_hashes minima are maintained in a SINGLE
    ``aggregate`` fold over the hashed-shingle array (acc = running-min
    vector, zip_with+least), so the shingle expression is evaluated once
    per row — not once per hash. (The naive
    ``array(array_min(transform(sh,…)) × N)`` form duplicates the whole
    shingling subtree N times after projection collapse: measured 15×
    slower at sf0.1.) One pass over the corpus, no shuffle, no Python.
    """
    hsh = F.transform(word_shingles(text_col, n=n), lambda s: F.xxhash64(s))
    max_long = (1 << 63) - 1
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    sig = F.aggregate(
        hsh,
        F.array_repeat(F.lit(max_long), num_hashes),
        lambda acc, s: F.zip_with(
            acc,
            F.transform(seeds, lambda i: F.xxhash64(i, s)),
            lambda x, y: F.least(x, y),
        ),
    )
    return df.select(
        F.col(id_col).alias("id"),
        hsh.alias("shingles"),
        sig.alias("sig"),
    )


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Candidate (id_a, id_b) pairs sharing ≥1 LSH band.

    Explode each signature into ``bands`` (band_idx, band_hash) keys and
    self-equi-join — the shuffle is keyed on band hashes (linear in corpus
    size), which is what makes MinHash dedup tractable at 100 TB.
    """
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bh")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def _union_find_components(pairs) -> list[tuple]:
    """Driver-side union-find (path compression + union by attaching the
    larger root under the smaller): (id, min-id-of-component) rows for
    every node that occurs in an edge. O(E·α(E)) — microseconds for the
    edge volumes this is gated to."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # attach under the smaller root → roots ARE component minima
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    nodes = set()
    for a, b in pairs:
        nodes.add(a)
        nodes.add(b)
    return [(x, find(x)) for x in sorted(nodes)]


def near_dedup_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    max_iter: int = 32,
    driver_cc_max_edges: int = 5_000_000,
) -> DataFrame:
    """Full near-dedup: MinHash LSH candidates → exact Jaccard verify →
    connected components → (id, rep_id). rep_id = min id in the component.

    Connected components are resolved by a size-gated hybrid. The verified
    edge set is the corpus's *duplicate pairs* — orders of magnitude
    smaller than the corpus itself (the corpus is never collected). When
    it fits comfortably on the driver (≤ ``driver_cc_max_edges``, default
    5M ≈ 80 MB), union-find resolves components in one collect + O(E·α)
    — replacing an iterative sequence of distributed jobs whose per-job
    scheduling overhead dominates at small edge counts. Past the gate
    (e.g. billions of dup pairs at 100 TB) the operator automatically
    stays fully distributed: min-label propagation WITH pointer jumping
    (path halving: after each neighbor-min pass, rep ← rep[rep]), so the
    label's reach roughly doubles per round and the loop exits as soon as
    a round changes no label. ``max_iter`` is only the adversarial upper
    bound for the distributed path; 2^max_iter exceeds any practical
    chain length. Both paths produce identical labels (pytest-asserted)."""
    sigs = minhash_signatures(
        df, id_col, text_col, n=n, num_hashes=num_hashes
    ).localCheckpoint(eager=True)  # referenced 4x below (cand a/b, verify a/b)
    cand = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=num_hashes // bands)
    sh = sigs.select("id", "shingles")
    verified = (
        cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .withColumn("jac", jaccard("sh_a", "sh_b"))
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)  # read 1-3x below (count, collect | union)
    )
    return resolve_components(
        sigs.select("id"),
        verified,
        driver_cc_max_edges=driver_cc_max_edges,
        max_iter=max_iter,
    )


def resolve_components(
    ids: DataFrame,
    verified: DataFrame,
    driver_cc_max_edges: int = 5_000_000,
    max_iter: int = 32,
) -> DataFrame:
    """Connected-component labeling shared by the near-dedup family:
    (id, rep_id) for every row of ``ids`` (single-column ``id``), where
    rep_id = min id of the component under the ``verified`` (id_a, id_b)
    edge set; edge-free ids label themselves.

    Size-gated hybrid (see near_dedup_minhash for the rationale): driver
    union-find while the edge set fits (it is the corpus's *duplicate
    pairs*, not the corpus), else distributed min-label propagation with
    pointer jumping. ``verified`` should already be materialized
    (localCheckpoint) — it is read 1-3x."""
    sigs = ids
    id_type = sigs.schema["id"].dataType
    # size gate folded into the collect: fetch at most gate+1 edges in one
    # job — if the limit isn't hit we already hold the whole edge set, so
    # a separate count() job (scheduling + a second pass over the
    # checkpointed edges) never runs. Past the gate the partial fetch is
    # discarded and the operator stays fully distributed.
    probe = verified.limit(driver_cc_max_edges + 1).collect()
    if len(probe) <= driver_cc_max_edges:
        rows = _union_find_components([(r[0], r[1]) for r in probe])
        spark = ids.sparkSession
        labels = spark.createDataFrame(
            rows,
            T.StructType(
                [
                    T.StructField("id", id_type),
                    T.StructField("rep_id", id_type),
                ]
            ),
        )
        return (
            sigs.select("id")
            .join(F.broadcast(labels.withColumnRenamed("rep_id", "__rep")), "id", "left")
            .select("id", F.coalesce("__rep", F.col("id")).alias("rep_id"))
        )
    # undirected edges both ways for label propagation
    edges = verified.union(
        verified.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    # propagate ONLY over nodes that occur in a verified edge — everything
    # else is trivially its own representative. At scale this shrinks the
    # per-iteration joins from |corpus| to |dup-involved nodes| (usually
    # orders of magnitude smaller).
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("id_a").alias("id")).distinct()
        .withColumn("rep_id", F.col("id"))
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        prev = labels
        neigh = (
            edges.join(labels, edges.id_b == labels.id)
            .groupBy("id_a")
            .agg(F.min("rep_id").alias("n_rep"))
        )
        stepped = labels.join(neigh, labels.id == neigh.id_a, "left").select(
            "id",
            F.least(
                F.col("rep_id"), F.coalesce(F.col("n_rep"), F.col("rep_id"))
            ).alias("rep_id"),
        )
        # pointer jump (path halving): rep ← min(rep, rep[rep]). Every
        # label-set node is an edge endpoint, so rep[rep] always resolves;
        # this squares pointer paths and gives log-round convergence.
        hop = stepped.select(
            F.col("id").alias("__rid"), F.col("rep_id").alias("__rrep")
        )
        labels = (
            stepped.join(hop, stepped.rep_id == hop.__rid, "left")
            .select(
                "id",
                F.least(
                    F.col("rep_id"),
                    F.coalesce(F.col("__rrep"), F.col("rep_id")),
                ).alias("rep_id"),
            )
            # each iteration references `labels` multiple times — without
            # truncating lineage the plan doubles per round (2^iters
            # subtrees). The label set is tiny (dup-involved nodes only),
            # so an eager materialization per round is the scalable shape.
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.alias("new")
            .join(prev.alias("old"), F.col("new.id") == F.col("old.id"))
            .filter(F.col("new.rep_id") != F.col("old.rep_id"))
            .limit(1)
            .count()
        )
        if changed == 0:
            break
    return (
        sigs.select("id")
        .join(labels.withColumnRenamed("rep_id", "__rep"), "id", "left")
        .select("id", F.coalesce("__rep", F.col("id")).alias("rep_id"))
    )



# --------------------------------------------------------------------- #
# SimHash
# --------------------------------------------------------------------- #

# bit-b weight for packing a vote vector into one int64; bit 63 is the
# sign bit, so its weight is MIN_LONG (two's complement — summing each
# weight at most once reconstructs the exact bit pattern, no overflow UB)
_BIT_WEIGHTS = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def simhash_packed(
    text_col: Column | str, token_fn=None, hash_fn: str = "xxhash64"
) -> Column:
    """64-bit SimHash of a document as ONE BIGINT.

    Classic Charikar construction: each token votes ±1 on each bit of
    its 64-bit hash; the signature bit is the vote sign (bit b of the
    long = 1 iff votes[b] > 0). A single ``aggregate`` fold over the
    pre-hashed token array — columnar, no explode, no shuffle, no UDF —
    and the packed representation makes downstream Hamming math
    `bit_count(a XOR b)`.

    ``hash_fn``: ``'xxhash64'`` (default — fastest, JVM-internal, the
    production tier) or ``'md5'`` — token bits come from the first 16
    hex digits of ``md5(token)`` (bit b = bit b%4 of digit b//4), a
    hash every engine computes identically, which makes the WHOLE
    simhash→Hamming pipeline replayable in a SQL oracle (the same
    auditable-twin pattern as ``deterministic_sample_md5`` vs the
    xxhash64 sampler).
    """
    from ..functions.text import tokenize

    toks = (token_fn or tokenize)(text_col)
    zeros = F.array_repeat(F.lit(0), 64)
    if hash_fn == "xxhash64":
        # hash each token ONCE up front: with xxhash64(w) inside the
        # per-bit lambda the interpreted HOF evaluator recomputes it
        # 64x per token
        hashes = F.transform(toks, lambda w: F.xxhash64(w))
        votes = F.aggregate(
            hashes,
            zeros,
            lambda acc, h: F.zip_with(
                acc,
                F.transform(
                    F.sequence(F.lit(0), F.lit(63)),
                    lambda b: F.when(F.getbit(h, b) == 1, 1).otherwise(-1),
                ),
                lambda x, y: x + y,
            ),
        )
    elif hash_fn == "md5":
        # per-token 64-bit array, LSB-first: 16 hex digits -> 4 bits
        # each (digit value via conv here, instr('0123..f') in the SQL
        # oracle — identical small ints either way)
        def bits64(w: Column) -> Column:
            digits = F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda i: F.conv(F.substring(F.md5(w), i, 1), 16, 10)
                .cast("int"),
            )
            return F.flatten(
                F.transform(
                    digits,
                    lambda d: F.array(
                        *[
                            F.when(
                                d.bitwiseAND(F.lit(1 << k)) > 0, 1
                            ).otherwise(-1)
                            for k in range(4)
                        ]
                    ),
                )
            )

        tokbits = F.transform(toks, bits64)
        votes = F.aggregate(
            tokbits,
            zeros,
            lambda acc, bits: F.zip_with(acc, bits, lambda x, y: x + y),
        )
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    weights = F.array(*[F.lit(w).cast("long") for w in _BIT_WEIGHTS])
    return F.aggregate(
        F.zip_with(
            votes,
            weights,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda x, y: x + y,
    )


def simhash(text_col: Column | str, token_fn=None) -> Column:
    """64-bit SimHash as a 64-char bitstring, LSB first (char i = bit i of
    ``simhash_packed``). Kept as the human-readable/API form; internally
    everything operates on the packed long."""
    packed = simhash_packed(text_col, token_fn)
    return F.reverse(F.lpad(F.bin(packed), 64, "0"))


def hamming_bits(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two packed int64 signatures."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.bit_count(a.bitwiseXOR(b))


def near_dup_pairs_simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id_a, id_b, hamming ≤ max_hamming) via the pigeonhole band trick:
    split the 64-bit signature into max_hamming+1 bit blocks; any pair
    within distance τ agrees exactly on ≥1 block, so candidates come from
    equi-joins on (block-idx, block-bits) — never a cross join. All
    integer ops: block extract = shift+mask, verify = bit_count(XOR)."""
    blocks = max_hamming + 1
    width = 64 // blocks
    sigs = df.select(
        F.col(id_col).alias("id"),
        simhash_packed(text_col, hash_fn=hash_fn).alias("sig"),
    ).localCheckpoint(eager=True)  # both self-join sides read it
    def block_bits(i: int) -> Column:
        w = width if i < blocks - 1 else 64 - i * width
        shifted = F.shiftrightunsigned("sig", i * width)
        if i == blocks - 1:
            return shifted  # top block: unsigned shift already masks
        return shifted.bitwiseAND(F.lit((1 << w) - 1))
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"), block_bits(i).alias("bv")
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.blk", "bk.bv")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", hamming_bits("sig_a", "sig_b"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------------- #
# embedding cosine near-dup
# --------------------------------------------------------------------- #

def near_dup_pairs_cosine(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    ann_index=None,
) -> DataFrame:
    """Cosine near-dup pairs (id_a < id_b, cos ≥ threshold).

    Default tier is oracle-exact: an upper-triangle pair scan — O(n²) by
    definition of the exact problem. Pass ``ann_index`` (an
    ``index.ann.CosineLSHIndex`` built over the SAME df/id/vector
    columns) to generate candidates from banded-signature equi-joins and
    exact-verify only those — the 100 TB tier: shuffle on bucket keys,
    never all-pairs. Output schema identical; completeness follows LSH
    collision probability at the threshold (pytest pins recall on
    duplicate-grade fixtures).
    """
    if ann_index is not None:
        if (
            ann_index.key != id_col
            or ann_index.vector_col != vec_col
        ):
            raise ValueError(
                "ann_index was built over "
                f"({ann_index.key!r}, {ann_index.vector_col!r}); "
                f"expected ({id_col!r}, {vec_col!r})"
            )
        return ann_index.similarity_self_join(threshold)
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_similarity("__va", "__vb"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# --------------------------------------------------------------------- #
# semantic (embedding-space) dedup — SemDeDup-style cluster scoping
# --------------------------------------------------------------------- #


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    nlist: int | None = None,
    replication: int = 2,
    driver_cc_max_edges: int = 5_000_000,
    seed: int = 42,
    hamming_prefilter: bool | str = "auto",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): drop semantic duplicates — documents
    whose EMBEDDINGS are near-identical even when their text is not —
    by clustering the corpus and comparing only within clusters.

    (id, rep_id) labeling: rep_id = min id of the duplicate component
    under cos ≥ ``threshold``; unique docs label themselves. Keep one row
    per rep_id to materialize the deduped corpus.

    Scale shape: the coarse quantizer trains on a bounded sample
    (index.ann.IVFIndex); candidate pairs are *within-cell* self-joins,
    so pair count is Σ|cell|² instead of n² — the SemDeDup argument.
    ``replication`` > 1 stores boundary vectors in their runner-up cells
    too, so high-cosine pairs (which sit close on the sphere and thus
    share cells with high probability at a duplicate-grade threshold)
    are not lost to a cell boundary. ``nlist=None`` (default) scales the
    cell count with the corpus (n/256, floor 16) so cells — and with
    them the Σ|cell|² pair bound per row — stay constant-sized as data
    grows. Exact cosine verifies every
    candidate; components resolve via the shared size-gated machinery
    (``resolve_components``).
    """
    from ..index.ann import IVFIndex

    if nlist is None:
        # Σ|cell|² is the pair bound, so nlist must GROW with the corpus
        # to keep cells constant-sized (~256 rows ⇒ pair work ≈ 256·n,
        # linear) — a fixed nlist goes quadratic (the round-4 sf1 smoke
        # measured the pinned 16-cell configuration at ~77x the
        # 10x-smaller corpus's time). Explicit nlist remains for oracle
        # replay and tests.
        nlist = max(16, df.count() // 256)
    ivf = IVFIndex(
        df,
        key=id_col,
        vector_col=vec_col,
        nlist=nlist,
        replication=replication,
        seed=seed,
    )
    a = ivf.assigned.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "centroid_id"
    )
    b = ivf.assigned.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "centroid_id"
    )
    # The expensive stage is the per-CANDIDATE exact cosine: array HOFs
    # evaluate at ~30 us/pair (measured — zip_with/aggregate do not
    # whole-stage-codegen, and a fully unrolled element_at sum is no
    # better), so Σ|cell|² candidates at 20k vectors already cost ~5
    # minutes. The scale shape is therefore: never run the float verify
    # on the raw candidate volume. Each row packs its sign bits ONCE
    # map-side (E72's sign_words_expr — |rows| HOF evaluations, not
    # |pairs|); the candidate join carries (id, cell, 2 ints) instead of
    # (id, cell, vector); the per-pair test is an unrolled
    # bit_count(XOR) — pure codegen integer ops — and only the tiny
    # survivor set fetches vectors back by id for the exact cosine.
    #
    # The Hamming gate is a PROBABILISTIC superset filter over RANDOM
    # PROJECTION signs: for a seeded gaussian plane r, P[sign(r·a) ≠
    # sign(r·b)] = θ/π exactly, for ANY pair — the sign-LSH guarantee.
    # (Raw COORDINATE signs would not do: a coordinate sitting at 0.0
    # in one near-duplicate and 0.001 in the other flips its bit while
    # contributing nothing to the angle, so adversarially sparse
    # vectors could exceed any radius — pytest pins exactly that
    # geometry.) With 64 planes, flips ~ Binomial(64, θ/π); τ = 2.5x
    # the mean + 8 puts the miss probability per true pair below
    # ~1e-10 at duplicate-grade thresholds, while a random non-pair
    # (mean 32 flips) passes with ~1e-2 odds — the gate prunes ~99% of
    # false candidates for free. hamming_prefilter=False restores the
    # exhaustive verify; the final cosine filter is exact either way,
    # so false candidates never pass.
    row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    dim = int(row[0]["d"]) if row else 1
    if hamming_prefilter == "auto":
        # size-gated hybrid (the resolve_components convention): below
        # the gate the exhaustive verify is cheaper than the gate's
        # fixed costs (python-worker spawn + two fetch joins); above it
        # the candidate volume dominates everything and the gate wins
        # by orders of magnitude (25s vs 327s at 20k vectors).
        hamming_prefilter = df.count() > 10_000
    if hamming_prefilter:
        import math

        import numpy as np

        n_planes = 64
        theta = math.acos(min(1.0, max(-1.0, threshold)))
        tau = min(
            n_planes,
            int(math.ceil(n_planes * theta / math.pi * 2.5)) + 8,
        )
        n_words = (n_planes + 31) // 32
        planes = np.random.default_rng(seed).standard_normal(
            (n_planes, dim)
        )

        # The projection-sign packing is a map-only per-ROW stage (it
        # runs |rows| times, never |pairs|), and expressing 64 plane
        # dots as column expressions costs more in plan compilation
        # (a ~4k-literal tree) than the data itself — the measured
        # fixture overhead was ~4 s of driver/interpreter time. An
        # Arrow-batched pandas UDF does the whole batch as one numpy
        # matmul; the words never face an oracle (gate only — the
        # final cosine filter is exact), so numpy's summation order is
        # immaterial.
        from pyspark.sql.functions import pandas_udf

        planes_t = planes.T  # (dim, n_planes)

        @pandas_udf("array<long>")
        def _proj_words(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for series in it:
                X = np.stack(series.to_numpy())  # (batch, dim)
                bits = (X @ planes_t) > 0  # (batch, n_planes)
                words = np.zeros((len(X), n_words), dtype=np.int64)
                for k in range(n_planes):
                    words[:, k // 32] |= bits[:, k].astype(np.int64) << (
                        k % 32
                    )
                yield pd.Series(list(words))

        light = ivf.assigned.select(
            F.col(id_col).alias("id"),
            "centroid_id",
            _proj_words(F.col(vec_col)).alias("__w"),
        )
        la = light.select(
            F.col("id").alias("id_a"), "centroid_id",
            F.col("__w").alias("__wa"),
        )
        lb = light.select(
            F.col("id").alias("id_b"), "centroid_id",
            F.col("__w").alias("__wb"),
        )
        ham = None
        for j in range(1, n_words + 1):
            term = F.bit_count(
                F.element_at("__wa", j).bitwiseXOR(F.element_at("__wb", j))
            )
            ham = term if ham is None else ham + term
        cand = (
            la.join(lb, "centroid_id")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(ham <= F.lit(tau))
            .select("id_a", "id_b")
            .distinct()  # replicated vectors can meet in two cells
        )
        fa = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
        fb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
        verified = (
            cand.join(fa, "id_a")
            .join(fb, "id_b")
            .filter(cosine_similarity("__va", "__vb") >= threshold)
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
    else:
        verified = (
            a.join(b, "centroid_id")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(cosine_similarity("__va", "__vb") >= threshold)
            .select("id_a", "id_b")
            .distinct()
            .localCheckpoint(eager=True)
        )
    ids = df.select(F.col(id_col).alias("id"))
    return resolve_components(
        ids, verified, driver_cc_max_edges=driver_cc_max_edges
    )


# --------------------------------------------------------------------- #
# cross-doc segment dedup (line-level dedup with reassembly)
# --------------------------------------------------------------------- #


def segment_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seg_len: int = 8,
    max_df: int = 2,
) -> DataFrame:
    """Cross-document segment-level dedup with reassembly — the
    CCNet/RefinedWeb "line dedup" pass: a segment (here a fixed run of
    ``seg_len`` tokens, standing in for a newline-delimited line, which
    the fixture corpus lacks) that appears in more than ``max_df``
    DISTINCT documents is boilerplate and is removed from every document
    it appears in; the surviving segments are re-joined in their
    original order. This is the *removal* complement of the cross-doc
    boilerplate *detector* (textstats.cross_doc_boilerplate): that one
    reports, this one rewrites the corpus.

    Scale shape: segmentation is a row-local HOF projection (no
    explode-then-window); the document-frequency table shuffles once on
    the segment key with map-side partial aggregation; the join back is
    a segment-key SHUFFLE_HASH join (the frequency side is
    segment-vocabulary-sized — potentially corpus-scale, so it is never
    broadcast); reassembly is one groupBy on the doc id whose
    ``collect_list`` is bounded by the document's own length (row-local
    sort, no window). Two key shuffles total, both AQE-skew-handled. At
    100 TB the segment join key would be ``xxhash64(seg)`` (8 bytes)
    rather than the segment text; the string key is kept here so the
    DuckDB oracle can replay the grouping byte-for-byte.

    Note on prefix filtering: PPJoin's Σ df_prefix² bound applies to
    pairwise similarity candidate JOINS; this operator has no pair join
    anywhere — segments join back to the vocabulary-sized frequency
    table directly (cost Σ df(s), linear in postings, not Σ df²), so
    there is no quadratic term for a prefix filter to cut.

    Returns one row per non-empty document:
    ``(doc id, n_segs, n_kept, clean_md5)`` where ``clean_md5`` is the
    md5 of the reassembled (space-joined) surviving text — a
    content-addressed handle for the rewritten corpus.
    """
    from ..functions.text import tokenize

    ws = tokenize(text_col)
    n_seg = F.ceil(F.size(ws) / F.lit(seg_len)).cast("int")
    segs = F.when(
        F.size(ws) > 0,
        F.transform(
            F.sequence(F.lit(0), n_seg - 1),
            lambda i: F.concat_ws(
                " ", F.slice(ws, i * seg_len + 1, seg_len)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = df.select(
        F.col(id_col).alias("__id"), F.posexplode(segs).alias("idx", "seg")
    ).localCheckpoint(eager=True)  # feeds BOTH the doc-frequency count
    # and the join back — materialized once so the corpus isn't
    # re-scanned and re-segmented (the cross_doc_boilerplate convention)
    dfreq = exploded.groupBy("seg").agg(
        F.count_distinct("__id").alias("__df")
    )
    joined = exploded.join(dfreq.hint("SHUFFLE_HASH"), "seg").select(
        "__id",
        F.struct(
            F.col("idx"),
            F.col("seg"),
            (F.col("__df") <= max_df).alias("kept"),
        ).alias("__s"),
    )
    a = F.array_sort(F.collect_list("__s"))
    kept = F.filter(a, lambda x: x["kept"])
    return (
        joined.groupBy("__id")
        .agg(
            F.size(a).alias("n_segs"),
            F.size(kept).alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(kept, lambda x: x["seg"]), " "
                )
            ).alias("clean_md5"),
        )
        .withColumnRenamed("__id", id_col)
    )


def incremental_dedup(
    history: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Incremental ingest dedup — classify each NEW-batch document
    against the already-ingested corpus (the daily-crawl shape: the
    corpus-wide operators above re-scan everything; a pipeline ingesting
    a new slice must not). Statuses:

    - ``history_dup``: content hash already exists in the history;
    - ``batch_dup``: first occurrence is inside this batch but an
      earlier batch row (smaller id) has the same hash;
    - ``novel``: first occurrence anywhere.

    Scale shape: the batch's distinct hash set is BROADCAST against the
    history scan (a batch is bounded — hours of crawl — while history is
    the 100 TB side, which therefore never shuffles and is touched by
    exactly one map-side semi-join pass); the within-batch first-
    occurrence is an argmin aggregate on the batch only. No window over
    history, no history shuffle.
    """
    # NULL text hashes as the empty string: a NULL md5 key would silently
    # drop the row from the equi-joins, losing the document's status
    bh = batch.select(
        F.col(id_col).alias("__bid"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__h"),
    )
    batch_hashes = bh.select("__h").distinct()
    hits = (
        history.select(
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__h")
        )
        .join(F.broadcast(batch_hashes), "__h", "left_semi")
        .distinct()
        .withColumn("__in_hist", F.lit(True))
    )
    first_in_batch = bh.groupBy("__h").agg(F.min("__bid").alias("__first"))
    return (
        bh.join(F.broadcast(first_in_batch), "__h")
        .join(F.broadcast(hits), "__h", "left")
        .select(
            F.col("__bid").alias(id_col),
            F.when(F.col("__in_hist").isNotNull(), F.lit("history_dup"))
            .when(F.col("__bid") > F.col("__first"), F.lit("batch_dup"))
            .otherwise(F.lit("novel"))
            .alias("status"),
        )
    )


def exact_substring_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """Exact-substring dedup with span REMOVAL (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): any
    ≥ ``k``-token run that appears verbatim in MORE THAN ONE document is
    duplicated text; every token position covered by such a run is cut
    from every document carrying it, and the survivors re-join in
    order. Two docs share a ≥k-token substring iff they share a k-gram,
    so k-gram postings are a complete witness set — the suffix-array
    machinery of the paper is an optimization for single-machine RAM,
    not a semantic requirement.

    Differs from segment_dedup (fixed non-overlapping segments ≈ line
    dedup): spans here are OVERLAPPING k-grams, so coverage is exact to
    the token — a duplicated sentence is removed wherever it starts.

    Scale shape: gram postings explode once (row-local positional HOF);
    the duplicated-gram set is one gram-key groupBy (map-side partials)
    joined back via SHUFFLE_HASH (gram vocabulary is corpus-scale —
    never broadcast); coverage expansion explodes k rows per DUPLICATED
    gram only (bounded by dup density, not corpus); reassembly is one
    doc-key groupBy + a row-local positional filter. Grams join on
    xxhash64 keys (8-byte shuffle; collision P ≈ |grams|²/2⁶⁴ —
    negligible, and validated against the string-keyed oracle).

    Returns one row per document:
    ``(id, n_tokens, n_covered, clean_md5)``.
    """
    from ..functions.text import tokenize

    ws = tokenize(text_col)
    grams = F.when(
        F.size(ws) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - k),
            lambda i: F.struct(
                i.alias("pos"),
                F.xxhash64(F.concat_ws(" ", F.slice(ws, i + 1, k))).alias(
                    "g"
                ),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,g:bigint>>"))
    pos_df = (
        df.select(F.col(id_col).alias("__id"), F.explode(grams).alias("pg"))
        .select("__id", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))
        .localCheckpoint(eager=True)  # feeds the dup-gram count AND the
        # coverage join — grams computed once
    )
    dupg = (
        pos_df.groupBy("g")
        .agg(F.count_distinct("__id").alias("__dfc"))
        .filter(F.col("__dfc") >= 2)
        .select("g")
    )
    covered = (
        pos_df.join(dupg.hint("SHUFFLE_HASH"), "g")
        .select(
            "__id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("cp"),
        )
        .groupBy("__id")
        .agg(F.sort_array(F.collect_set("cp")).alias("__cov"))
    )
    base = df.select(
        F.col(id_col).alias("__id"), ws.alias("__ws")
    )
    cov = F.coalesce(F.col("__cov"), F.array().cast("array<int>"))
    # array_except builds its lookup set ONCE per row → O(n + |cov|);
    # a per-token array_contains scan would be O(n·|cov|), which stalls
    # a task on a heavily-duplicated long document. sequence order is
    # preserved, so kept positions stay ascending.
    kept_pos = F.when(
        F.size("__ws") > 0,
        F.array_except(
            F.sequence(F.lit(0), F.size("__ws") - 1).cast("array<int>"),
            cov,
        ),
    ).otherwise(F.array().cast("array<int>"))
    kept = F.transform(kept_pos, lambda p: F.element_at("__ws", p + 1))
    return (
        base.join(covered, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.size("__ws").cast("long").alias("n_tokens"),
            F.size(cov).cast("long").alias("n_covered"),
            F.md5(F.concat_ws(" ", kept)).alias("clean_md5"),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.9,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Asymmetric containment pairs: C(A→B) = |A∩B| / |A| — the
    subset-duplication detector symmetric Jaccard misses (a short doc
    quoted whole inside a long one scores near-zero Jaccard but
    containment 1.0; Broder's original resemblance/containment split).
    Emits (id_a, id_b, cont_ab_micro, cont_ba_micro) for pairs where
    EITHER direction ≥ threshold, id_a < id_b, micro-floored.

    Same inverted-index shape as near_dup_pairs_jaccard (shingle-key
    equi-join, never all-pairs; ``max_shingle_df`` caps hot shingles).
    Containment admits no symmetric length-ratio prune — a tiny doc can
    be fully contained in a huge one — so the join keeps every
    shared-shingle pair; the dominant cost is still Σ df(s)²."""
    sh = df.select(
        F.col(id_col).alias("__id"),
        word_shingles(text_col, n=n).alias("__sh"),
    ).withColumn("__sz", F.size("__sh"))
    ex = sh.select(
        "__id",
        "__sz",
        F.explode(F.transform("__sh", lambda s: F.xxhash64(s))).alias("__s"),
    )
    if max_shingle_df is not None:
        freq = ex.groupBy("__s").agg(F.count("*").alias("__df"))
        ex = ex.join(
            F.broadcast(
                freq.filter(F.col("__df") <= max_shingle_df).select("__s")
            ),
            "__s",
        )
    ex = ex.localCheckpoint(eager=True)
    a, b = ex.alias("a"), ex.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.__s") == F.col("b.__s"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sz").alias("sz_a"),
            F.col("b.__sz").alias("sz_b"),
        )
        .agg(F.count("*").alias("shared"))
    )
    cont_ab = F.expr("shared * 1000000 div sz_a")
    cont_ba = F.expr("shared * 1000000 div sz_b")
    thr_micro = int(threshold * 1_000_000)
    return (
        shared.select(
            "id_a",
            "id_b",
            cont_ab.alias("cont_ab_micro"),
            cont_ba.alias("cont_ba_micro"),
        )
        .filter(
            (F.col("cont_ab_micro") >= thr_micro)
            | (F.col("cont_ba_micro") >= thr_micro)
        )
    )
