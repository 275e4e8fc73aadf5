"""Named index catalog — the native replacement for the Vector Search
client's index *lifecycle* API (``Nomic MultiModal Retrieval.py``:294
``VectorSearchClient()``, :315–323 ``create_delta_sync_index_and_wait``,
:384 ``get_index``; SURVEY.md §2 O16/O17).

The reference manages indexes by *name* inside an external service with a
three-level namespace (catalog.schema.index, NMR:319). Natively the catalog
is a directory tree::

    <root>/<name>/data/*.parquet        materialized index rows
    <root>/<name>/_vectorlake_index_meta.json

so index *build* is a Spark write, *lookup* is a metadata read + lazy scan
(column-pruned — the vector column is only read by queries that score), and
*sync* re-materializes from the registered source, mirroring the
``pipeline_type="TRIGGERED"`` on-demand model (NMR:318): nothing refreshes
until ``sync()`` is called.

At 100 TB the data dir is a partitioned parquet/Delta table; every method
here stays metadata-only on the driver except the writes themselves, which
are ordinary distributed jobs.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from .vector_index import _META_FILE, VectorIndex

_CATALOG_META = "_vectorlake_catalog.json"


class IndexCatalog:
    """Create / look up / list / drop / sync named vector indexes."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------------ #

    def _path(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"invalid index name: {name!r}")
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), _META_FILE))

    def create_index(
        self,
        name: str,
        source: DataFrame,
        key: str = "vec_id",
        vector_col: str = "embedding",
        dim: int | None = None,
        assume_normalized: bool = False,
        source_table: str | None = None,
        if_exists: str = "error",
    ) -> VectorIndex:
        """Materialize ``source`` as the named index (the reference's
        ``create_delta_sync_index_and_wait``, NMR:315–323 — `_and_wait`
        is implicit: the write IS the build, there is no remote poll).

        ``source_table`` optionally registers a catalog table name so
        ``sync(name)`` can re-read it later without the caller re-passing
        the DataFrame (delta-sync semantics).
        """
        existed = self.exists(name) or self.graph_exists(name)
        if existed:
            if if_exists == "error":
                raise ValueError(f"index {name!r} already exists")
            if if_exists == "ignore":
                if self.graph_exists(name):
                    # 'ignore' means "hand back the existing index of
                    # THIS type" — a graph index under the name is a
                    # caller error, not something to silently return
                    raise ValueError(
                        f"{name!r} is held by a knn_graph index; "
                        "use if_exists='replace' to overwrite it"
                    )
                return self.get_index(name)
            # "replace": build into a staging dir FIRST so a failed
            # build cannot destroy the existing index, then swap (the
            # sync() discipline); the swap also clears a stale meta of
            # the OTHER index type
        idx = VectorIndex(
            source,
            key=key,
            vector_col=vector_col,
            dim=dim,
            assume_normalized=assume_normalized,
        )
        path = self._path(name)
        staging = path + ".__staging__" if existed else path
        idx.save(staging, mode="overwrite")
        with open(os.path.join(staging, _CATALOG_META), "w") as f:
            json.dump({"name": name, "source_table": source_table}, f)
        if staging != path:
            shutil.rmtree(path)
            os.replace(staging, path)
        return VectorIndex.load(self.spark, path)

    def create_index_async(self, name: str, source: DataFrame, **kwargs):
        """Non-blocking build — the reference's commented
        ``create_delta_sync_index`` variant (NMR:305–313) that returns
        before the index is ready and lets the caller poll.

        The build is the same distributed write as ``create_index``,
        submitted from a background thread (Spark schedules jobs from
        concurrent threads of one SparkSession independently). Returns an
        ``IndexBuildHandle`` with ``status()`` / ``wait()``; the index is
        invisible to ``get_index``/``exists`` until the write's final
        metadata rename, so readers never observe a half-built index.
        """
        import threading

        handle = IndexBuildHandle(name)

        def _build() -> None:
            try:
                handle._result = self.create_index(name, source, **kwargs)
                handle._status = "READY"
            except BaseException as e:  # noqa: BLE001 - surfaced via .wait()
                handle._error = e
                handle._status = "FAILED"
            finally:
                handle._done.set()

        handle._status = "RUNNING"
        t = threading.Thread(
            target=_build, name=f"index-build-{name}", daemon=True
        )
        t.start()
        return handle

    def get_index(self, name: str) -> VectorIndex:
        """Lookup by name (``vs_client.get_index``, NMR:384)."""
        if not self.exists(name):
            if self.graph_exists(name):
                raise KeyError(
                    f"{name!r} is a knn_graph index — use get_graph_index"
                )
            raise KeyError(f"no such index: {name!r}")
        return VectorIndex.load(self.spark, self._path(name))

    def list_indexes(self) -> list[dict]:
        """Name + schema metadata for every index in the catalog
        (vector indexes and knn_graph indexes, tagged by ``type``)."""
        from .graph_ann import _GRAPH_META_FILE

        out = []
        for name in sorted(os.listdir(self.root)):
            meta_path = os.path.join(self.root, name, _META_FILE)
            graph_meta_path = os.path.join(
                self.root, name, _GRAPH_META_FILE
            )
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = json.load(f)
                meta["name"] = name
                meta.setdefault("type", "vector")
                out.append(meta)
            elif os.path.exists(graph_meta_path):
                with open(graph_meta_path) as f:
                    meta = json.load(f)
                # centroid payload is index state, not listing metadata
                meta.pop("centroids", None)
                meta["name"] = name
                meta["type"] = "knn_graph"
                out.append(meta)
        return out

    def drop_index(self, name: str) -> None:
        if not (self.exists(name) or self.graph_exists(name)):
            raise KeyError(f"no such index: {name!r}")
        shutil.rmtree(self._path(name))

    # ------------------------------------------------------------------ #
    # Graph-ANN tier (KNNGraphIndex) lifecycle — the same build-once /
    # serve-many surface as create_index/get_index, for the graph tier.
    # ------------------------------------------------------------------ #

    def graph_exists(self, name: str) -> bool:
        from .graph_ann import _GRAPH_META_FILE

        return os.path.exists(
            os.path.join(self._path(name), _GRAPH_META_FILE)
        )

    def create_graph_index(
        self,
        name: str,
        source: DataFrame,
        key: str = "vec_id",
        vector_col: str = "embedding",
        degree: int = 8,
        strategy: str = "exact",
        nlist: int = 16,
        nprobe: int = 4,
        seed: int = 42,
        per_cell: int = 1,
        refine_rounds: int = 0,
        if_exists: str = "error",
    ):
        """Build + persist a :class:`~.graph_ann.KNNGraphIndex` under a
        catalog name: edge table, quantizer centroids, and the
        MATERIALIZED entry representatives all land on disk, so
        ``get_graph_index(name).search(...)`` serves beam queries
        without rebuilding anything (the reference's get_index →
        similarity_search flow, NMR:384-388, for the graph tier)."""
        from .graph_ann import KNNGraphIndex

        existed = self.graph_exists(name) or self.exists(name)
        if existed:
            if if_exists == "error":
                raise ValueError(f"index {name!r} already exists")
            if if_exists == "ignore":
                if self.exists(name):
                    raise ValueError(
                        f"{name!r} is held by a vector index; "
                        "use if_exists='replace' to overwrite it"
                    )
                return self.get_graph_index(name)
            # "replace": build into a staging dir FIRST so a failed
            # build cannot destroy the existing index, then swap (the
            # sync() discipline); the swap also clears a stale meta of
            # the OTHER index type
        path = self._path(name)
        idx = KNNGraphIndex.build(
            source,
            key,
            vector_col,
            degree=degree,
            strategy=strategy,
            nlist=nlist,
            nprobe=nprobe,
            seed=seed,
            per_cell=per_cell,
            refine_rounds=refine_rounds,
        )
        staging = path + ".__staging__" if existed else path
        idx.save(staging)
        if staging != path:
            shutil.rmtree(path)
            os.replace(staging, path)
        return KNNGraphIndex.load(self.spark, path)

    def get_graph_index(self, name: str):
        """Lookup a persisted graph index by name; everything it reads
        (edges, vectors, reps) is a lazy parquet scan."""
        from .graph_ann import KNNGraphIndex

        if not self.graph_exists(name):
            if self.exists(name):
                raise KeyError(
                    f"{name!r} is a vector index — use get_index"
                )
            raise KeyError(f"no such index: {name!r}")
        return KNNGraphIndex.load(self.spark, self._path(name))

    def sync(self, name: str, source: DataFrame | None = None) -> VectorIndex:
        """TRIGGERED refresh (NMR:318): re-materialize the index from its
        registered source table, or from an explicitly passed DataFrame.

        The rewrite goes through a staging directory so a reader holding
        the old index keeps a consistent view until the swap.
        """
        path = self._path(name)
        if not self.exists(name):
            if self.graph_exists(name):
                raise KeyError(
                    f"{name!r} is a knn_graph index — refresh it with "
                    "create_graph_index(..., if_exists='replace')"
                )
            raise KeyError(f"no such index: {name!r}")
        with open(os.path.join(path, _META_FILE)) as f:
            meta = json.load(f)
        cat_meta_path = os.path.join(path, _CATALOG_META)
        source_table = None
        if os.path.exists(cat_meta_path):
            with open(cat_meta_path) as f:
                source_table = json.load(f).get("source_table")
        if source is None:
            if source_table is None:
                raise ValueError(
                    f"index {name!r} has no registered source_table; "
                    "pass a source DataFrame"
                )
            source = self.spark.table(source_table)
        idx = VectorIndex(
            source,
            key=meta["key"],
            vector_col=meta["vector_col"],
            dim=meta["dim"],
            assume_normalized=meta["assume_normalized"],
        )
        staging = path + ".__staging__"
        idx.save(staging, mode="overwrite")
        with open(os.path.join(staging, _CATALOG_META), "w") as f:
            json.dump({"name": name, "source_table": source_table}, f)
        shutil.rmtree(path)
        os.replace(staging, path)
        return VectorIndex.load(self.spark, path)

    # ------------------------------------------------------------------ #

    def search(
        self,
        name: str,
        query_vector: Sequence[float],
        k: int = 5,
        columns: Sequence[str] | None = None,
    ) -> DataFrame:
        """Convenience: ``get_index(name).search(...)`` — one call shaped
        like the reference's ``index.similarity_search`` (NMR:388)."""
        return self.get_index(name).search(query_vector, k=k, columns=columns)


class IndexBuildHandle:
    """Poll/wait handle for ``IndexCatalog.create_index_async`` —
    the ``describe()``-status loop of the reference's non-blocking
    variant (NMR:305–313), minus the remote service."""

    def __init__(self, name: str) -> None:
        import threading

        self.name = name
        self._status = "PENDING"
        self._result: VectorIndex | None = None
        self._error: BaseException | None = None
        self._done = threading.Event()

    def status(self) -> str:
        """PENDING | RUNNING | READY | FAILED."""
        return self._status

    def ready(self) -> bool:
        return self._done.is_set() and self._status == "READY"

    def wait(self, timeout: float | None = None) -> VectorIndex:
        """Block until the build finishes; re-raise a build failure."""
        if not self._done.wait(timeout):
            raise TimeoutError(
                f"index build {self.name!r} still {self._status} "
                f"after {timeout}s"
            )
        if self._error is not None:
            raise self._error
        assert self._result is not None
        return self._result
