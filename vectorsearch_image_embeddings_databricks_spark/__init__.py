"""spark-vectorlake: a PySpark-native analytics engine with the query and
data-processing capabilities of ``auschoi96/vectorsearch_image_embeddings_databricks``
(see SURVEY.md — the reference is a multimodal retrieval notebook built on the
closed Databricks Vector Search service; we rebuild its semantics natively on
DataFrames/Catalyst and extend it with LLM-data-pipeline operators).

Layout
------
- ``functions/``  column-expression helpers (vector math, text features)
- ``sources/``    ingestion (binaryFile scans, catalog helpers)
- ``embed/``      pluggable pandas-UDF encoders (stub encoder for tests)
- ``index/``      VectorIndex lifecycle (exact + LSH ANN, persist/refresh)
- ``operators/``  kNN join, dedup family, hybrid search, text analysis
- ``streaming/``  incremental (TRIGGERED-style) index refresh + windows
- ``plans/``      plan-inspection utilities (explain capture, shuffle audit)
- ``engine``      MultiModalEngine facade (ingest → embed → index → query)
"""

__version__ = "0.1.0"

# Lazy top-level exports (PEP 562). Python workers that unpickle a
# class from a submodule (Python DataSource readers/writers, pandas-UDF
# closures) execute THIS file first; an eager `from .engine import ...`
# would drag the whole engine/embed/pandas tree (~0.5 s) into every
# freshly-forked worker. Spark's PythonWorkerFactory hard-reaps idle
# pooled workers after one minute (IDLE_WORKER_TIMEOUT_NS, no config),
# so on a real cluster every Python-path query that hasn't run in the
# last minute pays this import again — keeping it lazy halves the
# cold-worker penalty (measured: python_datasource_scan 2.3 s -> ~1.3 s
# after a forced idle reap; warm 0.6 s either way).
_LAZY_EXPORTS = {
    "MultiModalEngine": ".engine",
    "to_data_array": ".engine",
}


def __getattr__(name: str):
    if name in _LAZY_EXPORTS:
        import importlib

        mod = importlib.import_module(_LAZY_EXPORTS[name], __name__)
        val = getattr(mod, name)
        globals()[name] = val  # cache: subsequent lookups skip here
        return val
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )


def __dir__():
    return sorted(set(globals()) | set(_LAZY_EXPORTS))
