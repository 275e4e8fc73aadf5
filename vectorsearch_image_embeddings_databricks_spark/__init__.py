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

from .engine import MultiModalEngine, to_data_array  # noqa: E402,F401
