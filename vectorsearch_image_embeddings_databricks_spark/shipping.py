"""Ship this package to Python workers / executors.

Python UDFs (pandas_udf, mapInPandas, applyInPandasWithState) close over
functions that cloudpickle serializes **by reference** to their defining
module. The worker process must therefore be able to ``import
vectorsearch_image_embeddings_databricks_spark`` — which fails whenever the
driver's cwd is not the repo root (local mode) or on any real cluster where
the package isn't pre-installed on executors.

``ensure_shipped(spark)`` zips the package once per SparkContext and
registers it with ``sc.addPyFile`` so every worker can import it regardless
of deployment mode. This is the standard OSS-Spark mechanism for shipping
job code (the cluster-scale equivalent of ``--py-files``); it is a no-op
cost after the first call (guarded by a context-scoped flag) and the zip is
a few hundred KB, broadcast once per executor, not per task.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_FLAG = "vectorsearch_image_embeddings_databricks_spark._shipped"


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    # Context-scoped idempotence: survives multiple sessions on one JVM and
    # resets automatically if the context is recreated.
    if sc.getLocalProperty(_FLAG) == "1" or getattr(sc, "_vl_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    fd, zip_path = tempfile.mkstemp(prefix="vectorlake_pkg_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._vl_shipped = True
    sc.setLocalProperty(_FLAG, "1")
