"""Round-10 receipt for the two python-streaming rows (VERDICT r9 #7):
time the phases of each row — stream start, drain (first poll success
→ keyspace committed), teardown (stop + awaitTermination), read-back
aggregation — to show where the residual wall time lives after the
adaptive-backoff change. Phases are measured by monkey-timing the same
code path the registry runs (the rows themselves are executed intact;
this script only brackets their dominant calls with clocks).
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("r10-stream-phases")
    .config("spark.sql.shuffle.partitions", str(int(CPUS)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "32g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import tempfile  # noqa: E402
import uuid  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from vectorsearch_image_embeddings_databricks_spark.registry.embedding_quant import (  # noqa: E402
    PYDS_STREAM_ROWS,
)
from vectorsearch_image_embeddings_databricks_spark.sources.pydatasource import (  # noqa: E402
    ManifestParquetSink,
    SyntheticTickStreamSource,
    read_manifest_files,
)

for src_cls in (SyntheticTickStreamSource, ManifestParquetSink):
    try:
        spark.dataSource.register(src_cls)
    except Exception:
        pass

for rep in range(2):
    sink_dir = tempfile.mkdtemp(prefix="phase_sink_")
    stream = (
        spark.readStream.format("tick_stream")
        .option("n_rows", str(PYDS_STREAM_ROWS))
        .option("batch_size", str(PYDS_STREAM_ROWS // 2))
        .load()
    )
    chk = f"{sink_dir}/_chk_{uuid.uuid4().hex[:8]}"
    t0 = time.time()
    q = (
        stream.writeStream.format("manifest_parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", chk)
        .trigger(processingTime="0 seconds")
        .start()
    )
    t_start = time.time()

    def _committed() -> int:
        mdir = os.path.join(sink_dir, "manifest")
        if not os.path.isdir(mdir):
            return 0
        import json

        total = 0
        for name in os.listdir(mdir):
            if name.startswith("."):
                continue
            with open(os.path.join(mdir, name)) as f:
                total += sum(e["n_rows"] for e in json.load(f)["files"])
        return total

    delay = 0.01
    while _committed() < PYDS_STREAM_ROWS:
        time.sleep(delay)
        delay = min(delay * 1.6, 0.2)
    t_drained = time.time()
    q.stop()
    q.awaitTermination()
    t_stopped = time.time()
    out = (
        read_manifest_files(spark, sink_dir)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .orderBy("bucket")
    )
    out.localCheckpoint(eager=True)
    t_read = time.time()
    print(
        f"sink_roundtrip rep{rep}: start={t_start - t0:.2f}s "
        f"drain={t_drained - t_start:.2f}s stop={t_stopped - t_drained:.2f}s "
        f"readback={t_read - t_stopped:.2f}s total={t_read - t0:.2f}s"
    )
