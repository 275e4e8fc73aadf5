"""Multimodal ingestion: binary-file scans into catalog tables
(SURVEY.md §2 O5–O7; reference ``Nomic MultiModal Retrieval.py``:160–163).

The reference's exact pipeline, re-expressed:

    spark.read.format("binaryFile").option("pathGlobFilter","*.jpg").load(dir)
        .withColumn('path', regexp_replace(col('path'), '^dbfs:', ''))
        .write.mode('overwrite').saveAsTable(name)

Scale notes: the ``binaryFile`` source prunes at file-listing time via the
glob (NMR:161) and supports column pruning — queries that don't touch
``content`` never read the bytes (the heavy column; SURVEY.md §4). Spark
caps binaryFile rows at ``spark.sql.sources.binaryFile.maxLength`` (2 GiB
default); larger blobs belong in object storage with path references.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# binaryFile scan schema (fixed by the source): NMR:161's implicit contract
BINARY_FILE_COLUMNS = ("path", "modificationTime", "length", "content")

# URI scheme prefixes to strip; the reference strips only '^dbfs:'
# (NMR:162) — locally the scheme is 'file:'.
_SCHEME_RE = "^(dbfs:|file:)"


def clean_path(path: Column | str = "path") -> Column:
    """Strip the filesystem scheme prefix (generalizes NMR:162)."""
    c = F.col(path) if isinstance(path, str) else path
    return F.regexp_replace(c, _SCHEME_RE, "")


def ingest_binary_dir(
    spark: SparkSession,
    directory: str,
    glob: str = "*.jpg",
    recursive: bool = False,
) -> DataFrame:
    """Scan a directory of binary files → (path, modificationTime, length,
    content) with the path scheme stripped (NMR:161–162)."""
    reader = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
    )
    df = reader.load(directory)
    return df.withColumn("path", clean_path("path"))


def save_as_table(df: DataFrame, name: str, mode: str = "overwrite") -> None:
    """Persist as a managed catalog table (NMR:163's saveAsTable; parquet
    locally, Delta where available)."""
    df.write.mode(mode).saveAsTable(name)
