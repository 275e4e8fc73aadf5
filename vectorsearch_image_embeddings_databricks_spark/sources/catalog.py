"""Catalog/namespace helpers (SURVEY.md §2 O1–O3).

The reference parameterizes a Unity Catalog three-level namespace with
notebook widgets and creates schema + volume via SQL (``Nomic MultiModal
Retrieval.py``:76–112). OSS Spark has a two-level namespace and no
volumes; the equivalents are a database plus a managed directory root.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class EngineConfig:
    """Replaces the six dbutils widgets (NMR:76–96) with plain config."""

    database: str = "vectorlake"
    data_root: str = "/tmp/vectorlake"
    image_table: str = "images"
    embedding_table: str = "image_embeddings"
    index_name: str = "image_index"


def ensure_database(spark: SparkSession, database: str) -> None:
    """CREATE SCHEMA IF NOT EXISTS (NMR:100–104), two-level namespace."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")


def volume_dir(config: EngineConfig, name: str) -> str:
    """CREATE VOLUME IF NOT EXISTS (NMR:108–112) → managed directory."""
    path = os.path.join(config.data_root, "volumes", name)
    os.makedirs(path, exist_ok=True)
    return path
