"""Local replica of the driver's Spark-vs-DuckDB comparison so every
registered query is validated before the driver ever sees it.

Compare semantics (per repo ``__spark_entry__.py`` docstring): row count +
schema (column names, sorted) + order-insensitive value hash. We reproduce
that as: sort columns by name, canonicalize each cell, sort rows, require
exact equality.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style: compare rounded float values; queries already round
        # to 6dp so this is just defensive canonicalization of -0.0 etc.
        return f"{v + 0.0:.6f}"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(_canon(r[i]) for i in order) for r in rows
    )
    return [cols[i] for i in order], out


def spark_result(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def assert_parity(df, sql: str, sf_dir: str, name: str = "query"):
    s_cols, s_rows = canonical(*spark_result(df))
    d_cols, d_rows = canonical(*duckdb_run(sql, sf_dir))
    assert s_cols == d_cols, f"{name}: schema mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mism = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first 3: {mism[:3]}"
