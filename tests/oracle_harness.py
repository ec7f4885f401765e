"""Local replica of the driver's t2 correctness gate: run a registered
Spark query and its DuckDB oracle side-by-side, compare row count,
schema width, and an order-insensitive value hash."""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _hash_rows(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    import hashlib

    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return len(rows), h


def compare(spark, sf_dir: str, name: str, fn, sql: str) -> dict:
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb_conn(sf_dir)
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    sn, sh = _hash_rows(scols, srows)
    dn, dh = _hash_rows(dcols, drows)
    return {
        "name": name,
        "rows_spark": sn,
        "rows_duck": dn,
        "cols_match": sorted(scols) == sorted(dcols),
        "hash_match": sh == dh,
        "spark_cols": scols,
        "duck_cols": dcols,
    }
