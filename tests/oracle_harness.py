"""Local twin of the driver's Spark-vs-DuckDB comparison: row count +
column names + order-insensitive value comparison."""

from __future__ import annotations

import datetime
import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, con, sql: str) -> dict:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    res = con.sql(sql)
    duck_cols = res.columns
    duck_rows = res.fetchall()
    report = {
        "rows_spark": len(spark_rows),
        "rows_duck": len(duck_rows),
        "cols_spark": sorted(spark_cols),
        "cols_duck": sorted(duck_cols),
    }
    report["cols_match"] = report["cols_spark"] == report["cols_duck"]
    report["rows_match"] = len(spark_rows) == len(duck_rows)
    if report["cols_match"] and report["rows_match"]:
        ns = normalize_rows(spark_cols, spark_rows)
        nd = normalize_rows(duck_cols, duck_rows)
        report["values_match"] = ns == nd
        if not report["values_match"]:
            diff = [(a, b) for a, b in zip(ns, nd) if a != b][:5]
            report["first_diffs"] = diff
    else:
        report["values_match"] = False
    return report
