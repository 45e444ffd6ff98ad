"""Local twin of the driver's Spark-vs-DuckDB comparison: row count +
column names + order-insensitive value comparison."""

from __future__ import annotations

import datetime
import math

import duckdb
import numpy as np

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
    # Type-tag numerics: the driver's value hash distinguishes int64 5
    # from float64 5.0 (DuckDB HUGEINT widens to float64 via pandas),
    # but Python's 5 == 5.0 would mask that here. Tagging makes the
    # local comparison at least as strict as the driver's.
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", round(v, 6))
    if isinstance(v, int):
        return ("i", v)
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
    # Fetch through pandas, exactly like the external driver: DuckDB
    # HUGEINT (e.g. uncast SUM over BIGINT) becomes float64 here but a
    # Python int via fetchall(), so fetchall() would hide type drift
    # the driver's hash rejects.
    res = con.sql(sql)
    duck_types = [str(t).upper() for t in res.types]
    duck_df = res.df()
    duck_cols = list(duck_df.columns)
    def _from_pandas(v):
        if isinstance(v, np.ndarray):
            return [_from_pandas(x) for x in v.tolist()]
        if hasattr(v, "item") and not isinstance(v, (list, tuple)):
            try:
                return v.item()
            except (ValueError, AttributeError):
                return v
        return v

    def _undate(i, v):
        # pandas renders DuckDB DATE as midnight Timestamp; restore the
        # date so it compares like Spark's datetime.date.
        if duck_types[i] == "DATE" and isinstance(v, datetime.datetime):
            return v.date()
        return v

    duck_rows = [
        tuple(_undate(i, _from_pandas(v)) for i, v in enumerate(row))
        for row in duck_df.itertuples(index=False, name=None)
    ]
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
