"""Partitioned writers — the Spark twins of the reference's binning /
splitting sinks.

- ``write_partitioned`` ≈ S6 hash-routed multi-file binning
  (``Kuzu/kuzu_build_graph_csv.py:297-387``): dynamic partition write.
- ``maxRecordsPerFile`` ≈ S10 ``sed``-based 6M/500k-row file splits
  (``docs/create_split_*.sh``).
- On Iceberg these become ``writeTo(...).append()`` with bucket/
  identity partition transforms; parquet is the sandbox backend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
