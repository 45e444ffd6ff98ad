"""Iceberg backend shim: the pure generators are golden-tested; the
runtime-dependent parts must gate cleanly in this jar-less sandbox."""

from __future__ import annotations

import pytest

from kgeng.io.iceberg import (
    CATALOG_IMPL,
    IcebergLineage,
    catalog_conf,
    create_table_ddl,
    iceberg_available,
    kg_table_ddl,
)


def test_catalog_conf_keys():
    conf = catalog_conf("kg", "/w")
    assert conf["spark.sql.catalog.kg"] == CATALOG_IMPL
    assert conf["spark.sql.catalog.kg.type"] == "hadoop"
    assert conf["spark.sql.catalog.kg.warehouse"] == "/w"
    assert "Iceberg" in conf["spark.sql.extensions"]


def test_create_table_ddl_golden():
    ddl = create_table_ddl(
        "kg.graph.nodes",
        {"id": "string", "category": "array<string>"},
        ("node_class",),
    )
    assert ddl.startswith(
        "CREATE TABLE IF NOT EXISTS kg.graph.nodes "
        "(id string, category array<string>) USING iceberg "
        "PARTITIONED BY (node_class)"
    )
    # contract-bearing props: v2 (row-level deletes) + file sizing
    assert "'format-version'='2'" in ddl
    assert "'write.target-file-size-bytes'='536870912'" in ddl
    # unpartitioned form omits the clause
    assert "PARTITIONED" not in create_table_ddl("t", {"a": "int"})


def test_kg_table_ddl_covers_layout():
    stmts = kg_table_ddl()
    assert len(stmts) == 2
    edges = next(s for s in stmts if ".edges" in s)
    nodes = next(s for s in stmts if ".nodes" in s)
    assert "PARTITIONED BY (predicate)" in edges
    assert "PARTITIONED BY (node_class)" in nodes


def test_runtime_gates_cleanly(spark):
    """No Iceberg jar in this sandbox: availability is False and the
    backend refuses construction with an actionable message instead of
    failing later mid-commit."""
    assert iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        IcebergLineage(spark, "kg.graph.nodes")
