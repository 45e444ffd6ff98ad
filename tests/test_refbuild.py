"""Reference-parity tests: typed-header CSV scan, 5-stage build
(convert/lookups/bin/DDL/import), merged-JSON sink."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from kgeng import fixtures
from kgeng.graph.build import ORDERED_CATEGORIES
from kgeng.graph.refbuild import run_refbuild
from kgeng.io.sources import read_kgx_csv, read_kgx_jsonl, write_merged_json

FIX = "/root/repo/.fixtures/kgx"
OUT = "/root/repo/.fixtures/refbuild_out"

N_NODES, N_EDGES = 200, 600


@pytest.fixture(scope="module")
def kgx_paths():
    return fixtures.write_kgx_csv(FIX, N_NODES, N_EDGES)


def test_typed_header_scan(spark, kgx_paths):
    nodes = read_kgx_csv(spark, kgx_paths["nodes_csv"], kgx_paths["nodes_hdr"])
    row = nodes.filter(F.col("id") == fixtures.entity_curie(3)).collect()[0]
    assert isinstance(row["category"], list) and len(row["category"]) >= 1
    assert row["lipinski"] == 3  # "3.0" -> 3 via two-step cast
    assert isinstance(row["equivalent_identifiers"], list)
    edges = read_kgx_csv(spark, kgx_paths["edges_csv"], kgx_paths["edges_hdr"])
    erow = edges.limit(1).collect()[0]
    assert erow["p_value"] == [0.001, 0.05]
    assert isinstance(erow["distance_to_feature"], int)


@pytest.fixture(scope="module")
def build(spark, kgx_paths):
    return run_refbuild(
        spark,
        kgx_paths["nodes_csv"],
        kgx_paths["nodes_hdr"],
        kgx_paths["edges_csv"],
        kgx_paths["edges_hdr"],
        OUT,
    )


def test_refbuild_join_drop_semantics(build):
    # every 50th edge has a dangling object -> dropped (J2)
    assert build["dropped_edges"].count() == N_EDGES // 50
    assert build["edges"].count() == N_EDGES - N_EDGES // 50


def test_refbuild_o1_invariant(build):
    for r in build["nodes"].select("labels").collect():
        labels = r["labels"]
        present = [c for c in ORDERED_CATEGORIES if c in labels]
        if present:
            assert labels[0] == present[0]
        assert len(labels) == len(set(labels))  # deduped


def test_refbuild_ddl_shapes(build):
    assert build["node_ddl"], "no node DDL generated"
    for stmt in build["node_ddl"]:
        assert stmt.startswith("CREATE NODE TABLE `biolink:")
        assert "PRIMARY KEY (id)" in stmt
        assert "lipinski INT64" in stmt
    for stmt in build["rel_ddl"]:
        assert stmt.startswith("CREATE REL TABLE `biolink:")
        assert "FROM `" in stmt and "` TO `" in stmt
        assert "p_value FLOAT[]" in stmt
    assert len(build["copy_manifest"]) == len(build["classes"]) + len(
        build["predicate_pairs"]
    )


def test_refbuild_bin_layout(build):
    node_parts = glob.glob(f"{OUT}/bins/nodes/node_class=*")
    assert sorted(os.path.basename(p).split("=")[1].replace("%3A", ":") for p in node_parts) == build["classes"]
    edge_parts = glob.glob(f"{OUT}/bins/edges/label=*/subject_class=*/object_class=*")
    assert edge_parts, "edge bins missing"


def test_refbuild_predicate_pairs_sorted_distinct(build):
    for pred, pairs in build["predicate_pairs"].items():
        assert pairs == sorted(set(pairs)), pred


def test_merged_json_sink(spark, build, tmp_path):
    out = "/root/repo/.fixtures/merged_json"
    nodes = build["nodes"].withColumnRenamed("labels", "category").drop("node_class")
    edges = (
        build["edges"]
        .withColumnRenamed("label", "predicate")
        .withColumnRenamed("from", "subject")
        .withColumnRenamed("to", "object")
    )
    write_merged_json(nodes, edges, out)
    back = read_kgx_jsonl(spark, out)
    counts = {r["type"]: r["n"] for r in back.groupBy("type").agg(F.count("*").alias("n")).collect()}
    assert counts["node"] == N_NODES
    assert counts["relationship"] == N_EDGES - N_EDGES // 50
    rel = back.filter("type = 'relationship'").limit(1).collect()[0]
    assert rel["start"] and rel["end"] and rel["label"].startswith("biolink:")
    # edge ids unique (O2)
    assert back.filter("type='relationship'").select("id").distinct().count() == counts["relationship"]
