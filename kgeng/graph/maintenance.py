"""Maintenance / delete rewrites — the distributed twins of the
reference's "danger zone" Cypher (``docs/cypher-cmds.txt:108-115``):

- ``match (a)-[e]-() with a, e limit N detach delete a, e``
  → :func:`detach_delete_edge_batch`
- ``match (a) where node.degree_in(a) = 0 detach delete a``
  → :func:`degree0_nodes` + :func:`detach_delete`

A delete against immutable columnar storage is a REWRITE: anti-join
the victims out and commit a new snapshot (on Iceberg this is a
copy-on-write DELETE producing a new table snapshot; parquet dirs are
the sandbox backend). :func:`run_degree0_delete` materializes the
rewrite with a lineage row, so a re-run against unchanged input skips
recomputation — the same resume protocol every pipeline stage uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def degree0_nodes(nodes: DataFrame, edges: DataFrame, limit: int | None = None) -> DataFrame:
    """Nodes with no incoming edge (``node.degree_in(a) = 0``),
    via left-anti join — the distributed NOT EXISTS. With ``limit``,
    the lowest ids are taken (deterministic at any parallelism; the
    reference's LIMIT takes arbitrary rows)."""
    orphans = nodes.join(
        edges.select(F.col("object").alias("id")).distinct(), "id", "left_anti"
    )
    if limit is not None:
        orphans = orphans.orderBy("id").limit(limit)
    return orphans


def detach_delete(
    nodes: DataFrame, edges: DataFrame, victim_ids: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """DETACH DELETE: remove the victim nodes and EVERY incident edge
    (either endpoint). Returns ``(nodes', edges')`` — lazy; callers
    materialize as a snapshot."""
    v = victim_ids.select("id").distinct()
    new_nodes = nodes.join(v, "id", "left_anti")
    new_edges = edges.join(
        v.select(F.col("id").alias("subject")), "subject", "left_anti"
    ).join(v.select(F.col("id").alias("object")), "object", "left_anti")
    return new_nodes, new_edges


def detach_delete_edge_batch(
    nodes: DataFrame, edges: DataFrame, limit: int
) -> tuple[DataFrame, DataFrame]:
    """The reference's batched cleanup (``with a, e limit N detach
    delete a, e``): take the first N edges in deterministic
    (subject, predicate, object) order, detach-delete their subject
    nodes (the ``a`` role) — which also removes every edge incident to
    those nodes — and drop the matched edges themselves."""
    batch = edges.orderBy("subject", "predicate", "object").limit(limit)
    victims = batch.select(F.col("subject").alias("id")).distinct()
    new_nodes, new_edges = detach_delete(nodes, edges, victims)
    # matched edges whose subject survived (victim set is subjects, so
    # none survive by construction; kept for contract clarity)
    new_edges = new_edges.join(
        batch.select("subject", "predicate", "object"),
        ["subject", "predicate", "object"],
        "left_anti",
    )
    return new_nodes, new_edges


def run_degree0_delete(
    spark: SparkSession,
    nodes_path: str,
    edges_path: str,
    out_dir: str,
    limit: int | None = None,
) -> dict:
    """Materialize the degree-0 detach-delete as a new snapshot under
    ``out_dir`` with a lineage commit. Re-running against the same
    input fingerprint returns the committed record without touching
    Spark — resume safety."""
    from kgeng.io.lineage import LineageLog, fingerprint_paths

    log = LineageLog(out_dir)
    fp = fingerprint_paths(nodes_path, edges_path, extra=f"degree0:{limit}")
    prior = log.committed("degree0_delete", fp)
    if prior is not None:
        return prior

    nodes = spark.read.parquet(nodes_path)
    edges = spark.read.parquet(edges_path)
    n_nodes_before = nodes.count()
    n_edges_before = edges.count()
    victims = degree0_nodes(nodes, edges, limit=limit).select("id")
    new_nodes, new_edges = detach_delete(nodes, edges, victims)
    new_nodes.write.mode("overwrite").parquet(f"{out_dir}/nodes")
    new_edges.write.mode("overwrite").parquet(f"{out_dir}/edges")
    n_nodes = spark.read.parquet(f"{out_dir}/nodes").count()
    n_edges = spark.read.parquet(f"{out_dir}/edges").count()
    return log.commit(
        "degree0_delete",
        fp,
        row_count=n_nodes,
        output_path=out_dir,
        metrics={
            "n_nodes_before": n_nodes_before,
            "n_edges_before": n_edges_before,
            "n_nodes_after": n_nodes,
            "n_edges_after": n_edges,
            "n_deleted": n_nodes_before - n_nodes,
        },
    )
