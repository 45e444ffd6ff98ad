"""Iceberg table backend: the commit contract a 10⁹-page deployment
runs on, kept behind the same seam the parquet/_lineage stand-in uses.

This sandbox has no Iceberg runtime jar, so everything that would
touch the catalog is import/feature-gated (``iceberg_available``);
the statement/config generators are pure and golden-tested. The
design note below is the contract the rest of ``kgeng.io`` is written
against — SURVEY.md §7.3's pluggable-backend plan made explicit.

Design note — what maps to what
===============================

**Snapshot commit.** Every pipeline stage that today writes a parquet
dir + a ``_lineage/<stage>-<fp>.json`` record (atomic ``os.replace``)
becomes one Iceberg table commit: write data files, then atomically
swap the table-metadata pointer. Iceberg's commit is an optimistic
compare-and-swap on the metadata file — on conflict the writer
re-reads, re-validates, retries — which is exactly the semantics the
rename-based lineage commit approximates on a local filesystem. The
lineage record itself (stage, input fingerprint, row count, content
hash) travels in ``snapshot summary`` properties, so resume = "does
any snapshot carry this input fingerprint", answered from metadata
without scanning data.

**Concurrent readers.** Readers resolve the current metadata pointer
once and then read a pinned snapshot id for the whole job — they never
see a half-written stage, regardless of how many executors are
mid-write (snapshot isolation). The parquet stand-in gets this only
because single-driver runs serialize stages; Iceberg gives it under
concurrent writers too, which is the difference that matters at 10⁹
pages where ingest, dedup, and query jobs overlap.

**Schema evolution.** Iceberg columns are tracked by field id, not
name/position, so adding extraction fields (a new quality signal, a
new linker score) is a metadata-only commit: no data-file rewrite, old
snapshots stay readable, and renames don't break readers. The parquet
stand-in relies on Spark's by-name union tolerance instead, which
silently fails on renames — documented gap, closed here.

**Partitioning.** The refbuild bin fan-out (``partitionBy(node_class)``
/ ``(label, subject_class, object_class)``) becomes an identity
partition spec; Iceberg's hidden partitioning replaces the
URL-escaped ``node_class=biolink%3AGene`` directory contract (and the
manifest-glob escaping tests) with metadata pruning — the CURIE-prefix
router in ``kg_node_by_id`` becomes a real partition prune. Spec
changes (e.g. adding a bucket(16, id) dimension when one class
dominates) are commits, not rewrites.

**Deletes / maintenance.** The DETACH DELETE rewrite
(``kgeng.graph.maintenance``) maps to copy-on-write DELETEs: one
commit producing a new snapshot; the before/after audit query reads
the two snapshot ids instead of two materialized dirs, and time-travel
(``VERSION AS OF``) replaces the snapshot-dir lineage chain.

**Sizing at 10⁹ pages.** ~10⁹ pages × ~5 KB text ≈ 5 TB of text plus
edges/embeddings; at 256–512 MB target file size that is O(10⁴–10⁵)
data files per table — one manifest list + O(100) manifests, pruned
in milliseconds. Commit cadence stays per-stage (tens of commits per
pipeline run), far below the CAS-contention regime; expire-snapshots
and rewrite-data-files (compaction) run as scheduled maintenance jobs.
"""

from __future__ import annotations

import json

CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"
EXTENSIONS = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"


def catalog_conf(name: str = "kg", warehouse: str = "/data/warehouse") -> dict[str, str]:
    """SparkSession config for a Hadoop-catalog Iceberg deployment —
    the exact keys a submitter passes; pure and golden-tested."""
    return {
        "spark.sql.extensions": EXTENSIONS,
        f"spark.sql.catalog.{name}": CATALOG_IMPL,
        f"spark.sql.catalog.{name}.type": "hadoop",
        f"spark.sql.catalog.{name}.warehouse": warehouse,
    }


def iceberg_available(spark) -> bool:
    """True when the Iceberg runtime jar is on the session classpath
    (never in this sandbox; the contract is exercised on a real
    deployment)."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(CATALOG_IMPL)
        return True
    except Exception:
        return False


def create_table_ddl(
    table: str,
    columns: dict[str, str],
    partition_by: tuple[str, ...] = (),
    table_props: dict[str, str] | None = None,
) -> str:
    """``CREATE TABLE ... USING iceberg`` statement for a KG table.

    Default props pin the contract pieces that matter at scale:
    format-version 2 (row-level deletes for the maintenance rewrites),
    snapshot retention, and a 512 MB target file size."""
    props = {
        "format-version": "2",
        "write.target-file-size-bytes": str(512 * 1024 * 1024),
        "history.expire.min-snapshots-to-keep": "10",
    }
    props.update(table_props or {})
    cols = ", ".join(f"{c} {t}" for c, t in columns.items())
    part = (
        f" PARTITIONED BY ({', '.join(partition_by)})" if partition_by else ""
    )
    tblprops = ", ".join(f"'{k}'='{v}'" for k, v in sorted(props.items()))
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ({cols}) USING iceberg"
        f"{part} TBLPROPERTIES ({tblprops})"
    )


# The engine's table layout on Iceberg (identity specs mirror the
# refbuild bin fan-out; see the partitioning section of the design
# note).
KG_TABLES: dict[str, tuple[dict[str, str], tuple[str, ...]]] = {
    "nodes": (
        {
            "id": "string",
            "name": "string",
            "category": "array<string>",
            "equivalent_identifiers": "array<string>",
            "node_class": "string",
        },
        ("node_class",),
    ),
    "edges": (
        {
            "id": "bigint",
            "subject": "string",
            "predicate": "string",
            "object": "string",
            "primary_knowledge_source": "string",
            "subject_class": "string",
            "object_class": "string",
        },
        ("predicate",),
    ),
}


def kg_table_ddl(catalog: str = "kg", db: str = "graph") -> list[str]:
    return [
        create_table_ddl(f"{catalog}.{db}.{name}", cols, part)
        for name, (cols, part) in sorted(KG_TABLES.items())
    ]


class IcebergLineage:
    """The LineageLog protocol (``committed`` / ``commit`` / ``entries``)
    over Iceberg snapshot-summary properties — same three calls, same
    ``commit`` signature (conformance-tested in ``tests/test_iceberg``).

    Seam scope: ``Pipeline._stage`` — every single-output stage —
    holds either backend unmodified. The two MULTI-output stages
    (``stage_link_dims`` writes one parquet dir per dim table,
    ``stage_materialize`` writes nodes + edges) commit once for the
    whole stage today; on an Iceberg deployment each output is its own
    table, so those stages map to one ``IcebergLineage(table).commit``
    per output rather than holding a single backend instance.

    ``commit`` appends the stage output with the lineage record in the
    snapshot summary; ``committed`` answers resume checks from the
    snapshot log (metadata only — no data scan). Requires the runtime
    jar; raises immediately and clearly without it.
    """

    SUMMARY_KEY = "kgeng.lineage"

    def __init__(self, spark, table: str):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; use the parquet "
                "LineageLog backend (kgeng.io.lineage) or submit with "
                "--packages org.apache.iceberg:iceberg-spark-runtime"
            )
        self.spark = spark
        self.table = table

    def _snapshots(self):
        return self.spark.sql(
            f"SELECT snapshot_id, summary FROM {self.table}.snapshots"
        ).collect()

    def entries(self) -> list[dict]:
        out = []
        for r in self._snapshots():
            rec = (r["summary"] or {}).get(self.SUMMARY_KEY)
            if rec:
                out.append(json.loads(rec))
        return out

    def committed(self, stage: str, fingerprint: str) -> dict | None:
        for rec in self.entries():
            if rec["stage"] == stage and rec["input_fingerprint"] == fingerprint:
                return rec
        return None

    def commit(
        self,
        stage: str,
        fingerprint: str,
        row_count: int,
        output_path: str | None = None,
        content_hash: str | None = None,
        metrics: dict | None = None,
        df=None,
    ) -> dict:
        """Same positional shape as ``LineageLog.commit`` so
        ``Pipeline._stage`` can hold either backend unmodified (the
        seam SURVEY §7.3 planned; conformance-tested in
        ``tests/test_iceberg.py``). Here ``df`` is REQUIRED — an
        Iceberg commit is the atomic data append that carries the
        lineage record in its snapshot summary — and ``output_path``
        is advisory (the table is the output; recorded as given, else
        the table identifier)."""
        if df is None:
            raise ValueError(
                "IcebergLineage.commit appends the stage output atomically "
                "with its lineage record: pass df="
            )
        rec = {
            "stage": stage,
            "input_fingerprint": fingerprint,
            "row_count": row_count,
            "output_path": output_path or self.table,
            "content_hash": content_hash,
            "metrics": metrics or {},
        }
        self._append(df, rec)
        return rec

    def _append(self, df, rec: dict) -> None:
        """The physical commit: append ``df`` with the lineage record
        as a snapshot-summary property (one atomic Iceberg snapshot).
        Isolated so the jar-less conformance test can fake ONLY the
        I/O while exercising the real record/protocol logic."""
        (
            df.writeTo(self.table)
            .option("snapshot-property." + self.SUMMARY_KEY, json.dumps(rec))
            .append()
        )
