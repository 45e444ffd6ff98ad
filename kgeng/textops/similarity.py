"""Similarity search over the ``embeddings`` table.

- ``ann_cosine_topk``: brute-force cosine top-k — the exactness
  baseline, a crossJoin bounded by |queries|·|corpus|.
- ``ann_lsh_topk``: random-hyperplane LSH bucketing — the scale path:
  each vector lands in one 12-bit bucket; queries probe only their
  bucket, so the pair space is |bucket| not |corpus|. The hyperplanes
  are a deterministic ±1 pattern, so results are reproducible at any
  parallelism.

Dot products run as ``zip_with``/``aggregate`` expressions (JVM-side,
no Python). Ranks order by the truncated score with id tie-breaks so
both Spark and the DuckDB oracle sort identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOP_K = 5
N_QUERIES = 10
LSH_BITS = 12


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition at ingest ONLY when the compressed source landed in
    # fewer splits than cores (the per-vector norm/bucket/dot
    # arithmetic is the hot loop); a well-split table is left alone
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if e.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        e = e.repartition(spark.sparkContext.defaultParallelism)
    return e


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _trunc5(c):
    # floor-truncation, the repo-wide cross-engine float rule
    # (CLAUDE.md): identical doubles floor identically on every engine,
    # while round() half-up vs half-even can differ at exact boundaries
    return F.floor(c * 100000) / 100000


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors (corpus = vec_id >= N_QUERIES) for each
    query vector (vec_id < N_QUERIES)."""
    e = _emb(spark, sf_dir).withColumn("nrm", _norm(F.col("v")))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = e.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "neighbor_id",
        _trunc5(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _hyperplane_weight(h: int, d):
    """Deterministic ±1 hyperplane component, portable to any engine
    with 64-bit integer arithmetic: the top bit of the 32-bit
    multiplicative hash ``(h·2654435761 + d·2246822519) mod 2^32``
    (Knuth/xxhash odd constants). NOTE: an earlier family used
    ``(h·131 + d·17) % 2``, which reduces to ``(h+d) % 2`` — one
    hyperplane repeated with alternating sign, i.e. two buckets total.
    This family gives genuinely independent bits per h."""
    mixed = (F.lit(h * 2654435761) + d * F.lit(2246822519)) % F.lit(4294967296)
    return (F.shiftright(mixed, 31) * 2 - 1).cast("double")


def _lsh_bucket(v, bits: int = LSH_BITS):
    """Deterministic random-hyperplane bucket: bit h = sign of
    Σ_d v[d]·w(h,d); see ``_hyperplane_weight`` for the portable
    weight family (mirrored by the DuckDB oracle)."""
    bucket = F.lit(0)
    for h in range(bits):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, d: x * _hyperplane_weight(h, d),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**h)).otherwise(0)
    return bucket


CENTROID_STRIDE = 40  # every 40th vector doubles as a coarse centroid
N_PROBE = 3


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: corpus vectors are assigned to their nearest
    coarse centroid (inverted lists); each query probes only its
    N_PROBE nearest centroids' lists.

    Centroids here are a deterministic sample (every
    ``CENTROID_STRIDE``-th vector) so results are reproducible without
    an RNG-seeded k-means fit; at scale the assignment join is
    |corpus| × |centroids| with the centroid side broadcast, and the
    probe space is |corpus| / |centroids| × N_PROBE per query.
    """
    e = _emb(spark, sf_dir).withColumn("nrm", _norm(F.col("v")))
    cents = e.filter(F.col("vec_id") % CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    corpus = e.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv_"), F.col("nrm").alias("cn_")
    )
    # inverted lists: nearest centroid per corpus vector, as a max_by
    # aggregation (tie -> lowest cent_id) — the argmax collapses
    # map-side in the partial agg, so the corpus×centroid product is
    # never shuffled (the old row_number window exchanged all of it)
    assigned = (
        corpus.crossJoin(F.broadcast(cents))
        .withColumn("cent_score", _dot(F.col("cv_"), F.col("cv")) / (F.col("cn_") * F.col("cn")))
        .groupBy("neighbor_id")
        .agg(
            F.max_by(
                F.struct("cent_id", "cv_", "cn_"),
                F.struct(F.col("cent_score"), (-F.col("cent_id")).alias("tb")),
            ).alias("s")
        )
        .select(
            "neighbor_id",
            F.col("s.cv_").alias("cv_"),
            F.col("s.cn_").alias("cn_"),
            F.col("s.cent_id").alias("cent_id"),
        )
    )
    # probe lists: top-N_PROBE centroids per query
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cent_score").desc(), F.col("cent_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cent_score", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
        .withColumn("r", F.row_number().over(probe_w))
        .filter(F.col("r") <= N_PROBE)
        .select("query_id", "qv", "qn", "cent_id")
    )
    scored = probes.join(assigned, "cent_id").select(
        "query_id",
        "neighbor_id",
        _trunc5(_dot(F.col("qv"), F.col("cv_")) / (F.col("qn") * F.col("cn_"))).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket. Recall is
    traded for a pair space of |bucket|; exactness is checked against
    ann_cosine_topk in tests (recall floor), not an oracle."""
    e = _emb(spark, sf_dir).withColumn("nrm", _norm(F.col("v"))).withColumn(
        "bucket", _lsh_bucket(F.col("v"))
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), "bucket",
    )
    c = e.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), "bucket",
    )
    scored = q.join(c, "bucket").select(
        "query_id",
        "neighbor_id",
        _trunc5(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "score", "rank")
    )
