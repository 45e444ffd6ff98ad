"""Entity linking: candidate generation + TF-IDF cosine ranking.

All pure DataFrame algebra — the TF-IDF pipeline is expressed as
explode/groupBy/join instead of Spark-ML vector UDTs so every stage
stays inside Catalyst (column pruning, broadcast selection, AQE) and
nothing crosses into Python.

Candidate generation is an equi-join of normalized surfaces against
the exploded alias dictionary. Ranking scores each (surface, curie)
pair with

    score = exact_label_bonus + dot(tfidf(surface), tfidf(profile)) / |profile|

where the entity profile is label + aliases. The surface-side norm is
constant within a surface group, so dividing by it cannot change the
ranking — it is omitted. Ties break on curie ascending, so linking is
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_col(col):
    """Spark twin of kgeng.extract.mentions.normalize_surface."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def _tokens(df: DataFrame, id_col: str, doc_col: str) -> DataFrame:
    """(id, doc) -> (id, token, tf) with tf = in-doc term frequency."""
    tok = df.select(
        F.col(id_col), F.explode(F.split(normalize_col(F.col(doc_col)), " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = tok.groupBy(id_col, "token").agg(F.count("*").alias("n"))
    totals = counts.groupBy(id_col).agg(F.sum("n").alias("total"))
    return counts.join(totals, id_col).select(
        id_col, "token", (F.col("n") / F.col("total")).alias("tf")
    )


def candidate_pairs(surfaces: DataFrame, dictionary: DataFrame) -> DataFrame:
    """surfaces(surface_norm) × dictionary(curie, aliases) ->
    (surface_norm, curie) candidate pairs, via broadcast of the
    exploded alias table."""
    alias_map = (
        dictionary.select("curie", F.explode("aliases").alias("alias"))
        .select("curie", normalize_col(F.col("alias")).alias("alias_norm"))
        .distinct()
    )
    return surfaces.select("surface_norm").distinct().join(
        F.broadcast(alias_map),
        F.col("surface_norm") == F.col("alias_norm"),
    ).select("surface_norm", "curie")


def rank_candidates(surfaces: DataFrame, dictionary: DataFrame) -> DataFrame:
    """-> (surface_norm, curie, score, rank) with rank=1 the chosen
    link for each surface."""
    cands = candidate_pairs(surfaces, dictionary)

    profiles = dictionary.select(
        "curie",
        F.concat_ws(" ", F.col("label"), F.array_join(F.col("aliases"), " ")).alias("doc"),
    )
    ent_w = _tokens(profiles, "curie", "doc")
    n_ents = dictionary.select("curie").distinct().count()
    df_t = ent_w.groupBy("token").agg(F.countDistinct("curie").alias("df"))
    idf = df_t.select(
        "token", (F.log((F.lit(n_ents) + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf")
    )
    ent_w = ent_w.join(idf, "token").select(
        "curie", "token", (F.col("tf") * F.col("idf")).alias("w_e")
    )
    ent_norm = ent_w.groupBy("curie").agg(F.sqrt(F.sum(F.col("w_e") ** 2)).alias("norm_e"))

    surf_docs = surfaces.select("surface_norm").distinct().withColumn("doc", F.col("surface_norm"))
    surf_w = _tokens(surf_docs, "surface_norm", "doc").join(idf, "token").select(
        "surface_norm", "token", (F.col("tf") * F.col("idf")).alias("w_s")
    )

    dots = (
        cands.join(surf_w, "surface_norm")
        .join(ent_w, ["curie", "token"])
        .groupBy("surface_norm", "curie")
        .agg(F.sum(F.col("w_s") * F.col("w_e")).alias("dot"))
    )

    labels = dictionary.select("curie", normalize_col(F.col("label")).alias("label_norm"))
    scored = (
        cands.join(dots, ["surface_norm", "curie"], "left")
        .join(F.broadcast(labels), "curie")
        .join(F.broadcast(ent_norm), "curie")
        .select(
            "surface_norm",
            "curie",
            (
                F.coalesce(F.col("dot") / F.col("norm_e"), F.lit(0.0))
                + F.when(F.col("surface_norm") == F.col("label_norm"), 1.0).otherwise(0.0)
            ).alias("score"),
        )
    )
    w = Window.partitionBy("surface_norm").orderBy(F.col("score").desc(), F.col("curie"))
    return scored.withColumn("rank", F.row_number().over(w))


def link_map(surfaces: DataFrame, dictionary: DataFrame) -> DataFrame:
    """-> (surface_norm, curie): the winning link per surface."""
    return rank_candidates(surfaces, dictionary).filter(F.col("rank") == 1).select(
        "surface_norm", "curie"
    )


def link_triples(
    triples: DataFrame, dictionary: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """triples(url, subject_surface, predicate, object_surface) ->
    (linked(url, subject_curie, predicate, object_curie), unlinked).

    Endpoints that match no dictionary alias drop to the ``unlinked``
    side-channel (the linking twin of J2's join-miss drop,
    ``Kuzu/kuzu_build_graph_csv.py:342-347``).
    """
    surfaces = (
        triples.select(normalize_col(F.col("subject_surface")).alias("surface_norm"))
        .unionByName(triples.select(normalize_col(F.col("object_surface")).alias("surface_norm")))
        .distinct()
    )
    lm = F.broadcast(link_map(surfaces, dictionary))
    t = triples.withColumn("s_norm", normalize_col(F.col("subject_surface"))).withColumn(
        "o_norm", normalize_col(F.col("object_surface"))
    )
    s_map = lm.withColumnRenamed("surface_norm", "s_norm").withColumnRenamed("curie", "subject_curie")
    o_map = lm.withColumnRenamed("surface_norm", "o_norm").withColumnRenamed("curie", "object_curie")
    joined = t.join(s_map, "s_norm", "left").join(o_map, "o_norm", "left")
    linked = joined.filter(
        F.col("subject_curie").isNotNull() & F.col("object_curie").isNotNull()
    ).select("url", "sentence_idx", "subject_curie", "predicate", "object_curie")
    unlinked = joined.filter(
        F.col("subject_curie").isNull() | F.col("object_curie").isNull()
    ).select("url", "sentence_idx", "subject_surface", "predicate", "object_surface")
    return linked, unlinked
