"""Entity linking: candidate generation + TF-IDF cosine ranking.

All pure DataFrame algebra — no Spark-ML vector UDTs, no Python — so
every stage stays inside Catalyst (column pruning, broadcast
selection, AQE).

Plan shape (kept deliberately shallow — ~5 shuffles total — because
the dictionary side is a dimension-sized computation that should never
dominate the corpus-sized probe):

1. explode dictionary profiles -> per-(curie, token) counts   [shuffle]
2. document frequencies -> idf                                [shuffle]
3. entity weight maps: curie -> map<token, w> + norm          [shuffle]
4. surface token weights re-collected per surface             [shuffle]
5. candidates (surface × exploded alias, broadcast) scored with an
   inline map-lookup dot product; window rank per surface     [shuffle]

Scoring: ``score = exact_label_bonus + dot(w_s, w_e) / |w_e|`` with
``w = token_count · idf``. Per-document tf normalization is omitted on
purpose: dividing ``w_e`` by profile length rescales ``dot`` and
``|w_e|`` identically, and dividing ``w_s`` rescales every candidate
of a surface equally — neither changes any ranking, so the plan drops
two shuffles by not computing totals. Ties break on curie ascending,
so linking is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_col(col):
    """Spark twin of kgeng.extract.mentions.normalize_surface."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


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


def build_link_dims(dictionary: DataFrame) -> dict[str, DataFrame]:
    """Dictionary-side (corpus-independent) linking tables — computable
    before/concurrently with extraction:

    - ``alias_map``: (alias_norm, curie) exploded surface forms
    - ``idf``:       (token, idf) over entity profiles
    - ``ent``:       (curie, w_map map<token,w>, norm_e)
    - ``labels``:    (curie, label_norm) for the exact-label bonus
    - ``link_map``:  (surface_norm, curie) the complete precomputed
      winner map over every alias key (see inline note)
    """
    n_ents = dictionary.count()
    profiles = dictionary.select(
        "curie",
        F.concat_ws(" ", F.col("label"), F.array_join(F.col("aliases"), " ")).alias("doc"),
    )
    tok_e = (
        profiles.select(
            "curie", F.explode(F.split(normalize_col(F.col("doc")), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("curie", "token")
        .agg(F.count("*").alias("cnt"))
    )
    idf = tok_e.groupBy("token").agg(
        (F.log((F.lit(n_ents) + 1.0) / (F.countDistinct("curie") + 1.0)) + 1.0).alias("idf")
    )
    ent = (
        tok_e.join(idf, "token")
        .withColumn("w", F.col("cnt") * F.col("idf"))
        .groupBy("curie")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("token", "w"))).alias("w_map"),
            F.sqrt(F.sum(F.col("w") ** 2)).alias("norm_e"),
        )
    )
    alias_map = (
        dictionary.select("curie", F.explode("aliases").alias("alias"))
        .select("curie", normalize_col(F.col("alias")).alias("alias_norm"))
        .distinct()
    )
    labels = dictionary.select("curie", normalize_col(F.col("label")).alias("label_norm"))
    dims = {"alias_map": alias_map, "idf": idf, "ent": ent, "labels": labels}
    # The complete winner map alias_norm -> curie is itself
    # dictionary-side: candidate generation is an equi-join on
    # alias_norm, so only alias-shaped surfaces can link, and scoring a
    # surface uses nothing but the dictionary tables above. Ranking
    # every alias key once HERE (corpus-independent, overlapped with
    # extraction by the pipeline's dictionary-side thread) lets
    # link_triples skip both its corpus-wide surface pass and the
    # per-run map computation; entries for aliases that never occur in
    # a corpus match no row and change nothing.
    all_alias_keys = alias_map.select(F.col("alias_norm").alias("surface_norm")).distinct()
    dims["link_map"] = link_map(all_alias_keys, dims=dims)
    return dims


def rank_candidates(
    surfaces: DataFrame,
    dictionary: DataFrame | None = None,
    dims: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """-> (surface_norm, curie, score, rank) with rank=1 the chosen
    link for each surface. Pass precomputed ``dims`` (from
    :func:`build_link_dims`, possibly read back from parquet) to skip
    the dictionary-side computation at probe time."""
    if dims is None:
        if dictionary is None:
            raise ValueError("need dictionary or dims")
        dims = build_link_dims(dictionary)
    idf, ent, labels = dims["idf"], dims["ent"], dims["labels"]

    # surface token weights, re-collected per surface (surfaces are
    # short strings; the explode is 1-3 rows each)
    surf = (
        surfaces.select("surface_norm")
        .distinct()
        .select("surface_norm", F.explode(F.split(F.col("surface_norm"), " ")).alias("token"))
        .groupBy("surface_norm", "token")
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(idf), "token", "left")
        .withColumn("w", F.col("cnt") * F.coalesce(F.col("idf"), F.lit(0.0)))
        .groupBy("surface_norm")
        .agg(F.collect_list(F.struct("token", "w")).alias("s_toks"))
    )

    # candidates scored with inline map-lookup dot product
    cands = surfaces.select("surface_norm").distinct().join(
        F.broadcast(dims["alias_map"]),
        F.col("surface_norm") == F.col("alias_norm"),
    ).select("surface_norm", "curie")
    dot = F.aggregate(
        F.col("s_toks"),
        F.lit(0.0),
        lambda acc, st: acc
        + st["w"] * F.coalesce(F.element_at(F.col("w_map"), st["token"]), F.lit(0.0)),
    )
    scored = (
        cands.join(surf, "surface_norm")
        .join(F.broadcast(ent), "curie")
        .join(F.broadcast(labels), "curie")
        .select(
            "surface_norm",
            "curie",
            (
                dot / F.col("norm_e")
                + F.when(F.col("surface_norm") == F.col("label_norm"), 1.0).otherwise(0.0)
            ).alias("score"),
        )
    )
    w = Window.partitionBy("surface_norm").orderBy(F.col("score").desc(), F.col("curie"))
    return scored.withColumn("rank", F.row_number().over(w))


def link_map(
    surfaces: DataFrame,
    dictionary: DataFrame | None = None,
    dims: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """-> (surface_norm, curie): the winning link per surface."""
    return rank_candidates(surfaces, dictionary, dims).filter(F.col("rank") == 1).select(
        "surface_norm", "curie"
    )


def link_triples(
    triples: DataFrame,
    dictionary: DataFrame | None = None,
    dims: dict[str, DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """triples(url, subject_surface, predicate, object_surface) ->
    (linked(url, subject_curie, predicate, object_curie), unlinked).

    Endpoints that match no dictionary alias drop to the ``unlinked``
    side-channel (the linking twin of J2's join-miss drop,
    ``Kuzu/kuzu_build_graph_csv.py:342-347``).
    """
    if dims is None:
        if dictionary is None:
            raise ValueError("need dictionary or dims")
        dims = build_link_dims(dictionary)
    # The winner map is dictionary-side (see build_link_dims): only
    # alias-shaped surfaces can link (candidate generation is an
    # equi-join on alias_norm) and scoring uses only dictionary
    # tables, so the precomputed complete alias_norm -> curie map
    # replaces the old corpus-wide surface pass (a scan + distinct
    # shuffle of EVERY surface string — the measured hot spot of this
    # stage) AND the per-run map computation. Entries for aliases the
    # corpus never mentions match no row below; corpus surfaces that
    # are no alias get NULL — the unlinked side-channel — exactly as
    # before. The map is dimension-sized: lazy-checkpoint once for the
    # two broadcast builds below.
    if "link_map" not in dims:
        # dims from an older caller without the precomputed table:
        # derive it the same dictionary-side way
        all_alias_keys = (
            dims["alias_map"].select(F.col("alias_norm").alias("surface_norm")).distinct()
        )
        dims = {**dims, "link_map": link_map(all_alias_keys, dims=dims)}
    lm = dims["link_map"].localCheckpoint(eager=False)
    lm = F.broadcast(lm)
    t = triples.withColumn("s_norm", normalize_col(F.col("subject_surface"))).withColumn(
        "o_norm", normalize_col(F.col("object_surface"))
    )
    s_map = lm.withColumnRenamed("surface_norm", "s_norm").withColumnRenamed("curie", "subject_curie")
    o_map = lm.withColumnRenamed("surface_norm", "o_norm").withColumnRenamed("curie", "object_curie")
    # the linked and unlinked branches both consume this join —
    # materialize it once instead of re-running the normalize + two
    # broadcast joins over the full triple set per output branch
    joined = t.join(s_map, "s_norm", "left").join(o_map, "o_norm", "left").localCheckpoint(
        eager=False
    )
    linked = joined.filter(
        F.col("subject_curie").isNotNull() & F.col("object_curie").isNotNull()
    ).select("url", "sentence_idx", "subject_curie", "predicate", "object_curie")
    unlinked = joined.filter(
        F.col("subject_curie").isNull() | F.col("object_curie").isNull()
    ).select("url", "sentence_idx", "subject_surface", "predicate", "object_surface")
    return linked, unlinked
