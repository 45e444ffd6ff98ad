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
    return {"alias_map": alias_map, "idf": idf, "ent": ent, "labels": labels}


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
    # one corpus scan: both endpoint surfaces in one explode
    surfaces = triples.select(
        F.explode(
            F.array(
                normalize_col(F.col("subject_surface")),
                normalize_col(F.col("object_surface")),
            )
        ).alias("surface_norm")
    )
    # Only surfaces equal to some dictionary alias can ever produce a
    # link (candidate generation is an equi-join on alias_norm), so the
    # corpus-wide distinct — a shuffle of EVERY surface string, the
    # measured hot spot of the link stage — is pre-filtered with a
    # broadcast semi-join on the alias key set. The shuffled set is
    # then bounded by the dictionary's alias count at any corpus size
    # instead of growing with the corpus's distinct-surface count.
    # Identical link map by construction: non-matching surfaces join to
    # zero candidates, and per-surface scoring is independent across
    # surfaces, so dropping them changes no surviving row.
    alias_keys = dims["alias_map"].select(F.col("alias_norm").alias("surface_norm"))
    surfaces = surfaces.join(F.broadcast(alias_keys), "surface_norm", "left_semi")
    # ... and the distinct surface set — ≤ |aliases| rows after the
    # semi-join — is materialized once: rank_candidates consumes
    # ``surfaces`` twice (token weights + candidate join) and would
    # otherwise re-execute the corpus explode per consumer. Lazy
    # checkpoints: each still materializes exactly once, at its first
    # consumer, without paying a separate blocking job per
    # checkpoint — the link stage runs as one job chain instead of
    # three (corpus-independent fixed latency, but it lands on every
    # leg of the scaling pair).
    surfaces = surfaces.distinct().localCheckpoint(eager=False)
    # materialize the (small) link map once; both output branches (and
    # both broadcast builds below) reuse it
    lm = link_map(surfaces, dictionary, dims).localCheckpoint(eager=False)
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
