"""Dictionary + alias-trie mention detection.

The alias dictionary is collected once on the driver, compiled into a
token-level longest-match trie, and shipped to executors as a Spark
broadcast (the distributed twin of the reference's 9.8M-entry in-heap
node lookup dict, ``Kuzu/kuzu_build_graph_csv.py:210-239``). Matching
runs inside ``mapInPandas`` — Arrow batches, no per-row Python at the
boundary.

Scale note: a Common-Crawl-scale alias set (~10⁷ surface forms) is a
few GB broadcast — the same order the reference already holds in heap
on one machine; beyond ``MAX_COLLECTED_ALIASES`` distinct surfaces,
``detect_mentions`` automatically switches to the join-based exact
path (positional n-gram explode + alias equi-join + a greedy-cursor
``F.aggregate`` fold), which keeps the dictionary fully distributed
and produces identical mentions.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MENTIONS_OUT_SCHEMA = "url string, surface string, alias_norm string, n_tokens int"

_TOKEN = re.compile(r"[^\s]+")
_EDGE_PUNCT = re.compile(r"^[^\w]+|[^\w]+$")


def normalize_surface(s: str) -> str:
    """Shared surface normalization for trie keys and lookups."""
    return re.sub(r"\s+", " ", s).strip().lower()


def build_alias_trie(aliases: list[str]) -> tuple[dict[str, bool], int]:
    """Compile alias surfaces into a token-count-keyed exact-match set.

    Returns ``(lookup, max_tokens)`` where ``lookup`` maps normalized
    alias -> True and ``max_tokens`` bounds the scan window.
    """
    lookup: dict[str, bool] = {}
    max_tokens = 1
    for a in aliases:
        norm = normalize_surface(a)
        if not norm:
            continue
        lookup[norm] = True
        max_tokens = max(max_tokens, norm.count(" ") + 1)
    return lookup, max_tokens


def _scan_text(text: str, lookup: dict[str, bool], max_n: int) -> list[tuple[str, str, int]]:
    """Longest-match-first scan: at each token position try windows of
    max_n..1 tokens; on a hit, emit and jump past the match."""
    out = []
    tokens = [_EDGE_PUNCT.sub("", t) for t in _TOKEN.findall(text)]
    i, n = 0, len(tokens)
    while i < n:
        matched = False
        for w in range(min(max_n, n - i), 0, -1):
            surface = " ".join(tokens[i : i + w])
            norm = normalize_surface(surface)
            if norm in lookup:
                out.append((surface, norm, w))
                i += w
                matched = True
                break
        if not matched:
            i += 1
    return out


# Collect guard: a dictionary beyond this many distinct aliases is not
# collected to the driver — detect_mentions auto-switches to the
# join-based exact-match path below. ~10^7 short strings ≈ a few GB of
# driver heap; the switch happens well before the driver OOMs
# mid-collect.
MAX_COLLECTED_ALIASES = 20_000_000


def _normalize_alias_df(distinct_aliases: DataFrame) -> DataFrame:
    """Distributed twin of ``normalize_surface`` over an alias column —
    runs the SAME Python normalizer via mapInPandas so the join path
    cannot drift from the trie path on regex-dialect edges (Python
    ``\\s``/``\\w`` are unicode-aware; Java's default is ASCII)."""

    def norm_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"alias_norm": [normalize_surface(a) for a in pdf["alias"]]}
            )

    return (
        distinct_aliases.mapInPandas(norm_batches, schema="alias_norm string")
        .filter("alias_norm != ''")
        .distinct()
    )


def _detect_mentions_join(
    spark: SparkSession, pages: DataFrame, distinct_aliases: DataFrame
) -> DataFrame:
    """Join-based exact-match mention detection — the 10⁷⁺-alias path
    where the dictionary never touches the driver.

    1. Normalize the alias set distributedly; take ``max_tokens`` (one
       scalar) to bound the n-gram window.
    2. Explode each page into positional token n-grams (w = 1..max_n)
       inside mapInPandas with the SAME tokenizer the trie scan uses —
       candidate volume is O(tokens × max_n), all distributed.
    3. Equi-join candidates against the alias set (Spark picks
       broadcast vs shuffle from stats; at 10⁷⁺ aliases this is the
       shuffle join the trie path cannot be).
    4. Replay the greedy longest-match-first cursor per url as a pure
       ``F.aggregate`` fold over the (pos asc, w desc)-sorted
       candidates: accept a candidate iff it starts at/after the
       cursor, then jump the cursor past it — bit-identical to
       ``_scan_text``'s emit-and-jump loop, no Python at this stage.
    """
    from pyspark.sql import functions as F

    norms = _normalize_alias_df(distinct_aliases)
    max_row = norms.select(
        F.max(F.size(F.split(F.col("alias_norm"), " "))).alias("mx")
    ).first()
    max_n = int(max_row["mx"] or 1)

    def emit_ngrams(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "url": [], "pos": [], "w": [], "surface": [], "alias_norm": []
            }
            for url, text in zip(pdf["url"], pdf["text"]):
                if not text:
                    continue
                tokens = [_EDGE_PUNCT.sub("", t) for t in _TOKEN.findall(text)]
                n = len(tokens)
                for i in range(n):
                    for w in range(1, min(max_n, n - i) + 1):
                        surface = " ".join(tokens[i : i + w])
                        rows["url"].append(url)
                        rows["pos"].append(i)
                        rows["w"].append(w)
                        rows["surface"].append(surface)
                        rows["alias_norm"].append(normalize_surface(surface))
            yield pd.DataFrame(rows)

    cand = pages.select("url", "text").mapInPandas(
        emit_ngrams, schema="url string, pos int, w int, surface string, alias_norm string"
    )
    matched = cand.join(norms, "alias_norm")
    # Pre-reduce to the max-w match per (url, pos) BEFORE collecting:
    # the greedy cursor can only ever accept the widest match at a
    # position (it sorts (pos, -w) and jumps past every shorter one),
    # so this aggregation is semantics-preserving — and it bounds the
    # collected per-page array at O(tokens) instead of O(tokens×max_n),
    # which on a dictionary-dense page could otherwise hit per-row /
    # shuffle-record limits at the 10⁷-alias scale (ADVICE r3). Ties
    # in w at one pos are the SAME n-gram (same surface, same norm),
    # so max_by's tie choice is immaterial. The partial (map-side)
    # max_by collapses most duplicates before the shuffle.
    matched = (
        matched.groupBy("url", "pos")
        .agg(F.max_by(F.struct("w", "surface", "alias_norm"), F.col("w")).alias("c"))
        .select("url", "pos", "c.w", "c.surface", "c.alias_norm")
    )
    sorted_cands = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("pos").alias("pos"),
                (-F.col("w")).alias("negw"),
                F.col("w").alias("w"),
                F.col("surface").alias("surface"),
                F.col("alias_norm").alias("alias_norm"),
            )
        )
    )
    kept_type = "array<struct<surface:string,alias_norm:string,n_tokens:int>>"
    init = F.struct(
        F.lit(0).alias("cur"), F.array().cast(kept_type).alias("kept")
    )

    def step(acc, c):
        keep = F.struct(
            c["surface"].alias("surface"),
            c["alias_norm"].alias("alias_norm"),
            c["w"].alias("n_tokens"),
        )
        return F.when(
            c["pos"] >= acc["cur"],
            F.struct(
                (c["pos"] + c["w"]).alias("cur"),
                F.concat(acc["kept"], F.array(keep)).alias("kept"),
            ),
        ).otherwise(acc)

    folded = matched.groupBy("url").agg(
        F.aggregate(sorted_cands, init, step, lambda acc: acc["kept"]).alias("kept")
    )
    return folded.select("url", F.explode("kept").alias("m")).select(
        "url", "m.surface", "m.alias_norm", "m.n_tokens"
    )


def detect_mentions(
    spark: SparkSession,
    pages: DataFrame,
    dictionary: DataFrame,
    max_collected_aliases: int = MAX_COLLECTED_ALIASES,
) -> DataFrame:
    """pages(url, text) × dictionary(curie, aliases) ->
    mentions(url, surface, alias_norm, n_tokens).

    Auto-switches implementation on dictionary size: below
    ``max_collected_aliases`` distinct surfaces the alias set is
    collected into a broadcast trie (one pass over the text, no
    candidate blow-up); above it, the join-based path keeps the
    dictionary fully distributed. Both paths produce identical
    mentions (tests/test_mentions.py proves it on the same corpus).

    Linking (alias_norm -> curie) is a separate broadcast join so the
    ambiguity-resolution ranker stays in DataFrame land.
    """
    distinct_aliases = dictionary.selectExpr("explode(aliases) AS alias").distinct()
    n_aliases = distinct_aliases.count()
    if n_aliases > max_collected_aliases:
        return _detect_mentions_join(spark, pages, distinct_aliases)
    alias_rows = distinct_aliases.collect()
    lookup, max_n = build_alias_trie([r["alias"] for r in alias_rows])
    bc = spark.sparkContext.broadcast((lookup, max_n))

    def scan_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lk, mx = bc.value
        for pdf in batches:
            rows: dict[str, list] = {"url": [], "surface": [], "alias_norm": [], "n_tokens": []}
            for url, text in zip(pdf["url"], pdf["text"]):
                if not text:
                    continue
                for surface, norm, w in _scan_text(text, lk, mx):
                    rows["url"].append(url)
                    rows["surface"].append(surface)
                    rows["alias_norm"].append(norm)
                    rows["n_tokens"].append(w)
            yield pd.DataFrame(rows)

    return pages.select("url", "text").mapInPandas(scan_batches, schema=MENTIONS_OUT_SCHEMA)
