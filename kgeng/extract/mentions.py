"""Dictionary + alias-trie mention detection.

The alias dictionary is collected once on the driver, compiled into a
token-level longest-match trie, and shipped to executors as a Spark
broadcast (the distributed twin of the reference's 9.8M-entry in-heap
node lookup dict, ``Kuzu/kuzu_build_graph_csv.py:210-239``). Matching
runs inside ``mapInPandas`` — Arrow batches, no per-row Python at the
boundary.

Scale note: a Common-Crawl-scale alias set (~10⁷ surface forms) is a
few GB broadcast — the same order the reference already holds in heap
on one machine; beyond that, switch ``detect_mentions`` to the
join-based exact path (explode text n-grams, broadcast-join the
dictionary), which this module's normalizer keeps compatible.
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


# Collect guard: a dictionary beyond this many distinct aliases should
# not be collected to the driver — the docstring's join-based path is
# the scale route. ~10^7 short strings ≈ a few GB of driver heap; the
# guard fails loudly well before the driver OOMs mid-collect.
MAX_COLLECTED_ALIASES = 20_000_000


def detect_mentions(
    spark: SparkSession, pages: DataFrame, dictionary: DataFrame
) -> DataFrame:
    """pages(url, text) × dictionary(curie, aliases) ->
    mentions(url, surface, alias_norm, n_tokens).

    Linking (alias_norm -> curie) is a separate broadcast join so the
    ambiguity-resolution ranker stays in DataFrame land.
    """
    distinct_aliases = dictionary.selectExpr("explode(aliases) AS alias").distinct()
    n_aliases = distinct_aliases.count()
    if n_aliases > MAX_COLLECTED_ALIASES:
        raise ValueError(
            f"alias dictionary has {n_aliases:,} distinct surfaces, beyond the "
            f"driver-collect guard ({MAX_COLLECTED_ALIASES:,}); use the "
            f"join-based exact-match path (explode text n-grams + broadcast "
            f"join) instead of the trie broadcast"
        )
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
