"""MinHash-LSH blocking for entity canonicalization (BASELINE.json
north_star: "connected-components ... plus min-hash LSH blocking for
entity canonicalization").

Equivalent-identifier CC (kgeng.canon.cc) merges entities that share
an id; this module adds the NEAR-DUPLICATE-NAME merge path: entity
labels are shingled into character 3-grams, banded MinHash proposes
candidate pairs, exact Jaccard verifies, and the surviving pairs
become extra CC edges. The hash family is the same portable
md5+integer-permutation family as kgeng.textops.dedup, so blocking is
deterministic on any engine at any parallelism.

Character (not word) shingles: entity labels are short strings where
word 3-grams barely exist but typos/variants ("acetaminophen" vs
"acetaminophene") differ in a few characters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgeng.textops.dedup import _jaccard_for_pairs, minhash_bands

NAME_JACCARD_THRESHOLD = 0.8


def label_char_shingles(dictionary: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id=curie, sh): distinct character n-grams of the
    normalized label — the shingle shape the MinHash/Jaccard machinery
    in kgeng.textops.dedup consumes (its key column is named doc_id
    but is type-agnostic)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col("label"), r"\s+", " ")))
    ln = F.length(norm)
    idx = F.when(ln >= n, F.sequence(F.lit(1), ln - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.substring(norm, i, n))
    return dictionary.select(
        F.col("curie").alias("doc_id"), F.explode(F.array_distinct(grams)).alias("sh")
    )


def near_dup_label_pairs(
    dictionary: DataFrame, threshold: float = NAME_JACCARD_THRESHOLD
) -> DataFrame:
    """(curie_a, curie_b, jaccard): label near-duplicate pairs via
    banded MinHash candidates + exact Jaccard verification — the
    linear-candidate-space blocking step, never the |entities|² scan."""
    sh = label_char_shingles(dictionary)
    # band keys computed directly from the wide signature row (see
    # kgeng.textops.dedup.minhash_bands: byte-identical keys, one
    # shuffle instead of explode + re-group)
    bands = minhash_bands(sh)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    cands = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    verified = _jaccard_for_pairs(sh, cands, threshold)
    return verified.select(
        F.col("doc_a").alias("curie_a"), F.col("doc_b").alias("curie_b"), "jaccard"
    )


def blocking_edges(dictionary: DataFrame, threshold: float = NAME_JACCARD_THRESHOLD) -> DataFrame:
    """Near-dup-label pairs as CC edges (u, v) — union these with the
    equivalent-identifier star edges before connected_components."""
    return near_dup_label_pairs(dictionary, threshold).select(
        F.col("curie_a").alias("u"), F.col("curie_b").alias("v")
    )
