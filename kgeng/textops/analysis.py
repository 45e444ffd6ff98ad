"""Text-analysis operators for a training-data pipeline: token
counting, quality scoring, language identification, document
fingerprinting. All pure DataFrame expressions over the ``documents``
table — no UDFs, everything whole-stage-codegen'd and DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# tiny deterministic stopword profiles for the n-gram/stopword language
# heuristic; priority order breaks ties (en > de > es > fr > zh)
LANG_PROFILES: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and"]),
    ("de", ["der", "die", "das", "und"]),
    ("es", ["el", "los", "las", "que"]),
    ("fr", ["le", "la", "et", "les"]),
]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def tokens_col(text: Column) -> Column:
    return F.split(text, r"\s+")


def stopword_count(text: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens_col(text), lambda t: t.isin(*words)))


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + punctuation-aware token count per document."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(tokens_col(F.col("text"))).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: stopword ratio + length saturation +
    mean token length (single-space corpora let mean length be derived
    arithmetically, keeping the op codegen-only)."""
    d = _docs(spark, sf_dir)
    n = F.size(tokens_col(F.col("text")))
    sw = stopword_count(F.col("text"), ["the", "a"])
    mean_len = (F.length("text") - (n - 1)) / n
    score = 0.4 * (sw / n) + 0.4 * F.least(n / F.lit(100.0), F.lit(1.0)) + 0.2 * F.least(
        mean_len / F.lit(8.0), F.lit(1.0)
    )
    # floor-truncation instead of round(): both engines compute
    # bit-identical doubles for this expression tree, and floor of an
    # identical double is engine-independent, while round() semantics
    # at exact .5 boundaries are not (HALF_UP vs half-away-on-binary)
    def trunc4(c):
        return F.floor(c * 10000) / 10000

    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        trunc4(sw / n).alias("stopword_ratio"),
        trunc4(mean_len).alias("mean_token_len"),
        trunc4(score).alias("quality_score"),
    )


def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID, reported as a (lang, lang_pred)
    confusion matrix. Argmax with fixed priority order for ties."""
    d = _docs(spark, sf_dir)
    scores = {lang: stopword_count(F.col("text"), words) for lang, words in LANG_PROFILES}
    best = F.greatest(*scores.values())
    pred = F.lit("en")  # priority fallback
    for lang, _ in reversed(LANG_PROFILES):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return (
        d.select("lang", pred.alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of case-normalized text); distinct
    fingerprints per source — the audit a dedup pass starts from."""
    d = _docs(spark, sf_dir)
    fp = F.md5(F.lower(F.col("text")))
    return (
        d.select("source", fp.alias("fp"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct_fp"),
        )
    )
