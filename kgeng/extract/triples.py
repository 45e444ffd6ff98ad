"""Pattern-based (OpenIE-style) SVO triple extraction.

A batched ``mapInPandas`` operator: pages in, one row per extracted
(subject_surface, predicate, object_surface) out. The kernel is a
deterministic regex over the predicate lexicon — the Spark-side
contract (Arrow batches, schema, fan-out) is exactly what a model- or
parser-backed extractor would use; swapping the kernel does not touch
the plan.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from kgeng.extract.lexicon import PREDICATE_LEXICON

TRIPLES_OUT_SCHEMA = (
    "url string, sentence_idx int, subject_surface string, "
    "predicate string, object_surface string"
)

# longest verb phrases first so "interacts with" wins over "interacts"
_VERB_ALT = "|".join(
    re.escape(v) for v, _ in sorted(PREDICATE_LEXICON, key=lambda t: -len(t[0]))
)
_SVO = re.compile(rf"^(?P<s>.+?)\s+(?P<v>{_VERB_ALT})\s+(?P<o>.+?)[.!?]?$")
_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_VERB_TO_PRED = dict(PREDICATE_LEXICON)


def extract_triples_py(text: str | None) -> list[tuple[int, str, str, str]]:
    """Deterministic kernel: text -> [(sentence_idx, subj_surface,
    predicate_curie, obj_surface)]."""
    if not text:
        return []
    out = []
    idx = 0
    for para in text.split("\n"):
        for sent in _SENT_SPLIT.split(para):
            sent = sent.strip()
            if not sent:
                continue
            m = _SVO.match(sent)
            if m:
                out.append(
                    (idx, m.group("s"), _VERB_TO_PRED[m.group("v")], m.group("o"))
                )
            idx += 1
    return out


def _triples_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: dict[str, list] = {
            "url": [], "sentence_idx": [], "subject_surface": [],
            "predicate": [], "object_surface": [],
        }
        for url, text in zip(pdf["url"], pdf["text"]):
            for idx, s, p, o in extract_triples_py(text):
                rows["url"].append(url)
                rows["sentence_idx"].append(idx)
                rows["subject_surface"].append(s)
                rows["predicate"].append(p)
                rows["object_surface"].append(o)
        yield pd.DataFrame(rows)


def extract_triples(pages: DataFrame) -> DataFrame:
    """pages(url, text, ...) -> triples(url, sentence_idx,
    subject_surface, predicate, object_surface).

    Column pruning happens before the Python boundary: only (url, text)
    cross into Arrow.
    """
    return pages.select("url", "text").mapInPandas(
        _triples_batches, schema=TRIPLES_OUT_SCHEMA
    )
