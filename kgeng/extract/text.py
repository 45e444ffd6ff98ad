"""Boilerplate-stripped text extraction from raw HTML.

Trafilatura-style main-content extraction, reduced to a deterministic
pure-Python kernel so the output is byte-identical per url across
runs, batch sizes, and cluster layouts (BASELINE.json per-row
invariant). Runs as a vectorized pandas UDF — one Arrow batch in, one
out; no per-row Python at the Spark boundary.

Extraction contract (the golden `pages.text` column is generated from
the same contract by kgeng.fixtures):

1. decode UTF-8 (errors -> U+FFFD),
2. drop <script>/<style> blocks, HTML comments, and the boilerplate
   containers <nav>/<header>/<footer>/<aside>,
3. take the text of each <p> block, tags stripped, entities unescaped,
   whitespace runs collapsed to single spaces, ends trimmed,
4. join non-empty paragraphs with a single '\n'.
"""

from __future__ import annotations

import html as html_mod
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DROP_BLOCKS = re.compile(
    r"<(script|style|nav|header|footer|aside)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENTS = re.compile(r"<!--.*?-->", re.DOTALL)
_PARA = re.compile(r"<p\b[^>]*>(.*?)</p\s*>", re.IGNORECASE | re.DOTALL)
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")


def extract_text_py(html_bytes: bytes | None) -> str | None:
    """The deterministic extraction kernel (pure function of the
    bytes)."""
    if html_bytes is None:
        return None
    doc = bytes(html_bytes).decode("utf-8", errors="replace")
    doc = _COMMENTS.sub(" ", doc)
    doc = _DROP_BLOCKS.sub(" ", doc)
    paras = []
    for m in _PARA.finditer(doc):
        inner = _TAG.sub(" ", m.group(1))
        inner = html_mod.unescape(inner)
        inner = _WS.sub(" ", inner).strip()
        if inner:
            paras.append(inner)
    return "\n".join(paras)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


def extracted_text(html_col: Column) -> Column:
    """Column-level entry point: ``df.withColumn("text",
    extracted_text(F.col("html")))``."""
    return extract_text_udf(html_col)
