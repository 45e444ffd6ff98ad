"""Boilerplate-stripped text extraction from raw HTML.

Trafilatura-style main-content extraction, reduced to a deterministic
pure-Python kernel so the output is byte-identical per url across
runs, batch sizes, and cluster layouts (BASELINE.json per-row
invariant). Runs as a vectorized pandas UDF — one Arrow batch in, one
out; no per-row Python at the Spark boundary.

The kernel is a real streaming HTML parse (stdlib ``html.parser``),
not a regex scrape: it tracks element nesting, so boilerplate
containers (<nav>/<header>/<footer>/<aside>) and non-content elements
(<script>/<style>/<template>, comments) are excluded even when nested
or malformed, and character/entity references are decoded by the
parser itself.

Extraction contract (the golden ``pages.text`` column is generated
from the same contract by kgeng.fixtures):

1. decode UTF-8 (errors -> U+FFFD),
2. drop content inside script/style/template, comments, and the
   boilerplate containers nav/header/footer/aside (at any depth),
3. take the text of each <p> block, tags stripped, entities unescaped,
   whitespace runs collapsed to single spaces, ends trimmed,
4. join non-empty paragraphs with a single '\n'.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WS = re.compile(r"\s+")

_SKIP_SUBTREE = {"script", "style", "template", "nav", "header", "footer", "aside"}
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class _ParagraphExtractor(HTMLParser):
    """Streaming parse collecting the text of <p> subtrees outside
    boilerplate containers."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.paras: list[str] = []
        self._skip_depth = 0
        self._p_depth = 0
        self._buf: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID:
            return
        if tag in _SKIP_SUBTREE:
            self._skip_depth += 1
        elif tag == "p" and self._skip_depth == 0:
            if self._p_depth == 0:
                self._buf = []
            self._p_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_SUBTREE:
            if self._skip_depth:
                self._skip_depth -= 1
        elif tag == "p" and self._p_depth:
            self._p_depth -= 1
            if self._p_depth == 0:
                text = _WS.sub(" ", "".join(self._buf)).strip()
                if text:
                    self.paras.append(text)

    def handle_data(self, data: str) -> None:
        if self._p_depth and not self._skip_depth:
            self._buf.append(data)


def extract_text_py(html_bytes: bytes | None) -> str | None:
    """The deterministic extraction kernel (pure function of the
    bytes)."""
    if html_bytes is None:
        return None
    doc = bytes(html_bytes).decode("utf-8", errors="replace")
    p = _ParagraphExtractor()
    try:
        p.feed(doc)
        p.close()
    except Exception:
        # malformed beyond recovery: emit what was collected so far —
        # still deterministic for identical bytes
        pass
    return "\n".join(p.paras)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


def extracted_text(html_col: Column) -> Column:
    """Column-level entry point: ``df.withColumn("text",
    extracted_text(F.col("html")))``."""
    return extract_text_udf(html_col)
