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


def extract_text_py_reference(html_bytes: bytes | None) -> str | None:
    """The stdlib-``html.parser`` twin of the extraction contract —
    kept as the readable reference implementation; the hot path is the
    scanner below (same contract, ~4× faster), and the two are
    differential-tested against each other over the fixture corpus."""
    if html_bytes is None:
        return None
    raw = bytes(html_bytes)
    if raw[:2] == b"\x1f\x8b":
        import gzip

        try:
            raw = gzip.decompress(raw)
        except Exception:
            pass
    doc = raw.decode("utf-8", errors="replace")
    p = _ParagraphExtractor()
    try:
        p.feed(doc)
        p.close()
    except Exception:
        # malformed beyond recovery: emit what was collected so far —
        # still deterministic for identical bytes
        pass
    return "\n".join(p.paras)


# FAST start-tag path: the clean shape that dominates real pages —
# whitespace-separated attributes, single '=', quoted or conservative
# bare values. Every string this matches is parsed identically by
# html.parser's tolerant grammar below (each piece is a strict subset
# of the tolerant pieces), so name/self-closing/end can be read off
# the groups with one C-speed match. Bare values are atomic so the
# trailing (/?) can never steal a '/' the tolerant grammar folds INTO
# an unquoted value (html.parser: `<a href=http://x/>` is NOT
# self-closing). Anything else falls back to the faithful port.
_FAST_TAG = re.compile(
    r"<([a-zA-Z][-a-zA-Z0-9:._]*)"
    r"((?:\s+[a-zA-Z_:@-][-a-zA-Z0-9_:.@]*"
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|(?>[-a-zA-Z0-9._:/&;#%+]+)))?)*)"
    r"\s*(/?)>"
)

# BORING-RUN skip: while text is being DISCARDED (outside any open
# <p>, or inside a skip subtree), the only constructs that can change
# scanner state are the 8 interesting element names (p + skip set,
# any letter case), comments/declarations/PIs/marked sections ('<!',
# '<?'), and anything the fast grammar can't parse. Everything else —
# text runs, stray '<', boring START tags in the _FAST_TAG shape,
# boring STRICT end tags — is state-neutral, so one C-speed match
# consumes a maximal run of them per Python iteration instead of one
# tag each (a boilerplate sidebar of hundreds of <a> links costs one
# match). Consumption extent per piece is identical to the per-tag
# code path by construction: the start-tag piece IS the _FAST_TAG
# body (a strict subset of the tolerant grammar), the end-tag piece
# IS the strict _END_TAG shape with no leading whitespace (a
# whitespace-led or tolerant-junk end tag falls through to the slow
# path), and the name lookaheads use html.parser's own name-boundary
# charset so `<pre>`/`<param>` stay boring while `<P/>` stays
# interesting.
_INTERESTING_NAME = r"(?i:p|nav|header|footer|aside|script|style|template)[\t\n\r\f />\x00]"
_BORING_RUN = re.compile(
    r"(?:"
    r"[^<]+"                                   # discarded text run
    r"|<(?![a-zA-Z!/?])"                       # stray '<' => data
    r"|</(?!\s)(?!" + _INTERESTING_NAME + r")"
    r"[a-zA-Z][-.a-zA-Z0-9:_]*\s*>"            # boring strict end tag
    r"|<(?!" + _INTERESTING_NAME + r")"
    r"[a-zA-Z][-a-zA-Z0-9:._]*"                # boring fast start tag
    r"(?:\s+[a-zA-Z_:@-][-a-zA-Z0-9_:.@]*"
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|(?>[-a-zA-Z0-9._:/&;#%+]+)))?)*"
    r"\s*/?>"
    r")+"
)

# Faithful port of html.parser's tolerant start-tag grammar (CPython
# Lib/html/parser.py: locatestarttagend_tolerant / tagfind_tolerant /
# attrfind_tolerant — public stdlib source; the reference kernel IS
# html.parser, so divergence here is a correctness bug). The three
# regexes must stay in lockstep exactly as the stdlib warns.
_LOCATE_START = re.compile(
    r"""<[a-zA-Z][^\t\n\r\f />\x00]*   # tag name
  (?:[\s/]*                            # optional ws before attr name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*    # attribute name
      (?:\s*=+\s*                      # value indicator
        (?:'[^']*'                     # LITA-enclosed value
          |"[^"]*"                     # LIT-enclosed value
          |(?!['"])[^>\s]*             # bare value
         )
        \s*
       )?(?:\s|/(?!>))*
     )*
   )?
  \s*""",
    re.VERBOSE,
)
_TAGFIND = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
_ATTRFIND = re.compile(
    r'((?<=[\'"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*'
    r'(\'[^\']*\'|"[^"]*"|(?![\'"])[^>\s]*))?(?:\s|/(?!>))*'
)
# check_for_whole_start_tag: these next-chars after the locate match
# mean "incomplete tag" — html.parser buffers, then at close() emits
# the region through the next '>' as data (goahead end-of-feed path)
_INCOMPLETE_NEXT = frozenset("abcdefghijklmnopqrstuvwxyz" "ABCDEFGHIJKLMNOPQRSTUVWXYZ=/")

# end-tag grammar (html.parser's endtagfind): whitespace allowed after
# '</', name charset restricted vs start tags; non-matching '</...' is
# a bogus comment
_END_TAG = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
# html.parser's TOLERANT end-tag fallback (tagfind_tolerant): when the
# strict grammar fails but a name starts right at '</', the junk
# between the name and the next '>' is swallowed and the end tag STILL
# fires — `</p </p>` closes p once (fuzz catch, r6)
_END_TAG_TOLERANT = re.compile(r"</([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")

# set_cdata_mode's `interesting` regex: ws allowed after '</' and
# before '>', attribute junk NOT allowed (</script foo> does not end
# the element in html.parser)
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.I),
    "style": re.compile(r"</\s*style\s*>", re.I),
}
# parse_comment closes on `--\s*>`, not the literal '-->'
_COMMENT_CLOSE = re.compile(r"--\s*>")
# _markupbase marked sections: <![keyword ... ]]> (or MS-Office ]>)
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_MARKED_CLOSE = re.compile(r"]\s*]\s*>")
_MS_MARKED_CLOSE = re.compile(r"]\s*>")


def extract_text_py(html_bytes: bytes | None) -> str | None:
    """The deterministic extraction kernel (pure function of the
    bytes): a single-pass tag scanner implementing the same contract
    as :func:`extract_text_py_reference` — skip-subtree nesting,
    script/style CDATA, comments, <p>-subtree text with entity
    unescape and whitespace collapse — without html.parser's per-tag
    callback overhead (measured 3.8 → ~1 ms per 19 KB page).

    Malformed input is handled deterministically: a stray ``<`` is
    text (the html.parser behavior), ``<p/>`` opens and closes, an
    unterminated comment or CDATA element runs to end-of-document.

    Gzip payloads (Common-Crawl WARC bodies arrive gzipped) are
    decompressed transparently on the magic bytes — keeping the
    column compressed end-to-end means the JVM→Python Arrow channel
    ships ~20× fewer bytes for boilerplate-heavy pages, and the
    decompress cost rides inside the perfectly-parallel kernel.
    """
    if html_bytes is None:
        return None
    raw = bytes(html_bytes)
    if raw[:2] == b"\x1f\x8b":
        import gzip

        try:
            raw = gzip.decompress(raw)
        except Exception:
            pass  # not actually gzip: treat the raw bytes as the doc
    doc = raw.decode("utf-8", errors="replace")
    from html import unescape

    paras: list[str] = []
    buf: list[str] = []
    skip_depth = 0
    p_depth = 0
    i, n = 0, len(doc)
    find = doc.find
    boring = _BORING_RUN.match
    while i < n:
        if p_depth == 0 or skip_depth:
            # text is being discarded: eat the maximal state-neutral
            # run (text + boring tags) in one C-speed match
            bm = boring(doc, i)
            if bm and bm.end() > i:
                i = bm.end()
                if i >= n:
                    break
        lt = find("<", i)
        if lt == -1:
            # trailing text with no '<' left: an open paragraph can
            # never close now, so the tail never reaches paras
            break
        if lt > i and p_depth and not skip_depth:
            # unescape PER TEXT RUN, like html.parser's
            # convert_charrefs: an entity split across a tag boundary
            # stays literal instead of decoding after join
            buf.append(unescape(doc[i:lt]))
        # single-char dispatch on what follows '<' (cheaper than a
        # startswith cascade at ~800 tags/page)
        nxt = doc[lt + 1] if lt + 1 < n else ""
        if nxt == "!" and doc.startswith("<!--", lt):
            end = _COMMENT_CLOSE.search(doc, lt + 4)
            if end:
                i = end.end()
                continue
            # no '--\s*>' terminator: html.parser degrades the comment
            # opener to literal DATA through the next '>' inclusive
            # (so '<!-->' and '<!--->' are text, and a following real
            # end tag can be consumed) — probed matrix in the tests
            gt = find(">", lt + 4)
            if gt == -1:
                # no '>' anywhere after: html.parser still buffers the
                # tail as data, but with no '>' no paragraph can ever
                # close, so nothing reaches paras — stop without the
                # write-only append
                break
            if p_depth and not skip_depth:
                buf.append(unescape(doc[lt : gt + 1]))
            i = gt + 1
            continue
        if nxt == "!" and doc.startswith("<![", lt):
            # marked section (_markupbase.parse_marked_section): known
            # keywords scan to ']]>' (']>' for the MS-Office trio); an
            # unknown or missing keyword raises in html.parser, which
            # the reference kernel's guard turns into truncate-here
            nm = _DECLNAME.match(doc, lt + 3)
            if not nm or nm.end() == n:
                break
            sect = nm.group().strip().lower()
            if sect in ("temp", "cdata", "ignore", "include", "rcdata"):
                cm = _MARKED_CLOSE.search(doc, lt + 3)
            elif sect in ("if", "else", "endif"):
                cm = _MS_MARKED_CLOSE.search(doc, lt + 3)
            else:
                break
            if cm:
                i = cm.end()
                continue
            # unterminated: close()-time recovery emits through the
            # next '>' as data; with no '>' at all nothing downstream
            # can ever close a paragraph, so stop
            gt = find(">", lt + 1)
            if gt == -1:
                break
            if p_depth and not skip_depth:
                buf.append(unescape(doc[lt : gt + 1]))
            i = gt + 1
            continue
        if nxt == "/":
            # end tags: strict grammar first; then html.parser's
            # tolerant path (name right at '</' + junk swallowed to the
            # next '>', end tag still fired); then bogus comment
            # swallowed through the next '>'. An incomplete '</...'
            # with no '>' before EOF becomes buffered data in
            # html.parser (the goahead end-of-feed path) — but with no
            # '>' left no paragraph can ever close, so none of it can
            # reach paras and the scanner just stops.
            em = _END_TAG.match(doc, lt)
            if em:
                name = em.group(1).lower()
                i = em.end()
            else:
                tm = _END_TAG_TOLERANT.match(doc, lt)
                gt = find(">", tm.end() if tm else lt + 2)
                if gt == -1:
                    break
                if not tm:
                    i = gt + 1
                    continue
                name = tm.group(1).lower()
                i = gt + 1
            if name in _SKIP_SUBTREE:
                if skip_depth:
                    skip_depth -= 1
            elif name == "p" and p_depth:
                p_depth -= 1
                if p_depth == 0:
                    text = _WS.sub(" ", "".join(buf)).strip()
                    if text:
                        paras.append(text)
            continue
        if nxt == "!" or nxt == "?":
            # declaration / processing instruction
            gt = find(">", lt)
            i = n if gt == -1 else gt + 1
            continue
        if not ("a" <= nxt <= "z" or "A" <= nxt <= "Z"):
            # stray '<' (goahead: handle_data("<"), resume after it)
            if p_depth and not skip_depth:
                buf.append("<")
            i = lt + 1
            continue
        fm = _FAST_TAG.match(doc, lt)
        if fm:
            name = fm.group(1).lower()
            self_closing = fm.group(3) == "/"
            i = fm.end()
        else:
            # faithful parse_starttag / check_for_whole_start_tag port
            m = _LOCATE_START.match(doc, lt)  # can't fail: '<'+letter
            j = m.end()
            nxt2 = doc[j : j + 1]
            if nxt2 == ">":
                endpos = j + 1
            elif nxt2 == "/":
                endpos = j + 2 if doc.startswith("/>", j) else -1
            elif nxt2 == "" or nxt2 in _INCOMPLETE_NEXT:
                endpos = -1
            else:
                endpos = j  # tag region with no '>': junk-checked below
            if endpos < 0:
                # incomplete tag: close()-time goahead emits the region
                # through the next '>' as DATA and resumes; with no '>'
                # at all no paragraph can ever close downstream
                gt = find(">", lt + 1)
                if gt == -1:
                    break
                if p_depth and not skip_depth:
                    buf.append(unescape(doc[lt : gt + 1]))
                i = gt + 1
                continue
            tm = _TAGFIND.match(doc, lt + 1)
            name = tm.group(1).lower()
            k = tm.end()
            while k < endpos:
                am = _ATTRFIND.match(doc, k)
                if not am:
                    break
                k = am.end()
            endtxt = doc[k:endpos].strip()
            if endtxt not in (">", "/>"):
                # attr junk the tolerant grammar skipped but attrfind
                # can't parse: parse_starttag degrades the WHOLE tag
                # region to data — RAW, not unescaped (handle_data is
                # called directly, bypassing convert_charrefs)
                if p_depth and not skip_depth:
                    buf.append(doc[lt:endpos])
                i = endpos
                continue
            self_closing = endtxt == "/>"
            i = endpos
        if name in _CDATA_CLOSE and not self_closing:
            close = _CDATA_CLOSE[name].search(doc, i)
            i = n if close is None else close.end()
            continue
        if name in _VOID:
            continue
        # a self-closing tag is handle_startendtag = starttag THEN
        # endtag. The extractor's starttag ignores p inside a skip
        # subtree, but its ENDTAG decrements p_depth and flushes
        # REGARDLESS of skip depth — so `<p/>` inside <nav> closes an
        # outer open paragraph exactly like a bare `</p>` there would
        # (review catch r6: the old `skip_depth == 0` guard made it a
        # no-op and desynced every later paragraph boundary)
        if name in _SKIP_SUBTREE:
            if not self_closing:
                skip_depth += 1
            # self-closing: start (+1) then end (-1) — net no-op
        elif name == "p":
            if skip_depth == 0:
                if p_depth == 0:
                    buf = []
                p_depth += 1
            if self_closing and p_depth:
                p_depth -= 1
                if p_depth == 0:
                    text = _WS.sub(" ", "".join(buf)).strip()
                    if text:
                        paras.append(text)
    return "\n".join(paras)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


def extracted_text(html_col: Column) -> Column:
    """Column-level entry point: ``df.withColumn("text",
    extracted_text(F.col("html")))``."""
    return extract_text_udf(html_col)
