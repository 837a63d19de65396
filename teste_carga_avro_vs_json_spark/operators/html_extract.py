"""HTML → text extraction — the ingest stage in front of every web
corpus pipeline (C4/CCNet/RefinedWeb all start from crawled HTML; the
published recipes extract body text, drop script/style/boilerplate
chrome, then run the line- and document-level filters this repo
already ships). The reference engine has no text operators
(SURVEY.md §2.2); this is extension surface.

Engine shape: ONE Arrow-batched pandas-UDF projection per document —
scan-local, zero shuffle, no state — built on the stdlib
``html.parser.HTMLParser`` (tolerant of malformed markup by design, no
external dependency; the real-codec-over-stdlib convention of
``multimodal``'s PNG/BMP/WAV paths). At 100 TB this parallelizes
embarrassingly: the operator composes as the front stage of
``corpus_clean`` / ``c4_line_filter`` with no partitioning demands.

Extraction contract (deterministic, pinned by round-trip tests):

- ``<script>/<style>/<noscript>/<template>`` content is DROPPED.
- ``<nav>/<header>/<footer>/<aside>`` subtrees are DROPPED (chrome —
  the C4 "boilerplate" class; counted in ``n_dropped``).
- ``<title>`` is captured separately, not part of the body text.
- Block-level tags (p, div, li, h1–h6, tr, br, section, article)
  break lines; inline markup concatenates.
- Character references are decoded (``&amp;`` → ``&``).
- Whitespace: runs collapse to one space inside a line; empty lines
  vanish; lines join with ``\\n``.

No SQL oracle: DuckDB has no HTML parser — the surface is pinned by
pytest goldens + an exact round-trip over :func:`synth_html` (the
documented convention for non-relational codecs, e.g.
``functions/avro_generic.py``).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

#: Subtrees whose CONTENT is dropped (code/markup, never prose).
_DROP_CONTENT = frozenset({"script", "style", "noscript", "template"})
#: Boilerplate chrome subtrees dropped wholesale (the C4 class).
_DROP_CHROME = frozenset({"nav", "header", "footer", "aside"})
#: Tags that force a line break around their content.
_BLOCK = frozenset(
    {
        "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5",
        "h6", "tr", "br", "section", "article", "table", "blockquote",
        "pre", "hr",
    }
)
#: Void elements never pushed on the open-element stack (``<br>`` has
#: no end tag — stack-tracking it would poison the drop depth).
_VOID = frozenset({"br", "hr", "img", "meta", "link", "input"})


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.title_chunks: list[str] = []
        self.drop_depth = 0
        self.in_title = False
        self.n_links = 0
        self.n_dropped = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_CONTENT or tag in _DROP_CHROME:
            if self.drop_depth == 0:
                self.n_dropped += 1
            self.drop_depth += 1
            return
        if tag == "title":
            self.in_title = True
        if tag == "a" and self.drop_depth == 0:
            self.n_links += 1
        if tag in _BLOCK:
            self.chunks.append("\n")

    def handle_endtag(self, tag):
        if tag in _DROP_CONTENT or tag in _DROP_CHROME:
            if self.drop_depth > 0:
                self.drop_depth -= 1
            return
        if tag == "title":
            self.in_title = False
        if tag in _BLOCK and tag not in _VOID:
            self.chunks.append("\n")

    def handle_data(self, data):
        if self.drop_depth > 0:
            return
        if self.in_title:
            self.title_chunks.append(data)
        else:
            self.chunks.append(data)


def _normalize(chunks: list[str]) -> str:
    lines = []
    for raw_line in "".join(chunks).split("\n"):
        line = " ".join(raw_line.split())
        if line:
            lines.append(line)
    return "\n".join(lines)


def extract_html(html: str) -> tuple[str, str, int, int]:
    """Pure-Python core: (title, text, n_links, n_dropped)."""
    p = _Extractor()
    p.feed(html or "")
    p.close()
    return (
        " ".join("".join(p.title_chunks).split()),
        _normalize(p.chunks),
        p.n_links,
        p.n_dropped,
    )


def extract_text(frame: DataFrame, html_col: str = "html") -> DataFrame:
    """doc_id + (title, text, n_links, n_dropped) per document — one
    Arrow-batched projection, shuffle-free."""

    @F.pandas_udf(
        "struct<title: string, text: string, n_links: bigint,"
        " n_dropped: bigint>"
    )
    def ex(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for h in batch:
                title, text, n_links, n_dropped = extract_html(h)
                rows.append(
                    {
                        "title": title,
                        "text": text,
                        "n_links": n_links,
                        "n_dropped": n_dropped,
                    }
                )
            yield pd.DataFrame(rows)

    return frame.select("doc_id", ex(F.col(html_col)).alias("e")).select(
        "doc_id", "e.title", "e.text", "e.n_links", "e.n_dropped"
    )


def synth_html(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic HTML page per fixture doc: titled, nav/footer
    chrome with links, a script block, body paragraphs of 12 words
    each — built JVM-side with string expressions (no Python on the
    synth path). Extraction must recover EXACTLY the paragraph text
    (12-word lines joined by newlines) with title ``Doc <id>``, zero
    surviving links (both sit in the dropped ``<nav>``) and 4 dropped
    subtrees (style, nav, script, footer) — the round-trip pin."""
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    # 12-word paragraphs: transform over chunk indices — the token
    # array is staged behind a projection first (HOF-capture rule).
    staged = docs.select("doc_id", toks.alias("toks"))
    paras = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest(
                F.floor((F.size("toks") - 1) / 12).cast("int"), F.lit(0)
            ),
        ),
        lambda i: F.concat(
            F.lit("<p>"),
            F.array_join(F.slice(F.col("toks"), i * 12 + 1, 12), " "),
            F.lit("</p>"),
        ),
    )
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit(
            "</title><style>body{color:red}</style></head><body>"
            "<nav><a href='/'>Home</a> <a href='/x'>About</a></nav>"
            "<script>var x = 1 < 2 && 3;</script>"
        ),
        F.array_join(paras, ""),
        F.lit("<footer>© fixture</footer></body></html>"),
    )
    return staged.select("doc_id", html.alias("html"))
