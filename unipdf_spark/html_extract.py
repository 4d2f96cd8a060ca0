"""HTML main-content extraction: boilerplate strip via DOM heuristics.

The north rule's main-content pipeline spans "HTML boilerplate strip,
PDF/layout parse, DOM heuristics" — this module is the HTML leg, built
from scratch on public technique: text blocks are segmented at
block-level tag boundaries (the DOM walk) and classified by the two
classic boilerplate-detection features — link density and block length —
per the shallow-text-features literature (Kohlschütter et al.,
"Boilerplate Detection using Shallow Text Features", WSDM 2010). Content
inside <script>/<style>/<noscript>/<template> is discarded outright;
blocks that are mostly anchor text (navigation, breadcrumbs, link farms)
or too short to be body prose (titles, timestamps, copyright lines) are
dropped; what remains, in document order, is the main content.

Deterministic by construction (stdlib html.parser, no randomness), so a
synthetic wrapped corpus round-trips exactly: extracted main text ==
original article text — the same oracle shape as the PDF render trip
(operators.extracted)."""

from __future__ import annotations

import re
from html.parser import HTMLParser

# tags whose content never reaches the text stream
DROP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}
# tags that delimit text blocks (a new block starts at every open/close)
BLOCK_TAGS = {
    "p", "div", "li", "ul", "ol", "nav", "footer", "header", "aside",
    "article", "section", "main", "table", "tr", "td", "th", "h1", "h2",
    "h3", "h4", "h5", "h6", "blockquote", "pre", "figure", "figcaption",
    "br", "title", "body",
}
MIN_BLOCK_CHARS = 25   # shorter blocks are headlines/timestamps/chrome
MAX_LINK_DENSITY = 0.33  # mostly-anchor blocks are navigation

_WS = re.compile(r"\s+")


class _BlockSegmenter(HTMLParser):
    """Flat DOM walk → text blocks with per-block link-character counts."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []  # (text, link_chars)
        self._text: list[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._a_depth = 0

    def _flush(self) -> None:
        text = _WS.sub(" ", "".join(self._text)).strip()
        if text:
            self.blocks.append((text, self._link_chars))
        self._text = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if tag == "a":
            self._a_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth:
            return
        self._text.append(data)
        if self._a_depth:
            self._link_chars += len(_WS.sub(" ", data).strip())

    def close(self):
        super().close()
        self._flush()


def text_blocks(html: str) -> list[tuple[str, float]]:
    """(block text, link density) in document order."""
    seg = _BlockSegmenter()
    seg.feed(html)
    seg.close()
    out = []
    for text, link_chars in seg.blocks:
        n = len(text)
        out.append((text, (link_chars / n) if n else 1.0))
    return out


def main_content(html: str) -> str:
    """Boilerplate-stripped main text: blocks that are long enough to be
    prose AND not dominated by anchor text, joined in document order."""
    kept = [
        text for text, ld in text_blocks(html)
        if len(text) >= MIN_BLOCK_CHARS and ld <= MAX_LINK_DENSITY
    ]
    return " ".join(kept)
