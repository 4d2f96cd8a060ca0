"""HTML main-content extraction: boilerplate strip via DOM heuristics.

The north rule's main-content pipeline spans "HTML boilerplate strip,
PDF/layout parse, DOM heuristics" — this module is the HTML leg, built
from scratch on public technique:

- text blocks are segmented at block-level tag boundaries (the DOM walk);
- each block carries the two classic shallow text features — link density
  and block length (Kohlschütter et al., "Boilerplate Detection using
  Shallow Text Features", WSDM 2010) — plus a DOM-context flag: inside a
  semantic boilerplate container (<nav>/<aside>/<header>/<footer>) or an
  element whose class/id matches the unlikely-candidates lexicon
  (cookie/consent/byline/sidebar/related/… — the Readability-style
  class-hint heuristic);
- hard labels first: boiler-context or link-dominated blocks are
  boilerplate; long low-link blocks outside boiler context are content;
- short low-link blocks outside boiler context are decided by NEIGHBOR
  SMOOTHING (Kohlschütter's context classification): a forward then a
  backward pass keeps a short block iff an adjacent block is content —
  dialogue lines and short closing paragraphs inside an article survive,
  while isolated chrome snippets (titles, timestamps) do not.

Content inside <script>/<style>/<noscript>/<template> is discarded
outright. Deterministic by construction (stdlib html.parser, no
randomness), so a synthetic wrapped corpus round-trips exactly: extracted
main text == original article text — the same oracle shape as the PDF
render trip (operators.extracted)."""

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
# semantic containers whose subtree is boilerplate context
BOILER_TAGS = {"nav", "aside", "footer", "header"}
# HTML void elements (no end tag ever arrives): excluded from boiler-scope
# frames — a hinted <img class="ad-banner"> must not open a scope that can
# never close, and a hint-less <img> inside an open scope must not bump the
# same-name nesting counter (its "end" never comes to decrement it)
VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}
# Readability-style unlikely-candidates lexicon over class/id attributes
UNLIKELY_RE = re.compile(
    r"banner|breadcrumb|\bcrumb|byline|combx|comment|community|cookie|"
    r"consent|disclaimer|disqus|legal|menu|related|remark|rss|share|"
    r"shoutbox|sidebar|social|sponsor|\bad\b|advert|agegate|pagination|"
    r"pager|popup|promo",
    re.I,
)
MIN_BLOCK_CHARS = 25   # shorter blocks need a content neighbor to survive
MAX_LINK_DENSITY = 0.33  # mostly-anchor blocks are navigation

_WS = re.compile(r"\s+")


class _BlockSegmenter(HTMLParser):
    """Flat DOM walk → text blocks with per-block link-character counts
    and boilerplate-context flags (semantic containers + class/id
    hints). Context uses a stack of [tag, extra_depth] frames: a nested
    same-name tag inside an open scope increments the top frame's depth
    counter instead of being ignored, so its end tag decrements rather
    than closing the scope early (<div class=sidebar><div>x</div><p>promo
    </p></div> keeps the promo inside the sidebar scope). Well-formed
    subtrees scope exactly; malformed markup degrades gracefully
    (mismatched closers pop only a matching open scope). Void elements
    (br, img, …) are skipped before any frame push or same-name counter
    bump — their end tag never arrives, so either would stick forever
    (a hinted <img class="ad-banner"> must not black-hole the rest of
    the page)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, bool]] = []
        self._text: list[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._a_depth = 0
        self._boiler_stack: list[list] = []  # [tag, extra_depth] frames
        self._in_boiler = False  # context of the text accumulated so far

    def _flush(self) -> None:
        text = _WS.sub(" ", "".join(self._text)).strip()
        if text:
            self.blocks.append((text, self._link_chars, self._in_boiler))
        self._text = []
        self._link_chars = 0
        self._in_boiler = bool(self._boiler_stack)

    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if tag == "a":
            self._a_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()
        if tag in VOID_TAGS:
            # void elements have no end tag: never open a scope frame and
            # never bump a same-name counter — either would stick forever
            return
        hints = " ".join(
            v for k, v in attrs if k in ("class", "id") and v)
        if tag in BOILER_TAGS or (hints and UNLIKELY_RE.search(hints)):
            self._boiler_stack.append([tag, 0])
            self._in_boiler = True
        elif self._boiler_stack and tag == self._boiler_stack[-1][0]:
            # nested same-name element inside the open scope: its end tag
            # must not close the scope — count it
            self._boiler_stack[-1][1] += 1

    def handle_endtag(self, tag):
        if tag in DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()
        if self._boiler_stack and self._boiler_stack[-1][0] == tag:
            if self._boiler_stack[-1][1] > 0:
                self._boiler_stack[-1][1] -= 1
            else:
                self._boiler_stack.pop()
                self._in_boiler = bool(self._boiler_stack)

    def handle_data(self, data):
        if self._drop_depth:
            return
        self._text.append(data)
        if self._a_depth:
            self._link_chars += len(_WS.sub(" ", data).strip())

    def close(self):
        super().close()
        self._flush()

    # stdlib HTMLParser calls _markupbase.updatepos (two string scans) on
    # every token purely to maintain lineno/offset for error reporting;
    # no tokenization decision reads them and this subclass never reports
    # positions — skip the bookkeeping (output-identical, ~15% of feed()).
    def updatepos(self, i, j):
        return j


def blocks_with_context(html: str) -> list[tuple[str, float, bool]]:
    """(block text, link density, boiler context) in document order."""
    seg = _BlockSegmenter()
    seg.feed(html)
    seg.close()
    out = []
    for text, link_chars, in_boiler in seg.blocks:
        n = len(text)
        out.append((text, (link_chars / n) if n else 1.0, in_boiler))
    return out


def text_blocks(html: str) -> list[tuple[str, float]]:
    """(block text, link density) in document order."""
    return [(t, ld) for t, ld, _ctx in blocks_with_context(html)]


def main_content(html: str) -> str:
    """Boilerplate-stripped main text in document order.

    Hard labels: boiler-context or link-dominated → drop; long low-link
    outside boiler context → keep. Short low-link blocks outside boiler
    context are kept iff an adjacent block is kept (forward then backward
    smoothing pass, so chains of short blocks anchored to content on
    either side survive)."""
    blocks = blocks_with_context(html)
    # 1 = content, 0 = boilerplate, None = short/undecided
    labels: list[int | None] = []
    for text, ld, in_boiler in blocks:
        if in_boiler or ld > MAX_LINK_DENSITY:
            labels.append(0)
        elif len(text) >= MIN_BLOCK_CHARS:
            labels.append(1)
        else:
            labels.append(None)
    for i in range(len(labels)):  # forward: inherit from the left
        if labels[i] is None and i > 0 and labels[i - 1] == 1:
            labels[i] = 1
    for i in range(len(labels) - 1, -1, -1):  # backward: from the right
        if labels[i] is None and i + 1 < len(labels) and labels[i + 1] == 1:
            labels[i] = 1
    return " ".join(t for (t, _ld, _c), lab in zip(blocks, labels)
                    if lab == 1)
