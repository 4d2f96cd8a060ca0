"""Foreign-HTML serializer tests (r8): the extractor must be invariant to
markup conventions the canonical page generator never emits — entity-
encoded text, attribute quoting/case permutations, injected comments,
junk attributes, void-element forms. The transform is designed to be
provably parser-neutral (see foreign_html module docstring), so any
extraction difference indicts html_extract, not the fixture."""

import random
import re

from unipdf_spark.fixtures.foreign_html import foreign_html, profile_of
from unipdf_spark.fixtures.gen import make_html_doc
from unipdf_spark.html_extract import main_content

_WS = re.compile(r"\s+")
_WORDS = ("alpha beta gamma delta engine span query kernel matrix "
          "partition document arrow rotate skew heuristic").split()


def _pages(n=50, seed=9):
    rng = random.Random(seed)
    for i in range(n):
        text = " ".join(rng.choice(_WORDS)
                        for _ in range(rng.randint(0, 400)))
        did = f"doc_{i:08d}"
        yield did, make_html_doc(did, text, seed=3)


def test_foreign_html_extraction_invariant():
    for did, page in _pages():
        fpage = foreign_html(page, did)
        a = _WS.sub(" ", main_content(page)).strip()
        b = _WS.sub(" ", main_content(fpage)).strip()
        assert a == b, did


def test_foreign_html_corpus_covers_every_knob():
    agg: dict = {}
    for did, page in _pages():
        for k, v in profile_of(foreign_html(page, did)).items():
            agg[k] = agg.get(k, 0) + v
    for knob in ("case_mutations", "charrefs", "comments", "junk_attrs",
                 "single_quoted", "unquoted_attrs"):
        assert agg.get(knob, 0) > 0, (knob, agg)


def test_foreign_html_conventions_visible_to_naive_reader():
    """The conventions are real in the bytes: a strip-all-tags reader
    (no entity decoding) sees DIFFERENT text, and raw markup carries
    uppercase tags / single quotes / injected comments — so the
    invariance test above cannot be passing vacuously."""
    tag_re = re.compile(r"<[^>]+>")
    seen_upper = seen_squote = seen_comment = seen_charref = False
    for did, page in _pages(20):
        fpage = foreign_html(page, did)
        naive_a = _WS.sub(" ", tag_re.sub(" ", page)).strip()
        naive_b = _WS.sub(" ", tag_re.sub(" ", fpage)).strip()
        p = profile_of(fpage)
        if p.get("charrefs"):
            assert naive_a != naive_b, did
            seen_charref = True
        if re.search(r"</?[A-Z]", fpage.split("-->", 1)[1]):
            seen_upper = True
        if "='" in fpage:
            seen_squote = True
        if "<!-- fx:" in fpage:
            seen_comment = True
    assert seen_upper and seen_squote and seen_comment and seen_charref


# -- tag soup (r9 VERDICT #2) -------------------------------------------


def _balanced(page: str) -> bool:
    """Well-formedness probe: every non-void open tag has a matching,
    properly nested close. make_html_doc output satisfies this; tag_soup
    output must NOT (otherwise the corpus isn't exercising malformation)."""
    seg = re.compile(r"<!--.*?-->|<![^>]*>|<[/a-zA-Z][^>]*>", re.S)
    void = {"area", "base", "br", "col", "embed", "hr", "img", "input",
            "link", "meta", "param", "source", "track", "wbr"}
    stack: list = []
    raw = None
    for m in seg.finditer(page):
        s = m.group(0)
        if s.startswith("<!"):
            continue
        t = re.match(r"^<(/?)([a-zA-Z][a-zA-Z0-9]*)", s)
        close, name = t.group(1), t.group(2).lower()
        if raw:
            if close and name == raw:
                raw = None
            continue
        if not close and name in ("script", "style"):
            raw = name
            continue
        if name in void or s.endswith("/>"):
            continue
        if close:
            if not stack or stack[-1] != name:
                return False
            stack.pop()
        else:
            stack.append(name)
    return not stack


def test_tag_soup_extraction_invariant():
    """Tag soup (unclosed <p>/<li>, stray closes, misnested inline, bare
    &, attribute junk, conditional comments) with html.parser's recovery
    as the defined semantics: main content is unchanged."""
    from unipdf_spark.fixtures.foreign_html import tag_soup

    for did, page in _pages():
        spage = tag_soup(page, did)
        a = _WS.sub(" ", main_content(page)).strip()
        b = _WS.sub(" ", main_content(spage)).strip()
        assert a == b, did


def test_tag_soup_corpus_covers_every_knob_and_is_malformed():
    from unipdf_spark.fixtures.foreign_html import soup_profile_of, tag_soup

    agg: dict = {}
    n_unbalanced = 0
    for did, page in _pages():
        assert _balanced(page), did  # canonical writer is well-formed
        spage = tag_soup(page, did)
        if not _balanced(spage):
            n_unbalanced += 1
        for k, v in soup_profile_of(spage).items():
            agg[k] = agg.get(k, 0) + v
    for knob in ("drop_close_p", "drop_close_li", "drop_close_td",
                 "stray_close_p", "stray_close_div", "misnest_inline",
                 "bare_amp_text", "bare_amp_attr", "attr_junk",
                 "cond_comment", "cdata_decl", "upper_close"):
        assert agg.get(knob, 0) > 0, (knob, agg)
    # the malformation is real: the overwhelming majority of souped pages
    # fail a well-formedness check the canonical pages all pass
    assert n_unbalanced >= 45, n_unbalanced


def test_tag_soup_recovery_rule_units():
    """Boundary units for the documented recovery semantics, one per soup
    pattern — minimal pages, expectations straight from html.parser's
    rules (start/end tags reported as seen; no implied closes; invalid
    charrefs literal; marked sections + comments invisible)."""
    long_a = "alpha " * 9 + "ends the first long paragraph here"
    long_b = "beta " * 9 + "ends the second long paragraph here"
    # unclosed <p>: the next <p> open flushes the block — two blocks, both
    # kept (no implied close, no merge)
    got = _WS.sub(" ", main_content(
        f"<body><p>{long_a}<p>{long_b}</body>")).strip()
    assert got == f"{long_a} {long_b}"
    # stray </p> / </div> between article paragraphs: flush no-ops
    got = _WS.sub(" ", main_content(
        f"<body><p>{long_a}</p></p></div><p>{long_b}</p></body>")).strip()
    assert got == f"{long_a} {long_b}"
    # a stray </p> inside a hinted scope must NOT close it (pop only a
    # matching open): the promo after the stray close stays boilerplate
    got = main_content(
        '<body><div class="sidebar"><p>promo line</p></p>'
        f"<p>second promo line</p></div><p>{long_a}</p></body>")
    assert "promo" not in got and long_a in got
    # misnested inline pair: inline tags are transparent to block text
    got = _WS.sub(" ", main_content(
        f"<body><p><b><i>{long_a}</b></i></p></body>")).strip()
    assert got == long_a
    # bare & is literal text (invalid charref recovery); bare & in an
    # attribute value never reaches the text stream
    got = main_content(
        f'<body><p><a href="/x?a=1&b=2">fish</a> & chips {long_a}</p></body>')
    assert "fish & chips" in _WS.sub(" ", got)
    # conditional comment and CDATA marked section are invisible, even
    # when the comment embeds chrome-looking markup
    got = _WS.sub(" ", main_content(
        f"<body><!--[if lt IE 9]><div class='menu'>legacy menu</div>"
        f"<![endif]--><![CDATA[noise]]><p>{long_a}</p></body>")).strip()
    assert got == long_a
    # attribute junk (valueless, duplicates, unquoted) parses through
    got = _WS.sub(" ", main_content(
        f"<body><p data-soup align=left align=right nowrap>{long_a}"
        "</p></body>")).strip()
    assert got == long_a


def test_foreign_html_raw_regions_untouched():
    """<script>/<style> bodies pass through verbatim (charref-encoding a
    script would change what a browser executes — not convention-neutral)."""
    for did, page in _pages(10):
        fpage = foreign_html(page, did)
        for m in re.finditer(r"<script[^>]*>(.*?)</script>", page, re.S):
            assert m.group(1) in fpage, did
        for m in re.finditer(r"<style[^>]*>(.*?)</style>", page, re.S):
            assert m.group(1) in fpage, did
