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


def test_foreign_html_raw_regions_untouched():
    """<script>/<style> bodies pass through verbatim (charref-encoding a
    script would change what a browser executes — not convention-neutral)."""
    for did, page in _pages(10):
        fpage = foreign_html(page, did)
        for m in re.finditer(r"<script[^>]*>(.*?)</script>", page, re.S):
            assert m.group(1) in fpage, did
        for m in re.finditer(r"<style[^>]*>(.*?)</style>", page, re.S):
            assert m.group(1) in fpage, did
