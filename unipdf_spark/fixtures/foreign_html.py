"""Foreign-HTML serializer: re-encodes a fixture page through markup
conventions the canonical generator never emits, WITHOUT changing what a
conforming parser sees.

The make_html_doc pages are one writer's clean markup — lowercase tags,
double-quoted attributes, literal text. Real-web pages vary all of it;
the extractor (html_extract, stdlib html.parser) must be invariant. This
module rewrites a page segment-wise:

- tag/attribute-name case permutations (<DIV Class=...>) — parsers
  lowercase both;
- attribute quoting: double / single / unquoted (unquoted only for
  values with no spaces/quotes/=/>/`), attribute-order preserved (order
  is never semantic here) plus injected junk ``data-fx`` attributes;
- intra-tag whitespace: newlines/tabs between attributes;
- void-element forms: <br> vs <br/> vs <br />;
- comment injection immediately after block-level close tags (between
  blocks, where a comment is provably inert);
- numeric character references for text characters (&#NN; / &#xNN;),
  skipping existing entities — the extractor's block text and ALL
  length/link-density math must run on the UNESCAPED text (the
  html_extract._flush invariant), so a page whose article is entity-
  encoded must extract byte-identically.

Neutrality rules (so a test failure indicts the engine, not the
transform): raw-text elements (<script>/<style>…) are never touched;
nothing is injected or re-encoded inside an open <a> scope, because
link-character counting strips each data call separately — splitting a
link's text run could legitimately change the count by a space.

A ``data-fxp`` JSON profile comment is prepended so corpus tests can
assert every knob fired (comments are invisible to any conforming
reader — same auditing trick as fixtures.foreign's %%foreign-profile).
"""

from __future__ import annotations

import json
import random
import re

# segments: comments | doctype/decls | tags | text between them
_SEG_RE = re.compile(r"<!--.*?-->|<![^>]*>|<[/a-zA-Z][^>]*>", re.S)
_TAG_RE = re.compile(
    r"^<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)(/?)>$",
    re.S,
)
_ATTR_RE = re.compile(
    r"([a-zA-Z][-a-zA-Z0-9_]*)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]+))?",
)
_ENT_RE = re.compile(r"&[a-zA-Z][a-zA-Z0-9]*;|&#[0-9]+;|&#x[0-9a-fA-F]+;")
_UNQUOTABLE = re.compile(r"^[-a-zA-Z0-9_./:#]+$")

_RAW_TAGS = {"script", "style", "noscript", "template"}
_VOID_TAGS = {"br", "img", "hr", "meta", "link", "input"}
_BLOCK_CLOSERS = {"p", "div", "li", "ul", "td", "tr", "table", "h1", "h2",
                  "h3", "section", "article", "aside", "nav", "header",
                  "footer", "blockquote"}


def _case_name(name: str, rng: random.Random, profile: dict) -> str:
    r = rng.random()
    if r < 0.55:
        return name
    profile["case_mutations"] = profile.get("case_mutations", 0) + 1
    return name.upper() if r < 0.85 else name.capitalize()


def _rewrite_tag(tag: str, rng: random.Random, profile: dict) -> str:
    m = _TAG_RE.match(tag)
    if not m:
        return tag
    close, name, attrs_src, selfclose = m.groups()
    out = "<" + close + _case_name(name, rng, profile)
    for am in _ATTR_RE.finditer(attrs_src):
        aname, aval = am.group(1), am.group(2)
        sep = rng.choice([" ", "  ", "\n  ", "\t"])
        out += sep + _case_name(aname, rng, profile)
        if aval is None:
            continue
        core = aval[1:-1] if aval[0] in "\"'" else aval
        r = rng.random()
        if r < 0.2 and _UNQUOTABLE.match(core):
            out += "=" + core
            profile["unquoted_attrs"] = profile.get("unquoted_attrs", 0) + 1
        elif r < 0.5 and "'" not in core:
            out += "='" + core + "'"
            profile["single_quoted"] = profile.get("single_quoted", 0) + 1
        else:
            out += '="' + core + '"'
    if not close and rng.random() < 0.25:
        out += ' data-fx="%d"' % rng.randrange(100)
        profile["junk_attrs"] = profile.get("junk_attrs", 0) + 1
    if not close and name.lower() in _VOID_TAGS:
        out += rng.choice(["", "/", " /"])
    elif selfclose:
        out += "/"
    return out + ">"


def _encode_text(text: str, rng: random.Random, profile: dict) -> str:
    """Numeric-charref-encode a fraction of the characters in plain text,
    leaving existing entities intact."""
    out = []
    pos = 0
    for em in _ENT_RE.finditer(text):
        out.append(_encode_run(text[pos:em.start()], rng, profile))
        out.append(em.group(0))
        pos = em.end()
    out.append(_encode_run(text[pos:], rng, profile))
    return "".join(out)


def _encode_run(run: str, rng: random.Random, profile: dict) -> str:
    out = []
    for ch in run:
        if ch.isalnum() and rng.random() < 0.08:
            out.append("&#%d;" % ord(ch) if rng.random() < 0.5
                       else "&#x%x;" % ord(ch))
            profile["charrefs"] = profile.get("charrefs", 0) + 1
        else:
            out.append(ch)
    return "".join(out)


def foreign_html(page: str, seed: str) -> str:
    """Deterministically re-serialize `page` through foreign markup
    conventions; a conforming parser must extract identical content."""
    rng = random.Random(f"fxhtml:{seed}")
    profile: dict = {}
    out: list[str] = []
    pos = 0
    raw_until: str | None = None  # inside <script>/<style>: emit verbatim
    a_depth = 0

    def emit_text(text: str) -> None:
        if raw_until or a_depth or not text:
            out.append(text)
        else:
            out.append(_encode_text(text, rng, profile))

    for m in _SEG_RE.finditer(page):
        emit_text(page[pos:m.start()])
        pos = m.end()
        seg = m.group(0)
        if seg.startswith("<!"):
            out.append(seg)  # comments / doctype pass through
            continue
        tm = _TAG_RE.match(seg)
        name = tm.group(2).lower() if tm else ""
        closing = bool(tm and tm.group(1))
        if raw_until:
            out.append(seg)  # raw content region: tags verbatim
            if closing and name == raw_until:
                raw_until = None
            continue
        if not closing and name in _RAW_TAGS:
            raw_until = name
            out.append(_rewrite_tag(seg, rng, profile))
            continue
        if name == "a":
            a_depth = max(0, a_depth + (-1 if closing else 1))
        out.append(_rewrite_tag(seg, rng, profile))
        # inert comment between blocks (never inside <a>, never in raw)
        if closing and name in _BLOCK_CLOSERS and not a_depth \
                and rng.random() < 0.2:
            out.append("<!-- fx:%d -->" % rng.randrange(1000))
            profile["comments"] = profile.get("comments", 0) + 1
    emit_text(page[pos:])
    stamp = "<!--data-fxp: %s-->\n" % json.dumps(profile, sort_keys=True)
    return stamp + "".join(out)


def profile_of(page: str) -> dict:
    m = re.search(r"<!--data-fxp: (.+?)-->", page)
    return json.loads(m.group(1)) if m else {}
