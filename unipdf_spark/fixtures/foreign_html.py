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


# ---------------------------------------------------------------------------
# Tag-soup serializer (r9 VERDICT #2): real web HTML is NOT well-formed.
# foreign_html permutes conventions but keeps documents valid; tag_soup
# breaks well-formedness the way the live web does — unclosed <p>/<li>,
# stray close tags, misnested inline pairs, bare '&', attribute junk,
# conditional comments — with html.parser's DOCUMENTED RECOVERY as the
# defined semantics (reference analog: the extractor's relaxed-mode
# philosophy, core/core.go:575). The oracle is unchanged: every knob is
# neutral by construction for a parser with those recovery rules, so a
# hash mismatch indicts the engine, not the transform.
#
# Neutrality arguments (each knob):
# * drop_close (</p>/</li>/</td>): only when the run to the next tag is
#   whitespace-only and that tag is block-level — the block flushes at the
#   next tag either way (flush precedes scope push/pop in both orders);
#   only for elements whose OPEN carried no class/id and is not a semantic
#   container, so no scope frame is left dangling (a hinted <td
#   class="menu"> keeps its close).
# * stray_close (</p>, </div>): inserted right after a block closer (text
#   buffer empty → flush is a no-op) — </p> can never pop a scope the
#   generator builds (it never hints <p>), </div> only where NO
#   potentially-scoped element is open (tracked superset stack empty).
# * misnest_inline (<b><i>w</b></i>): inline tags are not block, not
#   scoped, not dropped — a recovering parser reports them in stream
#   order and a block-segmenting extractor ignores them entirely.
# * bare '&': in ATTRIBUTE values anywhere (never reaches text), and in
#   TEXT only inside the generator's class-hinted chrome containers
#   (dropped by hint regardless of length/density, so chrome text edits
#   cannot flip a near-gate probe).
# * attr junk (valueless, duplicates, unquoted): never class/id.
# * conditional comments / CDATA sections between blocks: one comment /
#   one unknown decl to a conforming parser; invisible.
# ---------------------------------------------------------------------------

# duplicated independently from the engine (FIXTURES.md discipline): tags
# at which any block-segmenting extractor must flush
_SOUP_BLOCK = {
    "p", "div", "li", "ul", "ol", "td", "tr", "th", "table", "h1", "h2",
    "h3", "h4", "h5", "h6", "nav", "footer", "header", "aside", "article",
    "section", "main", "blockquote", "pre", "figure", "figcaption", "br",
    "title", "body",
}
_SOUP_SEMANTIC = {"nav", "aside", "header", "footer"}
_SOUP_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input",
              "link", "meta", "param", "source", "track", "wbr"}
# the generator's chrome class/id tokens: blocks under these are dropped
# by CLASS HINT in any conforming extractor, so their text is fair game
_SOUP_CHROME = ("cookie-consent", "menu", "crumbs", "sidebar", "ad",
                "author-byline", "related", "footer-legal")
_CLASSID_RE = re.compile(
    r"""\b(?:class|id)\s*=\s*("[^"]*"|'[^']*'|[^\s"'>]+)""", re.I)
_HREF_RE = re.compile(r"""\bhref\s*=\s*"([^"&?]*)\"""")
_WORD_GAP_RE = re.compile(r"(\w) (\w)")
_INLINE = ("b", "i", "em")


def tag_soup(page: str, seed: str) -> str:
    """Deterministically re-serialize `page` (which must be tag-balanced,
    as make_html_doc output is) into malformed tag soup; a parser with
    html.parser's recovery rules must extract identical main content."""
    rng = random.Random(f"fxsoup:{seed}")
    profile: dict = {}

    def hit(knob: str) -> None:
        profile[knob] = profile.get(knob, 0) + 1

    segs = list(_SEG_RE.finditer(page))
    out: list[str] = []
    pos = 0
    raw_until: str | None = None
    a_depth = 0
    chrome_depth = 0
    # exact open-element stack (input is balanced): (name, scoped, chrome)
    stack: list[tuple[str, bool, bool]] = []
    pending_misnest: tuple[str, str] | None = None

    for idx, m in enumerate(segs):
        text = page[pos:m.start()]
        if (text.strip() and chrome_depth and not a_depth
                and not raw_until and rng.random() < 0.5):
            # bare & between words of hint-dropped chrome text
            text, n = _WORD_GAP_RE.subn(r"\1 & \2", text, count=1)
            if n:
                hit("bare_amp_text")
        out.append(text)
        pos = m.end()
        seg = m.group(0)
        if seg.startswith("<!"):
            out.append(seg)
            continue
        tm = _TAG_RE.match(seg)
        if not tm:
            out.append(seg)
            continue
        closing, name = bool(tm.group(1)), tm.group(2).lower()
        if raw_until:
            out.append(seg)
            if closing and name == raw_until:
                raw_until = None
            continue
        if not closing and name in _RAW_TAGS:
            raw_until = name
            out.append(seg)
            continue
        if name == "a":
            a_depth = max(0, a_depth + (-1 if closing else 1))

        # maintain the exact element stack
        popped_scoped = True  # default conservative: treat unknown as scoped
        if name not in _SOUP_VOID and not seg.endswith("/>"):
            if closing:
                if stack and stack[-1][0] == name:
                    _, popped_scoped, was_chrome = stack.pop()
                    if was_chrome:
                        chrome_depth -= 1
            else:
                cm = _CLASSID_RE.search(seg)
                hintval = cm.group(1).strip("\"'") if cm else ""
                scoped = bool(cm) or name in _SOUP_SEMANTIC
                chrome = any(t in hintval for t in _SOUP_CHROME)
                stack.append((name, scoped, chrome))
                if chrome:
                    chrome_depth += 1

        # -- knob: drop the close tag of an unhinted p/li/td -------------
        # (never a hinted element's close — a <td class="menu"> whose
        # close vanished would leave the extractor's scope frame dangling
        # past the cell, which is a TRANSFORM bug, not an engine bug)
        if (closing and name in ("p", "li", "td") and not popped_scoped
                and pending_misnest is None
                and not a_depth and rng.random() < 0.4):
            nxt = segs[idx + 1] if idx + 1 < len(segs) else None
            gap_ws = nxt is not None and not page[pos:nxt.start()].strip()
            nxt_tm = _TAG_RE.match(nxt.group(0)) if nxt else None
            if (gap_ws and nxt_tm
                    and nxt_tm.group(2).lower() in _SOUP_BLOCK):
                hit(f"drop_close_{name}")
                continue  # the tag is simply never emitted

        # -- knob: misnested inline pair ----------------------------------
        if (not closing and name in _INLINE and pending_misnest is None
                and not a_depth and rng.random() < 0.35):
            partner = rng.choice([t for t in _INLINE if t != name])
            out.append(seg + f"<{partner}>")
            pending_misnest = (name, partner)
            hit("misnest_inline")
            continue
        if closing and pending_misnest and name == pending_misnest[0]:
            out.append(seg + f"</{pending_misnest[1]}>")  # crossed order
            pending_misnest = None
            continue

        # -- knob: attribute junk on block opens (never class/id) ---------
        if (not closing and name in ("p", "div", "li", "td", "ul")
                and rng.random() < 0.3):
            junk = rng.choice(
                [" data-soup", " align=left align=right",
                 " nowrap DATA-Y=a/b", " lang=en lang=en-GB"])
            seg = seg[:-1] + junk + ">"
            hit("attr_junk")
        # -- knob: bare & inside attribute values --------------------------
        if not closing and "href=\"" in seg and rng.random() < 0.4:
            seg, n = _HREF_RE.subn(r'href="\1?s=1&soup=2&raw"', seg, count=1)
            if n:
                hit("bare_amp_attr")
        # -- knob: SHOUTING close tags -------------------------------------
        if closing and rng.random() < 0.15:
            seg = "</" + name.upper() + ">"
            hit("upper_close")
        out.append(seg)

        # -- knobs that inject AFTER a block closer ------------------------
        if closing and name in _BLOCK_CLOSERS and not a_depth:
            r = rng.random()
            if r < 0.12:
                out.append("</p>")  # stray close: no p-scope can exist
                hit("stray_close_p")
            elif r < 0.2 and not any(s for _, s, _ in stack):
                out.append("</div>")  # stray close: no scope is open
                hit("stray_close_div")
            elif r < 0.28:
                out.append("<!--[if lt IE 9]><div class=\"menu\">legacy "
                           "menu text</div><![endif]-->")
                hit("cond_comment")
            elif r < 0.34:
                out.append("<![CDATA[soup %d]]>" % rng.randrange(100))
                hit("cdata_decl")

    out.append(page[pos:])
    stamp = "<!--data-fxs: %s-->\n" % json.dumps(profile, sort_keys=True)
    return stamp + "".join(out)


def soup_profile_of(page: str) -> dict:
    m = re.search(r"<!--data-fxs: (.+?)-->", page)
    return json.loads(m.group(1)) if m else {}
