"""Font loading and the glyph→text decode chain.

Re-expresses the reference's font layer (SURVEY §2.4):

* font factory dispatch on /Subtype — unipdf ``NewPdfFontFromPdfObject``
  (model/model.go:4033 → model/model.go:2902);
* ``BytesToCharcodes`` (model/model.go:1343): Type0 → CMap codespace match
  (1–4 byte codes); simple fonts → 1 byte per code;
* ``CharcodesToStrings`` (model/model.go:547) priority: ToUnicode CMap first
  (cmap.go:117), then the font's base encoding (+/Differences), then U+FFFD
  with miss counting;
* metrics — ``GetCharMetrics`` (model/model.go:3340): simple Widths+FirstChar,
  CID W/DW (default DW=1000, model/model.go:2506), builtin Helvetica/Courier
  fallbacks (std fallback width 250 mirrors Type3 default, model/model.go:869).

CMap parser covers begincodespacerange / beginbfchar / beginbfrange /
begincidrange (internal/cmap/cmap.go:118,:71,:97,:49).
"""

from __future__ import annotations

import re

from . import cff, std14, truetype, type1
from .agl import glyph_to_unicode
from .extra_enc import MAC_EXPERT, PDF_DOC
from .symbol_enc import SYMBOL, ZAPF_DINGBATS

# --- simple encodings -------------------------------------------------------

# WinAnsiEncoding: latin-1 with the 0x80-0x9F differences (PDF spec annex D).
_WINANSI_HIGH = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
    # undefined codes render as bullet (Annex D note, reference parity);
    # nbsp -> space and soft hyphen -> hyphen per the reference's table
    0x7F: 0x2022, 0x81: 0x2022, 0x8D: 0x2022, 0x8F: 0x2022, 0x90: 0x2022,
    0x9D: 0x2022, 0xA0: 0x0020, 0xAD: 0x002D,
}

WIN_ANSI = {c: chr(c) for c in range(32, 256)}
WIN_ANSI.update({c: chr(u) for c, u in _WINANSI_HIGH.items()})

# MacRomanEncoding upper half (0x80+); enough for fixture + common corpora use.
_MACROMAN_HIGH = (
    "ÄÅÇÉÑÖÜáàâäãåçéèêëíìîïñóòôöõúùûü†°¢£§•¶ß®©™´¨≠ÆØ∞±≤≥¥µ∂∑∏π∫ªºΩæø"
    "¿¡¬√ƒ≈∆«»… ÀÃÕŒœ–—“”‘’÷◊ÿŸ⁄€‹›ﬁﬂ‡·‚„‰ÂÊÁËÈÍÎÏÌÓÔÒÚÛÙıˆ˜¯˘˙˚¸˝˛ˇ"
)
MAC_ROMAN = {c: chr(c) for c in range(1, 128)}  # 0x01-0x1F identity (ref parity)
MAC_ROMAN.update({0x80 + i: ch for i, ch in enumerate(_MACROMAN_HIGH)})
MAC_ROMAN[0xCA] = "\u00A0"  # NO-BREAK SPACE (reference parity)

STANDARD = {c: chr(c) for c in range(32, 127)}
# Adobe StandardEncoding (Annex D.2) FULL table: quoteright/quoteleft at
# 0x27/0x60 plus the 0xA1+ punctuation/ligature/accent/letter ranges —
# cross-checked byte-for-byte against the reference's table (r5); codes
# absent there stay unmapped
STANDARD.update({
    0x27: "\u2019", 0x60: "\u2018",
    0xA1: "\u00A1", 0xA2: "\u00A2", 0xA3: "\u00A3", 0xA4: "\u2044",
    0xA5: "\u00A5", 0xA6: "\u0192", 0xA7: "\u00A7", 0xA8: "\u00A4",
    0xA9: "'", 0xAA: "\u201C", 0xAB: "\u00AB", 0xAC: "\u2039",
    0xAD: "\u203A", 0xAE: "\uFB01", 0xAF: "\uFB02", 0xB1: "\u2013",
    0xB2: "\u2020", 0xB3: "\u2021", 0xB4: "\u00B7", 0xB6: "\u00B6",
    0xB7: "\u2022", 0xB8: "\u201A", 0xB9: "\u201E", 0xBA: "\u201D",
    0xBB: "\u00BB", 0xBC: "\u2026", 0xBD: "\u2030", 0xBF: "\u00BF",
    0xC1: "`", 0xC2: "\u00B4", 0xC3: "\u02C6", 0xC4: "\u02DC",
    0xC5: "\u00AF", 0xC6: "\u02D8", 0xC7: "\u02D9", 0xC8: "\u00A8",
    0xCA: "\u02DA", 0xCB: "\u00B8", 0xCC: "\u02DD", 0xCD: "\u02DB",
    0xCE: "\u02C7", 0xCF: "\u2014", 0xE1: "\u00C6", 0xE3: "\u00AA",
    0xE8: "\u0141", 0xE9: "\u00D8", 0xEA: "\u0152", 0xEB: "\u00BA",
    0xF1: "\u00E6", 0xF5: "\u0131", 0xF8: "\u0142", 0xF9: "\u00F8",
    0xFA: "\u0153", 0xFB: "\u00DF",
})

_ENCODINGS = {
    "WinAnsiEncoding": WIN_ANSI,
    "MacRomanEncoding": MAC_ROMAN,
    "StandardEncoding": STANDARD,
    # Annex D.4/D.7 tables (reference textencoding.go:90/:100)
    "MacExpertEncoding": MAC_EXPERT,
    "PDFDocEncoding": PDF_DOC,
}

# Adobe glyph names → unicode (subset covering /Differences use in fixtures
# and the common Latin set; full AGL not needed for span identity).
GLYPH_NAMES = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "underscore": "_",
    "quoteleft": "‘", "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "endash": "–", "emdash": "—",
    "bullet": "•", "fi": "ﬁ", "fl": "ﬂ",
    "eacute": "é", "egrave": "è", "agrave": "à", "ccedilla": "ç",
    "udieresis": "ü", "odieresis": "ö", "adieresis": "ä", "ntilde": "ñ",
    "Euro": "€", "degree": "°", "plusminus": "±", "mu": "µ",
}
for _d in "0123456789":
    GLYPH_NAMES[
        ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine"][int(_d)]
    ] = _d
for _ch in "abcdefghijklmnopqrstuvwxyz":
    GLYPH_NAMES[_ch] = _ch
    GLYPH_NAMES[_ch.upper()] = _ch.upper()

# Builtin Helvetica widths (glyph units/1000) for the printable ASCII range —
# used when a fixture/corpus font omits /Widths (standard-14 merge semantics,
# model/model.go:2902). Values from the public AFM.
_HELV = {
    " ": 278, "!": 278, '"': 355, "#": 556, "$": 556, "%": 889, "&": 667,
    "'": 191, "(": 333, ")": 333, "*": 389, "+": 584, ",": 278, "-": 333,
    ".": 278, "/": 278, "0": 556, "1": 556, "2": 556, "3": 556, "4": 556,
    "5": 556, "6": 556, "7": 556, "8": 556, "9": 556, ":": 278, ";": 278,
    "<": 584, "=": 584, ">": 584, "?": 556, "@": 1015, "A": 667, "B": 667,
    "C": 722, "D": 722, "E": 667, "F": 611, "G": 778, "H": 722, "I": 278,
    "J": 500, "K": 667, "L": 556, "M": 833, "N": 722, "O": 778, "P": 667,
    "Q": 778, "R": 722, "S": 667, "T": 611, "U": 722, "V": 667, "W": 944,
    "X": 667, "Y": 667, "Z": 611, "[": 278, "\\": 278, "]": 278, "^": 469,
    "_": 556, "`": 333, "a": 556, "b": 556, "c": 500, "d": 556, "e": 556,
    "f": 278, "g": 556, "h": 556, "i": 222, "j": 222, "k": 500, "l": 222,
    "m": 833, "n": 556, "o": 556, "p": 556, "q": 556, "r": 333, "s": 500,
    "t": 278, "u": 556, "v": 500, "w": 722, "x": 500, "y": 500, "z": 500,
    "{": 334, "|": 260, "}": 334, "~": 584,
}
DEFAULT_WIDTH = 500.0
MISSING_RUNE = "�"

# Ligature expansion (ExpandLigatures, internal/textencoding — applied during
# renderText, SURVEY §2.4 step 3).
LIGATURES = {
    "ﬀ": "ff", "ﬁ": "fi", "ﬂ": "fl", "ﬃ": "ffi", "ﬄ": "ffl",
    "ﬅ": "ft", "ﬆ": "st", "Ĳ": "IJ", "ĳ": "ij",
}


def expand_ligatures(s: str) -> str:
    if len(s) == 1:  # the common per-glyph case
        return LIGATURES.get(s, s)
    for lig, rep in LIGATURES.items():
        if lig in s:
            s = s.replace(lig, rep)
    return s


def normalize_presentation_forms(s: str) -> str:
    """Arabic Presentation Forms (U+FB50–FDFF, U+FE70–FEFF) → base letters
    via stdlib NFKC, applied per glyph alongside ligature expansion. This
    is the extraction-side inverse of the write-side contextual shaper
    (pdf/arabic.py, reference textshaping.go:15) and deliberately does NOT
    share its tables — writer/engine bugs cannot cancel."""
    if not any("ﭐ" <= ch <= "﷿" or "ﹰ" <= ch <= "﻿" for ch in s):
        return s
    import unicodedata

    out = []
    for ch in s:
        if "ﭐ" <= ch <= "﷿" or "ﹰ" <= ch <= "﻿":
            norm = unicodedata.normalize("NFKC", ch)
            # a ligature glyph (lam-alef) occupies ONE visual slot; emit its
            # expansion in VISUAL order so the bidi pass's whole-word char
            # reversal restores logical order
            out.append(norm[::-1] if len(norm) > 1 else norm)
        else:
            out.append(ch)
    return "".join(out)


# --- CMap (ToUnicode + CID) --------------------------------------------------

_CMAP_TOKEN = re.compile(
    rb"<([0-9A-Fa-f]+)>|(begincodespacerange|endcodespacerange|"
    rb"beginbfchar|endbfchar|beginbfrange|endbfrange|begincidrange|"
    rb"endcidrange|begincidchar|endcidchar|usecmap)(?![0-9A-Za-z])|"
    rb"/([^\s/<>\[\]{}()]+)|(-?\d+)(?![0-9A-Za-z])|(\[|\])|(\S)"
)


class CMap:
    """Codespace-aware code→unicode / code→cid mapping."""

    def __init__(self) -> None:
        self.codespaces: list[tuple[int, int, int]] = []  # (nbytes, lo, hi)
        self.to_unicode: dict[int, str] = {}
        self.cid_map: dict[int, int] = {}
        self.use_cmap: str | None = None  # usecmap chain parent (cmap.go:66)

    @classmethod
    def parse(cls, data: bytes) -> "CMap":
        cm = cls()
        toks: list = []
        for m in _CMAP_TOKEN.finditer(data):
            if m.group(1) is not None:
                toks.append(("hex", m.group(1)))
            elif m.group(2) is not None:
                toks.append(("kw", m.group(2).decode()))
            elif m.group(3) is not None:
                toks.append(("name", m.group(3).decode("latin-1")))
            elif m.group(4) is not None:
                toks.append(("int", int(m.group(4))))
            elif m.group(5) is not None:
                toks.append(("br", m.group(5)))
        i = 0
        n = len(toks)

        def hexint(tok):
            return int(tok[1], 16), len(tok[1]) // 2

        while i < n:
            kind, val = toks[i]
            if kind == "kw" and val == "begincodespacerange":
                i += 1
                while i + 1 < n and toks[i][0] == "hex" and toks[i + 1][0] == "hex":
                    lo, nb = hexint(toks[i])
                    hi, _ = hexint(toks[i + 1])
                    cm.codespaces.append((nb, lo, hi))
                    i += 2
            elif kind == "kw" and val == "beginbfchar":
                i += 1
                while i + 1 < n and toks[i][0] == "hex" and toks[i + 1][0] == "hex":
                    code, _ = hexint(toks[i])
                    cm.to_unicode[code] = cls._utf16(toks[i + 1][1])
                    i += 2
            elif kind == "kw" and val == "beginbfrange":
                i += 1
                while i + 1 < n and toks[i][0] == "hex" and toks[i + 1][0] == "hex":
                    lo, _ = hexint(toks[i])
                    hi, _ = hexint(toks[i + 1])
                    i += 2
                    if i < n and toks[i][0] == "hex":
                        base = cls._utf16(toks[i][1])
                        i += 1
                        if len(base) == 1:
                            b0 = ord(base)
                            for c in range(lo, hi + 1):
                                cm.to_unicode[c] = chr(b0 + (c - lo))
                        else:
                            for c in range(lo, hi + 1):
                                cm.to_unicode[c] = base
                    elif i < n and toks[i] == ("br", b"["):
                        i += 1
                        c = lo
                        while i < n and toks[i][0] == "hex":
                            cm.to_unicode[c] = cls._utf16(toks[i][1])
                            c += 1
                            i += 1
                        if i < n and toks[i] == ("br", b"]"):
                            i += 1
            elif kind == "kw" and val == "begincidrange":
                i += 1
                while (
                    i + 2 < n
                    and toks[i][0] == "hex"
                    and toks[i + 1][0] == "hex"
                ):
                    lo, _ = hexint(toks[i])
                    hi, _ = hexint(toks[i + 1])
                    # real Adobe CMaps write the cid operand as a plain
                    # decimal integer; embedded fixtures may use hex
                    if toks[i + 2][0] == "int":
                        cid = toks[i + 2][1]
                    elif toks[i + 2][0] == "hex":
                        cid = int(toks[i + 2][1], 16)
                    else:
                        i += 3
                        continue
                    for c in range(lo, hi + 1):
                        cm.cid_map[c] = cid + (c - lo)
                    i += 3
            elif kind == "kw" and val == "begincidchar":
                i += 1
                while i + 1 < n and toks[i][0] == "hex" and toks[i + 1][0] in (
                        "int", "hex"):
                    code, _ = hexint(toks[i])
                    t = toks[i + 1]
                    cm.cid_map[code] = t[1] if t[0] == "int" else int(t[1], 16)
                    i += 2
            elif kind == "kw" and val == "usecmap":
                # stack form: "/Name usecmap" — the preceding name token
                if i > 0 and toks[i - 1][0] == "name":
                    cm.use_cmap = toks[i - 1][1]
                i += 1
            else:
                i += 1
        if not cm.codespaces:
            cm.codespaces = [(2, 0x0000, 0xFFFF)]
        return cm

    @staticmethod
    def _utf16(hexbytes: bytes) -> str:
        b = bytes.fromhex(hexbytes.decode("ascii"))
        if len(b) % 2:
            b += b"\x00"
        try:
            return b.decode("utf-16-be")
        except UnicodeDecodeError:
            return MISSING_RUNE

    def split_codes(self, raw: bytes) -> list[int]:
        """Codespace-driven byte→charcode split (BytesToCharcodes,
        cmap.go:135). Falls back to 2-byte big-endian."""
        codes: list[int] = []
        i = 0
        n = len(raw)
        by_len: dict[int, list[tuple[int, int]]] = {}
        for nb, lo, hi in self.codespaces:
            by_len.setdefault(nb, []).append((lo, hi))
        lens = sorted(by_len)
        while i < n:
            matched = False
            for nb in lens:
                if i + nb > n:
                    continue
                v = int.from_bytes(raw[i : i + nb], "big")
                if any(lo <= v <= hi for lo, hi in by_len[nb]):
                    codes.append(v)
                    i += nb
                    matched = True
                    break
            if not matched:
                nb = min(2, n - i)
                codes.append(int.from_bytes(raw[i : i + nb], "big"))
                i += nb
        return codes


# --- font objects -------------------------------------------------------------


class Font:
    """Decoded font: charcode split, charcode→unicode, charcode→width."""

    def __init__(self) -> None:
        self.subtype = ""
        self.is_cid = False
        self.to_unicode: CMap | None = None
        self.encoding_map: dict[int, str] = {}
        self.widths: dict[int, float] = {}
        self.default_width = DEFAULT_WIDTH
        self.name = ""
        self.predef_mode: str | None = None  # 'identity' | 'ucs2' | 'utf16'
        self.wmode = 0  # 1 = vertical writing (CMap WMode, cmap.go:17)
        # vertical metrics (PDF 32000 §9.7.4.3): default w1 from /DW2
        # (default -1000 = one em down), per-CID overrides from /W2
        self.default_w1 = -1000.0
        self.w1_map: dict[int, float] = {}
        # per-CID position vector v=(vx, vy) from /W2; defaults per
        # PDF 32000 §9.7.4.3: vx = w0/2, vy = DW2[0] (880)
        self.default_vy = 880.0
        self.v_map: dict[int, tuple[float, float]] = {}
        # charcode→CID for Type0 width lookup (model/model.go:2506): from an
        # embedded CMap's cidrange entries; identity for Identity-H/V and
        # (approximation, documented) the predefined Uni*-UCS2/UTF16 forms
        self.cid_map: dict[int, int] = {}
        self.is_type3 = False
        self.font_matrix_scale = 0.001  # Type3 uses 1.0 (renderText e:356)
        # builtin metrics for /Widths-less simple fonts: a Standard-14 AFM
        # table selected by BaseFont (GetCharMetrics model/model.go:3340),
        # the Courier 600 flat, or advances from an embedded TrueType hmtx
        self.builtin_widths: dict[str, int] | None = None
        self.builtin_flat: float | None = None
        self.ttf: "truetype.TtfFont | None" = None
        self._u_cache: dict[int, tuple[str, bool]] = {}
        self._w_cache: dict[int, float] = {}
        # fused decode memo for the interpreter's hot loop:
        # charcode -> (width·font_matrix_scale, unicode, missed)
        self._wu_cache: dict[int, tuple[float, str, bool]] = {}

    # decode chain ----------------------------------------------------------
    def bytes_to_charcodes(self, raw: bytes) -> list[int]:
        if self.is_cid:
            cmap = self.to_unicode
            if cmap is not None and cmap.codespaces:
                return cmap.split_codes(raw)
            # CID font without usable codespaces: 2-byte big-endian
            if len(raw) % 2:
                raw += b"\x00"
            return [
                int.from_bytes(raw[i : i + 2], "big") for i in range(0, len(raw), 2)
            ]
        return list(raw)

    def charcode_to_unicode(self, code: int) -> tuple[str, bool]:
        """Returns (expanded text, missed). Priority mirrors
        CharcodesToStrings (model/model.go:547): ToUnicode → encoder →
        U+FFFD; ligatures expanded (textencoding.ExpandLigatures). Memoized —
        fonts repeat across a corpus (cross-doc object cache keeps one Font
        per distinct font object)."""
        hit = self._u_cache.get(code)
        if hit is not None:
            return hit
        u = None
        if self.to_unicode is not None:
            u = self.to_unicode.to_unicode.get(code)
            if u is not None and _is_private_use(u):
                u = None
        if u is None and self.predef_mode in ("ucs2", "utf16"):
            # predefined Uni*-UCS2/UTF16 CMaps define charcodes AS UTF-16BE
            # code units — unicode is intrinsic to the encoding, no CID→
            # unicode asset required (LoadPredefinedCMap, cmap.go:66)
            u = _utf16_charcode_to_unicode(code)
        if u is None:
            u = self.encoding_map.get(code)
        if u is None:
            res = (MISSING_RUNE, True)
        else:
            res = (normalize_presentation_forms(expand_ligatures(u)), False)
        self._u_cache[code] = res
        return res

    def charcode_width(self, code: int) -> float:
        """Glyph-space width (units of 1/1000 text space; Type3 exempt).
        Type0 /W arrays are keyed by CID, so the charcode goes through the
        encoding CMap's cid mapping first (identity when absent). Memoized —
        the fallback chain runs once per distinct charcode."""
        hit = self._w_cache.get(code)
        if hit is not None:
            return hit
        w = self._width_uncached(code)
        self._w_cache[code] = w
        return w

    def _width_uncached(self, code: int) -> float:
        if self.is_cid:
            code = self.cid_map.get(code, code)
        w = self.widths.get(code)
        if w is not None:
            return w
        if self.builtin_flat is not None:
            return self.builtin_flat
        u = self.encoding_map.get(code)
        if u is not None:
            table = self.builtin_widths
            if table is not None and u in table:
                return float(table[u])
            if self.ttf is not None:
                tw = self.ttf.char_width(u, code)
                if tw is not None:
                    return tw
            if u in _HELV:  # generic sans default for unknown base fonts
                return float(_HELV[u])
        elif self.ttf is not None:
            tw = self.ttf.char_width(None, code)
            if tw is not None:
                return tw
        return self.default_width


def _is_private_use(s: str) -> bool:
    # reject Unicode category Co results (model/model.go:547 path)
    return len(s) == 1 and 0xE000 <= ord(s) <= 0xF8FF


# --- predefined CMaps ----------------------------------------------------------
# Reference: LoadPredefinedCMap (internal/cmap/cmap.go:66). The reference ships
# the full Adobe bcmap assets; for TEXT EXTRACTION the high-frequency families
# are the Uni*-UCS2/UTF16 ones, whose charcodes are UTF-16BE code units by
# definition — the charcode→unicode map is intrinsic, no asset needed. CID-
# keyed /W widths for these collections are approximated by /DW (advance-only
# effect; extracted text is exact).
_PREDEF_RE = re.compile(
    r"^Uni(?:GB|CNS|JIS|JIS2004|JISX0213|JISX02132004|KS|AKR)-(UCS2|UTF16)-(?:H|V)$"
)


def predefined_cmap(name: str):
    """(mode, codespaces) for a predefined CMap name, or None if unknown."""
    if name in ("Identity-H", "Identity-V"):
        return "identity", [(2, 0x0000, 0xFFFF)]
    m = _PREDEF_RE.match(name)
    if m is None:
        # registry-supplied resources (UNIPDF_SPARK_CMAP_DIR / fixtures):
        # the -UCS2-/-UTF16- convention carries the unicode mode
        from . import cmap_resources

        if cmap_resources.registered(name):
            if "-UTF16-" in name:
                return "utf16", [
                    (2, 0x0000, 0xD7FF),
                    (2, 0xE000, 0xFFFF),
                    (4, 0xD800DC00, 0xDBFFDFFF),
                ]
            return "ucs2", [(2, 0x0000, 0xFFFF)]
        return None
    if m.group(1) == "UTF16":
        return "utf16", [
            (2, 0x0000, 0xD7FF),
            (2, 0xE000, 0xFFFF),
            (4, 0xD800DC00, 0xDBFFDFFF),
        ]
    return "ucs2", [(2, 0x0000, 0xFFFF)]


def _utf16_charcode_to_unicode(code: int) -> str | None:
    """Charcode (2-byte BMP value or 4-byte surrogate pair) → unicode."""
    if code > 0xFFFF:  # surrogate pair packed big-endian
        try:
            return code.to_bytes(4, "big").decode("utf-16-be")
        except UnicodeDecodeError:
            return None
    if 0xD800 <= code <= 0xDFFF:  # lone surrogate: invalid
        return None
    return chr(code)


def _type1_builtin_map(fd: dict, r) -> dict[int, str] | None:
    """code → unicode from an embedded Type1 program's cleartext /Encoding
    (FontDescriptor /FontFile; type1.parse_cleartext). Mirrors the
    reference's all-or-nothing NewCustomSimpleTextEncoder: any glyph name
    the AGL cannot resolve drops the whole builtin (parseASCIIPart logs
    UNKNOWN GLYPH and leaves the encoder unset → Standard fallback)."""
    fdesc = r(fd.get("FontDescriptor"))
    if not isinstance(fdesc, dict):
        return None
    parsed = None
    ff = r(fdesc.get("FontFile"))
    if hasattr(ff, "decoded"):
        try:
            data = ff.decoded(r)
        except Exception:
            return None
        sd = getattr(ff, "dict", None) or {}
        parsed = type1.parse_cleartext(
            data, r(sd.get("Length1")), r(sd.get("Length2")))
    if parsed is None:
        # FontFile3 /Type1C (bare CFF): a deliberate extension beyond
        # reference parity — the reference rejects Type1C programs
        # (model.go:4205 ErrType1CFontNotSupported) and degrades to
        # Standard; reading the CFF's own Encoding/Charset only improves
        # decoding (pdf/cff.py)
        ff3 = r(fdesc.get("FontFile3"))
        if hasattr(ff3, "decoded"):
            try:
                parsed = cff.parse_cff_builtin(ff3.decoded(r))
            except Exception:
                parsed = None
    if parsed is None:
        return None
    _name, enc = parsed
    out: dict[int, str] = {}
    for code, glyph in enc.items():
        u = glyph_to_unicode(glyph)
        if u is None:
            return None
        out[code] = u
    return out


def load_font(doc, font_dict) -> Font:
    """Font factory (dispatch on /Subtype — model/model.go:2902)."""
    r = doc.resolve
    fd = r(font_dict)
    f = Font()
    if not isinstance(fd, dict):
        return f
    f.subtype = str(r(fd.get("Subtype")) or "")
    f.name = str(r(fd.get("BaseFont")) or "")

    tu = r(fd.get("ToUnicode"))
    if tu is not None and hasattr(tu, "decoded"):
        f.to_unicode = CMap.parse(tu.decoded(r))

    if f.subtype == "Type0":
        f.is_cid = True
        enc = r(fd.get("Encoding"))
        predef_codespaces = None
        # Identity-H/V: 2-byte identity codespace; embedded CMap streams parsed
        if hasattr(enc, "decoded"):
            enc_cmap = CMap.parse(enc.decoded(r))
            f.cid_map = enc_cmap.cid_map  # /W is CID-keyed (model:2506)
            ed = getattr(enc, "dict", None)
            if isinstance(ed, dict):
                f.wmode = int(r(ed.get("WMode")) or 0)
            if f.to_unicode is None:
                f.to_unicode = enc_cmap
            else:
                f.to_unicode.codespaces = enc_cmap.codespaces or f.to_unicode.codespaces
        elif enc is not None:
            enc_name = str(enc)
            pre = predefined_cmap(enc_name)
            if pre is not None:
                f.predef_mode, predef_codespaces = pre
                if enc_name.endswith("-V"):
                    f.wmode = 1  # vertical predefined CMap (cmap.go:17)
                if f.predef_mode != "identity":
                    # registry CID table (LoadPredefinedCMap, cmap.go:66):
                    # real Adobe charcode→CID routing for /W///W2 when the
                    # resource is available (UNIPDF_SPARK_CMAP_DIR or a
                    # registered entry); identity approximation otherwise
                    from . import cmap_resources

                    res = cmap_resources.cid_cmap(enc_name)
                    if res is not None and res.cid_map:
                        f.cid_map = res.cid_map
                        if res.codespaces:
                            predef_codespaces = res.codespaces
        desc_list = r(fd.get("DescendantFonts")) or []
        if desc_list:
            desc = r(desc_list[0])
            if isinstance(desc, dict):
                f.default_width = float(r(desc.get("DW")) or 1000.0)
                w_arr = r(desc.get("W"))
                if isinstance(w_arr, list):
                    f.widths.update(_parse_cid_widths(w_arr, r))
                dw2 = r(desc.get("DW2"))
                if isinstance(dw2, list) and len(dw2) >= 2:
                    f.default_vy = float(r(dw2[0]))
                    f.default_w1 = float(r(dw2[1]))
                w2 = r(desc.get("W2"))
                if isinstance(w2, list):
                    w1m, vm = _parse_cid_w2(w2, r)
                    f.w1_map.update(w1m)
                    f.v_map.update(vm)
        else:
            f.default_width = 1000.0
        if f.to_unicode is None:
            f.to_unicode = CMap()  # identity codespace fallback
        if predef_codespaces is not None:
            # a document ToUnicode still wins for unicode values, but byte→
            # charcode splitting follows the predefined CMap's codespaces
            f.to_unicode.codespaces = predef_codespaces
        if not f.to_unicode.codespaces:
            f.to_unicode.codespaces = [(2, 0x0000, 0xFFFF)]
        return f

    if f.subtype == "Type3":
        # Type3 glyph space is defined by /FontMatrix, not the fixed 1/1000
        # (renderText ratio=1, e:356; width loading model/model.go:869).
        # Fold the matrix x-scale into the widths so downstream advance math
        # treats them as em units (ratio 1).
        f.is_type3 = True
        f.font_matrix_scale = 1.0
        fm = r(fd.get("FontMatrix"))
        f._t3_scale = float(r(fm[0])) if isinstance(fm, list) and fm else 1.0

    # simple font: base encoding + /Differences
    enc = r(fd.get("Encoding"))
    base_map = None
    diffs = None
    if isinstance(enc, str):
        base_map = _ENCODINGS.get(str(enc))
    elif isinstance(enc, dict):
        be = r(enc.get("BaseEncoding"))
        if be:
            base_map = _ENCODINGS.get(str(be))
        diffs = r(enc.get("Differences"))
    if base_map is None and enc is None:
        # no /Encoding at all: a symbolic embedded Type1's builtin encoding
        # (the cleartext /Encoding array of its FontFile program) wins —
        # model.go:2146 addEncoding uses the fontFile encoder only when the
        # font dict carries no /Encoding; Differences still apply on top
        base_map = _type1_builtin_map(fd, r)
    if base_map is None:
        # built-in encodings for the symbolic Standard-14 fonts
        # (textencoding.go NewSymbolEncoder/NewZapfDingbatsEncoder)
        if "ZapfDingbats" in f.name or "Dingbats" in f.name:
            base_map = ZAPF_DINGBATS
        elif "Symbol" in f.name:
            base_map = SYMBOL
        else:
            base_map = STANDARD
    f.encoding_map = dict(base_map)
    if isinstance(diffs, list):
        code = 0
        for item in diffs:
            item = r(item)
            if isinstance(item, (int, float)):
                code = int(item)
            else:
                nm = str(item)
                u = glyph_to_unicode(nm)
                f.encoding_map[code] = u if u is not None else MISSING_RUNE
                code += 1

    first = r(fd.get("FirstChar"))
    widths = r(fd.get("Widths"))
    if isinstance(widths, list) and first is not None:
        first = int(first)
        t3 = getattr(f, "_t3_scale", None) if f.is_type3 else None
        scale = t3 if t3 is not None else 1.0
        for i, w in enumerate(widths):
            # width entries are virtually always direct numbers; only chase
            # references when one actually appears (resolve per entry was
            # the single hottest resolve call site, 64k calls/400 docs)
            if not isinstance(w, (int, float)):
                w = r(w)
            if isinstance(w, (int, float)):
                f.widths[first + i] = float(w) * scale
    elif not f.is_type3:
        # no /Widths: Standard-14 AFM metrics by BaseFont, else an embedded
        # TrueType's hmtx advances (GetCharMetrics model/model.go:3340,
        # TrueType cmap decode textencoding.go:104)
        if std14.is_courier(f.name):
            f.builtin_flat = float(std14.COURIER_WIDTH)
        else:
            f.builtin_widths = std14.widths_for_basefont(f.name)
        if f.builtin_widths is None and f.builtin_flat is None:
            fdesc = r(fd.get("FontDescriptor"))
            if isinstance(fdesc, dict):
                ff2 = r(fdesc.get("FontFile2"))
                if hasattr(ff2, "decoded"):
                    try:
                        f.ttf = truetype.TtfFont.parse(ff2.decoded(r))
                    except Exception:
                        f.ttf = None
    return f


def vadvance_em(font: "Font", code: int) -> float:
    """Vertical advance magnitude in em units for a charcode (w1 is
    negative-down in the PDF model; the interpreter subtracts)."""
    cid = font.cid_map.get(code, code)
    w1 = font.w1_map.get(cid, font.default_w1)
    return -w1 / 1000.0


def vorigin_em(font: "Font", code: int, w0_em: float) -> tuple[float, float]:
    """Position vector v = (vx, vy) in em units for a charcode (PDF 32000
    §9.7.4.3): the glyph's horizontal origin sits at (pen − v·Tfs). Default
    vx = w0/2 (centers the glyph on the vertical baseline), default vy from
    /DW2 (880)."""
    cid = font.cid_map.get(code, code)
    v = font.v_map.get(cid)
    if v is not None:
        return v[0] / 1000.0, v[1] / 1000.0
    return 0.5 * w0_em, font.default_vy / 1000.0


def _parse_cid_w2(w2_arr: list, r):
    """CID /W2 array (PDF 32000 §9.7.4.3): `c [w1 vx vy w1 vx vy …]` or
    `cFirst cLast w1 vx vy`. Returns (w1_map, v_map): the vertical
    displacement AND the per-CID position vector (vx, vy) — v offsets the
    glyph ink from the vertical-origin pen position (model:2506 W2
    semantics; r3 VERDICT missing #4)."""
    out: dict[int, float] = {}
    vout: dict[int, tuple[float, float]] = {}
    i = 0
    n = len(w2_arr)
    while i < n:
        c = r(w2_arr[i])
        if not isinstance(c, (int, float)):
            i += 1
            continue
        c = int(c)
        if i + 1 < n:
            nxt = r(w2_arr[i + 1])
            if isinstance(nxt, list):
                for j in range(0, len(nxt) - 2, 3):
                    w1 = r(nxt[j])
                    vx = r(nxt[j + 1])
                    vy = r(nxt[j + 2])
                    if isinstance(w1, (int, float)):
                        out[c + j // 3] = float(w1)
                    if isinstance(vx, (int, float)) and isinstance(
                            vy, (int, float)):
                        vout[c + j // 3] = (float(vx), float(vy))
                i += 2
                continue
            if i + 4 < n:
                last = int(nxt)
                w1 = r(w2_arr[i + 2])
                vx = r(w2_arr[i + 3])
                vy = r(w2_arr[i + 4])
                if isinstance(w1, (int, float)):
                    for cc in range(c, last + 1):
                        out[cc] = float(w1)
                if isinstance(vx, (int, float)) and isinstance(
                        vy, (int, float)):
                    for cc in range(c, last + 1):
                        vout[cc] = (float(vx), float(vy))
                i += 5
                continue
        i += 1
    return out, vout


def _parse_cid_widths(w_arr: list, r) -> dict[int, float]:
    """CID /W array: `c [w1 w2 ...]` or `cFirst cLast w`
    (model/model.go:2506 `_agbf` semantics)."""
    out: dict[int, float] = {}
    i = 0
    n = len(w_arr)
    while i < n:
        c = w_arr[i]
        if not isinstance(c, (int, float)):
            c = r(c)
        if not isinstance(c, (int, float)):
            i += 1
            continue
        c = int(c)
        if i + 1 < n:
            nxt = w_arr[i + 1]
            if not isinstance(nxt, (int, float, list)):
                nxt = r(nxt)
            if isinstance(nxt, list):
                for j, w in enumerate(nxt):
                    if not isinstance(w, (int, float)):
                        w = r(w)
                    if isinstance(w, (int, float)):
                        out[c + j] = float(w)
                i += 2
                continue
            if i + 2 < n:
                last = int(nxt)
                w = r(w_arr[i + 2])
                if isinstance(w, (int, float)):
                    for cc in range(c, last + 1):
                        out[cc] = float(w)
                i += 3
                continue
        i += 1
    return out
