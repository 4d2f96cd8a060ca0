"""Embedded Type1 font program: builtin-encoding extraction.

A symbolic simple Type1 font with no /Encoding entry decodes through the
encoding baked into its embedded font program (FontFile). The reference
parses ONLY the cleartext (ASCII) segment — the eexec-encrypted binary is
never opened — and reads the ``/Encoding 256 array … readonly def``
section's ``dup <code> /<glyph> put`` lines (reference: model.go
``fontFile.parseASCIIPart`` / ``getASCIISections`` / ``getEncodings``,
regex set at model.go:3624–3626; wired into simple-font decoding by
``addEncoding`` at model.go:2146 — builtin used only when the font dict
has no /Encoding at all). FontFile3 /Type1C (bare CFF) takes a separate
path: the reference rejects it (``ErrType1CFontNotSupported``,
model.go:4205 ``newFontFileFromPdfObject``) but this engine parses the
CFF charset/encoding as a documented extension beyond reference parity —
see :mod:`unipdf_spark.pdf.cff` (wired at fonts.py `_type1_builtin_map`).
"""

from __future__ import annotations

import re

# the reference's exact patterns (model.go:3624-3626), transcribed:
_DICT_BEGIN = re.compile(rb"\d+ dict\s+(dup\s+)?begin")
_ENC_START = b"/Encoding 256 array"
_ENC_END = b"readonly def"
_KEY_VAL = re.compile(rb"^\s*/(\S+?)\s+(.+?)\s+def\s*$")
_DUP_PUT = re.compile(rb"^\s*dup\s+(\d+)\s*/(\w+?)(?:\.\d+)?\s+put$")


def parse_cleartext(data: bytes, length1: int | None = None,
                    length2: int | None = None
                    ) -> tuple[str, dict[int, str]] | None:
    """(FontName, code → glyph-name builtin encoding) from a decoded
    FontFile stream, or None when the program carries no parseable
    cleartext encoding. ``length1``/``length2`` are the stream dict's
    segment lengths (clamped like the reference's newFontFileFromPdfObject;
    the binary segment is sliced off and ignored)."""
    n = len(data)
    l1 = n if length1 is None else max(0, min(int(length1), n))
    ascii_seg = data[:l1] if l1 else data
    if len(ascii_seg) < 2 or ascii_seg[:2] != b"%!":
        return None
    m = _DICT_BEGIN.search(ascii_seg)
    if m is None:
        return None
    rest = ascii_seg[m.end():]
    enc_at = rest.find(_ENC_START)
    if enc_at < 0:
        keys_part, enc_part = rest, b""
    else:
        keys_part = rest[:enc_at]
        tail = rest[enc_at:]
        end_at = tail.find(_ENC_END)
        if end_at < 0:
            return None
        enc_part = tail[:end_at]
    name = ""
    for line in re.split(rb"[\n\r]+", keys_part):
        kv = _KEY_VAL.match(line)
        if kv and kv.group(1) == b"FontName":
            name = kv.group(2).decode("latin-1").lstrip("/")
    enc: dict[int, str] = {}
    for line in re.split(rb"[\n\r]+", enc_part):
        dm = _DUP_PUT.match(line)
        if dm:
            enc[int(dm.group(1))] = dm.group(2).decode("latin-1")
    if not enc:
        return None
    return name, enc
