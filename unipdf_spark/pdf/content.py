"""Content-stream lexer: bytes → list of (operator, params) operations.

Semantics of unipdf ``ContentStreamParser.Parse`` (contentstream/
contentstream.go:70): accumulate operands until an operator token, emit
``(operand, params)``; ``BI`` triggers inline-image parsing
(``ParseInlineImage``, contentstream.go:580). Unknown operators pass through
(relaxed mode, contentstream.go:575); BX/EX compatibility sections ignored.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .cos import DELIMITERS, WHITESPACE, Lexer, Name, PdfDict, PdfError


@dataclass
class InlineImage:
    params: PdfDict
    data: bytes


@dataclass
class Operation:
    op: str
    params: list


_OPRE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


def parse_content(data: bytes) -> list[Operation]:
    ops: list[Operation] = []
    lx = Lexer(data, 0)
    params: list = []
    n = len(data)
    while True:
        lx.skip_ws()
        if lx.pos >= n:
            break
        c = data[lx.pos]
        try:
            if c == 0x2F or c == 0x28 or c == 0x5B or c in b"+-.0123456789":
                params.append(_parse_operand(lx))
                continue
            if c == 0x3C:
                if data.startswith(b"<<", lx.pos):
                    d = lx.parse_dict()
                    params.append(d)
                else:
                    params.append(lx.parse_hex_string())
                continue
        except PdfError:
            # relaxed: skip one byte and continue
            lx.pos += 1
            continue
        m = _OPRE.match(data, lx.pos)
        if not m:
            lx.pos += 1  # stray delimiter — skip
            continue
        op = m.group().decode("latin-1")
        lx.pos = m.end()
        if op == "BI":
            img = _parse_inline_image(lx)
            ops.append(Operation("BI", [img]))
            params = []
            continue
        if op in ("true", "false", "null"):
            params.append(None if op == "null" else op == "true")
            continue
        ops.append(Operation(op, params))
        params = []
    return ops


def _parse_operand(lx: Lexer):
    c = lx.data[lx.pos]
    if c == 0x2F:
        return lx.parse_name()
    if c == 0x28:
        return lx.parse_literal_string()
    if c == 0x5B:
        # content-stream arrays contain no indirect refs — reuse cos parser
        return lx.parse_array()
    m = _NUM_RE.match(lx.data, lx.pos)
    if not m:
        raise PdfError(f"bad operand at {lx.pos}")
    tok = m.group()
    lx.pos = m.end()
    return float(tok) if b"." in tok else int(tok)


def _parse_inline_image(lx: Lexer) -> InlineImage:
    """BI <pairs> ID <raw> EI (contentstream.go:580)."""
    d = PdfDict()
    data = lx.data
    n = len(data)
    while True:
        lx.skip_ws()
        if lx.pos >= n:
            break
        if data.startswith(b"ID", lx.pos) and (
            lx.pos + 2 >= n
            or data[lx.pos + 2] in WHITESPACE
            or data[lx.pos + 2] in DELIMITERS
        ):
            lx.pos += 2
            if lx.pos < n and data[lx.pos] in WHITESPACE:
                lx.pos += 1  # single whitespace after ID
            break
        key = lx.parse_name()
        lx.skip_ws()
        val = lx.parse_object()
        if isinstance(val, tuple):
            val = val[0]
        d[str(key)] = val
    start = lx.pos
    # scan for EI delimited by whitespace (binary-safe heuristic)
    i = start
    while i < n:
        j = data.find(b"EI", i)
        if j < 0:
            j = n
            break
        before_ok = j == 0 or data[j - 1] in WHITESPACE
        after_ok = j + 2 >= n or data[j + 2] in WHITESPACE or data[j + 2] in DELIMITERS
        if before_ok and after_ok:
            break
        i = j + 1
    raw = data[start:j]
    # exactly one EOL/space separates data from EI; payload bytes may
    # themselves end in whitespace, so strip a single separator only
    if raw.endswith(b"\r\n"):
        raw = raw[:-2]
    elif raw[-1:] in (b" ", b"\n", b"\r", b"\t"):
        raw = raw[:-1]
    lx.pos = min(j + 2, n)
    return InlineImage(d, raw)
