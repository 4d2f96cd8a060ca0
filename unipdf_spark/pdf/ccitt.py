"""CCITT Group 3/4 fax decoding (ITU-T T.4 / T.6), written from the public
spec; code tables in :mod:`ccitt_tables`. Reference parity target:
internal/ccittfax/ccittfax.go (Decoder.decodeRowType4/Type6, decode2D).

Supported: K < 0 (Group 4 / T.6 pure 2D), K = 0 (Group 3 1D / modified
Huffman, optional EOLs), K > 0 (Group 3 mixed 1D/2D: each EOL carries a
tag bit — 1 selects 1D, 0 selects 2D against the previous row), BlackIs1,
EncodedByteAlign, Columns, Rows.
Output is the PDF image convention: 1 bit per pixel, rows padded to byte
boundaries, 0 = black unless BlackIs1 (PDF 32000-1 §7.4.6).
"""

from __future__ import annotations

from . import ccitt_tables as T


class CCITTError(Exception):
    pass


class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def eof(self) -> bool:
        return self.pos >= len(self.data) * 8

    def read(self) -> int:
        p = self.pos
        if p >= len(self.data) * 8:
            raise CCITTError("bit stream exhausted")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def peek_str(self, n: int) -> str:
        out = []
        p = self.pos
        end = len(self.data) * 8
        for i in range(n):
            if p + i >= end:
                break
            out.append(str((self.data[(p + i) >> 3] >> (7 - ((p + i) & 7))) & 1))
        return "".join(out)


def _build_tree(*tables: dict) -> dict:
    """bitstring-keyed prefix map → nested dict tree {0: ..., 1: ..., 'v': run}."""
    root: dict = {}
    for tbl in tables:
        for run, bits in tbl.items():
            node = root
            for ch in bits:
                node = node.setdefault(int(ch), {})
            node["v"] = run
    return root


_WHITE_TREE = _build_tree(T.WHITE_TERMINAL, T.WHITE_MAKEUP, T.EXT_MAKEUP)
_BLACK_TREE = _build_tree(T.BLACK_TERMINAL, T.BLACK_MAKEUP, T.EXT_MAKEUP)

# T.6 / T.4-2D vertical/horizontal/pass mode codes (spec §4.2.1.3 table 4)
_MODE_TREE = _build_tree(
    {
        ("V", 0): "1",
        ("V", 1): "011",
        ("V", -1): "010",
        ("H",): "001",
        ("P",): "0001",
        ("V", 2): "000011",
        ("V", -2): "000010",
        ("V", 3): "0000011",
        ("V", -3): "0000010",
        ("EOL",): "000000000001",
    }
)


def _read_code(bits: _Bits, tree: dict):
    node = tree
    while True:
        node = node.get(bits.read())
        if node is None:
            raise CCITTError("unknown code word")
        if "v" in node:
            return node["v"]


def _read_run(bits: _Bits, white: bool) -> int:
    """Total run length: make-up codes (≥64) accumulate until a terminal."""
    total = 0
    tree = _WHITE_TREE if white else _BLACK_TREE
    while True:
        v = _read_code(bits, tree)
        total += v
        if v < 64:
            return total


def _decode_1d_row(bits: _Bits, columns: int) -> list[int]:
    """One MH-coded row → changing-element positions (T.4 §2.3.1)."""
    changes: list[int] = []
    a0 = 0
    white = True
    while a0 < columns:
        run = _read_run(bits, white)
        a0 += run
        changes.append(min(a0, columns))
        white = not white
    return changes


def _decode_2d_row(bits: _Bits, ref: list[int], columns: int) -> list[int]:
    """One 2D-coded row against the reference row's changing elements
    (T.6 §4.2.1; reference decode2D)."""
    changes: list[int] = []
    a0 = -1
    white = True
    while a0 < columns:
        # b1: first changing element on ref line right of a0 with color
        # opposite to a0's color; b2: the next one after b1
        i = 0
        while i < len(ref) and ref[i] <= (a0 if a0 >= 0 else -1):
            i += 1
        # ref changes alternate colors starting white→black at index 0;
        # element i has "color after change" = black if i even
        if (i % 2 == 0) != white:
            i += 1
        b1 = ref[i] if i < len(ref) else columns
        b2 = ref[i + 1] if i + 1 < len(ref) else columns

        mode = _read_code(bits, _MODE_TREE)
        if mode == ("P",):
            a0 = b2  # pass: color unchanged, skip past b2
        elif mode == ("H",):
            # horizontal: two explicit runs from a0 (first of current color)
            start = a0 if a0 > 0 else 0
            r1 = _read_run(bits, white)
            r2 = _read_run(bits, not white)
            a1 = start + r1
            a2 = a1 + r2
            changes.append(min(a1, columns))
            changes.append(min(a2, columns))
            a0 = a2
        elif mode == ("EOL",):
            break
        else:  # vertical mode: a1 = b1 + delta, color flips
            delta = mode[1]
            a1 = b1 + delta
            changes.append(min(max(a1, 0), columns))
            a0 = a1
            white = not white
    return changes


def _changes_to_row(changes: list[int], columns: int) -> bytearray:
    """Changing elements → packed row bits (1 = black here; inverted later
    per BlackIs1)."""
    row = bytearray((columns + 7) // 8)
    pos = 0
    black = False
    for c in changes:
        c = min(c, columns)
        if black:
            for x in range(pos, c):
                row[x >> 3] |= 0x80 >> (x & 7)
        pos = c
        black = not black
        if pos >= columns:
            break
    return row


def decode_t6_planes(data: bytes, columns: int, rows: int,
                     n_planes: int) -> list[bytes]:
    """N consecutive T.6 (MMR) bitmaps from ONE bit stream — the JBIG2
    halftone HMMR=1 grayscale shape (T.88 Annex C.5: bitplanes coded one
    after another, each terminated by EOFB). Returns packed rows per
    plane, 1 = black (JBIG2 convention), without byte re-alignment
    between planes beyond the EOFB."""
    if not (0 < columns <= (1 << 16)):
        raise CCITTError(f"implausible Columns {columns}")
    bits = _Bits(data)
    planes: list[bytes] = []
    for _ in range(n_planes):
        out = bytearray()
        ref = [columns, columns]
        for _r in range(rows):
            if bits.peek_str(24) == "000000000001" * 2:
                break
            changes = _decode_2d_row(bits, ref, columns)
            out += _changes_to_row(changes, columns)
            ref = changes if changes else [columns, columns]
        if bits.peek_str(24) == "000000000001" * 2:
            bits.pos += 24  # consume the plane's EOFB
        stride = (columns + 7) // 8
        if len(out) < rows * stride:
            raise CCITTError("truncated halftone grayscale plane")
        planes.append(bytes(out))
    return planes


def decode_ccitt(data: bytes, parms: dict | None = None) -> bytes:
    """CCITTFaxDecode → packed 1-bpp rows (PDF image data convention)."""
    parms = parms or {}
    columns = int(parms.get("Columns", 1728))
    if not (0 < columns <= (1 << 16)):
        # corrupt /Columns from a poisoned dict: fail fast, never allocate
        # a multi-MB stride per row (relaxed web-corpus contract)
        raise CCITTError(f"implausible Columns {columns}")
    k = int(parms.get("K", 0))
    rows_limit = int(parms.get("Rows", 0))
    black_is_1 = bool(parms.get("BlackIs1", False))
    byte_align = bool(parms.get("EncodedByteAlign", False))

    bits = _Bits(data)
    out = bytearray()
    ref = [columns, columns]  # imaginary all-white reference line
    n_rows = 0
    while not bits.eof():
        if rows_limit and n_rows >= rows_limit:
            break
        if byte_align:
            bits.align()
        if bits.eof():
            break
        try:
            if k < 0:
                # T.6: EOFB = two EOLs
                if bits.peek_str(24) == "000000000001" * 2:
                    break
                changes = _decode_2d_row(bits, ref, columns)
            elif k == 0:
                # G3 1D: optional EOL before each row
                if bits.peek_str(12) == "000000000001":
                    bits.pos += 12
                    if bits.eof():
                        break
                changes = _decode_1d_row(bits, columns)
            else:
                # G3 2D (K > 0): EOL + tag bit per row (T.4 §4.2.1.2)
                two_d = False
                if bits.peek_str(12) == "000000000001":
                    bits.pos += 12
                    if bits.eof():
                        break
                    two_d = bits.read() == 0
                if two_d:
                    changes = _decode_2d_row(bits, ref, columns)
                else:
                    changes = _decode_1d_row(bits, columns)
        except CCITTError:
            break  # truncated tail (relaxed, like the reference's EOF path)
        if not changes:
            break
        row = _changes_to_row(changes, columns)
        if not black_is_1:
            row = bytearray(b ^ 0xFF for b in row)
            tail = columns & 7
            if tail:  # keep pad bits zero
                row[-1] &= 0xFF << (8 - tail) & 0xFF
                row[-1] |= 0
        out += row
        ref = changes if changes else [columns, columns]
        n_rows += 1
    return bytes(out)
