"""Minimal TrueType (sfnt) parser: `cmap` + `hmtx` — enough to recover
glyph advances for simple TrueType fonts that carry no /Widths.

Re-expresses the reference's TrueType handling (unipdf's ttfParser,
model/internal/fonts; charcode→rune via the embedded cmap at
internal/textencoding/textencoding.go:104) from the public OpenType spec:

* offset table → table directory;
* `head` → unitsPerEm (advance scale to 1000/em text units);
* `hhea` → numberOfHMetrics; `hmtx` → advance widths (trailing glyphs
  repeat the last advance, per spec);
* `cmap` subtables: format 4 (segment delta), format 6 (trimmed), format 0
  (byte table); preferred platform order (3,1) Windows-BMP, then (3,0)
  Windows-Symbol (codes live at 0xF000+code), then (1,0) Macintosh.
"""

from __future__ import annotations

import struct


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from(">H", b, off)[0]


def _i16(b: bytes, off: int) -> int:
    return struct.unpack_from(">h", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from(">I", b, off)[0]


class TtfFont:
    def __init__(self) -> None:
        self.units_per_em = 1000
        self.cmap: dict[int, int] = {}  # rune/code -> glyph id
        self.symbolic = False  # (3,0) table: codes are 0xF000-based
        self.advances: list[int] = []

    @classmethod
    def parse(cls, data: bytes) -> "TtfFont":
        f = cls()
        n_tables = _u16(data, 4)
        tables: dict[str, tuple[int, int]] = {}
        for i in range(n_tables):
            off = 12 + 16 * i
            tag = data[off : off + 4].decode("latin-1")
            tables[tag] = (_u32(data, off + 8), _u32(data, off + 12))
        if "head" in tables:
            f.units_per_em = _u16(data, tables["head"][0] + 18) or 1000
        n_hmetrics = 0
        if "hhea" in tables:
            n_hmetrics = _u16(data, tables["hhea"][0] + 34)
        if "hmtx" in tables and n_hmetrics:
            base = tables["hmtx"][0]
            f.advances = [
                _u16(data, base + 4 * i) for i in range(n_hmetrics)
            ]
        if "cmap" in tables:
            f._parse_cmap(data, tables["cmap"][0])
        return f

    # cmap ---------------------------------------------------------------
    def _parse_cmap(self, data: bytes, base: int) -> None:
        n = _u16(data, base + 2)
        subs: dict[tuple[int, int], int] = {}
        for i in range(n):
            off = base + 4 + 8 * i
            plat, enc = _u16(data, off), _u16(data, off + 2)
            subs[(plat, enc)] = base + _u32(data, off + 4)
        for key in ((3, 1), (3, 0), (1, 0), (0, 3), (0, 4)):
            if key in subs:
                self._parse_subtable(data, subs[key])
                if self.cmap:
                    self.symbolic = key == (3, 0)
                    return

    def _parse_subtable(self, data: bytes, off: int) -> None:
        fmt = _u16(data, off)
        if fmt == 4:
            seg_x2 = _u16(data, off + 6)
            n_seg = seg_x2 // 2
            ends = [_u16(data, off + 14 + 2 * i) for i in range(n_seg)]
            starts_off = off + 16 + seg_x2
            starts = [_u16(data, starts_off + 2 * i) for i in range(n_seg)]
            deltas_off = starts_off + seg_x2
            deltas = [_i16(data, deltas_off + 2 * i) for i in range(n_seg)]
            range_off_base = deltas_off + seg_x2
            for s in range(n_seg):
                ro = _u16(data, range_off_base + 2 * s)
                for c in range(starts[s], min(ends[s], 0xFFFE) + 1):
                    if ro == 0:
                        gid = (c + deltas[s]) & 0xFFFF
                    else:
                        gi_off = range_off_base + 2 * s + ro + 2 * (c - starts[s])
                        if gi_off + 2 > len(data):
                            continue
                        gid = _u16(data, gi_off)
                        if gid:
                            gid = (gid + deltas[s]) & 0xFFFF
                    if gid:
                        self.cmap[c] = gid
        elif fmt == 6:
            first, count = _u16(data, off + 6), _u16(data, off + 8)
            for i in range(count):
                gid = _u16(data, off + 10 + 2 * i)
                if gid:
                    self.cmap[first + i] = gid
        elif fmt == 0:
            for c in range(256):
                gid = data[off + 6 + c]
                if gid:
                    self.cmap[c] = gid

    # metrics --------------------------------------------------------------
    def gid_width(self, gid: int) -> float | None:
        """Advance in text units (1/1000 em), hmtx trailing-repeat rule."""
        if not self.advances:
            return None
        adv = self.advances[gid] if gid < len(self.advances) else self.advances[-1]
        return adv * 1000.0 / self.units_per_em

    def char_width(self, u: str | None, code: int) -> float | None:
        """Width for a decoded rune (preferred) or a raw charcode.
        Symbol-table fonts address glyphs at 0xF000+code (textencoding.go
        symbolic path)."""
        gid = None
        if self.symbolic:
            gid = self.cmap.get(0xF000 | code) or self.cmap.get(code)
        elif u:
            gid = self.cmap.get(ord(u[0]))
        if gid is None:
            gid = self.cmap.get(code)
        if gid is None:
            return None
        return self.gid_width(gid)
