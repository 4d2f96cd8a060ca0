"""JPEG (DCTDecode) decoder — baseline + progressive subset.

Re-expresses the reference's JPEG image leg (unipdf decodes DCTDecode via
Go's image/jpeg for ExtractPageImages, core/core.go:1347/:363) from the
public ITU-T T.81 spec: marker parse (SOI/APP/DQT/SOF/DHT/DRI/SOS/EOI),
Huffman entropy decode with byte unstuffing and RST restart-marker
realignment, DC prediction, progressive spectral-selection + successive-
approximation scans (T.81 §G: DC first/refine, AC first/refine with EOB
runs), dequantize, 8×8 IDCT (numpy matrix form), level shift, chroma
upsample, JFIF YCbCr→RGB.

Scope: 8-bit Huffman streams, 1 or 3 components, integer-ratio sampling
factors in {1,2,4} (covers 4:4:4, 4:2:2, 4:2:0, 4:4:0, 4:1:1 — the Go
image/jpeg set the reference decodes), PLUS two documented extensions
beyond reference parity (Go image/jpeg rejects both): 12-bit extended
sequential / progressive (SOF1/SOF2 precision 12, 16-bit DQT) and
LOSSLESS (SOF3, Annex H: single component, predictors 1-7, precision
2-16, point transform 0). Arithmetic-coded and hierarchical streams
raise a typed error (the span path keeps byte-identity media_ref either
way).
"""

from __future__ import annotations

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# orthonormal DCT-II basis: IDCT(X) = C.T @ X @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5)


class JpegError(Exception):
    pass


# corrupt web-corpus guard: a garbage SOF must not allocate multi-GB
# coefficient stores or spin the scan loop (relaxed-mode contract)
MAX_PIXELS = 1 << 26  # 64M
# The lossless scan (Annex H) is a per-sample pure-Python loop — Huffman
# category decode + predictor per pixel — so a crafted SOF3 header must
# fail fast rather than pin a worker for minutes. 1M pixels ≈ 1–2 s
# worst case; real PDF lossless-JPEG assets (scanned masks, medical
# thumbnails) sit far below this.
MAX_PIXELS_LOSSLESS = 1 << 20  # 1M


class _Huff:
    """Canonical Huffman table from (BITS, HUFFVAL) as a (code, len) map."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; marker = end."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise JpegError("truncated entropy segment")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise JpegError("marker inside entropy segment")
            self.buf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, huff: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            val = huff.lookup.get((length, code))
            if val is not None:
                return val
        raise JpegError("invalid Huffman code")

    def restart(self) -> None:
        """Consume an RSTn marker: drop padding bits, realign to the byte
        boundary, verify the marker (T.81 F.2.1.3.1 / §B.2.1 DRI). A
        stuffed 0xFF00 pair produced by 1-bit padding is tolerated."""
        self.nbits = 0
        d, p = self.data, self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                return
            if d[p] == 0xFF and d[p + 1] == 0x00:
                p += 2  # stuffed padding byte before the marker
                continue
            raise JpegError("expected RST marker at restart interval")
        raise JpegError("truncated at restart interval")


def _extend(v: int, t: int) -> int:
    """DC/AC value extension (T.81 F.2.2.1): t-bit magnitude to signed."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _Component:
    """One frame component: geometry + zigzag-order coefficient store."""

    __slots__ = ("cid", "h", "v", "qsel", "bw", "bh", "nbw", "nbh",
                 "blocks", "pred", "dc_sel", "ac_sel")

    def __init__(self, cid: int, h: int, v: int, qsel: int) -> None:
        self.cid, self.h, self.v, self.qsel = cid, h, v, qsel
        self.pred = 0
        self.dc_sel = 0
        self.ac_sel = 0

    def alloc(self, mcux: int, mcuy: int, w: int, h: int,
              hmax: int, vmax: int) -> None:
        self.bw = mcux * self.h  # interleaved-padded block grid
        self.bh = mcuy * self.v
        cw = -(-w * self.h // hmax)  # component sample dims (A.1.1)
        ch = -(-h * self.v // vmax)
        self.nbw = -(-cw // 8)  # non-interleaved scan block grid
        self.nbh = -(-ch // 8)
        self.blocks = [[0] * 64 for _ in range(self.bw * self.bh)]


def _seq_block(br: _BitReader, comp: _Component, zz: list[int],
               dc_h: _Huff, ac_h: _Huff) -> None:
    """Sequential (baseline) block: DC diff + full AC run-length (F.2.2)."""
    t = br.decode(dc_h)
    comp.pred += _extend(br.bits(t), t)
    zz[0] = comp.pred
    k = 1
    while k < 64:
        rs = br.decode(ac_h)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC run past block")
        zz[k] = _extend(br.bits(s), s)
        k += 1


def _ac_first(br: _BitReader, ac_h: _Huff, zz: list[int], ss: int, se: int,
              al: int, eobrun: int) -> int:
    """Progressive AC first scan for one block (T.81 G.1.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode(ac_h)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            break
        k += r
        if k > se:
            raise JpegError("AC run past spectral band")
        zz[k] = _extend(br.bits(s), s) * (1 << al)
        k += 1
    return eobrun


def _ac_refine(br: _BitReader, ac_h: _Huff, zz: list[int], ss: int, se: int,
               al: int, eobrun: int) -> int:
    """Progressive AC refinement for one block (T.81 G.1.2.3): correction
    bits on known-nonzero coefficients, newly-nonzero insertions of ±2^Al."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode(ac_h)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # r == 15: ZRL — pass over 16 zero-history coefficients
            else:
                if s != 1:
                    raise JpegError("bad AC refinement magnitude")
                val = p1 if br.bit() else m1
            while k <= se:
                c = zz[k]
                if c != 0:
                    if br.bit() and (c & p1) == 0:
                        zz[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = zz[k]
            if c != 0:
                if br.bit() and (c & p1) == 0:
                    zz[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(data: bytes, pos: int, comps: list[_Component],
                 scan_comps: list[_Component], htables: dict,
                 ss: int, se: int, ah: int, al: int,
                 mcux: int, mcuy: int, restart_interval: int,
                 progressive: bool) -> int:
    """Decode one entropy-coded scan into the components' coefficient
    arrays; returns the stream position after the scan data."""
    br = _BitReader(data, pos)
    for c in scan_comps:
        c.pred = 0
    eobrun = 0
    interleaved = len(scan_comps) > 1
    if interleaved:
        units = mcux * mcuy
    else:
        c = scan_comps[0]
        units = c.nbw * c.nbh
    ri = restart_interval
    to_restart = ri if ri else -1

    for u in range(units):
        if ri and u and u % ri == 0:
            br.restart()
            for c in scan_comps:
                c.pred = 0
            eobrun = 0
        if interleaved:
            mx, my = u % mcux, u // mcux
            for c in scan_comps:
                dc_h = htables.get((0, c.dc_sel))
                ac_h = htables.get((1, c.ac_sel))
                for sub in range(c.h * c.v):
                    bx = mx * c.h + sub % c.h
                    by = my * c.v + sub // c.h
                    zz = c.blocks[by * c.bw + bx]
                    if not progressive:
                        _seq_block(br, c, zz, dc_h, ac_h)
                    elif ah == 0:  # DC first (interleaved DC scan)
                        t = br.decode(dc_h)
                        c.pred += _extend(br.bits(t), t)
                        zz[0] = c.pred << al
                    else:  # DC refinement
                        if br.bit():
                            zz[0] |= 1 << al
        else:
            c = scan_comps[0]
            bx, by = u % c.nbw, u // c.nbw
            zz = c.blocks[by * c.bw + bx]
            if not progressive:
                _seq_block(br, c, zz, htables[(0, c.dc_sel)],
                           htables[(1, c.ac_sel)])
            elif ss == 0:
                if ah == 0:
                    dc_h = htables[(0, c.dc_sel)]
                    t = br.decode(dc_h)
                    c.pred += _extend(br.bits(t), t)
                    zz[0] = c.pred << al
                else:
                    if br.bit():
                        zz[0] |= 1 << al
            else:
                ac_h = htables[(1, c.ac_sel)]
                if ah == 0:
                    eobrun = _ac_first(br, ac_h, zz, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(br, ac_h, zz, ss, se, al, eobrun)
    return br.pos


def _decode_lossless_scan(data: bytes, pos: int, w: int, h: int,
                          precision: int, predictor: int,
                          pt: int, huff: _Huff) -> tuple[np.ndarray, int]:
    """Lossless-process scan (T.81 Annex H, single component): per-sample
    Huffman category + difference bits, predictor reconstruction in mod-
    2^16 arithmetic. Returns (plane int32 (h, w), stream position)."""
    br = _BitReader(data, pos)
    plane = np.zeros((h, w), dtype=np.int32)
    default = 1 << (precision - 1 - pt)
    for y in range(h):
        for x in range(w):
            t = br.decode(huff)
            if t == 16:  # special category: diff = 32768, no extra bits
                diff = 32768
            else:
                diff = _extend(br.bits(t), t)
            if y == 0 and x == 0:
                pred = default
            elif y == 0:
                pred = int(plane[0, x - 1])
            elif x == 0:
                pred = int(plane[y - 1, 0])
            else:
                ra = int(plane[y, x - 1])
                rb = int(plane[y - 1, x])
                rc = int(plane[y - 1, x - 1])
                pred = {
                    1: ra,
                    2: rb,
                    3: rc,
                    4: ra + rb - rc,
                    5: ra + ((rb - rc) >> 1),
                    6: rb + ((ra - rc) >> 1),
                    7: (ra + rb) >> 1,
                }[predictor]
            plane[y, x] = (pred + diff) & 0xFFFF
    return plane, br.pos


def decode_baseline(data: bytes) -> np.ndarray:
    """Decode a JPEG (baseline sequential or progressive): grayscale →
    (h, w) uint8; YCbCr → (h, w, 3) uint8 RGB (JFIF color transform)."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("no SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _Huff] = {}
    precision = 8
    w = h = 0
    comps: list[_Component] = []
    progressive = False
    lossless = False
    lossless_plane = None
    restart_interval = 0
    mcux = mcuy = 0
    hmax = vmax = 1
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            pos += 1  # garbage/padding between segments — resync
            continue
        marker = data[pos + 1]
        pos += 2
        if marker == 0xFF:  # fill byte
            pos -= 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or marker == 0x00 or 0xD0 <= marker <= 0xD7:
            continue  # TEM / stuffed pad byte / stray RST
        seg_len = int.from_bytes(data[pos : pos + 2], "big")
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq == 0:
                    qtables[tq] = np.array(list(seg[i + 1 : i + 65]),
                                           dtype="f8")
                    i += 65
                else:  # Pq=1: 16-bit entries (extended precision, §B.2.4.1)
                    qtables[tq] = np.array(
                        [int.from_bytes(seg[i + 1 + 2 * k : i + 3 + 2 * k],
                                        "big") for k in range(64)],
                        dtype="f8")
                    i += 129
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1 seq, SOF2
            # progressive, SOF3 lossless
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            precision = seg[0]
            # baseline (SOF0) is 8-bit by definition; extended sequential
            # (SOF1) and progressive (SOF2) allow 12-bit (T.81 Table B.2);
            # lossless (SOF3) allows 2..16. The reference decodes none of
            # 12-bit/lossless (Go image/jpeg) — documented extensions
            # beyond parity.
            if lossless:
                if not 2 <= precision <= 16:
                    raise JpegError(
                        "lossless precision %d out of range" % precision)
            elif precision not in (8, 12) or (marker == 0xC0
                                              and precision != 8):
                raise JpegError(
                    "unsupported precision %d for SOF 0x%02X"
                    % (precision, marker))
            nc = seg[5]
            if nc not in (1, 3) or (lossless and nc != 1):
                raise JpegError("unsupported component count")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            if w == 0 or h == 0 or w * h > MAX_PIXELS:
                raise JpegError(f"implausible frame dimensions {w}x{h}")
            if lossless and w * h > MAX_PIXELS_LOSSLESS:
                raise JpegError(
                    f"lossless frame {w}x{h} exceeds the per-sample "
                    f"decode budget ({MAX_PIXELS_LOSSLESS} px)")
            comps = []
            for ci in range(nc):
                off = 6 + 3 * ci
                hv = seg[off + 1]
                comps.append(_Component(seg[off], hv >> 4, hv & 15,
                                        seg[off + 2]))
            if not lossless:
                for c in comps:
                    if c.h not in (1, 2, 4) or c.v not in (1, 2, 4):
                        raise JpegError("unsupported sampling factors")
                hmax = max(c.h for c in comps)
                vmax = max(c.v for c in comps)
                # integer chroma ratios only (Go image/jpeg parity: 4:4:4,
                # 4:4:0, 4:2:2, 4:2:0, 4:1:1, 4:1:0 all satisfy this) and
                # the T.81 §B.2.2 ten-blocks-per-MCU bound
                for c in comps:
                    if hmax % c.h or vmax % c.v:
                        raise JpegError("non-integer sampling ratios")
                if sum(c.h * c.v for c in comps) > 10:
                    raise JpegError("blocks per MCU exceed spec limit")
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                for c in comps:
                    c.alloc(mcux, mcuy, w, h, hmax, vmax)
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError("unsupported SOF type 0x%02X" % marker)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(seg[i + 17 : i + 17 + cnt])
                htables[(tc, th)] = _Huff(bits, vals)
                i += 17 + cnt
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if not comps:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            by_id = {c.cid: c for c in comps}
            scan_comps = []
            for ci in range(ns):
                c = by_id.get(seg[1 + 2 * ci])
                if c is None:
                    raise JpegError("scan references unknown component")
                sel = seg[2 + 2 * ci]
                c.dc_sel, c.ac_sel = sel >> 4, sel & 15
                scan_comps.append(c)
            ss_, se_ = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            ah_, al_ = a >> 4, a & 15
            if lossless:
                if restart_interval:
                    raise JpegError("restart in lossless scan unsupported")
                if not 1 <= ss_ <= 7:
                    raise JpegError("invalid lossless predictor %d" % ss_)
                c = scan_comps[0]
                huff = htables.get((0, c.dc_sel))
                if huff is None:
                    raise JpegError("lossless scan without DC table")
                lossless_plane, pos = _decode_lossless_scan(
                    data, pos + seg_len, w, h, precision, ss_, al_, huff)
                continue
            pos = _decode_scan(
                data, pos + seg_len, comps, scan_comps, htables,
                ss_, se_, ah_, al_, mcux, mcuy, restart_interval,
                progressive)
            continue
        pos += seg_len
    if not w or not h or not comps:
        raise JpegError("no SOF")

    if lossless:
        if lossless_plane is None:
            raise JpegError("lossless frame without scan")
        maxval = (1 << precision) - 1
        return np.clip(lossless_plane, 0, maxval).astype(
            "u1" if precision <= 8 else "u2")

    half = float(1 << (precision - 1))
    maxval = (1 << precision) - 1
    dtype = "u1" if precision == 8 else "u2"
    planes = []
    for c in comps:
        q = qtables[c.qsel]
        zz = np.array(c.blocks, dtype="f8")  # (nblocks, 64) zigzag order
        nat = np.zeros_like(zz)
        nat[:, ZIGZAG] = zz * q
        blk = nat.reshape(-1, 8, 8)
        spatial = (_C.T @ blk) @ _C + half  # batched IDCT + level shift
        plane = (spatial.reshape(c.bh, c.bw, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(c.bh * 8, c.bw * 8))
        cw = -(-w * c.h // hmax)
        ch = -(-h * c.v // vmax)
        plane = plane[:ch, :cw]
        if c.h != hmax or c.v != vmax:  # nearest-neighbour chroma upsample
            plane = np.repeat(np.repeat(plane, vmax // c.v, 0),
                              hmax // c.h, 1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, maxval).astype(dtype)
    y, cb, cr = planes[0], planes[1] - half, planes[2] - half
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, maxval).astype(dtype)


def stream_precision(data: bytes) -> int:
    """Sample precision (bits) from the stream's SOF marker — the full
    scale of the decoded plane is (1 << precision) - 1. Walks segment
    lengths so a stray 0xFFCx byte inside entropy data cannot be
    misread; raises JpegError when no SOF is present."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("no SOI")
    pos = 2
    n = len(data)
    while pos + 1 < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI: anything after is trailing garbage
            break
        # standalone markers carry no length word: fill byte, stuffed 0x00,
        # TEM (0x01), RSTn, SOI — falling through would read a bogus 16-bit
        # "length" from the following bytes and skip past the real SOF
        if marker in (0xFF, 0x00, 0x01) or 0xD0 <= marker <= 0xD8:
            pos += 2 if marker != 0xFF else 1
            continue
        if pos + 4 > n:
            break
        seg_len = int.from_bytes(data[pos + 2:pos + 4], "big")
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return data[pos + 4]
        pos += 2 + seg_len
    raise JpegError("no SOF")


def decode_baseline_gray(data: bytes) -> np.ndarray:
    """Decode to a single grayscale plane: native for 1-component streams,
    the luma-weighted average for color ones. Dtype follows the stream
    precision (u1 for 8-bit, u2 for 12-bit extended or lossless 9–16);
    callers needing the exact full scale read stream_precision()."""
    out = decode_baseline(data)
    if out.ndim == 2:
        return out
    maxval = (1 << stream_precision(data)) - 1
    y = (0.299 * out[:, :, 0] + 0.587 * out[:, :, 1] + 0.114 * out[:, :, 2])
    return np.clip(np.rint(y), 0, maxval).astype(out.dtype)
