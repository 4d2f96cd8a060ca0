"""Baseline JPEG (DCTDecode) decoder — grayscale subset.

Re-expresses the reference's JPEG image leg (unipdf decodes DCTDecode via
Go's image/jpeg for ExtractPageImages) from the public ITU-T T.81 spec:
marker parse (SOI/APP/DQT/SOF0/DHT/SOS/EOI), Huffman entropy decode with
byte unstuffing, DC prediction, dequantize, 8×8 IDCT (numpy matrix form),
level shift. Scope: baseline sequential, single grayscale component, no
subsampling; progressive/multi-component streams raise a typed error (the
span path keeps byte-identity media_ref either way).
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


def _extend(v: int, t: int) -> int:
    """DC/AC value extension (T.81 F.2.2.1): t-bit magnitude to signed."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(br: _BitReader, dc_h: _Huff, ac_h: _Huff,
                  q: np.ndarray, pred: int) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype="f8")
    t = br.decode(dc_h)
    pred += _extend(br.bits(t), t)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = br.decode(ac_h)
        r, ssss = rs >> 4, rs & 15
        if ssss == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC run past block")
        zz[k] = _extend(br.bits(ssss), ssss)
        k += 1
    blk = np.zeros(64, dtype="f8")
    blk[ZIGZAG] = zz * q
    return _C.T @ blk.reshape(8, 8) @ _C + 128.0, pred


def decode_baseline(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG: grayscale → (h, w) uint8; 4:4:4 YCbCr →
    (h, w, 3) uint8 RGB (JFIF color transform)."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("no SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _Huff] = {}
    w = h = 0
    comps: list[tuple[int, int]] = []  # (component id, q selector)
    scan_sel: list[tuple[int, int]] = []  # (dc table, ac table) per comp
    subsampled = False
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError("bad marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(data[pos : pos + 2], "big")
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                qtables[tq] = np.array(list(seg[i + 1 : i + 65]), dtype="f8")
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            nc = seg[5]
            if nc not in (1, 3):
                raise JpegError("1 or 3 components supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            comps = []
            samp = []
            for ci in range(nc):
                off = 6 + 3 * ci
                samp.append((seg[off + 1] >> 4, seg[off + 1] & 15))
                comps.append((seg[off], seg[off + 2]))
            if nc == 1:
                if samp != [(1, 1)]:
                    raise JpegError("grayscale must be 1x1 sampled")
            elif samp not in ([(1, 1)] * 3, [(2, 2), (1, 1), (1, 1)]):
                raise JpegError("only 4:4:4 and 4:2:0 sampling supported")
            subsampled = samp[0] == (2, 2) if nc == 3 else False
        elif marker in (0xC1, 0xC2, 0xC3):
            raise JpegError("non-baseline SOF unsupported")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                htables[(tc, th)] = _Huff(bits, vals)
                i += 17 + n
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_sel = [
                (seg[2 + 2 * ci] >> 4, seg[2 + 2 * ci] & 15)
                for ci in range(ns)
            ]
            pos += seg_len
            break
        pos += seg_len
    if not w or not h or not comps:
        raise JpegError("no SOF0")
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    if not subsampled:
        bw = (w + 7) // 8
        bh = (h + 7) // 8
        planes = [np.zeros((bh * 8, bw * 8), dtype="f8") for _ in comps]
        for by in range(bh):
            for bx in range(bw):
                for ci, (_cid, qsel) in enumerate(comps):  # interleaved MCU
                    dc_h = htables[(0, scan_sel[ci][0])]
                    ac_h = htables[(1, scan_sel[ci][1])]
                    spatial, preds[ci] = _decode_block(
                        br, dc_h, ac_h, qtables[qsel], preds[ci])
                    planes[ci][by * 8 : by * 8 + 8,
                               bx * 8 : bx * 8 + 8] = spatial
        if len(comps) == 1:
            return np.clip(np.rint(planes[0][:h, :w]), 0, 255).astype("u1")
        yp = planes[0][:h, :w]
        cbp = planes[1][:h, :w]
        crp = planes[2][:h, :w]
    else:
        # 4:2:0: MCU = 16×16 luma (4 blocks, raster order) + 1 Cb + 1 Cr
        mw = (w + 15) // 16
        mh = (h + 15) // 16
        yplane = np.zeros((mh * 16, mw * 16), dtype="f8")
        cplanes = [np.zeros((mh * 8, mw * 8), dtype="f8") for _ in range(2)]
        for my in range(mh):
            for mx in range(mw):
                for sub in range(4):
                    dy, dx = (sub // 2) * 8, (sub % 2) * 8
                    dc_h = htables[(0, scan_sel[0][0])]
                    ac_h = htables[(1, scan_sel[0][1])]
                    spatial, preds[0] = _decode_block(
                        br, dc_h, ac_h, qtables[comps[0][1]], preds[0])
                    yplane[my * 16 + dy : my * 16 + dy + 8,
                           mx * 16 + dx : mx * 16 + dx + 8] = spatial
                for ci in (1, 2):
                    dc_h = htables[(0, scan_sel[ci][0])]
                    ac_h = htables[(1, scan_sel[ci][1])]
                    spatial, preds[ci] = _decode_block(
                        br, dc_h, ac_h, qtables[comps[ci][1]], preds[ci])
                    cplanes[ci - 1][my * 8 : my * 8 + 8,
                                    mx * 8 : mx * 8 + 8] = spatial
        yp = yplane[:h, :w]
        # nearest-neighbour chroma upsample (2×)
        cbp = np.repeat(np.repeat(cplanes[0], 2, 0), 2, 1)[:h, :w]
        crp = np.repeat(np.repeat(cplanes[1], 2, 0), 2, 1)[:h, :w]
    y = yp
    cb = cbp - 128.0
    cr = crp - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype("u1")


def decode_baseline_gray(data: bytes) -> np.ndarray:
    """Decode to a single grayscale plane: native for 1-component streams,
    the luma-weighted average for color ones."""
    out = decode_baseline(data)
    if out.ndim == 2:
        return out
    y = (0.299 * out[:, :, 0] + 0.587 * out[:, :, 1] + 0.114 * out[:, :, 2])
    return np.clip(np.rint(y), 0, 255).astype("u1")
