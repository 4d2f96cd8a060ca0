"""PDF stream decode filters.

Re-expresses the reference's filter layer (unipdf core/core.go:1556
``NewEncoderFromStream`` dispatch, ``DecodeStream`` core/core.go:1410,
``MultiEncoder`` core/core.go:917) in Python. Filter arrays compose
left-to-right on decode (first filter listed is applied first to the raw
bytes — PDF 32000-1:2008 §7.4).

Supported: FlateDecode (+PNG/TIFF predictors), LZWDecode (EarlyChange),
ASCIIHexDecode, ASCII85Decode, RunLengthDecode, DCTDecode (identity — media
spans need byte identity only, cf. SURVEY §2.2), raw passthrough.
CCITTFax/JBIG2/JPX are intentionally unsupported (reference treats JPX as
unsupported too, core/core.go:265).
"""

from __future__ import annotations

import base64
import binascii
import zlib


class FilterError(Exception):
    pass


def _apply_png_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    """Undo PNG row predictors (per-row filter byte). Mirrors the semantics of
    unipdf's FlateEncoder predictor handling (core/core.go:471)."""
    bpp = max(1, (colors * bpc) // 8)  # bytes per pixel
    row_len = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(row_len)
    i = 0
    n = len(data)
    while i + 1 <= n:
        ft = data[i]
        i += 1
        row = bytearray(data[i : i + row_len])
        if len(row) < row_len:
            row.extend(b"\x00" * (row_len - len(row)))
        i += row_len
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for j in range(bpp, row_len):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(row_len):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(row_len):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(row_len):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        else:
            raise FilterError(f"bad PNG predictor filter type {ft}")
        out.extend(row)
        prev = row
    return bytes(out)


def _apply_tiff_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    if bpc != 8:
        raise FilterError("TIFF predictor: only 8 bpc supported")
    row_len = columns * colors
    out = bytearray(data)
    for r in range(0, len(out) - row_len + 1, row_len):
        for j in range(colors, row_len):
            out[r + j] = (out[r + j] + out[r + j - colors]) & 0xFF
    return bytes(out)


def _undo_predictor(data: bytes, parms: dict) -> bytes:
    pred = int(parms.get("Predictor", 1) or 1)
    if pred <= 1:
        return data
    colors = int(parms.get("Colors", 1) or 1)
    bpc = int(parms.get("BitsPerComponent", 8) or 8)
    columns = int(parms.get("Columns", 1) or 1)
    if pred == 2:
        return _apply_tiff_predictor(data, colors, bpc, columns)
    if pred >= 10:
        return _apply_png_predictor(data, colors, bpc, columns)
    raise FilterError(f"unsupported predictor {pred}")


def flate_decode(data: bytes, parms: dict | None = None) -> bytes:
    try:
        raw = zlib.decompress(data)
    except zlib.error:
        # relaxed mode: tolerate trailing garbage / truncated streams
        try:
            d = zlib.decompressobj()
            raw = d.decompress(data)
        except zlib.error as e:
            # genuinely corrupt deflate bytes: the TYPED filter error,
            # never a raw zlib.error (r9 cross-fuzz)
            raise FilterError(f"FlateDecode: {e}") from e
    return _undo_predictor(raw, parms or {})


def lzw_decode(data: bytes, parms: dict | None = None) -> bytes:
    parms = parms or {}
    early = int(parms.get("EarlyChange", 1) or 1)
    out = bytearray()
    # LZW per PDF spec: codes 0-255 literal, 256 clear, 257 EOD.
    clear_code, eod = 256, 257
    dict_size = 258
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    code_len = 9
    buf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= code_len:
            nbits -= code_len
            code = (buf >> nbits) & ((1 << code_len) - 1)
            if code == clear_code:
                table = {i: bytes([i]) for i in range(256)}
                dict_size = 258
                code_len = 9
                prev = None
                continue
            if code == eod:
                return _undo_predictor(bytes(out), parms)
            if prev is None:
                entry = table[code]
            elif code < dict_size:
                entry = table.get(code, b"")
                if dict_size < 4096:
                    table[dict_size] = prev + entry[:1]
                    dict_size += 1
            elif code == dict_size or dict_size >= 4096:
                entry = prev + prev[:1]
                if dict_size < 4096:
                    table[dict_size] = entry
                    dict_size += 1
            else:
                # code beyond next assignable entry: corrupt stream —
                # stop here (relaxed mode) rather than emit garbage
                return _undo_predictor(bytes(out), parms)
            out.extend(entry)
            prev = entry
            # EarlyChange=1 (default): width grows one code early (PDF 32000
            # §7.4.4.2), checked after the decoder-side table insert — the
            # pairing used by the standard decoders (pdfminer/Ghostscript).
            if dict_size + early >= (1 << code_len) and code_len < 12:
                code_len += 1
    return _undo_predictor(bytes(out), parms)


def ascii_hex_decode(data: bytes, parms: dict | None = None) -> bytes:
    end = data.find(b">")
    if end >= 0:
        data = data[:end]
    hexstr = b"".join(data.split())
    if len(hexstr) % 2 == 1:
        hexstr += b"0"
    try:
        return binascii.unhexlify(hexstr)
    except binascii.Error as e:
        raise FilterError(f"ASCIIHexDecode: {e}") from e


def ascii85_decode(data: bytes, parms: dict | None = None) -> bytes:
    s = bytes(data)
    if s.startswith(b"<~"):
        s = s[2:]
    end = s.find(b"~>")
    if end >= 0:
        s = s[:end]
    s = b"".join(s.split())
    try:
        return base64.a85decode(s)
    except ValueError as e:
        raise FilterError(f"ASCII85Decode: {e}") from e


def run_length_decode(data: bytes, parms: dict | None = None) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        l = data[i]
        i += 1
        if l == 128:
            break
        if l < 128:
            out.extend(data[i : i + l + 1])
            i += l + 1
        else:
            out.extend(data[i : i + 1] * (257 - l))
            i += 1
    return bytes(out)


def identity(data: bytes, parms: dict | None = None) -> bytes:
    return data


_FILTERS = {
    "FlateDecode": flate_decode,
    "Fl": flate_decode,
    "LZWDecode": lzw_decode,
    "LZW": lzw_decode,
    "ASCIIHexDecode": ascii_hex_decode,
    "AHx": ascii_hex_decode,
    "ASCII85Decode": ascii85_decode,
    "A85": ascii85_decode,
    "RunLengthDecode": run_length_decode,
    "RL": run_length_decode,
    # image codecs: span pipeline needs media identity only (SURVEY §2.2) —
    # leave bytes as-is; pixel decode is out of pipeline scope.
    "DCTDecode": identity,
    "DCT": identity,
    "CCITTFaxDecode": identity,
    "CCF": identity,
    "JBIG2Decode": identity,
    "JPXDecode": identity,
}


def decode_stream(data: bytes, filters, parms_list) -> bytes:
    """Apply a (possibly composed) filter chain. ``filters`` is a list of
    filter names; ``parms_list`` a parallel list of DecodeParms dicts."""
    for i, name in enumerate(filters):
        fn = _FILTERS.get(name)
        if fn is None:
            raise FilterError(f"unknown filter {name}")
        parms = parms_list[i] if i < len(parms_list) and parms_list[i] else {}
        data = fn(data, parms)
    return data
