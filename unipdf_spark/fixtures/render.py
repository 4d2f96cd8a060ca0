"""Minimal-but-real PDF file writer for fixtures.

Produces complete PDFs: header, numbered objects, Flate-encoded content
streams, xref table, trailer. Intentionally independent from the engine's
parser (`unipdf_spark.pdf`) — round-trip tests would be meaningless otherwise.
"""

from __future__ import annotations

import base64
import binascii
import zlib


def lzw_encode(data: bytes) -> bytes:
    """LZW per PDF spec, EarlyChange=1 (generator-side; independent of the
    engine's decoder). Code-width growth mirrors the DECODER's table count —
    the decoder inserts one entry per data code after the first (including
    the final flush code, which adds nothing on the encoder side)."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258   # encoder table codes
    dec_size = 258    # decoder's table size (drives code width)
    code_len = 9
    n_data_codes = 0
    bits: list[tuple[int, int]] = [(256, 9)]  # clear table

    def emit(code: int) -> None:
        nonlocal dec_size, code_len, n_data_codes
        bits.append((code, code_len))
        n_data_codes += 1
        if n_data_codes > 1 and dec_size < 4096:
            dec_size += 1  # decoder inserts after reading this code
            if dec_size + 1 >= (1 << code_len) and code_len < 12:
                code_len += 1  # EarlyChange=1

    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
        w = bytes([ch])
    if w:
        emit(table[w])
    bits.append((257, code_len))  # EOD
    buf = 0
    nbits = 0
    out = bytearray()
    for code, cl in bits:
        buf = (buf << cl) | code
        nbits += cl
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def rl_encode(data: bytes) -> bytes:
    """RunLengthDecode encoder: repeat runs ≥3 as (257-n, byte); literals
    chunked ≤128."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        j = i
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j
            continue
        # literal run until next repeat-of-3 or 128 bytes
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out.extend(data[i:j])
        i = j
    out.append(128)  # EOD
    return bytes(out)


_ENCODERS = {
    "FlateDecode": lambda d: zlib.compress(d, 6),
    "LZWDecode": lzw_encode,
    "RunLengthDecode": rl_encode,
    "ASCIIHexDecode": lambda d: binascii.hexlify(d) + b">",
    "ASCII85Decode": lambda d: base64.a85encode(d) + b"~>",
}


def encode_chain(data: bytes, filters: list[str]) -> bytes:
    """Encode for a /Filter [F1 F2 ...] chain (decode order F1→F2 ⇒ encode
    order reversed)."""
    for name in reversed(filters):
        data = _ENCODERS[name](data)
    return data


def esc_string(s: str) -> bytes:
    """Escape a text string for a PDF literal string (latin-1 payload)."""
    b = s.encode("latin-1", errors="replace")
    return (
        b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


class PdfFileWriter:
    def __init__(self) -> None:
        self._objs: list[bytes | None] = [None]  # 1-indexed
        self._is_stream: set[int] = set()

    def reserve(self) -> int:
        self._objs.append(None)
        return len(self._objs) - 1

    def set_obj(self, num: int, body: bytes) -> int:
        self._objs[num] = body
        return num

    def add(self, body: bytes) -> int:
        self._objs.append(body)
        return len(self._objs) - 1

    def add_stream(self, dict_extra: bytes, data: bytes, compress: bool = True,
                   filters: list[str] | None = None) -> tuple[int, bytes]:
        """Returns (objnum, raw_encoded_bytes_as_stored). ``filters`` names a
        decode chain (/Filter order); default Flate when ``compress``."""
        if filters:
            raw = encode_chain(data, filters)
            if len(filters) == 1:
                filt = f"/Filter /{filters[0]} ".encode()
            else:
                filt = (
                    b"/Filter [ "
                    + b" ".join(b"/" + f.encode() for f in filters)
                    + b" ] "
                )
        elif compress:
            raw = zlib.compress(data, 6)
            filt = b"/Filter /FlateDecode "
        else:
            raw = data
            filt = b""
        body = (
            b"<< " + dict_extra + filt + b"/Length " + str(len(raw)).encode() + b" >>\n"
            b"stream\n" + raw + b"\nendstream"
        )
        num = self.add(body)
        self._is_stream.add(num)
        return num, raw

    def build(self, root_num: int, corrupt_startxref: bool = False) -> bytes:
        out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0] * len(self._objs)
        for num in range(1, len(self._objs)):
            body = self._objs[num]
            if body is None:
                raise ValueError(f"object {num} reserved but never set")
            offsets[num] = len(out)
            out += str(num).encode() + b" 0 obj\n" + body + b"\nendobj\n"
        xref_pos = len(out)
        n = len(self._objs)
        out += b"xref\n0 " + str(n).encode() + b"\n"
        out += b"0000000000 65535 f \n"
        for num in range(1, n):
            out += ("%010d 00000 n \n" % offsets[num]).encode()
        out += (
            b"trailer\n<< /Size " + str(n).encode()
            + b" /Root " + str(root_num).encode() + b" 0 R >>\n"
        )
        sx = 1 if corrupt_startxref else xref_pos  # broken offset → repair path
        out += b"startxref\n" + str(sx).encode() + b"\n%%EOF\n"
        return bytes(out)

    def build_modern(self, root_num: int) -> bytes:
        """Modern container: non-stream objects packed into an /ObjStm object
        stream; cross-references via a compressed /XRef stream (PDF 1.5+).
        Exercises the engine's xref-stream + object-stream decode path."""
        out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
        n_existing = len(self._objs)
        objstm_num = n_existing  # next two object numbers
        xref_num = n_existing + 1
        size = n_existing + 2

        packed: list[int] = []   # object numbers inside the ObjStm
        direct: dict[int, int] = {}  # num -> file offset
        for num in range(1, n_existing):
            body = self._objs[num]
            if body is None:
                raise ValueError(f"object {num} reserved but never set")
            if b"\nstream\n" in body:
                direct[num] = len(out)
                out += str(num).encode() + b" 0 obj\n" + body + b"\nendobj\n"
            else:
                packed.append(num)

        # ObjStm payload: "num off num off ..." header + concatenated bodies
        bodies = bytearray()
        header = bytearray()
        for num in packed:
            header += b"%d %d " % (num, len(bodies))
            bodies += self._objs[num] + b"\n"
        payload = bytes(header) + bytes(bodies)
        comp = zlib.compress(payload, 6)
        direct[objstm_num] = len(out)
        out += (
            str(objstm_num).encode() + b" 0 obj\n<< /Type /ObjStm /N "
            + str(len(packed)).encode() + b" /First " + str(len(header)).encode()
            + b" /Filter /FlateDecode /Length " + str(len(comp)).encode()
            + b" >>\nstream\n" + comp + b"\nendstream\nendobj\n"
        )

        # XRef stream: W = [1 4 2]
        xref_pos = len(out)
        rows = bytearray()
        for num in range(size):
            if num == 0:
                rows += b"\x00" + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
            elif num == xref_num:
                rows += b"\x01" + xref_pos.to_bytes(4, "big") + (0).to_bytes(2, "big")
            elif num in direct:
                rows += b"\x01" + direct[num].to_bytes(4, "big") + (0).to_bytes(2, "big")
            else:
                idx = packed.index(num)
                rows += b"\x02" + objstm_num.to_bytes(4, "big") + idx.to_bytes(2, "big")
        xcomp = zlib.compress(bytes(rows), 6)
        out += (
            str(xref_num).encode() + b" 0 obj\n<< /Type /XRef /W [1 4 2] /Size "
            + str(size).encode() + b" /Root " + str(root_num).encode()
            + b" 0 R /Filter /FlateDecode /Length " + str(len(xcomp)).encode()
            + b" >>\nstream\n" + xcomp + b"\nendstream\nendobj\n"
        )
        out += b"startxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
        return bytes(out)
