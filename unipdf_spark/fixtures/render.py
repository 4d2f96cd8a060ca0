"""Minimal-but-real PDF file writer for fixtures.

Produces complete PDFs: header, numbered objects, Flate-encoded content
streams, xref table, trailer. Intentionally independent from the engine's
parser (`unipdf_spark.pdf`) — round-trip tests would be meaningless otherwise.
"""

from __future__ import annotations

import zlib


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

    def add_stream(self, dict_extra: bytes, data: bytes, compress: bool = True) -> tuple[int, bytes]:
        """Returns (objnum, raw_encoded_bytes_as_stored)."""
        if compress:
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
