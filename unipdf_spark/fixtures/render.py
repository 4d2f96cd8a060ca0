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
        return self.add(body), raw

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
