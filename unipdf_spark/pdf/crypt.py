"""PDF standard security handler — decrypt side.

Re-expresses the reference's crypt layer (unipdf ``PdfCrypt`` core/core.go:1916,
``Decrypt`` core/core.go:554, RC4/AES handlers in core/security/security.go:127)
from the public spec (PDF 32000-1:2008 §7.6.3):

* Algorithm 2 file-key derivation (R2–R4; 40–128-bit RC4, AESV2);
* per-object keys: MD5(file_key + objnum[3 LE] + gen[2 LE] [+ sAlT]);
* RC4 (pure Python) and AES-128-CBC (via `cryptography`) for strings/streams.

R6/AES-256 is not implemented in v1 (documented; the fixture corpus and the
bulk of web PDFs use the RC4/AESV2 handlers).
"""

from __future__ import annotations

import hashlib
import struct

PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
        0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, ch in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = ch ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    if len(data) < 16:
        return b""
    iv, body = data[:16], data[16:]
    if len(body) % 16:
        body = body[: len(body) - (len(body) % 16)]
    dec = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
    out = dec.update(body) + dec.finalize()
    if out and 1 <= out[-1] <= 16:  # PKCS#5
        out = out[: -out[-1]]
    return out


class StdSecurityHandler:
    """Standard handler, empty user password (the relaxed web-corpus case —
    CheckAccessRights semantics, core/core.go:1284)."""

    def __init__(self, enc: dict, file_id: bytes, resolve=lambda o: o):
        self.v = int(resolve(enc.get("V")) or 0)
        self.r = int(resolve(enc.get("R")) or 2)
        self.length = int(resolve(enc.get("Length")) or 40)
        self.o = bytes(resolve(enc.get("O")) or b"")
        self.p = int(resolve(enc.get("P")) or -1)
        self.file_id = file_id
        self.metadata_encrypted = bool(resolve(enc.get("EncryptMetadata", True)))
        # Per-class crypt filters (PDF 32000-1 §7.6.5): streams use /StmF,
        # strings use /StrF; both default to Identity (no-op) for V>=4 —
        # the reference registers Identity as a no-op filter (core/core.go:515).
        self.stm_cfm = "V2"  # pre-V4: one RC4 algorithm for everything
        self.str_cfm = "V2"
        if self.v >= 4:
            cf = resolve(enc.get("CF")) or {}

            def _cfm(filter_name: str) -> str:
                if filter_name == "Identity":
                    return "Identity"
                entry = resolve(cf.get(filter_name)) if isinstance(cf, dict) else None
                if isinstance(entry, dict):
                    if "Length" in entry:
                        ln = int(resolve(entry["Length"]))
                        self.length = ln * 8 if ln <= 32 else ln
                    return str(resolve(entry.get("CFM")) or "V2")
                return "Identity"

            self.stm_cfm = _cfm(str(resolve(enc.get("StmF")) or "Identity"))
            self.str_cfm = _cfm(str(resolve(enc.get("StrF")) or "Identity"))
        self.key = self._file_key(b"")

    def _file_key(self, user_pw: bytes) -> bytes:
        n = max(5, self.length // 8)
        h = hashlib.md5()
        h.update((user_pw + PAD)[:32])
        h.update(self.o[:32])
        h.update(struct.pack("<i", self.p))
        h.update(self.file_id)
        if self.r >= 4 and not self.metadata_encrypted:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        return key[:n]

    def _object_key(self, num: int, gen: int, aes: bool) -> bytes:
        h = hashlib.md5()
        h.update(self.key)
        h.update(struct.pack("<I", num)[:3])
        h.update(struct.pack("<I", gen)[:2])
        if aes:
            h.update(b"sAlT")
        return h.digest()[: min(len(self.key) + 5, 16)]

    def decrypt(self, num: int, gen: int, data: bytes, kind: str = "stream") -> bytes:
        cfm = self.stm_cfm if kind == "stream" else self.str_cfm
        if cfm == "Identity":
            return data
        if cfm == "AESV2":
            return _aes_cbc_decrypt(self._object_key(num, gen, True), data)
        return rc4(self._object_key(num, gen, False), data)
