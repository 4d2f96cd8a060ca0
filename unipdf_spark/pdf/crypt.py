"""PDF standard security handler — decrypt side.

Re-expresses the reference's crypt layer (unipdf ``PdfCrypt`` core/core.go:1916,
``Decrypt`` core/core.go:554, RC4/AES handlers in core/security/security.go:127)
from the public spec (PDF 32000-1:2008 §7.6.3):

* Algorithm 2 file-key derivation (R2–R4; 40–128-bit RC4, AESV2);
* per-object keys: MD5(file_key + objnum[3 LE] + gen[2 LE] [+ sAlT]);
* RC4 (pure Python) and AES-128-CBC (via `cryptography`) for strings/streams;
* AES-256 / R5+R6 (AESV3, ISO 32000-2 §7.6.4): Algorithm 2.B iterated-hash
  key derivation, /U //O validation salts, /UE //OE file-key unwrap; data
  uses the 32-byte file key directly (no per-object key).
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


def _aes_cbc_raw(key: bytes, iv: bytes, data: bytes, decrypt: bool) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    c = Cipher(algorithms.AES(key), modes.CBC(iv))
    op = c.decryptor() if decrypt else c.encryptor()
    return op.update(data) + op.finalize()


def hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B (R6 iterated SHA-256/384/512 KDF)."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc_raw(k[:16], k[16:32], k1, decrypt=False)
        m = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[m](e).digest()
        i += 1
        # Spec exit: after 64 rounds, stop once the last byte of E is <= i-32
        # (ISO 32000-2 §7.6.4.3.4; reference security.go alg2b).
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def hash_r(password: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    """Revision-dispatched KDF: R5 (deprecated AESV3) is a single
    SHA-256(pw+salt+udata); R6 is the iterated Algorithm 2.B."""
    if r == 5:
        return hashlib.sha256(password + salt + udata).digest()
    return hash_2b(password, salt, udata)


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
        if self.r >= 5:  # AES-256 handler (R5 deprecated / R6)
            self.key = self._file_key_r6(
                self.r,
                b"",
                bytes(resolve(enc.get("U")) or b""),
                bytes(resolve(enc.get("O")) or b""),
                bytes(resolve(enc.get("UE")) or b""),
                bytes(resolve(enc.get("OE")) or b""),
            )
        else:
            self.key = self._file_key(b"")

    @staticmethod
    def _file_key_r6(r: int, pw: bytes, u: bytes, o: bytes, ue: bytes, oe: bytes) -> bytes:
        """R5/R6 Algorithm 2.A (empty-password path): validate against /U
        (user) or /O (owner), then unwrap the 32-byte file key from /UE or
        /OE (security.go:127 semantics). R5 uses the single-SHA-256 KDF,
        R6 the iterated Algorithm 2.B."""
        u48, o48 = u[:48], o[:48]
        if len(u48) >= 48 and hash_r(pw, u48[32:40], b"", r) == u48[:32]:
            inter = hash_r(pw, u48[40:48], b"", r)
            return _aes_cbc_raw(inter, b"\x00" * 16, ue[:32], decrypt=True)
        if len(o48) >= 48 and hash_r(pw, o48[32:40], u48, r) == o48[:32]:
            inter = hash_r(pw, o48[40:48], u48, r)
            return _aes_cbc_raw(inter, b"\x00" * 16, oe[:32], decrypt=True)
        raise ValueError("R5/R6: password validation failed (non-empty password?)")

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
        if cfm == "AESV3":  # AES-256: the file key is used directly
            return _aes_cbc_decrypt(self.key, data)
        if cfm == "AESV2":
            return _aes_cbc_decrypt(self._object_key(num, gen, True), data)
        return rc4(self._object_key(num, gen, False), data)
