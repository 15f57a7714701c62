"""Standard security handler (ISO 32000-1 §7.6.3): RC4 revisions 2-4.

Derives the file key from the password (reference parity: the reference
passes ``password`` through to pdfminer, pdf.py:38), authenticates the
user password against /U, and decrypts per-object strings/streams.
AES crypt filters (AESV2/AESV3) are reported as unsupported — documents
using them quarantine to the dead-letter path instead of raising.
"""

from __future__ import annotations

import struct
from hashlib import md5
from typing import Optional

_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 255
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 255
        j = (j + S[i]) & 255
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 255]
    return bytes(out)


class UnsupportedEncryption(Exception):
    pass


class WrongPassword(Exception):
    pass


class StandardSecurityHandler:
    """RC4 file-key derivation + per-object decryption."""

    def __init__(self, enc: dict, id0: bytes, password: str = ""):
        self.r = int(enc.get("R", 2))
        v = int(enc.get("V", 1))
        if self.r > 4 or v > 4:
            raise UnsupportedEncryption(f"encryption V={v} R={self.r}")
        if v == 4:
            cf = enc.get("CF") or {}
            stmf = enc.get("StmF", "Identity")
            cfm = (cf.get(stmf) or {}).get("CFM") if isinstance(cf, dict) else None
            if cfm not in ("V2",):
                raise UnsupportedEncryption(f"crypt filter {cfm}")
        o = enc.get("O")
        u = enc.get("U")
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            raise UnsupportedEncryption("missing O/U")
        p = int(enc.get("P", 0))
        length_bits = int(enc.get("Length", 40))
        encrypt_metadata = bool(enc.get("EncryptMetadata", True))

        pw = (password.encode("latin-1", "ignore") + _PAD)[:32]
        # /P is a signed 32-bit value but some producers store it unsigned
        # (e.g. 4294963392); mask to 32 bits and pack unsigned to accept both.
        h = md5(pw + o[:32] + struct.pack("<L", p & 0xFFFFFFFF) + id0)
        if self.r >= 4 and not encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        n = 5 if self.r == 2 else length_bits // 8
        if self.r >= 3:
            for _ in range(50):
                key = md5(key[:n]).digest()
        self.key = key[:n]
        self.n = n

        # authenticate the user password against /U
        if self.r == 2:
            ok = rc4(self.key, _PAD) == u[:32]
        else:
            x = rc4(self.key, md5(_PAD + id0).digest())
            for i in range(1, 20):
                x = rc4(bytes(b ^ i for b in self.key), x)
            ok = x == u[:16]
        if not ok:
            raise WrongPassword("user password does not authenticate")

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
        k = md5(
            self.key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
        ).digest()[: min(self.n + 5, 16)]
        return rc4(k, data)
