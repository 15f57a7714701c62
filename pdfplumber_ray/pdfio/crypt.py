"""Standard security handler (ISO 32000-1 §7.6; 32000-2 §7.6.4).

Supports RC4 revisions 2-4, AESV2 (V=4/R=4, AES-128-CBC) and AESV3
(V=5, R=5 legacy-Adobe / R=6 ISO, AES-256-CBC). Derives the file key
from the password (reference parity: the reference passes ``password``
through to pdfminer, pdf.py:38; pdfminer pdfdocument.py implements the
same algorithms), authenticates user-then-owner password, and decrypts
per-object strings/streams. Unknown crypt filters quarantine to the
dead-letter path via UnsupportedEncryption.
"""

from __future__ import annotations

import struct
from hashlib import md5, sha256, sha384, sha512
from typing import Optional

from .aes import cbc_decrypt, cbc_encrypt

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


def _strip_aes_padding(data: bytes) -> bytes:
    """RFC 2898 padding: last byte is the pad length (1-16)."""
    if data:
        n = data[-1]
        if 1 <= n <= 16 and n <= len(data):
            return data[:-n]
    return data


def _aes_payload_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AES payload = 16-byte IV prefix + CBC ciphertext + padding."""
    if len(data) < 16:
        return b""
    body = data[16:]
    body = body[: len(body) - len(body) % 16]
    return _strip_aes_padding(cbc_decrypt(key, data[:16], body))


def _hash_r6(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B iterated hash (also valid for R=5,
    where the loop below never starts)."""
    k = sha256(password + salt + udata).digest()
    count = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1)
        k = (sha256, sha384, sha512)[sum(e[:16]) % 3](e).digest()
        count += 1
        if count >= 64 and e[-1] <= count - 32:
            return k[:32]


class StandardSecurityHandler:
    """File-key derivation + per-object decryption (RC4 / AESV2 / AESV3)."""

    def __init__(self, enc: dict, id0: bytes, password: str = ""):
        self.r = int(enc.get("R", 2))
        v = int(enc.get("V", 1))
        if self.r > 6 or v > 5:
            raise UnsupportedEncryption(f"encryption V={v} R={self.r}")
        self.stm_cfm = self.str_cfm = "V2" if v < 4 else None
        if v >= 4:
            cf = enc.get("CF") or {}
            if not isinstance(cf, dict):
                cf = {}

            def _cfm(name: str) -> str:
                if name == "Identity":
                    return "Identity"
                m = (cf.get(name) or {}).get("CFM")
                return str(m) if m is not None else "Identity"

            self.stm_cfm = _cfm(str(enc.get("StmF", "Identity")))
            self.str_cfm = _cfm(str(enc.get("StrF", "Identity")))
            for m in (self.stm_cfm, self.str_cfm):
                if m not in ("Identity", "V2", "AESV2", "AESV3"):
                    raise UnsupportedEncryption(f"crypt filter {m}")

        o = enc.get("O")
        u = enc.get("U")
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            raise UnsupportedEncryption("missing O/U")
        pw = password.encode("utf-8" if self.r >= 5 else "latin-1", "ignore")

        if self.r >= 5:
            self.key = self._auth_r6(enc, o, u, pw[:127])
            self.n = 32
            return

        p = int(enc.get("P", 0))
        length_bits = int(enc.get("Length", 40))
        encrypt_metadata = bool(enc.get("EncryptMetadata", True))
        padded = (pw + _PAD)[:32]
        key = self._file_key_r234(padded, o, p, id0, length_bits, encrypt_metadata)
        if self._check_user_r234(key, u, id0):
            self.key = key
            return
        # Algorithm 7: recover the user password from /O with the owner
        # password, then authenticate as the user.
        okey = md5(padded).digest()
        if self.r >= 3:
            for _ in range(50):
                okey = md5(okey[: self.n]).digest()
        okey = okey[: self.n]
        if self.r == 2:
            user_pw = rc4(okey, o[:32])
        else:
            user_pw = o[:32]
            for i in range(19, -1, -1):
                user_pw = rc4(bytes(b ^ i for b in okey), user_pw)
        key = self._file_key_r234(
            user_pw[:32], o, p, id0, length_bits, encrypt_metadata
        )
        if not self._check_user_r234(key, u, id0):
            raise WrongPassword("password does not authenticate")
        self.key = key

    def _file_key_r234(
        self,
        padded_pw: bytes,
        o: bytes,
        p: int,
        id0: bytes,
        length_bits: int,
        encrypt_metadata: bool,
    ) -> bytes:
        # /P is a signed 32-bit value but some producers store it unsigned
        # (e.g. 4294963392); mask to 32 bits and pack unsigned to accept both.
        h = md5(padded_pw + o[:32] + struct.pack("<L", p & 0xFFFFFFFF) + id0)
        if self.r >= 4 and not encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        self.n = 5 if self.r == 2 else length_bits // 8
        if self.r >= 3:
            for _ in range(50):
                key = md5(key[: self.n]).digest()
        return key[: self.n]

    def _check_user_r234(self, key: bytes, u: bytes, id0: bytes) -> bool:
        if self.r == 2:
            return rc4(key, _PAD) == u[:32]
        x = rc4(key, md5(_PAD + id0).digest())
        for i in range(1, 20):
            x = rc4(bytes(b ^ i for b in key), x)
        return x == u[:16]

    def _auth_r6(self, enc: dict, o: bytes, u: bytes, pw: bytes) -> bytes:
        """AESV3 (R=5/R=6) Algorithms 2.A/8/9: validate the password and
        unwrap the 256-bit file key from /UE or /OE."""
        ue = enc.get("UE")
        oe = enc.get("OE")
        u = (u + b"\x00" * 48)[:48]
        o = (o + b"\x00" * 48)[:48]
        hashf = _hash_r6 if self.r == 6 else (
            lambda p, s, ud=b"": sha256(p + s + ud).digest()
        )
        if hashf(pw, u[32:40]) == u[:32]:  # user password
            if not isinstance(ue, bytes):
                raise UnsupportedEncryption("missing UE")
            ikey = hashf(pw, u[40:48])
            return cbc_decrypt(ikey, b"\x00" * 16, ue[:32])
        if hashf(pw, o[32:40], u) == o[:32]:  # owner password
            if not isinstance(oe, bytes):
                raise UnsupportedEncryption("missing OE")
            ikey = hashf(pw, o[40:48], u)
            return cbc_decrypt(ikey, b"\x00" * 16, oe[:32])
        raise WrongPassword("password does not authenticate")

    def _decrypt_cfm(self, cfm: str, data: bytes, num: int, gen: int) -> bytes:
        if cfm == "Identity":
            return data
        if cfm == "AESV3":
            return _aes_payload_decrypt(self.key, data)
        salt = num.to_bytes(3, "little") + gen.to_bytes(2, "little")
        if cfm == "AESV2":
            k = md5(self.key + salt + b"sAlT").digest()[: min(self.n + 5, 16)]
            return _aes_payload_decrypt(k, data)
        k = md5(self.key + salt).digest()[: min(self.n + 5, 16)]
        return rc4(k, data)

    def decrypt(
        self, data: bytes, num: int, gen: int, stream: bool = False
    ) -> bytes:
        return self._decrypt_cfm(
            self.stm_cfm if stream else self.str_cfm, data, num, gen
        )
