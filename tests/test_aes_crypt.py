"""AES-encrypted PDF decode (AESV2 / AESV3).

The reference opens these via pdfminer's standard security handler
(reference pdf.py:38 password passthrough; tests/test_basics.py:154-199
is its password suite). The reference corpus carries no AES fixture, so
these tests build deterministic AES-encrypted one-page PDFs from
scratch — the writer side below implements the same ISO 32000
algorithms the handler must invert, using an independent AES backend
(`cryptography`) so a handler bug can't self-validate.
"""

from __future__ import annotations

import struct
from hashlib import md5, sha256

import pytest

from pdfplumber_ray.pdfio.crypt import _PAD, _hash_r6, rc4
from pdfplumber_ray.pdfio.reader import decode_pdf_doc

cryptography = pytest.importorskip("cryptography")
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes  # noqa: E402


def _aes_enc(key: bytes, iv: bytes, data: bytes) -> bytes:
    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def _aes_payload(key: bytes, iv: bytes, data: bytes) -> bytes:
    padlen = 16 - len(data) % 16
    return iv + _aes_enc(key, iv, data + bytes([padlen]) * padlen)


CONTENT = b"BT /F1 12 Tf 72 720 Td (SecretAES endstream text) Tj ET"
USER_PW = b"test"
OWNER_PW = b"owner"
ID0 = bytes(range(16))


def _assemble(objs: list, encrypt_obj: bytes, id0: bytes) -> bytes:
    header = b"%PDF-1.6\n"
    objs = objs + [encrypt_obj]
    offsets = []
    pos = len(header)
    for o in objs:
        offsets.append(pos)
        pos += len(o)
    xref = b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1) + b"".join(
        b"%010d 00000 n \n" % off for off in offsets
    )
    trailer = (
        b"trailer\n<< /Size %d /Root 1 0 R /Encrypt %d 0 R /ID [<%s> <%s>] >>\n"
        b"startxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, len(objs), id0.hex().encode(), id0.hex().encode(), pos)
    )
    return header + b"".join(objs) + xref + trailer


def _body_objs(stream_payload: bytes) -> list:
    return [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n",
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(stream_payload)
        + stream_payload
        + b"\nendstream\nendobj\n",
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n",
    ]


def make_aesv2_pdf(p: int = -3904) -> bytes:
    """V=4 R=4 AES-128 (Algorithms 2/3/5 + the AESV2 sAlT object key)."""
    # Algorithm 3: /O from the owner password
    opad = (OWNER_PW + _PAD)[:32]
    okey = md5(opad).digest()
    for _ in range(50):
        okey = md5(okey[:16]).digest()
    okey = okey[:16]
    o = (USER_PW + _PAD)[:32]
    for i in range(20):
        o = rc4(bytes(b ^ i for b in okey), o)
    # Algorithm 2: file key from the user password
    upad = (USER_PW + _PAD)[:32]
    key = md5(upad + o + struct.pack("<L", p & 0xFFFFFFFF) + ID0).digest()
    for _ in range(50):
        key = md5(key[:16]).digest()
    key = key[:16]
    # Algorithm 5: /U
    u = rc4(key, md5(_PAD + ID0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    u += b"\x00" * 16
    # object 4, gen 0 stream payload
    ok4 = md5(key + (4).to_bytes(3, "little") + b"\x00\x00" + b"sAlT").digest()[:16]
    payload = _aes_payload(ok4, bytes(range(1, 17)), CONTENT)
    enc = (
        b"6 0 obj\n<< /Filter /Standard /V 4 /R 4 /Length 128 "
        b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
        b"/StmF /StdCF /StrF /StdCF "
        b"/O <%s> /U <%s> /P %d >>\nendobj\n"
        % (o.hex().encode(), u.hex().encode(), p)
    )
    return _assemble(_body_objs(payload), enc, ID0)


def make_aesv3_pdf(r: int = 6, p: int = -3904) -> bytes:
    """V=5 AES-256: R=6 (ISO Algorithm 2.B) or R=5 (plain SHA-256)."""
    file_key = bytes(range(100, 132))
    uvs, uks = b"UVALSALT", b"UKEYSALT"
    ovs, oks = b"OVALSALT", b"OKEYSALT"
    hashf = _hash_r6 if r == 6 else (
        lambda pw, s, ud=b"": sha256(pw + s + ud).digest()
    )
    u = hashf(USER_PW, uvs) + uvs + uks
    ue = _aes_enc(hashf(USER_PW, uks), b"\x00" * 16, file_key)
    o = hashf(OWNER_PW, ovs, u) + ovs + oks
    oe = _aes_enc(hashf(OWNER_PW, oks, u), b"\x00" * 16, file_key)
    perms = _aes_enc(
        file_key,
        b"\x00" * 16,
        struct.pack("<L", p & 0xFFFFFFFF) + b"\xff\xff\xff\xffTadbfill",
    )
    payload = _aes_payload(file_key, bytes(range(32, 48)), CONTENT)
    enc = (
        b"6 0 obj\n<< /Filter /Standard /V 5 /R %d /Length 256 "
        b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
        b"/StmF /StdCF /StrF /StdCF "
        b"/O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s> /P %d >>\nendobj\n"
        % (
            r,
            o.hex().encode(),
            u.hex().encode(),
            oe.hex().encode(),
            ue.hex().encode(),
            perms.hex().encode(),
            p,
        )
    )
    return _assemble(_body_objs(payload), enc, ID0)


def _decoded_text(rows) -> str:
    return "".join(c["text"] for c in rows[0]["chars"])


@pytest.mark.parametrize("pw", ["test", "owner"])
def test_aesv2_decodes_with_password(pw):
    rows, err = decode_pdf_doc("aesv2", make_aesv2_pdf(), password=pw)
    assert err is None, err
    assert "SecretAES endstream text" in _decoded_text(rows)


@pytest.mark.parametrize("r", [5, 6])
@pytest.mark.parametrize("pw", ["test", "owner"])
def test_aesv3_decodes_with_password(r, pw):
    rows, err = decode_pdf_doc("aesv3", make_aesv3_pdf(r=r), password=pw)
    assert err is None, err
    assert "SecretAES endstream text" in _decoded_text(rows)


@pytest.mark.parametrize(
    "data", [make_aesv2_pdf(), make_aesv3_pdf(6)], ids=["aesv2", "aesv3r6"]
)
def test_wrong_password_quarantines(data):
    rows, err = decode_pdf_doc("aes", data, password="nope")
    assert err is not None and "authenticate" in err
    rows, err = decode_pdf_doc("aes", data)
    assert err is not None


def test_unsigned_p_aesv2():
    """AESV2 with /P stored unsigned (producer quirk; ADVICE r2)."""
    rows, err = decode_pdf_doc(
        "aesv2u", make_aesv2_pdf(p=-3904 & 0xFFFFFFFF), password="test"
    )
    assert err is None, err
    assert "SecretAES" in _decoded_text(rows)


def test_pure_python_aes_fallback_matches_openssl():
    """The in-repo AES (used when `cryptography` is absent) must match
    the OpenSSL-backed path bit-for-bit for 128/192/256-bit keys."""
    import importlib
    import sys

    saved = {
        k: sys.modules.pop(k)
        for k in list(sys.modules)
        if k == "cryptography" or k.startswith("cryptography.")
    }
    sys.modules["cryptography"] = None  # force ImportError in aes.py
    try:
        import pdfplumber_ray.pdfio.aes as aes_mod

        pure = importlib.reload(aes_mod)
        data = bytes(range(256)) * 2
        iv = bytes(range(16, 32))
        for klen in (16, 24, 32):
            key = bytes(range(klen))
            ct = _aes_enc(key, iv, data)
            assert pure.cbc_decrypt(key, iv, ct) == data
            assert pure.cbc_encrypt(key, iv, data) == ct
    finally:
        sys.modules.pop("cryptography", None)
        sys.modules.update(saved)
        importlib.reload(aes_mod)
