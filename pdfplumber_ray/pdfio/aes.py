"""AES-CBC for PDF encryption (ISO 32000-1 §7.6.2, FIPS-197).

Backend: the ``cryptography`` package when importable (OpenSSL speed),
else a self-contained pure-Python AES — correct, slower, always present.
Only CBC with no internal padding handling is exposed; PDF's RFC-2898
padding is stripped by the caller (crypt.py), because key-wrap blobs
(/UE, /OE) are unpadded while string/stream payloads are padded.
"""

from __future__ import annotations

try:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    def cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
        dec = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
        return dec.update(data) + dec.finalize()

    def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
        enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
        return enc.update(data) + enc.finalize()

except ImportError:  # pure-Python fallback (FIPS-197 reference structure)
    _SBOX = bytes.fromhex(
        "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
        "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
        "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
        "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
        "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
        "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
        "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
        "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
    )
    _INV_SBOX = bytes(256)
    _inv = bytearray(256)
    for _i, _v in enumerate(_SBOX):
        _inv[_v] = _i
    _INV_SBOX = bytes(_inv)
    _RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D]

    def _xtime(a: int) -> int:
        a <<= 1
        return (a ^ 0x1B) & 0xFF if a & 0x100 else a

    _MUL = [[0] * 256 for _ in range(15)]
    for _c in (1, 2, 3, 9, 11, 13, 14):
        for _a in range(256):
            r, a, c = 0, _a, _c
            while c:
                if c & 1:
                    r ^= a
                a = _xtime(a)
                c >>= 1
            _MUL[_c][_a] = r

    def _expand_key(key: bytes):
        nk = len(key) // 4
        nr = nk + 6
        w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
        for i in range(nk, 4 * (nr + 1)):
            t = list(w[i - 1])
            if i % nk == 0:
                t = t[1:] + t[:1]
                t = [_SBOX[b] for b in t]
                t[0] ^= _RCON[i // nk - 1]
            elif nk > 6 and i % nk == 4:
                t = [_SBOX[b] for b in t]
            w.append([w[i - nk][j] ^ t[j] for j in range(4)])
        return w, nr

    def _add_round_key(s, w, rnd):
        for c in range(4):
            for r in range(4):
                s[r][c] ^= w[4 * rnd + c][r]

    def _decrypt_block(block: bytes, w, nr: int) -> bytes:
        s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]
        _add_round_key(s, w, nr)
        for rnd in range(nr - 1, 0, -1):
            for r in range(1, 4):  # InvShiftRows
                s[r] = s[r][-r:] + s[r][:-r]
            for r in range(4):  # InvSubBytes
                s[r] = [_INV_SBOX[b] for b in s[r]]
            _add_round_key(s, w, rnd)
            for c in range(4):  # InvMixColumns
                a0, a1, a2, a3 = s[0][c], s[1][c], s[2][c], s[3][c]
                s[0][c] = _MUL[14][a0] ^ _MUL[11][a1] ^ _MUL[13][a2] ^ _MUL[9][a3]
                s[1][c] = _MUL[9][a0] ^ _MUL[14][a1] ^ _MUL[11][a2] ^ _MUL[13][a3]
                s[2][c] = _MUL[13][a0] ^ _MUL[9][a1] ^ _MUL[14][a2] ^ _MUL[11][a3]
                s[3][c] = _MUL[11][a0] ^ _MUL[13][a1] ^ _MUL[9][a2] ^ _MUL[14][a3]
        for r in range(1, 4):
            s[r] = s[r][-r:] + s[r][:-r]
        for r in range(4):
            s[r] = [_INV_SBOX[b] for b in s[r]]
        _add_round_key(s, w, 0)
        return bytes(s[r][c] for c in range(4) for r in range(4))

    def _encrypt_block(block: bytes, w, nr: int) -> bytes:
        s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]
        _add_round_key(s, w, 0)
        for rnd in range(1, nr):
            for r in range(4):
                s[r] = [_SBOX[b] for b in s[r]]
            for r in range(1, 4):  # ShiftRows
                s[r] = s[r][r:] + s[r][:r]
            for c in range(4):  # MixColumns
                a0, a1, a2, a3 = s[0][c], s[1][c], s[2][c], s[3][c]
                s[0][c] = _MUL[2][a0] ^ _MUL[3][a1] ^ a2 ^ a3
                s[1][c] = a0 ^ _MUL[2][a1] ^ _MUL[3][a2] ^ a3
                s[2][c] = a0 ^ a1 ^ _MUL[2][a2] ^ _MUL[3][a3]
                s[3][c] = _MUL[3][a0] ^ a1 ^ a2 ^ _MUL[2][a3]
            _add_round_key(s, w, rnd)
        for r in range(4):
            s[r] = [_SBOX[b] for b in s[r]]
        for r in range(1, 4):
            s[r] = s[r][r:] + s[r][:r]
        _add_round_key(s, w, nr)
        return bytes(s[r][c] for c in range(4) for r in range(4))

    def cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
        w, nr = _expand_key(key)
        out = bytearray()
        prev = iv
        for i in range(0, len(data) - len(data) % 16, 16):
            blk = data[i : i + 16]
            plain = _decrypt_block(blk, w, nr)
            out.extend(bytes(p ^ c for p, c in zip(plain, prev)))
            prev = blk
        return bytes(out)

    def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
        w, nr = _expand_key(key)
        out = bytearray()
        prev = iv
        for i in range(0, len(data), 16):
            blk = bytes(p ^ c for p, c in zip(data[i : i + 16], prev))
            prev = _encrypt_block(blk, w, nr)
            out.extend(prev)
        return bytes(out)
