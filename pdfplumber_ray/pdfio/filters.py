"""PDF stream filters (ISO 32000-1 §7.4): FlateDecode (+PNG/TIFF
predictors), ASCIIHexDecode, ASCII85Decode, RunLengthDecode, LZWDecode.
Image-only filters (DCT/JPX/CCITT/JBIG2) pass through raw — the engine
treats image payloads as opaque binary columns."""

from __future__ import annotations

import re
import zlib
from typing import Any, List, Optional


def apply_png_predictor(data: bytes, colors: int, columns: int, bpc: int) -> bytes:
    """PNG predictors 10-15: per-row filter byte then Sub/Up/Avg/Paeth."""
    bpp = max(1, (colors * bpc + 7) // 8)  # bytes per pixel
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    n = len(data)
    while i + 1 <= n:
        ft = data[i]
        row = bytearray(data[i + 1 : i + 1 + rowlen])
        if len(row) < rowlen:
            row += bytearray(rowlen - len(row))
        i += 1 + rowlen
        if ft == 1:  # Sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(rowlen):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pr) & 0xFF
        out += row
        prev = row
    return bytes(out)


def apply_tiff_predictor(data: bytes, colors: int, columns: int, bpc: int) -> bytes:
    """TIFF predictor 2 (horizontal differencing): each sample is a
    delta from the previous sample of the same color component.
    Supports bpc 1/2/4 (bit-packed rows, ISO 32000-1 §7.4.4.4 note on
    sub-byte samples), 8, and 16 (big-endian components)."""
    if bpc == 8:
        rowlen = columns * colors
        out = bytearray(data)
        for r in range(0, len(out) - rowlen + 1, rowlen):
            for j in range(colors, rowlen):
                out[r + j] = (out[r + j] + out[r + j - colors]) & 0xFF
        return bytes(out)

    import numpy as np

    if bpc == 16:
        rowlen = columns * colors * 2
        nrows = len(data) // rowlen
        if nrows == 0:
            return data
        arr = (
            np.frombuffer(data[: nrows * rowlen], dtype=">u2")
            .reshape(nrows, columns * colors)
            .astype(np.int64)
        )
        for c in range(colors):
            arr[:, c::colors] = np.add.accumulate(arr[:, c::colors], axis=1) & 0xFFFF
        tail = data[nrows * rowlen :]
        return arr.astype(">u2").tobytes() + tail

    if bpc in (1, 2, 4):
        rowlen = (columns * colors * bpc + 7) // 8  # rows are byte-aligned
        nrows = len(data) // rowlen
        if nrows == 0:
            return data
        mask = (1 << bpc) - 1
        bits = np.unpackbits(
            np.frombuffer(data[: nrows * rowlen], dtype=np.uint8).reshape(
                nrows, rowlen
            ),
            axis=1,
        )
        nsamp = columns * colors
        # bit-groups -> samples (big-endian within each bpc group)
        samples = np.zeros((nrows, nsamp), dtype=np.int64)
        for b in range(bpc):
            samples = (samples << 1) | bits[:, b : nsamp * bpc : bpc]
        for c in range(colors):
            samples[:, c::colors] = (
                np.add.accumulate(samples[:, c::colors], axis=1) & mask
            )
        # repack, preserving row padding bits as zero
        outbits = np.zeros((nrows, rowlen * 8), dtype=np.uint8)
        for b in range(bpc):
            outbits[:, b : nsamp * bpc : bpc] = (samples >> (bpc - 1 - b)) & 1
        tail = data[nrows * rowlen :]
        return np.packbits(outbits, axis=1).tobytes() + tail

    return data  # nonstandard bpc: pass through unchanged


def flate_decode(data: bytes, params: Optional[dict] = None) -> bytes:
    try:
        raw = zlib.decompress(data)
    except zlib.error:
        d = zlib.decompressobj()
        try:
            raw = d.decompress(data)  # tolerate truncated / trailing junk
        except zlib.error:
            raw = b""
    if params:
        pred = params.get("Predictor", 1) or 1
        colors = params.get("Colors", 1) or 1
        columns = params.get("Columns", 1) or 1
        bpc = params.get("BitsPerComponent", 8) or 8
        if pred >= 10:
            raw = apply_png_predictor(raw, colors, columns, bpc)
        elif pred == 2:
            raw = apply_tiff_predictor(raw, colors, columns, bpc)
    return raw


_HEX_CLEAN = re.compile(rb"[^0-9A-Fa-f>]")


def asciihex_decode(data: bytes) -> bytes:
    data = _HEX_CLEAN.sub(b"", data)
    end = data.find(b">")
    if end >= 0:
        data = data[:end]
    if len(data) % 2:
        data += b"0"
    return bytes.fromhex(data.decode("ascii"))


def ascii85_decode(data: bytes) -> bytes:
    import base64

    data = re.sub(rb"\s", b"", data)
    if data.startswith(b"<~"):
        data = data[2:]
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    return base64.a85decode(data)


def runlength_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        l = data[i]
        if l == 128:
            break
        if l < 128:
            out += data[i + 1 : i + 2 + l]
            i += 2 + l
        else:
            if i + 1 < n:
                out += bytes([data[i + 1]]) * (257 - l)
            i += 2
    return bytes(out)


def lzw_decode(data: bytes, params: Optional[dict] = None) -> bytes:
    """LZW per TIFF/PDF flavor (early change = 1 by default)."""
    early = 1
    if params and "EarlyChange" in params:
        early = int(params["EarlyChange"] or 0)
    out = bytearray()
    table: List[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bitbuf = 0
    bitcnt = 0
    codelen = 9
    prev: Optional[bytes] = None
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= codelen:
            code = (bitbuf >> (bitcnt - codelen)) & ((1 << codelen) - 1)
            bitcnt -= codelen
            if code == 256:  # clear
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                codelen = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) + early - 1 >= (1 << codelen) and codelen < 12:
                codelen += 1
    return bytes(out)


_PASSTHROUGH = {
    "DCTDecode", "DCT", "JPXDecode", "CCITTFaxDecode", "CCF", "JBIG2Decode",
}


def decode_stream(
    rawdata: bytes, filters: Any, parms: Any, resolve
) -> bytes:
    """Apply the (possibly chained) /Filter list with /DecodeParms."""
    if filters is None:
        return rawdata
    flist = filters if isinstance(filters, list) else [filters]
    flist = [resolve(f) for f in flist]
    plist = parms if isinstance(parms, list) else [parms] * len(flist)
    data = rawdata
    for f, p in zip(flist, plist):
        p = resolve(p)
        if isinstance(p, dict):
            p = {k: resolve(v) for k, v in p.items()}
        if f in ("FlateDecode", "Fl"):
            data = flate_decode(data, p)
        elif f in ("ASCIIHexDecode", "AHx"):
            data = asciihex_decode(data)
        elif f in ("ASCII85Decode", "A85"):
            data = ascii85_decode(data)
        elif f in ("RunLengthDecode", "RL"):
            data = runlength_decode(data)
        elif f in ("LZWDecode", "LZW"):
            data = lzw_decode(data, p)
        elif f in _PASSTHROUGH:
            return data  # opaque image codec: stop, keep raw
        # unknown filter: pass through unchanged
    return data
