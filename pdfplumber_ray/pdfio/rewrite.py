"""Structural PDF rewriter — the engine's Ghostscript-repair analogue
(reference repair.py:8-54 shells out to ``gs -o out.pdf -sDEVICE=pdfwrite``;
no gs binary ships in this environment, so repair is done in-process).

``rewrite_pdf(data, password)`` re-serializes every reachable object with
a fresh, correct xref table: broken xref offsets, scrambled startxref,
garbage between objects, and missing trailers are all healed because the
loader's scan-recovery finds the objects and the writer emits a clean
file. Encrypted input is written back decrypted (the loader already
decrypted strings and streams), like ``gs``'s default behavior with a
supplied password.

Stream payloads: fully-supported filter chains (Flate/LZW/A85/AHx/RL)
are written DECODED with /Filter dropped — re-encoding adds nothing and
uncompressed output round-trips byte-exactly through any reader. Opaque
image codecs (DCT/JPX/CCITT/JBIG2) keep their raw bytes and /Filter.
Object streams and xref streams are dropped (their members are written
as direct objects).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from .document import PDFDocument
from .syntax import PDFRef, PDFStream

_SUPPORTED_FILTERS = {
    "FlateDecode", "Fl", "LZWDecode", "LZW", "ASCIIHexDecode", "AHx",
    "ASCII85Decode", "A85", "RunLengthDecode", "RL",
}

# name chars that must be #-escaped (ISO 32000-1 §7.3.5)
_NAME_SPECIAL = set(b"()<>[]{}/%# \t\r\n\x0c\x00")


def _ser_name(name: str) -> bytes:
    out = bytearray(b"/")
    for b in name.encode("latin-1", "replace"):
        if b in _NAME_SPECIAL or b < 0x21 or b > 0x7E:
            out += b"#%02X" % b
        else:
            out.append(b)
    return bytes(out)


def _ser_num(v: float) -> bytes:
    if isinstance(v, bool):  # bool is int subclass; handled by caller
        return b"true" if v else b"false"
    if isinstance(v, int):
        return b"%d" % v
    s = f"{v:.12g}"
    if "e" in s or "E" in s:
        # PDF reals have NO exponent form (ISO 32000-1 §7.3.3): expand
        # to plain decimal; sub-precision magnitudes round to 0
        s = f"{v:.12f}".rstrip("0").rstrip(".") or "0"
    return s.encode("ascii")


def serialize_object(obj: Any) -> bytes:
    """One COS object -> bytes (no obj/endobj wrapper)."""
    if obj is None:
        return b"null"
    if isinstance(obj, bool):
        return b"true" if obj else b"false"
    if isinstance(obj, (int, float)):
        return _ser_num(obj)
    if isinstance(obj, bytes):
        return b"<" + obj.hex().encode("ascii") + b">"
    if isinstance(obj, str):
        return _ser_name(obj)
    if isinstance(obj, PDFRef):
        return b"%d %d R" % (obj.num, obj.gen)
    if isinstance(obj, list):
        return b"[" + b" ".join(serialize_object(v) for v in obj) + b"]"
    if isinstance(obj, dict):
        parts = [b"<<"]
        for k, v in obj.items():
            parts.append(_ser_name(str(k)) + b" " + serialize_object(v))
        parts.append(b">>")
        return b" ".join(parts)
    if isinstance(obj, PDFStream):
        raise TypeError("streams are serialized at the object level")
    # unknown token type (keywords shouldn't appear in object position)
    return b"null"


def _stream_body(doc: PDFDocument, stm: PDFStream) -> tuple:
    """-> (dict to write, payload bytes)."""
    d = dict(stm.dict)
    filt = doc.resolve(d.get("Filter"))
    names = filt if isinstance(filt, list) else ([filt] if filt else [])
    names = [doc.resolve(f) for f in names]
    if all(isinstance(f, str) and f in _SUPPORTED_FILTERS for f in names):
        try:
            payload = doc.stream_data(stm)
            d.pop("Filter", None)
            d.pop("DecodeParms", None)
            d.pop("DP", None)
        except Exception:
            payload = stm.rawdata
    else:
        payload = stm.rawdata
    d["Length"] = len(payload)
    return d, payload


def rewrite_pdf(
    data: bytes, password: str = "", version: bytes = b"1.7"
) -> bytes:
    """Broken/encrypted PDF bytes -> clean, unencrypted PDF bytes.

    Raises whatever ``PDFDocument`` raises on unloadable input — callers
    in the repair pipeline quarantine on exception (dead-letter), they
    never crash the block.
    """
    doc = PDFDocument(data, password=password)

    objs: Dict[int, Any] = {}
    for num in sorted(doc.xref):
        obj = doc.get_object(num)
        if obj is None:
            continue
        if isinstance(obj, PDFStream):
            t = doc.resolve(obj.dict.get("Type"))
            if t in ("ObjStm", "XRef"):
                continue  # members become direct objects; xref is rebuilt
        objs[num] = obj

    if not objs or doc.trailer.get("Root") is None:
        raise ValueError("no recoverable objects / document catalog")

    out = bytearray(b"%PDF-" + version + b"\n%\xe2\xe3\xcf\xd3\n")
    offsets: Dict[int, int] = {}
    for num, obj in objs.items():
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num
        if isinstance(obj, PDFStream):
            d, payload = _stream_body(doc, obj)
            out += serialize_object(d)
            out += b"\nstream\n" + payload + b"\nendstream"
        else:
            out += serialize_object(obj)
        out += b"\nendobj\n"

    xref_pos = len(out)
    maxn = (max(offsets) + 1) if offsets else 1
    out += b"xref\n0 %d\n" % maxn
    out += b"0000000000 65535 f \n"
    for n in range(1, maxn):
        if n in offsets:
            out += b"%010d 00000 n \n" % offsets[n]
        else:
            out += b"0000000000 65535 f \n"

    trailer: Dict[str, Any] = {"Size": maxn}
    for key in ("Root", "Info", "ID"):
        v = doc.trailer.get(key)
        if v is not None:
            trailer[key] = v
    out += b"trailer\n" + serialize_object(trailer)
    out += b"\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)
