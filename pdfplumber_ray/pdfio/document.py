"""PDF document structure: cross-reference tables & streams, object
streams, the page tree with attribute inheritance, and document metadata
(ISO 32000-1 §7.5). The engine-side analogue of the reference's
``PDF.open`` front door (reference pdf.py:65-108)."""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

from .filters import decode_stream
from .syntax import KW_OBJ, Parser, PDFRef, PDFStream, PSKeyword

_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)", re.S)
_OBJ_AT_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")

# page-tree attributes inherited from ancestor /Pages nodes (§7.7.3.4)
_INHERITABLE = ("Resources", "MediaBox", "CropBox", "Rotate")


class PDFSyntaxError(Exception):
    pass


class PDFPage:
    """One resolved page: attrs with inheritance applied. ``objnum`` is
    the page object's number (the identity /Pg references point at)."""

    __slots__ = ("doc", "page_number", "attrs", "objnum")

    def __init__(
        self, doc: "PDFDocument", page_number: int, attrs: dict, objnum: int = -1
    ):
        self.doc = doc
        self.page_number = page_number
        self.attrs = attrs
        self.objnum = objnum

    @property
    def mediabox(self) -> List[float]:
        mb = self.doc.resolve(self.attrs.get("MediaBox")) or [0, 0, 612, 792]
        return [float(self.doc.resolve(v)) for v in mb]

    @property
    def rotate(self) -> int:
        r = int(self.doc.resolve(self.attrs.get("Rotate")) or 0)
        return r % 360

    @property
    def resources(self) -> dict:
        return self.doc.resolve(self.attrs.get("Resources")) or {}

    @property
    def annots(self) -> list:
        return self.doc.resolve(self.attrs.get("Annots")) or []

    def content_bytes(self) -> bytes:
        c = self.doc.resolve(self.attrs.get("Contents"))
        if c is None:
            return b""
        streams = c if isinstance(c, list) else [c]
        parts = []
        for s in streams:
            s = self.doc.resolve(s)
            if isinstance(s, PDFStream):
                parts.append(self.doc.stream_data(s))
        return b"\n".join(parts)


class PDFDocument:
    """Random-access reader over one PDF's bytes.

    Builds the object index from the xref chain (classic tables, xref
    streams, hybrid /XRefStm), loading compressed objects from object
    streams on demand; falls back to a full-file scan for malformed xrefs
    (the reference quarantines such docs via Ghostscript repair,
    repair.py:8-54 — here the scan recovery plays that role)."""

    def __init__(self, data: bytes, password: str = ""):
        self.data = data
        self.xref: Dict[int, Tuple[int, int, int]] = {}  # num -> (type, a, b)
        self.trailer: Dict[str, Any] = {}
        self._cache: Dict[int, Any] = {}
        self._objstm_cache: Dict[int, Dict[int, Any]] = {}
        # parsed fonts keyed by resolved-spec identity; shared across
        # the document's page interpreters (fonts are read-only once
        # loaded, and font parsing — CMaps, ToUnicode, widths — is a
        # dominant per-page cost when every page reuses the same fonts)
        self._font_obj_cache: Dict[int, Any] = {}
        self._loading: set = set()  # cycle guard for indirect-/Length resolution
        self._crypt = None
        try:
            self._load_xrefs()
        except Exception:
            self.xref = {}
        used_scan = False
        if not self.xref or "Root" not in self.trailer:
            self._scan_objects()
            used_scan = True
        if self.trailer.get("Encrypt") is not None:
            from .crypt import StandardSecurityHandler

            enc = self.resolve_all(self.trailer["Encrypt"])
            ids = self.trailer.get("ID")
            id0 = ids[0] if isinstance(ids, list) and ids and isinstance(ids[0], bytes) else b""
            # raises UnsupportedEncryption / WrongPassword -> caller
            # quarantines (the reader's dead-letter path)
            self._crypt = StandardSecurityHandler(
                enc if isinstance(enc, dict) else {}, id0, password
            )
            # drop anything parsed pre-decryption (scan recovery may
            # have touched object streams and cached ciphertext)
            self._cache.clear()
            self._objstm_cache.clear()
            if used_scan:
                # the pre-decryption scan expanded object streams over
                # ciphertext; redo it now that streams decrypt, replacing
                # any type-2 member indices parsed from ciphertext
                self._expand_objstms(overwrite_type2=True)

    # ---- xref loading ----

    def _load_xrefs(self) -> None:
        m = None
        for m in _STARTXREF_RE.finditer(self.data[-2048:] if len(self.data) > 2048 else self.data):
            pass
        if m is None:
            raise PDFSyntaxError("no startxref")
        tail = self.data[-2048:] if len(self.data) > 2048 else self.data
        offset = int(m.group(1))
        seen = set()
        while offset and offset not in seen and 0 <= offset < len(self.data):
            seen.add(offset)
            offset = self._load_xref_at(offset)

    def _load_xref_at(self, offset: int) -> int:
        """Load one xref section; returns /Prev offset or 0."""
        data = self.data
        # skip whitespace
        m = re.match(rb"[\s]*xref\b", data[offset : offset + 16])
        if m:
            return self._load_xref_table(offset + m.end() - 4)
        return self._load_xref_stream(offset)

    def _load_xref_table(self, pos: int) -> int:
        data = self.data
        pos = data.find(b"xref", pos) + 4
        while True:
            m = re.match(rb"\s*(\d+)\s+(\d+)\s*[\r\n]+", data[pos : pos + 64])
            if not m:
                break
            start, count = int(m.group(1)), int(m.group(2))
            pos += m.end()
            for i in range(count):
                line = data[pos : pos + 20]
                em = re.match(rb"(\d{10})\s(\d{5})\s([nf])", line)
                if em:
                    num = start + i
                    if em.group(3) == b"n" and num not in self.xref:
                        self.xref[num] = (1, int(em.group(1)), int(em.group(2)))
                    pos += em.end()
                    # entries are 18-20 bytes; skip trailing EOL
                    while pos < len(data) and data[pos] in b" \r\n":
                        pos += 1
                else:
                    pos += 20
        # trailer
        tpos = data.find(b"trailer", pos)
        prev = 0
        if tpos >= 0:
            p = Parser(data, tpos + 7)
            tdict = p.parse_object()
            if isinstance(tdict, dict):
                for k, v in tdict.items():
                    self.trailer.setdefault(k, v)
                if "XRefStm" in tdict:  # hybrid-reference file
                    try:
                        self._load_xref_stream(int(tdict["XRefStm"]))
                    except Exception:
                        pass
                prev = int(tdict.get("Prev", 0) or 0)
        return prev

    def _load_xref_stream(self, offset: int) -> int:
        data = self.data
        m = _OBJ_AT_RE.match(data, offset) or _OBJ_AT_RE.search(
            data, offset, offset + 64
        )
        if not m:
            raise PDFSyntaxError(f"no xref stream at {offset}")
        p = Parser(data, m.end(), resolve=self.resolve)
        obj = p.parse_object()
        if not isinstance(obj, PDFStream):
            raise PDFSyntaxError("xref object is not a stream")
        d = obj.dict
        for k, v in d.items():
            if k not in ("Length", "Filter", "DecodeParms", "W", "Index", "Type"):
                self.trailer.setdefault(k, v)
        raw = self.stream_data(obj)
        w = [int(self.resolve(x)) for x in self.resolve(d.get("W", [1, 2, 1]))]
        size = int(self.resolve(d.get("Size", 0)))
        index = self.resolve(d.get("Index")) or [0, size]
        index = [int(self.resolve(x)) for x in index]
        rowlen = sum(w)
        pos = 0

        def field(row: bytes, a: int, b: int, default: int) -> int:
            if b == 0:
                return default
            return int.from_bytes(row[a : a + b], "big")

        for s in range(0, len(index), 2):
            start, count = index[s], index[s + 1]
            for i in range(count):
                row = raw[pos : pos + rowlen]
                pos += rowlen
                if len(row) < rowlen:
                    break
                t = field(row, 0, w[0], 1)
                f2 = field(row, w[0], w[1], 0)
                f3 = field(row, w[0] + w[1], w[2], 0)
                num = start + i
                if num not in self.xref and t in (1, 2):
                    self.xref[num] = (t, f2, f3)
        return int(self.resolve(d.get("Prev", 0)) or 0)

    def _expand_objstms(self, overwrite_type2: bool = False) -> List[Tuple[int, dict]]:
        """Register type-2 xref entries for every object-stream member
        reachable from the scan index; returns the (position, dict) of
        each XRef stream found (pure xref-stream files keep /Root and
        /Encrypt there, not in a ``trailer`` block).

        ``overwrite_type2`` is used by the post-decryption re-expansion:
        member indices parsed from ciphertext in the pre-decryption pass
        may be wrong, so existing type-2 entries are REPLACED (type-1 scan
        entries still win — the raw ``N G obj`` position is authoritative)."""
        xref_stream_dicts: List[Tuple[int, dict]] = []
        for num in list(self.xref):
            if self.xref[num][0] != 1:
                continue
            try:
                obj = self.get_object(num)
            except Exception:
                continue
            if not isinstance(obj, PDFStream):
                continue
            typ = self.resolve(obj.dict.get("Type"))
            if typ == "XRef":
                xref_stream_dicts.append((self.xref[num][1], obj.dict))
                continue
            if typ != "ObjStm":
                continue
            try:
                raw = self.stream_data(obj)
                n = int(self.resolve(obj.dict.get("N", 0)))
                hp = Parser(raw, 0)
                for idx in range(n):
                    onum = hp.parse_object()
                    hp.parse_object()  # member offset, unused here
                    if isinstance(onum, int):
                        cur = self.xref.get(onum)
                        if cur is None or (overwrite_type2 and cur[0] == 2):
                            self.xref[onum] = (2, num, idx)
            except Exception:
                continue
        return xref_stream_dicts

    def _scan_objects(self) -> None:
        """Malformed-xref recovery: index every ``N G obj`` in the file
        (last definition wins, matching incremental-update semantics)."""
        for m in _OBJ_AT_RE.finditer(self.data):
            self.xref[int(m.group(1))] = (1, m.start(), int(m.group(2)))
        # expand object streams: compressed objects leave no ``N G obj``
        # marker, so docs whose Catalog lives in an ObjStm (standard for
        # xref-stream files) would otherwise stay unrecoverable
        xref_stream_dicts = self._expand_objstms()
        for _, d in sorted(xref_stream_dicts, key=lambda t: -t[0]):
            for k, v in d.items():
                if k not in (
                    "Length", "Filter", "DecodeParms", "DP", "W", "Index",
                    "Type", "Size", "Prev",
                ):
                    self.trailer.setdefault(k, v)
        # merge EVERY trailer dict, newest (last in file) first — the
        # final trailer of an incrementally-updated file may omit keys
        # like /Encrypt that an earlier one carries, and missing /Encrypt
        # silently yields ciphertext streams instead of content
        tpositions = [
            m.start() for m in re.finditer(rb"trailer", self.data)
        ]
        for tpos in reversed(tpositions):
            try:
                t = Parser(self.data, tpos + 7).parse_object()
            except Exception:
                continue
            if isinstance(t, dict):
                for k, v in t.items():
                    self.trailer.setdefault(k, v)
        if "Root" not in self.trailer:
            # find a Catalog object
            for num in self.xref:
                try:
                    obj = self.get_object(num)
                except Exception:
                    continue
                if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                    self.trailer["Root"] = PDFRef(num, 0)
                    break

    # ---- object access ----

    def get_object(self, num: int) -> Any:
        if num in self._cache:
            return self._cache[num]
        if num in self._loading:
            return None  # /Length cycle: treat as unresolvable
        ent = self.xref.get(num)
        obj: Any = None
        if ent is not None:
            t, a, b = ent
            if t == 1:
                m = _OBJ_AT_RE.match(self.data, a) or _OBJ_AT_RE.search(
                    self.data, a, a + 64
                )
                if m:
                    # even when group(1) != num the scan index is trusted
                    self._loading.add(num)
                    try:
                        obj = Parser(
                            self.data, m.end(), resolve=self.resolve
                        ).parse_object()
                    finally:
                        self._loading.discard(num)
            elif t == 2:
                obj = self._load_from_objstm(a, b)
        if isinstance(obj, PSKeyword):
            obj = None
        if self._crypt is not None and ent is not None and ent[0] == 1:
            # objects inside object streams are already covered by the
            # container stream's decryption — only direct objects decrypt
            obj = self._decrypt_deep(obj, num, ent[2])
        self._cache[num] = obj
        return obj

    def _decrypt_deep(self, obj: Any, num: int, gen: int, depth: int = 0) -> Any:
        if depth > 16:
            return obj
        if isinstance(obj, bytes):
            return self._crypt.decrypt(obj, num, gen, stream=False)
        if isinstance(obj, PDFStream):
            return PDFStream(
                self._decrypt_deep(obj.dict, num, gen, depth + 1),
                self._crypt.decrypt(obj.rawdata, num, gen, stream=True),
            )
        if isinstance(obj, list):
            return [self._decrypt_deep(v, num, gen, depth + 1) for v in obj]
        if isinstance(obj, dict):
            return {
                k: self._decrypt_deep(v, num, gen, depth + 1)
                for k, v in obj.items()
            }
        return obj

    def _load_from_objstm(self, stm_num: int, idx: int) -> Any:
        objs = self._objstm_cache.get(stm_num)
        if objs is None:
            stm = self.get_object(stm_num)
            objs = {}
            if isinstance(stm, PDFStream):
                raw = self.stream_data(stm)
                n = int(self.resolve(stm.dict.get("N", 0)))
                first = int(self.resolve(stm.dict.get("First", 0)))
                hp = Parser(raw, 0)
                pairs = []
                for _ in range(n):
                    a = hp.lexer.next_token()
                    b = hp.lexer.next_token()
                    if not isinstance(a, int) or not isinstance(b, int):
                        break
                    pairs.append((a, b))
                for i, (onum, off) in enumerate(pairs):
                    op = Parser(raw, first + off)
                    objs[i] = (onum, op.parse_object())
            self._objstm_cache[stm_num] = objs
        ent = objs.get(idx)
        return ent[1] if ent else None

    def resolve(self, obj: Any, depth: int = 0) -> Any:
        while isinstance(obj, PDFRef) and depth < 32:
            obj = self.get_object(obj.num)
            depth += 1
        return obj

    def resolve_all(self, obj: Any, depth: int = 0) -> Any:
        """Deep-resolve refs inside containers (reference
        utils/pdfinternals.py:8-16 ``resolve_all``)."""
        obj = self.resolve(obj)
        if depth > 16:
            return obj
        if isinstance(obj, list):
            return [self.resolve_all(v, depth + 1) for v in obj]
        if isinstance(obj, dict):
            return {k: self.resolve_all(v, depth + 1) for k, v in obj.items()}
        return obj

    def stream_data(self, stm: PDFStream) -> bytes:
        if stm._decoded is None:
            filt = self.resolve(stm.dict.get("Filter"))
            parms = self.resolve(
                stm.dict.get("DecodeParms", stm.dict.get("DP"))
            )
            stm._decoded = decode_stream(stm.rawdata, filt, parms, self.resolve)
        return stm._decoded

    # ---- pages & metadata ----

    @property
    def catalog(self) -> dict:
        return self.resolve(self.trailer.get("Root")) or {}

    def pages(self) -> List[PDFPage]:
        root = self.resolve(self.catalog.get("Pages"))
        out: List[PDFPage] = []
        if not isinstance(root, dict):
            # no page tree: collect Type/Page objects in number order
            for num in sorted(self.xref):
                obj = self.resolve(self.get_object(num))
                if isinstance(obj, dict) and obj.get("Type") == "Page":
                    out.append(PDFPage(self, len(out) + 1, obj, num))
            return out
        stack: List[Tuple[Any, dict]] = [(self.catalog.get("Pages"), {})]
        seen = set()
        while stack:
            ref, inherited = stack.pop()
            objnum = ref.num if isinstance(ref, PDFRef) else -1
            node = self.resolve(ref)
            if not isinstance(node, dict) or id(node) in seen:
                continue
            seen.add(id(node))
            inh = dict(inherited)
            for k in _INHERITABLE:
                if k in node:
                    inh[k] = node[k]
            if node.get("Type") == "Page":
                attrs = dict(inh)
                attrs.update(node)
                out.append(PDFPage(self, len(out) + 1, attrs, objnum))
            else:
                kids = self.resolve(node.get("Kids")) or []
                for kid in reversed(kids):
                    stack.append((kid, inh))
        for i, p in enumerate(out):
            p.page_number = i + 1
        return out

    def metadata(self) -> Dict[str, Any]:
        """Resolved + text-decoded /Info dict (reference pdf.py:47-63;
        nested refs resolve recursively like the reference's
        ``resolve_and_decode`` — issue-316's /Changes is a list of
        indirect dicts whose values must come back decoded)."""
        from .fonts import decode_pdf_text

        def deep(v, depth: int = 0):
            if depth > 8:  # cycle/depth guard
                return v
            v = self.resolve(v)
            if isinstance(v, bytes):
                return decode_pdf_text(v)
            if isinstance(v, list):
                return [deep(x, depth + 1) for x in v]
            if isinstance(v, dict):
                return {k: deep(x, depth + 1) for k, x in v.items()}
            if isinstance(v, PDFStream):
                return deep(dict(v.dict), depth + 1)
            return v

        info = self.resolve(self.trailer.get("Info")) or {}
        out: Dict[str, Any] = {}
        if isinstance(info, dict):
            for k, v in info.items():
                out[k] = deep(v)
        return out
