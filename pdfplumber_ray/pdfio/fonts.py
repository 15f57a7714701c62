"""Font models: code->width, code->unicode (ISO 32000-1 §9).

Simple fonts (Type1/TrueType/Type3) use /Widths + /FirstChar and an
encoding (base table + /Differences glyph names, or a /ToUnicode CMap,
which takes precedence). Composite Type0/CID fonts use /W//DW and 2-byte
Identity encodings. Width semantics mirror pdfminer's layout model:
``char_width(cid) -> glyph-space width * 0.001`` and
``get_descent() -> /Descent * 0.001``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from .syntax import Lexer, PDFStream, PSKeyword

# ---- base encodings (code -> unicode char) ----


def _codec_table(codec: str) -> Dict[int, str]:
    out: Dict[int, str] = {}
    for c in range(32, 256):
        try:
            out[c] = bytes([c]).decode(codec)
        except UnicodeDecodeError:
            pass
    return out


WIN_ANSI = _codec_table("cp1252")
MAC_ROMAN = _codec_table("mac_roman")
# Adobe StandardEncoding: ASCII plus repositioned punctuation; the upper
# range differs from latin-1 — listed explicitly (public Adobe data)
STANDARD = {c: chr(c) for c in range(32, 127)}
STANDARD.update(
    {
        0x27: "’",  # quoteright
        0x60: "‘",  # quoteleft
        0xA1: "¡", 0xA2: "¢", 0xA3: "£", 0xA4: "⁄",
        0xA5: "¥", 0xA6: "ƒ", 0xA7: "§", 0xA8: "¤",
        0xA9: "'", 0xAA: "“", 0xAB: "«", 0xAC: "‹",
        0xAD: "›", 0xAE: "ﬁ", 0xAF: "ﬂ", 0xB1: "–",
        0xB2: "†", 0xB3: "‡", 0xB4: "·", 0xB6: "¶",
        0xB7: "•", 0xB8: "‚", 0xB9: "„", 0xBA: "”",
        0xBB: "»", 0xBC: "…", 0xBD: "‰", 0xBF: "¿",
        0xC1: "`", 0xC2: "´", 0xC3: "ˆ", 0xC4: "˜",
        0xC5: "¯", 0xC6: "˘", 0xC7: "˙", 0xC8: "¨",
        0xCA: "˚", 0xCB: "¸", 0xCD: "˝", 0xCE: "˛",
        0xCF: "ˇ", 0xD0: "—", 0xE1: "Æ", 0xE3: "ª",
        0xE8: "Ł", 0xE9: "Ø", 0xEA: "Œ", 0xEB: "º",
        0xF1: "æ", 0xF5: "ı", 0xF8: "ł", 0xF9: "ø",
        0xFA: "œ", 0xFB: "ß",
    }
)

BASE_ENCODINGS = {
    "WinAnsiEncoding": WIN_ANSI,
    "MacRomanEncoding": MAC_ROMAN,
    "StandardEncoding": STANDARD,
    "PDFDocEncoding": _codec_table("latin-1"),
    "MacExpertEncoding": {},
}

# Adobe Glyph List subset: names seen in /Differences of real corpora.
# Single letters and 'uniXXXX' forms are handled programmatically.
GLYPH_NAMES: Dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•",
    "dagger": "†", "daggerdbl": "‡", "ellipsis": "…",
    "perthousand": "‰", "guilsinglleft": "‹",
    "guilsinglright": "›", "guillemotleft": "«",
    "guillemotright": "»", "exclamdown": "¡",
    "questiondown": "¿", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "florin": "ƒ",
    "section": "§", "paragraph": "¶", "periodcentered": "·",
    "copyright": "©", "registered": "®", "trademark": "™",
    "degree": "°", "plusminus": "±", "multiply": "×",
    "divide": "÷", "minus": "−", "fraction": "⁄",
    "onehalf": "½", "onequarter": "¼", "threequarters": "¾",
    "onesuperior": "¹", "twosuperior": "²",
    "threesuperior": "³", "brokenbar": "¦", "mu": "µ",
    "dotlessi": "ı", "fi": "ﬁ", "fl": "ﬂ",
    "OE": "Œ", "oe": "œ", "AE": "Æ", "ae": "æ",
    "Oslash": "Ø", "oslash": "ø", "Lslash": "Ł",
    "lslash": "ł", "germandbls": "ß", "eth": "ð",
    "Eth": "Ð", "thorn": "þ", "Thorn": "Þ",
    "nbspace": " ", "softhyphen": "­", "sfthyphen": "­",
    "Euro": "€", "euro": "€",
    "acute": "´", "circumflex": "ˆ", "caron": "ˇ",
    "dieresis": "¨", "tilde": "˜", "macron": "¯",
    "breve": "˘", "dotaccent": "˙", "ring": "˚",
    "cedilla": "¸", "hungarumlaut": "˝", "ogonek": "˛",
    "ordfeminine": "ª", "ordmasculine": "º",
    "logicalnot": "¬",
}
# accented latin: Aacute..ydieresis derive from unicodedata lookup
import unicodedata as _ud

_ACCENTS = {
    "acute": "ACUTE", "grave": "GRAVE", "circumflex": "CIRCUMFLEX",
    "dieresis": "DIAERESIS", "tilde": "TILDE", "ring": "RING ABOVE",
    "cedilla": "CEDILLA", "caron": "CARON", "breve": "BREVE",
    "macron": "MACRON", "hungarumlaut": "DOUBLE ACUTE",
    "ogonek": "OGONEK", "dotaccent": "DOT ABOVE", "slash": "STROKE",
}
for _base in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
    for _acc, _uname in _ACCENTS.items():
        _case = "CAPITAL" if _base.isupper() else "SMALL"
        try:
            GLYPH_NAMES.setdefault(
                _base + _acc,
                _ud.lookup(
                    f"LATIN {_case} LETTER {_base.upper()} WITH {_uname}"
                ),
            )
        except KeyError:
            pass


def glyph_to_unicode(name: str) -> Optional[str]:
    """AGL resolution: known names, single chars, uniXXXX / uXXXX forms."""
    if name in GLYPH_NAMES:
        return GLYPH_NAMES[name]
    if len(name) == 1:
        return name
    if name.startswith("uni") and len(name) >= 7:
        try:
            return "".join(
                chr(int(name[i : i + 4], 16)) for i in range(3, len(name) - 3, 4)
            )
        except ValueError:
            return None
    if name.startswith("u") and len(name) in (5, 7):
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return None
    # 'gXX' / 'cidXX' glyph ids carry no unicode
    return None


# PDFDocEncoding (ISO 32000-1 Annex D.2): latin-1 base with accent marks
# at 0x18-0x1F, typographic punctuation at 0x80-0x9F, Euro at 0xA0
_PDFDOC = [chr(i) for i in range(256)]
for _i, _u in {
    0x18: 0x02D8, 0x19: 0x02C7, 0x1A: 0x02C6, 0x1B: 0x02D9,
    0x1C: 0x02DD, 0x1D: 0x02DB, 0x1E: 0x02DA, 0x1F: 0x02DC,
    0x80: 0x2022, 0x81: 0x2020, 0x82: 0x2021, 0x83: 0x2026,
    0x84: 0x2014, 0x85: 0x2013, 0x86: 0x0192, 0x87: 0x2044,
    0x88: 0x2039, 0x89: 0x203A, 0x8A: 0x2212, 0x8B: 0x2030,
    0x8C: 0x201E, 0x8D: 0x201C, 0x8E: 0x201D, 0x8F: 0x2018,
    0x90: 0x2019, 0x91: 0x201A, 0x92: 0x2122, 0x93: 0xFB01,
    0x94: 0xFB02, 0x95: 0x0141, 0x96: 0x0152, 0x97: 0x0160,
    0x98: 0x0178, 0x99: 0x017D, 0x9A: 0x0131, 0x9B: 0x0142,
    0x9C: 0x0153, 0x9D: 0x0161, 0x9E: 0x017E, 0xA0: 0x20AC,
}.items():
    _PDFDOC[_i] = chr(_u)
PDFDOC_ENCODING = "".join(_PDFDOC)
del _PDFDOC


def decode_pdf_text(data: bytes) -> str:
    """Text-string decode: UTF-16BE with BOM else PDFDocEncoding
    (reference utils/pdfinternals.py:19-34 ``decode_text``)."""
    if data.startswith(b"\xfe\xff"):
        try:
            return data[2:].decode("utf-16-be", "ignore")
        except UnicodeDecodeError:  # pragma: no cover
            return data[2:].decode("latin-1")
    return "".join(PDFDOC_ENCODING[b] for b in data)


# ---- ToUnicode CMap ----


def parse_tounicode(data: bytes) -> Dict[int, str]:
    """bfchar/bfrange sections of a ToUnicode CMap -> {cid: text}."""
    out: Dict[int, str] = {}
    lex = Lexer(data)
    mode: Optional[str] = None
    buf: List[Any] = []
    while True:
        tok = lex.next_token()
        if tok is None:
            break
        if isinstance(tok, PSKeyword):
            if tok.name == "beginbfchar":
                mode, buf = "char", []
            elif tok.name == "beginbfrange":
                mode, buf = "range", []
            elif tok.name in ("endbfchar", "endbfrange"):
                mode = None
            continue
        if mode == "char":
            buf.append(tok)
            if len(buf) == 2:
                src, dst = buf
                buf = []
                if isinstance(src, bytes) and isinstance(dst, bytes):
                    out[int.from_bytes(src, "big")] = dst.decode(
                        "utf-16-be", "ignore"
                    )
        elif mode == "range":
            if tok == "[":
                # <lo> <hi> [dst...]
                arr: List[bytes] = []
                while True:
                    t = lex.next_token()
                    if t == "]" or t is None:
                        break
                    if isinstance(t, bytes):
                        arr.append(t)
                if len(buf) >= 2 and isinstance(buf[-2], bytes):
                    lo = int.from_bytes(buf[-2], "big")
                    for i, d in enumerate(arr):
                        out[lo + i] = d.decode("utf-16-be", "ignore")
                buf = []
                continue
            buf.append(tok)
            if len(buf) == 3:
                lo_b, hi_b, dst = buf
                buf = []
                if all(isinstance(x, bytes) for x in (lo_b, hi_b, dst)):
                    lo = int.from_bytes(lo_b, "big")
                    hi = int.from_bytes(hi_b, "big")
                    base = int.from_bytes(dst, "big") if dst else 0
                    nb = len(dst)
                    for cid in range(lo, min(hi, lo + 65535) + 1):
                        val = base + (cid - lo)
                        try:
                            out[cid] = val.to_bytes(nb, "big").decode(
                                "utf-16-be", "ignore"
                            )
                        except OverflowError:
                            break
    return out


# ---- font classes ----


class PDFFontBase:
    vertical = False
    multibyte = False

    fontname: str = "unknown"
    widths: Dict[int, float]
    default_width: float = 0.0
    descent: float = 0.0
    ascent: float = 0.0
    # glyph-space -> text-space scale. 1/1000 for every font except
    # Type3, whose /FontMatrix defines it (ISO 32000-1 §9.6.5; the
    # published PDFType3Font hscale/vscale via apply_matrix_norm)
    wscale: float = 0.001
    vscale: float = 0.001

    @property
    def glyph_cache(self) -> Dict[int, tuple]:
        """Lazy per-font ``cid -> (text, width*wscale)`` memo for the
        show-text hot loop: one dict probe replaces a ``to_unichr``
        call + widths lookup per glyph. ``width*wscale`` is the same
        first float op the uncached path performs, so advances stay
        bit-identical."""
        cache = self.__dict__.get("_glyph_cache")
        if cache is None:
            cache = self.__dict__["_glyph_cache"] = {}
        return cache

    def get_descent(self) -> float:
        return self.descent * self.vscale

    def get_ascent(self) -> float:
        return self.ascent * self.vscale

    def char_width(self, cid: int) -> float:
        w = self.widths.get(cid)
        if w is None:
            w = self.default_width
        return float(w) * self.wscale

    def decode(self, data: bytes) -> List[int]:
        return list(data)

    def to_unichr(self, cid: int) -> Optional[str]:
        raise KeyError(cid)


def _numv(v) -> float:
    return float(v) if isinstance(v, (int, float)) else 0.0


# Byte-encoded CP936 font names -> friendly names (reference
# page.py:78-95 fix_fontname_bytes; mapping via mupdf pdf-font.c).
CP936_FONTNAMES = {
    b"\xcb\xce\xcc\xe5": "SimSun,Regular",
    b"\xba\xda\xcc\xe5": "SimHei,Regular",
    b"\xbf\xac\xcc\xe5_GB2312": "SimKai,Regular",
    b"\xb7\xc2\xcb\xce_GB2312": "SimFang,Regular",
    b"\xc1\xa5\xca\xe9": "SimLi,Regular",
}


def fix_fontname_bytes(fontname: bytes) -> str:
    """Reference page.py:87-95, byte-for-byte: split a subset prefix at
    the first ``+``, map the CP936 suffix to its friendly name, and fall
    back to the repr-style escape of unknown bytes."""
    if b"+" in fontname:
        split_at = fontname.index(b"+") + 1
        prefix, suffix = fontname[:split_at], fontname[split_at:]
    else:
        prefix, suffix = b"", fontname
    suffix_new = CP936_FONTNAMES.get(suffix, str(suffix)[2:-1])
    return str(prefix)[2:-1] + suffix_new


def fix_fontname(name: str) -> str:
    """Non-ASCII font names arrive as latin-1-decoded raw bytes; map
    them through the CP936 table like the reference's process_object
    (page.py:382-384) does for pdfminer's byte-encoded names."""
    if name.isascii():
        return name
    return fix_fontname_bytes(name.encode("latin-1", "replace"))


def _strip_subset(name: str) -> str:
    """'DCLTEC+Helvetica-Bold' -> 'Helvetica-Bold'."""
    if len(name) > 7 and name[6] == "+" and name[:6].isalpha() and name[:6].isupper():
        return name[7:]
    return name


# Standard-14 fallback widths (public Adobe AFM data, abbreviated):
# Courier family is uniformly 600; others fall back to default_width.
_COURIER = {"Courier", "Courier-Bold", "Courier-Oblique", "Courier-BoldOblique"}


class SimpleFont(PDFFontBase):
    """Type1 / TrueType / Type3 font with single-byte codes."""

    def __init__(self, spec: dict, doc):
        r = doc.resolve
        self.subtype = r(spec.get("Subtype")) or "Type1"
        base = r(spec.get("BaseFont")) or r(spec.get("Name")) or "unknown"
        descriptor = r(spec.get("FontDescriptor")) or {}
        self.fontname = fix_fontname(str(r(descriptor.get("FontName")) or base))
        self.descent = float(r(descriptor.get("Descent")) or 0)
        self.ascent = float(r(descriptor.get("Ascent")) or 0)
        self.default_width = float(r(descriptor.get("MissingWidth")) or 0)

        self.widths = {}
        wl = r(spec.get("Widths"))
        if wl is not None:
            first = int(r(spec.get("FirstChar")) or 0)
            for i, w in enumerate(r(wl) or []):
                w = r(w)
                if isinstance(w, (int, float)):
                    self.widths[first + i] = float(w)
        elif _strip_subset(str(base)) in _COURIER:
            self.widths = {c: 600.0 for c in range(256)}
            self.descent = self.descent or -194.0
        elif not self.default_width:
            # no /Widths, no metrics table, no /MissingWidth: a zero
            # default would collapse every glyph onto one point — use a
            # plausible average width so layout stays usable
            self.default_width = 500.0

        if self.subtype == "Type3":
            # Type3 widths are in GLYPH space: /FontMatrix maps them to
            # text space (ISO 32000-1 §9.6.5). The published handler's
            # hscale/vscale = apply_matrix_norm(matrix, (1, 1)), and its
            # descent/ascent always come from the font bbox.
            m = r(spec.get("FontMatrix"))
            if isinstance(m, list) and len(m) == 6:
                a, b, c, d = (_numv(r(v)) for v in m[:4])
            else:
                a, b, c, d = 0.001, 0.0, 0.0, 0.001
            self.wscale = a + c
            self.vscale = b + d
            bbox = r(descriptor.get("FontBBox")) or r(spec.get("FontBBox"))
            if isinstance(bbox, list) and len(bbox) == 4:
                self.descent = _numv(r(bbox[1]))
                self.ascent = _numv(r(bbox[3]))

        # encoding: base table + Differences
        enc_obj = r(spec.get("Encoding"))
        table = dict(STANDARD)
        if isinstance(enc_obj, str):
            table = dict(BASE_ENCODINGS.get(enc_obj, STANDARD))
        elif isinstance(enc_obj, dict):
            basename = r(enc_obj.get("BaseEncoding"))
            if isinstance(basename, str):
                table = dict(BASE_ENCODINGS.get(basename, STANDARD))
            diffs = r(enc_obj.get("Differences")) or []
            code = 0
            for item in diffs:
                item = r(item)
                if isinstance(item, (int, float)):
                    code = int(item)
                elif isinstance(item, str):
                    u = glyph_to_unicode(item)
                    if u is not None:
                        table[code] = u
                    else:
                        table.pop(code, None)
                    code += 1
        self.cid2unicode = table

        if wl is None and not self.widths:
            # widthless standard-14 font: resolve metrics through the
            # AFM-equivalent table (std14.py), keyed by unicode so any
            # encoding works; remaining glyphs keep default_width
            from .std14 import STD14_WIDTHS

            metrics = STD14_WIDTHS.get(_strip_subset(str(base)))
            if metrics:
                self.widths = {
                    code: metrics[u]
                    for code, u in table.items()
                    if u in metrics
                }

        self.unicode_map: Optional[Dict[int, str]] = None
        tu = r(spec.get("ToUnicode"))
        if isinstance(tu, PDFStream):
            try:
                self.unicode_map = parse_tounicode(doc.stream_data(tu))
            except Exception:
                self.unicode_map = None

    def to_unichr(self, cid: int) -> str:
        if self.unicode_map:
            u = self.unicode_map.get(cid)
            if u is not None:
                return u
        u = self.cid2unicode.get(cid)
        if u is None:
            raise KeyError(cid)
        return u


def _parse_w_array(w: list, r) -> Dict[int, float]:
    """CID /W array: [c [w...]] or [c1 c2 w]."""
    out: Dict[int, float] = {}
    i = 0
    n = len(w)
    while i < n:
        c = r(w[i])
        if i + 1 < n and isinstance(r(w[i + 1]), list):
            for j, ww in enumerate(r(w[i + 1])):
                out[int(c) + j] = float(r(ww))
            i += 2
        elif i + 2 < n:
            c2, ww = r(w[i + 1]), float(r(w[i + 2]))
            for cid in range(int(c), int(c2) + 1):
                out[cid] = ww
            i += 3
        else:
            break
    return out


def _parse_w2_array(w: list, r) -> tuple:
    """CID /W2 array -> ({cid: w1y}, {cid: (vx, vy)}).

    Vertical metrics per ISO 32000-1 §9.7.4.3: groups of
    ``c [w1y vx vy ...]`` or ``c1 c2 w1y vx vy`` (pdfminer
    get_widths2 semantics; reference inherits them via LTChar)."""
    widths: Dict[int, float] = {}
    disps: Dict[int, tuple] = {}
    run: list = []
    for v0 in w:
        v = r(v0)
        if isinstance(v, list):
            if run:
                c1 = int(run[-1])
                vals = [r(x) for x in v]
                for i in range(0, len(vals) - len(vals) % 3, 3):
                    cid = c1 + i // 3
                    widths[cid] = float(vals[i])
                    disps[cid] = (float(vals[i + 1]), float(vals[i + 2]))
                run = []
        elif isinstance(v, (int, float)):
            run.append(v)
            if len(run) == 5:
                c1, c2, ww, vx, vy = run
                for cid in range(int(c1), int(c2) + 1):
                    widths[cid] = float(ww)
                    disps[cid] = (float(vx), float(vy))
                run = []
    return widths, disps


class Type0Font(PDFFontBase):
    """Composite font with a CID descendant; Identity-H/V 2-byte codes."""

    multibyte = True

    def __init__(self, spec: dict, doc):
        r = doc.resolve
        base = r(spec.get("BaseFont")) or "unknown"
        desc_list = r(spec.get("DescendantFonts")) or []
        desc = r(desc_list[0]) if desc_list else {}
        descriptor = r(desc.get("FontDescriptor")) or {}
        self.fontname = fix_fontname(str(r(descriptor.get("FontName")) or base))
        self.descent = float(r(descriptor.get("Descent")) or 0)
        self.ascent = float(r(descriptor.get("Ascent")) or 0)
        enc = r(spec.get("Encoding"))
        self.vertical = isinstance(enc, str) and enc.endswith("-V")
        if self.vertical:
            # vertical writing (ISO 32000-1 §9.7.4.3): widths are the
            # w1y vertical displacements from /W2; /DW2 = [vy w1y]
            # defaults to [880 -1000]; position vectors carried in disps
            dw2 = r(desc.get("DW2"))
            if not (isinstance(dw2, list) and len(dw2) == 2):
                dw2 = [880, -1000]
            self.widths, self.disps = _parse_w2_array(r(desc.get("W2")) or [], r)
            self.default_width = float(r(dw2[1]))
            self.default_disp = (None, float(r(dw2[0])))
        else:
            self.disps = {}
            self.default_disp = (None, 880.0)
            self.default_width = float(r(desc.get("DW")) or 1000)
            self.widths = _parse_w_array(r(desc.get("W")) or [], r)
        self.unicode_map: Optional[Dict[int, str]] = None
        tu = r(spec.get("ToUnicode"))
        if isinstance(tu, PDFStream):
            try:
                self.unicode_map = parse_tounicode(doc.stream_data(tu))
            except Exception:
                self.unicode_map = None

    def char_disp(self, cid: int) -> tuple:
        """(vx, vy) position vector in 1000ths; vx None -> w0/2 rule."""
        return self.disps.get(cid, self.default_disp)

    def decode(self, data: bytes) -> List[int]:
        return [
            int.from_bytes(data[i : i + 2], "big")
            for i in range(0, len(data) - len(data) % 2, 2)
        ]

    def to_unichr(self, cid: int) -> str:
        if self.unicode_map:
            u = self.unicode_map.get(cid)
            if u is not None:
                return u
        raise KeyError(cid)


def load_font(spec: Any, doc) -> PDFFontBase:
    spec = doc.resolve(spec) or {}
    subtype = doc.resolve(spec.get("Subtype"))
    if subtype == "Type0":
        return Type0Font(spec, doc)
    return SimpleFont(spec, doc)
