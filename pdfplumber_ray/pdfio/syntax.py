"""PDF object syntax: lexer + parser (ISO 32000-1 §7.2-7.3).

Parses the COS object model out of raw bytes: numbers, booleans, null,
names (with #xx escapes), literal strings (nested parens, octal and
character escapes), hex strings, arrays, dictionaries and indirect
references. Used both for document objects and content streams.
"""

from __future__ import annotations

import re
import sys
from typing import Any, List, Optional, Tuple

WHITESPACE = b"\x00\t\n\x0c\r "
DELIMITERS = b"()<>[]{}/%"

_TOKEN_RE = re.compile(
    rb"(?P<ws>[\x00\t\n\x0c\r ]+)"
    rb"|(?P<comment>%[^\r\n]*)"
    rb"|(?P<name>/[^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"
    rb"|(?P<number>[+-]?(?:\d+\.\d*|\.\d+|\d+))"
    rb"|(?P<dict_open><<)"
    rb"|(?P<dict_close>>>)"
    rb"|(?P<hex_open><)"
    rb"|(?P<arr_open>\[)"
    rb"|(?P<arr_close>\])"
    rb"|(?P<str_open>\()"
    rb"|(?P<brace>[{}])"
    rb"|(?P<keyword>[^\x00\t\n\x0c\r ()<>\[\]{}/%]+)"
    rb"|(?P<gt>>)"
)

_NAME_ESC_RE = re.compile(rb"#([0-9A-Fa-f]{2})")

_STR_ESC = {
    ord("n"): b"\n",
    ord("r"): b"\r",
    ord("t"): b"\t",
    ord("b"): b"\b",
    ord("f"): b"\x0c",
    ord("("): b"(",
    ord(")"): b")",
    ord("\\"): b"\\",
}


class PSKeyword:
    """Bare keyword token (operators, obj/endobj/stream/R/true/false...).

    Names are interned: the interpreter's operator dispatch compares
    ``op == "Tj"`` against literals, and interning turns every such
    comparison into a pointer-identity hit."""

    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = sys.intern(name)

    def __repr__(self) -> str:  # pragma: no cover
        return f"KW({self.name})"

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, PSKeyword) and self.name == other.name

    def __hash__(self) -> int:
        return hash(("kw", self.name))


class PDFRef:
    """Indirect reference ``num gen R``."""

    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self) -> str:  # pragma: no cover
        return f"Ref({self.num},{self.gen})"

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, PDFRef) and (self.num, self.gen) == (
            other.num,
            other.gen,
        )

    def __hash__(self) -> int:
        return hash(("ref", self.num, self.gen))


class PDFStream:
    """Stream object: dict + raw (still encoded) data."""

    __slots__ = ("dict", "rawdata", "_decoded")

    def __init__(self, d: dict, rawdata: bytes):
        self.dict = d
        self.rawdata = rawdata
        self._decoded: Optional[bytes] = None

    def __repr__(self) -> str:  # pragma: no cover
        return f"Stream({self.dict}, {len(self.rawdata)}b)"


def decode_name(raw: bytes) -> str:
    """/Name token bytes (without the slash) -> str, resolving #xx."""
    return _NAME_ESC_RE.sub(
        lambda m: bytes([int(m.group(1), 16)]), raw
    ).decode("latin-1")


def parse_literal_string(data: bytes, pos: int) -> Tuple[bytes, int]:
    """Parse after the opening '('; returns (bytes, pos after ')')."""
    # fast path: no escapes or nested parens before the closing ')' —
    # the overwhelming majority of show-text operands
    end = data.find(b")", pos)
    if end >= 0:
        seg = data[pos:end]
        if b"\\" not in seg and b"(" not in seg:
            return seg, end + 1
    out = bytearray()
    depth = 1
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = data[pos]
            if e in _STR_ESC:
                out += _STR_ESC[e]
                pos += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray()
                while pos < n and len(oct_digits) < 3 and 0x30 <= data[pos] <= 0x37:
                    oct_digits.append(data[pos])
                    pos += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e == 0x0D:  # line continuation \CR[LF]
                pos += 1
                if pos < n and data[pos] == 0x0A:
                    pos += 1
            elif e == 0x0A:
                pos += 1
            else:  # unknown escape: emit the char itself
                out.append(e)
                pos += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    return bytes(out), pos


_HEX_CLEAN = re.compile(rb"[^0-9A-Fa-f]")


def parse_hex_string(data: bytes, pos: int) -> Tuple[bytes, int]:
    """Parse after the opening '<'; returns (bytes, pos after '>')."""
    end = data.find(b">", pos)
    if end < 0:
        end = len(data)
    hx = _HEX_CLEAN.sub(b"", data[pos:end])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")), end + 1


# interned operator/keyword tokens (tiny closed set in practice)
_KW_CACHE: dict = {}

# interned ("name", str) tokens — resource names (/F1, /GS0, ...) repeat
# millions of times across content streams; bounded so adversarial
# streams with unbounded distinct names can't grow worker memory
_NAME_CACHE: dict = {}
_NAME_CACHE_MAX = 16384


# Master token regex for the content-stream tokenizer: one C-engine
# scan yields every token; bytes no alternative matches (whitespace,
# stray ')' '>' '{' '}') are skipped by finditer itself, mirroring the
# old first-byte-class skip rules. Alternative ORDER is load-bearing:
# float before int (else "3.14" lexes as 3 + .14), int before keyword
# (else "12" lexes as a keyword — the keyword class includes digits so
# "Q12" still lexes whole), "<<" before hex, simple-string before "(".
_CONTENT_RE = re.compile(
    rb"([+-]?(?:\d+\.\d*|\.\d+))"  # 1: float
    rb"|([+-]?\d+)"  # 2: int
    rb"|(/[^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"  # 3: name
    rb"|([^\x00\t\n\x0c\r ()<>\[\]{}/%]+)"  # 4: keyword
    rb"|(\([^\\()]*\))"  # 5: escape-free literal string (fast path)
    rb"|(\()"  # 6: literal string needing the manual parser
    rb"|(\[)|(\])"  # 7, 8: array delimiters
    rb"|(<<)|(<[^>]*>?)|(>>)"  # 9: dict open, 10: hex string, 11: close
    rb"|(%[^\r\n]*)"  # 12: comment (dropped)
)


def tokenize_content(data: bytes) -> List[Any]:
    """Bulk-tokenize one content stream into a token list.

    One ``_CONTENT_RE.finditer`` pass: the C regex engine does the
    scanning loop and the whitespace/garbage skipping; Python touches
    each token once to coerce/intern it. The iterator only restarts
    (``finditer(data, pos)``) for the rare tokens whose extent the
    regex can't express — literal strings with escapes or nested
    parens, and inline-image binary payloads.

    Inline images (``BI .. ID <binary> EI``) are handled here: the
    binary payload is skipped to ``EI`` exactly as the interpreter's
    scan did, so the emitted stream is pure tokens.
    """
    out: List[Any] = []
    append = out.append
    kw_cache = _KW_CACHE
    name_cache = _NAME_CACHE
    hex_clean = _HEX_CLEAN.sub
    finditer = _CONTENT_RE.finditer
    pos = 0
    n = len(data)
    in_bi = False
    while pos < n:
        restart = False
        for m in finditer(data, pos):
            g = m.lastindex
            if g == 1:
                append(float(m.group()))
            elif g == 2:
                append(int(m.group()))
            elif g == 3:
                raw = m.group()
                tokv = name_cache.get(raw)
                if tokv is None:
                    tokv = ("name", decode_name(raw[1:]))
                    if len(name_cache) < _NAME_CACHE_MAX:
                        name_cache[raw] = tokv
                append(tokv)
            elif g == 4:
                raw = m.group()
                kw = kw_cache.get(raw)
                if kw is None:
                    kw = PSKeyword(raw.decode("latin-1"))
                    kw_cache[raw] = kw
                append(kw)
                if in_bi:
                    if raw == b"ID":
                        # skip the binary payload to EI (same scan as
                        # the per-token interpreter path used)
                        pos = m.end()
                        if pos < n and data[pos] in b" \n\r":
                            pos += 1
                        end = data.find(b"EI", pos)
                        pos = (end + 2) if end >= 0 else n
                        in_bi = False
                        append(KW_EI)
                        restart = True
                        break
                elif raw == b"BI":
                    in_bi = True
            elif g == 5:  # escape-free literal string
                append(m.group()[1:-1])
            elif g == 6:  # literal string with escapes/nesting
                s, pos = parse_literal_string(data, m.end())
                append(s)
                restart = True
                break
            elif g == 7:
                append("[")
            elif g == 8:
                append("]")
            elif g == 9:
                append("<<")
            elif g == 10:
                raw = m.group()
                hx = hex_clean(b"", raw)
                if len(hx) % 2:
                    hx += b"0"
                append(bytes.fromhex(hx.decode("ascii")))
            elif g == 11:
                append(">>")
            # g == 12: comment, dropped
        if not restart:
            break
    return out


class Lexer:
    """Token stream over a byte buffer with pushback."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self._pushback: List[Any] = []

    def push(self, tok: Any) -> None:
        self._pushback.append(tok)

    # group indices in _TOKEN_RE, in declaration order
    _G_WS, _G_COMMENT, _G_NAME, _G_NUMBER = 1, 2, 3, 4
    _G_DICT_OPEN, _G_DICT_CLOSE, _G_HEX_OPEN = 5, 6, 7
    _G_ARR_OPEN, _G_ARR_CLOSE, _G_STR_OPEN = 8, 9, 10
    _G_BRACE, _G_KEYWORD, _G_GT = 11, 12, 13

    def next_token(self) -> Optional[Any]:
        """Returns int/float, bytes (string), str (name, prefixed '/'
        stripped -> returned as ('name', s)), PSKeyword, or one of the
        structural markers '[' ']' '<<' '>>'. None at EOF.

        Dispatches on the integer ``lastindex`` (hot loop: content
        streams are millions of tokens)."""
        if self._pushback:
            return self._pushback.pop()
        data, n = self.data, len(self.data)
        match = _TOKEN_RE.match
        while self.pos < n:
            m = match(data, self.pos)
            if m is None:
                self.pos += 1  # skip stray byte
                continue
            kind = m.lastindex
            self.pos = m.end()
            if kind == 4:  # number (most frequent in content streams)
                txt = m.group(4)
                if b"." in txt:
                    return float(txt)
                return int(txt)
            if kind == 12:  # keyword / operator
                raw = m.group(12)
                kw = _KW_CACHE.get(raw)
                if kw is None:
                    kw = PSKeyword(raw.decode("latin-1"))
                    _KW_CACHE[raw] = kw
                return kw
            if kind == 1 or kind == 2:  # whitespace / comment
                continue
            if kind == 3:  # name
                return ("name", decode_name(m.group(3)[1:]))
            if kind == 10:  # literal string
                s, self.pos = parse_literal_string(data, self.pos)
                return s
            if kind == 8:
                return "["
            if kind == 9:
                return "]"
            if kind == 5:
                return "<<"
            if kind == 6:
                return ">>"
            if kind == 7:  # hex string
                s, self.pos = parse_hex_string(data, self.pos)
                return s
            # 11 (type-4 function braces) and 13 (stray '>') skip
        return None


KW_R = PSKeyword("R")
KW_EI = PSKeyword("EI")
KW_OBJ = PSKeyword("obj")
KW_TRUE = PSKeyword("true")
KW_FALSE = PSKeyword("false")
KW_NULL = PSKeyword("null")
KW_STREAM = PSKeyword("stream")
KW_ENDOBJ = PSKeyword("endobj")


class Parser:
    """Object parser over a Lexer; understands R-references and streams."""

    def __init__(self, data: bytes, pos: int = 0, resolve=None):
        self.lexer = Lexer(data, pos)
        # optional callback to resolve indirect /Length refs (set by
        # PDFDocument) — without it streams whose /Length is indirect fall
        # back to scanning for 'endstream', which truncates compressed
        # payloads that contain that byte sequence
        self.resolve = resolve

    def parse_object(self, tok: Any = None) -> Any:
        """Parse one object. ``tok`` is an optional already-read first
        token."""
        if tok is None:
            tok = self.lexer.next_token()
        if tok is None:
            return None
        if isinstance(tok, (int, float)):
            # might be "num gen R"
            if isinstance(tok, int):
                t2 = self.lexer.next_token()
                if isinstance(t2, int):
                    t3 = self.lexer.next_token()
                    if t3 == KW_R:
                        return PDFRef(tok, t2)
                    self.lexer.push(t3)
                    self.lexer.push(t2)
                    return tok
                self.lexer.push(t2)
            return tok
        if isinstance(tok, bytes):
            return tok
        if isinstance(tok, tuple) and tok[0] == "name":
            return tok[1]
        if tok == "[":
            out = []
            while True:
                t = self.lexer.next_token()
                if t == "]" or t is None:
                    return out
                out.append(self.parse_object(t))
        if tok == "<<":
            d = {}
            while True:
                t = self.lexer.next_token()
                if t == ">>" or t is None:
                    break
                if isinstance(t, tuple) and t[0] == "name":
                    key = t[1]
                    d[key] = self.parse_object()
                # non-name key: skip (malformed)
            # check for stream
            t = self.lexer.next_token()
            if t == KW_STREAM:
                data = self.lexer.data
                pos = self.lexer.pos
                # EOL after 'stream': CRLF or LF
                if data[pos : pos + 2] == b"\r\n":
                    pos += 2
                elif data[pos : pos + 1] in (b"\n", b"\r"):
                    pos += 1
                length = d.get("Length")
                if isinstance(length, PDFRef) and self.resolve is not None:
                    try:
                        lr = self.resolve(length)
                        if isinstance(lr, (int, float)):
                            length = int(lr)
                    except Exception:
                        pass  # fall through to the endstream scan
                raw: Optional[bytes] = None
                if isinstance(length, int):
                    cand = data[pos : pos + length]
                    tail = data[pos + length : pos + length + 20]
                    if re.match(rb"[\x00\t\n\x0c\r ]*endstream", tail):
                        raw = cand
                if raw is None:  # Length wrong/indirect: scan for endstream
                    end = data.find(b"endstream", pos)
                    if end < 0:
                        end = len(data)
                    raw = data[pos:end]
                    if raw.endswith(b"\r\n"):
                        raw = raw[:-2]
                    elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                        raw = raw[:-1]
                    self.lexer.pos = end
                else:
                    self.lexer.pos = pos + len(raw)
                    end = data.find(b"endstream", self.lexer.pos)
                    if end >= 0:
                        self.lexer.pos = end
                # consume 'endstream'
                t2 = self.lexer.next_token()
                if t2 != PSKeyword("endstream"):  # tolerate malformed
                    if t2 is not None:
                        self.lexer.push(t2)
                return PDFStream(d, raw)
            if t is not None:
                self.lexer.push(t)
            return d
        if tok == KW_TRUE:
            return True
        if tok == KW_FALSE:
            return False
        if tok == KW_NULL:
            return None
        return tok  # PSKeyword or marker — caller decides
