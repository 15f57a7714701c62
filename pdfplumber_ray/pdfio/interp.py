"""Content-stream interpreter: PDF operators -> flat object records.

Executes a page's content stream (text state machine, path construction,
XObject recursion, marked-content stamping) and emits char/line/rect/
curve/image dicts in pdfplumber's top-left coordinate convention
(reference page.py:335-400 ``process_object``: ``top = height - y1``,
``doctop = initial_doctop + top``).

Geometry follows pdfminer.six's documented layout model so the engine's
word/textmap/table kernels reproduce the reference goldens:

- text advance: ``adv = char_width(cid) * fontsize * (Tz/100)``
- char bbox: ``(0, descent+rise) .. (adv, descent+rise+fontsize)`` in
  text space, transformed by (Tm x CTM)
- ``upright = 0 < a*d*scaling and b*c <= 0``
- TJ number adjustments: ``x -= v * 0.001 * fontsize * scaling``
- word spacing applies to single-byte code 32 only
- paths: rect/line/curve classification by subpath shape, with the
  closed-loop + square-coordinates rect test
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from .document import PDFDocument, PDFPage
from .fonts import PDFFontBase, load_font
from .syntax import Lexer, PDFStream, PSKeyword

Matrix = Tuple[float, float, float, float, float, float]
Point = Tuple[float, float]

MATRIX_IDENTITY: Matrix = (1, 0, 0, 1, 0, 0)


def mult_matrix(m1: Matrix, m0: Matrix) -> Matrix:
    a1, b1, c1, d1, e1, f1 = m1
    a0, b0, c0, d0, e0, f0 = m0
    return (
        a0 * a1 + c0 * b1,
        b0 * a1 + d0 * b1,
        a0 * c1 + c0 * d1,
        b0 * c1 + d0 * d1,
        a0 * e1 + c0 * f1 + e0,
        b0 * e1 + d0 * f1 + f0,
    )


def translate_matrix(m: Matrix, v: Point) -> Matrix:
    a, b, c, d, e, f = m
    x, y = v
    return (a, b, c, d, x * a + y * c + e, x * b + y * d + f)


def apply_matrix_pt(m: Matrix, p: Point) -> Point:
    a, b, c, d, e, f = m
    x, y = p
    return (a * x + c * y + e, b * x + d * y + f)


class _GState:
    __slots__ = ("ctm", "linewidth", "dash", "scolor", "ncolor", "scs", "ncs")

    def __init__(self, ctm: Matrix):
        self.ctm = ctm
        self.linewidth: float = 0.0
        self.dash: Tuple[list, float] = ([], 0.0)
        self.scolor: Any = None
        self.ncolor: Any = None
        self.scs: Optional[str] = None
        self.ncs: Optional[str] = None

    def copy(self) -> "_GState":
        g = _GState(self.ctm)
        g.linewidth = self.linewidth
        g.dash = self.dash
        g.scolor = self.scolor
        g.ncolor = self.ncolor
        g.scs = self.scs
        g.ncs = self.ncs
        return g


class _TState:
    __slots__ = (
        "font", "fontsize", "charspace", "wordspace", "scaling",
        "leading", "rise", "render", "matrix", "linematrix",
    )

    def __init__(self) -> None:
        self.font: Optional[PDFFontBase] = None
        self.fontsize: float = 0.0
        self.charspace: float = 0.0
        self.wordspace: float = 0.0
        self.scaling: float = 100.0
        self.leading: float = 0.0
        self.rise: float = 0.0
        self.render: int = 0
        self.matrix: Matrix = MATRIX_IDENTITY
        self.linematrix: Point = (0.0, 0.0)


def _num(v: Any, default: float = 0.0) -> float:
    if isinstance(v, (int, float)):
        return float(v)
    return default


class PageInterpreter:
    """Interprets one page; collects flat object dicts per kind."""

    def __init__(
        self,
        doc: PDFDocument,
        page: PDFPage,
        initial_doctop: float = 0.0,
        max_form_depth: int = 8,
    ):
        self.doc = doc
        self.page = page
        self.initial_doctop = initial_doctop
        self.max_form_depth = max_form_depth

        x0, y0, x1, y1 = page.mediabox
        x0, x1 = sorted((x0, x1))
        y0, y1 = sorted((y0, y1))
        rotate = page.rotate
        # pdfminer PDFPageInterpreter.process_page rotation CTMs
        if rotate == 90:
            base_ctm: Matrix = (0, -1, 1, 0, -y0, x1)
            self.width, self.height = (y1 - y0), (x1 - x0)
        elif rotate == 180:
            base_ctm = (-1, 0, 0, -1, x1, y1)
            self.width, self.height = (x1 - x0), (y1 - y0)
        elif rotate == 270:
            base_ctm = (0, 1, -1, 0, y1, -x0)
            self.width, self.height = (y1 - y0), (x1 - x0)
        else:
            base_ctm = (1, 0, 0, 1, -x0, -y0)
            self.width, self.height = (x1 - x0), (y1 - y0)
        self.base_ctm = base_ctm

        self.chars: List[Dict] = []
        self.lines: List[Dict] = []
        self.rects: List[Dict] = []
        self.curves: List[Dict] = []
        self.images: List[Dict] = []

        self._font_cache: Dict[int, PDFFontBase] = {}
        self.cur_mcid: Optional[int] = None
        self.cur_tag: Optional[str] = None
        self._form_depth = 0  # >0 while executing a Form XObject

    # ---- entry ----

    def run(self) -> None:
        content = self.page.content_bytes()
        self.gs = _GState(self.base_ctm)
        self.ts = _TState()
        self.gstack: List[_GState] = []
        self.execute(content, self.page.resources, depth=0)

    # ---- helpers ----

    def _top(self, y1: float) -> float:
        return self.height - y1

    def _get_font(self, resources: dict, name: str) -> PDFFontBase:
        fonts = self.doc.resolve(resources.get("Font")) or {}
        spec = fonts.get(name)
        spec_r = self.doc.resolve(spec)
        key = id(spec_r) if spec_r is not None else hash(name)
        f = self._font_cache.get(key)
        if f is None:
            f = load_font(spec_r if spec_r is not None else {}, self.doc)
            self._font_cache[key] = f
        return f

    # ---- text rendering ----

    def _render_string(self, seq: List[Any]) -> None:
        ts = self.ts
        font = ts.font
        if font is None:
            return
        matrix = mult_matrix(ts.matrix, self.gs.ctm)
        fontsize = ts.fontsize
        scaling = ts.scaling * 0.01
        charspace = ts.charspace * scaling
        wordspace = ts.wordspace * scaling
        rise = ts.rise
        if font.multibyte:
            wordspace = 0.0
        dxscale = 0.001 * fontsize * scaling
        if font.vertical:
            # vertical writing unsupported: advance naively downward
            ts.linematrix = self._render_horizontal(
                seq, matrix, ts.linematrix, font, fontsize, scaling,
                charspace, wordspace, rise, dxscale,
            )
            return
        ts.linematrix = self._render_horizontal(
            seq, matrix, ts.linematrix, font, fontsize, scaling,
            charspace, wordspace, rise, dxscale,
        )

    def _render_horizontal(
        self, seq, matrix, pos, font, fontsize, scaling,
        charspace, wordspace, rise, dxscale,
    ) -> Point:
        x, y = pos
        needcharspace = False

        # constants for the whole string: the text matrix's a..d never
        # change within one show operation, only the (x, y) translation.
        # Float-op ORDER matches translate_matrix/apply_matrix_pt exactly
        # so coordinates stay bit-identical to the generic path.
        (a, b, c, d, e0, f0) = matrix
        dy = font.get_descent() * fontsize + rise
        dy2 = dy + fontsize
        c_dy = c * dy
        d_dy = d * dy
        c_dy2 = c * dy2
        d_dy2 = d * dy2
        upright = (0 < a * d * scaling) and (b * c <= 0)
        initial_doctop = self.initial_doctop
        height = self.height
        widths = font.widths
        default_width = font.default_width
        to_unichr = font.to_unichr
        fontname = font.fontname
        chars_out = self.chars
        mcid = self.cur_mcid
        tag = self.cur_tag
        in_figure = self._form_depth > 0
        gs = self.gs

        for obj in seq:
            if isinstance(obj, (int, float)):
                x -= obj * dxscale
                needcharspace = True
            elif isinstance(obj, bytes):
                for cid in font.decode(obj):
                    if needcharspace:
                        x += charspace
                    try:
                        text = to_unichr(cid)
                    except KeyError:
                        text = f"(cid:{cid})"
                    w = widths.get(cid)
                    if w is None:
                        w = default_width
                    # same float-op order as char_width()*fontsize*scaling
                    adv = w * 0.001 * fontsize * scaling
                    # char matrix translation (translate_matrix order)
                    e = x * a + y * c + e0
                    f = x * b + y * d + f0
                    ll_x = 0.0 * a + c_dy + e
                    ll_y = 0.0 * b + d_dy + f
                    ur_x = a * adv + c_dy2 + e
                    ur_y = b * adv + d_dy2 + f
                    if ur_x < ll_x:
                        ll_x, ur_x = ur_x, ll_x
                    if ur_y < ll_y:
                        ll_y, ur_y = ur_y, ll_y
                    top = height - ur_y
                    chars_out.append(
                        {
                            "text": text,
                            "x0": ll_x,
                            "x1": ur_x,
                            "top": top,
                            "bottom": height - ll_y,
                            "doctop": initial_doctop + top,
                            "size": ur_y - ll_y,
                            "adv": adv,
                            "fontname": fontname,
                            "upright": upright,
                            "matrix": (a, b, c, d, e, f),
                            "mcid": mcid,
                            "tag": tag,
                            "ncs": gs.ncs,
                            "stroking_color": gs.scolor,
                            "non_stroking_color": gs.ncolor,
                            "in_figure": in_figure,
                        }
                    )
                    x += adv
                    if cid == 32 and wordspace:
                        x += wordspace
                    needcharspace = True
        return (x, y)

    def _render_char(
        self, matrix: Matrix, font: PDFFontBase, fontsize: float,
        scaling: float, rise: float, cid: int,
    ) -> float:
        try:
            text = font.to_unichr(cid)
        except KeyError:
            text = f"(cid:{cid})"
        textwidth = font.char_width(cid)
        adv = textwidth * fontsize * scaling
        descent = font.get_descent() * fontsize
        (a, b, c, d, e, f) = matrix
        upright = (0 < a * d * scaling) and (b * c <= 0)
        (x0, y0) = apply_matrix_pt(matrix, (0, descent + rise))
        (x1, y1) = apply_matrix_pt(matrix, (adv, descent + rise + fontsize))
        if x1 < x0:
            x0, x1 = x1, x0
        if y1 < y0:
            y0, y1 = y1, y0
        top = self._top(y1)
        self.chars.append(
            {
                "text": text,
                "x0": x0,
                "x1": x1,
                "top": top,
                "bottom": self._top(y0),
                "doctop": self.initial_doctop + top,
                "size": (y1 - y0) if not font.vertical else (x1 - x0),
                "adv": adv,
                "fontname": font.fontname,
                "upright": upright,
                "matrix": matrix,
                "mcid": self.cur_mcid,
                "tag": self.cur_tag,
                "ncs": self.gs.ncs,
                "stroking_color": self.gs.scolor,
                "non_stroking_color": self.gs.ncolor,
            }
        )
        return adv

    # ---- path painting ----

    def _paint_path(
        self, stroke: bool, fill: bool, evenodd: bool, path: List[tuple]
    ) -> None:
        shape = "".join(x[0] for x in path)
        if not shape.startswith("m"):
            return
        if shape.count("m") > 1:
            # decompose into single-subpath invocations
            start = 0
            for i in range(1, len(path) + 1):
                if i == len(path) or path[i][0] == "m":
                    self._paint_path(stroke, fill, evenodd, path[start:i])
                    start = i
            return
        ctm = self.gs.ctm
        raw_pts = [
            (p[-2], p[-1]) if p[0] != "h" else (path[0][-2], path[0][-1])
            for p in path
        ]
        pts = [apply_matrix_pt(ctm, pt) for pt in raw_pts]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        bbox = (min(xs), min(ys), max(xs), max(ys))

        # transformed full path with control points, pdfplumber-style
        # (cmd, x, top) steps — control points flattened in order
        path_steps: List[Tuple[str, float, float]] = []
        for p in path:
            cmd = p[0]
            coords = p[1:]
            if cmd == "h":
                px, py = apply_matrix_pt(ctm, (path[0][-2], path[0][-1]))
                path_steps.append(("h", px, self._top(py)))
                continue
            for i in range(0, len(coords), 2):
                px, py = apply_matrix_pt(ctm, (coords[i], coords[i + 1]))
                path_steps.append((cmd, px, self._top(py)))

        common = {
            "x0": bbox[0],
            "x1": bbox[2],
            "top": self._top(bbox[3]),
            "bottom": self._top(bbox[1]),
            "doctop": self.initial_doctop + self._top(bbox[3]),
            "mcid": self.cur_mcid,
            "tag": self.cur_tag,
        }
        if shape in ("mlh", "ml"):
            self.lines.append(common)
            return
        if shape in ("mlllh", "mllll"):
            (x0p, y0p), (x1p, y1p), (x2p, y2p), (x3p, y3p) = pts[0:4]
            p4 = pts[4] if len(pts) > 4 else pts[0]
            is_closed = pts[0] == p4
            has_square = (
                x0p == x1p and y1p == y2p and x2p == x3p and y3p == y0p
            ) or (y0p == y1p and x1p == x2p and y2p == y3p and x3p == x0p)
            if is_closed and has_square:
                self.rects.append(common)
                return
        self.curves.append(
            {
                **common,
                "pts": [(px, self._top(py)) for (px, py) in pts],
                "path": path_steps,
                "dash": {
                    "array": [float(v) for v in self.gs.dash[0]],
                    "phase": float(self.gs.dash[1]),
                },
            }
        )

    # ---- main execution loop ----

    def execute(self, content: bytes, resources: dict, depth: int) -> None:
        doc = self.doc
        lex = Lexer(content)
        stack: List[Any] = []

        def pop(n: int) -> List[Any]:
            if n == 0:
                return []
            vals = stack[-n:]
            del stack[-n:]
            while len(vals) < n:
                vals.insert(0, 0)
            return vals

        while True:
            tok = lex.next_token()
            if tok is None:
                break
            if isinstance(tok, (int, float, bytes)):
                stack.append(tok)
                continue
            if isinstance(tok, tuple) and tok[0] == "name":
                stack.append(("name", tok[1]))
                continue
            if tok == "[":
                stack.append(self._read_array(lex))
                continue
            if tok == "<<":
                stack.append(self._read_dict(lex))
                continue
            if not isinstance(tok, PSKeyword):
                continue

            op = tok.name
            try:
                self._exec_op(op, stack, pop, lex, resources, depth)
            except Exception:
                stack.clear()

    def _exec_op(self, op, stack, pop, lex, resources, depth) -> None:
        gs, ts = self.gs, self.ts
        if op == "BT":
            ts.matrix = MATRIX_IDENTITY
            ts.linematrix = (0.0, 0.0)
        elif op == "ET":
            pass
        elif op == "Tf":
            name, size = pop(2)
            if isinstance(name, tuple):
                name = name[1]
            ts.font = self._get_font(resources, name)
            ts.fontsize = _num(size)
        elif op == "Td":
            tx, ty = pop(2)
            ts.matrix = translate_matrix(ts.matrix, (_num(tx), _num(ty)))
            ts.linematrix = (0.0, 0.0)
        elif op == "TD":
            tx, ty = pop(2)
            ts.leading = _num(ty)
            ts.matrix = translate_matrix(ts.matrix, (_num(tx), _num(ty)))
            ts.linematrix = (0.0, 0.0)
        elif op == "Tm":
            a, b, c, d, e, f = pop(6)
            ts.matrix = (
                _num(a), _num(b), _num(c), _num(d), _num(e), _num(f)
            )
            ts.linematrix = (0.0, 0.0)
        elif op == "T*":
            ts.matrix = translate_matrix(ts.matrix, (0, ts.leading))
            ts.linematrix = (0.0, 0.0)
        elif op == "TL":
            ts.leading = -_num(pop(1)[0])
        elif op == "Tc":
            ts.charspace = _num(pop(1)[0])
        elif op == "Tw":
            ts.wordspace = _num(pop(1)[0])
        elif op == "Tz":
            ts.scaling = _num(pop(1)[0], 100.0)
        elif op == "Ts":
            ts.rise = _num(pop(1)[0])
        elif op == "Tr":
            ts.render = int(_num(pop(1)[0]))
        elif op == "Tj":
            (s,) = pop(1)
            if isinstance(s, bytes):
                self._render_string([s])
        elif op == "TJ":
            (arr,) = pop(1)
            if isinstance(arr, list):
                self._render_string(arr)
        elif op == "'":
            (s,) = pop(1)
            ts.matrix = translate_matrix(ts.matrix, (0, ts.leading))
            ts.linematrix = (0.0, 0.0)
            if isinstance(s, bytes):
                self._render_string([s])
        elif op == '"':
            aw, ac, s = pop(3)
            ts.wordspace = _num(aw)
            ts.charspace = _num(ac)
            ts.matrix = translate_matrix(ts.matrix, (0, ts.leading))
            ts.linematrix = (0.0, 0.0)
            if isinstance(s, bytes):
                self._render_string([s])
        elif op == "q":
            self.gstack.append(gs.copy())
        elif op == "Q":
            if self.gstack:
                self.gs = self.gstack.pop()
        elif op == "cm":
            a, b, c, d, e, f = pop(6)
            gs.ctm = mult_matrix(
                (_num(a), _num(b), _num(c), _num(d), _num(e), _num(f)),
                gs.ctm,
            )
        elif op == "w":
            gs.linewidth = _num(pop(1)[0])
        elif op == "d":
            arr, phase = pop(2)
            if isinstance(arr, list):
                gs.dash = ([_num(v) for v in arr], _num(phase))
        elif op == "gs":
            (name,) = pop(1)
            if isinstance(name, tuple):
                name = name[1]
            eg = self.doc.resolve(
                (self.doc.resolve(resources.get("ExtGState")) or {}).get(name)
            )
            if isinstance(eg, dict):
                fspec = self.doc.resolve(eg.get("Font"))
                if isinstance(fspec, list) and len(fspec) == 2:
                    ts.font = load_font(fspec[0], self.doc)
                    ts.fontsize = _num(self.doc.resolve(fspec[1]))
        elif op in ("m", "l"):
            x, y = pop(2)
            if not hasattr(self, "curpath"):
                self.curpath: List[tuple] = []
            self.curpath.append((op, _num(x), _num(y)))
        elif op == "c":
            vals = [_num(v) for v in pop(6)]
            self._path().append(("c", *vals))
        elif op == "v":
            vals = [_num(v) for v in pop(4)]
            self._path().append(("v", *vals))
        elif op == "y":
            vals = [_num(v) for v in pop(4)]
            self._path().append(("y", *vals))
        elif op == "h":
            self._path().append(("h",))
        elif op == "re":
            x, y, w, h = [_num(v) for v in pop(4)]
            p = self._path()
            p.append(("m", x, y))
            p.append(("l", x + w, y))
            p.append(("l", x + w, y + h))
            p.append(("l", x, y + h))
            p.append(("h",))
        elif op in ("S", "s", "f", "F", "f*", "B", "B*", "b", "b*", "n"):
            path = getattr(self, "curpath", [])
            if op in ("s", "b", "b*") and path:
                path.append(("h",))
            if op != "n" and path:
                stroke = op in ("S", "s", "B", "B*", "b", "b*")
                fill = op in ("f", "F", "f*", "B", "B*", "b", "b*")
                evenodd = op in ("f*", "B*", "b*")
                self._paint_path(stroke, fill, evenodd, path)
            self.curpath = []
        elif op in ("W", "W*"):
            pass  # clipping: layout model ignores it
        elif op == "G":
            gs.scolor = _num(pop(1)[0])
        elif op == "g":
            gs.ncolor = _num(pop(1)[0])
        elif op == "RG":
            gs.scolor = tuple(_num(v) for v in pop(3))
        elif op == "rg":
            gs.ncolor = tuple(_num(v) for v in pop(3))
        elif op == "K":
            gs.scolor = tuple(_num(v) for v in pop(4))
        elif op == "k":
            gs.ncolor = tuple(_num(v) for v in pop(4))
        elif op == "CS":
            (n,) = pop(1)
            gs.scs = n[1] if isinstance(n, tuple) else n
        elif op == "cs":
            (n,) = pop(1)
            gs.ncs = n[1] if isinstance(n, tuple) else n
        elif op in ("SC", "SCN"):
            vals = list(stack)
            stack.clear()
            nums = [v for v in vals if isinstance(v, (int, float))]
            names = [v for v in vals if isinstance(v, tuple)]
            gs.scolor = (
                names[-1][1] if names else
                (tuple(float(v) for v in nums) if len(nums) > 1 else
                 (float(nums[0]) if nums else None))
            )
        elif op in ("sc", "scn"):
            vals = list(stack)
            stack.clear()
            nums = [v for v in vals if isinstance(v, (int, float))]
            names = [v for v in vals if isinstance(v, tuple)]
            gs.ncolor = (
                names[-1][1] if names else
                (tuple(float(v) for v in nums) if len(nums) > 1 else
                 (float(nums[0]) if nums else None))
            )
        elif op in ("BDC", "BMC"):
            if op == "BDC":
                tag, props = pop(2)
            else:
                (tag,) = pop(1)
                props = None
            if isinstance(tag, tuple):
                tag = tag[1]
            self.cur_tag = tag if isinstance(tag, str) else None
            # reference page.py:135-141: MCID only from a direct props dict
            mcid = None
            if isinstance(props, dict):
                m = props.get("MCID")
                if isinstance(m, (int, float)):
                    mcid = int(m)
            self.cur_mcid = mcid
        elif op == "EMC":
            self.cur_mcid = None
            self.cur_tag = None
        elif op in ("MP", "DP"):
            pop(2 if op == "DP" else 1)
        elif op == "Do":
            (name,) = pop(1)
            if isinstance(name, tuple):
                name = name[1]
            self._do_xobject(name, resources, depth)
        elif op == "BI":
            self._inline_image(lex)
        elif op == "sh":
            pop(1)
        # unknown operators: operands already consumed lazily by pops of
        # later ops is a risk — clear anything obviously stale
        elif op in ("i", "j", "J", "M", "ri"):
            pop(1)

    def _read_array(self, lex: Lexer) -> List[Any]:
        out: List[Any] = []
        while True:
            t = lex.next_token()
            if t is None or t == "]":
                return out
            if t == "[":
                out.append(self._read_array(lex))
            elif t == "<<":
                out.append(self._read_dict(lex))
            elif isinstance(t, tuple) and t[0] == "name":
                out.append(t[1])
            elif not isinstance(t, (str, PSKeyword)):
                out.append(t)

    def _read_dict(self, lex: Lexer) -> Dict[str, Any]:
        d: Dict[str, Any] = {}
        while True:
            t = lex.next_token()
            if t is None or t == ">>":
                return d
            if isinstance(t, tuple) and t[0] == "name":
                key = t[1]
                v = lex.next_token()
                if v == "[":
                    d[key] = self._read_array(lex)
                elif v == "<<":
                    d[key] = self._read_dict(lex)
                elif isinstance(v, tuple) and v[0] == "name":
                    d[key] = v[1]
                elif isinstance(v, PSKeyword):
                    d[key] = {"true": True, "false": False}.get(v.name)
                else:
                    d[key] = v

    def _path(self) -> List[tuple]:
        if not hasattr(self, "curpath"):
            self.curpath = []
        return self.curpath

    def _do_xobject(self, name: str, resources: dict, depth: int) -> None:
        xobjs = self.doc.resolve(resources.get("XObject")) or {}
        xobj = self.doc.resolve(xobjs.get(name))
        if not isinstance(xobj, PDFStream):
            return
        subtype = self.doc.resolve(xobj.dict.get("Subtype"))
        if subtype == "Image":
            self._emit_image(name, xobj)
        elif subtype == "Form" and depth < self.max_form_depth:
            matrix = self.doc.resolve(xobj.dict.get("Matrix"))
            m: Matrix = MATRIX_IDENTITY
            if isinstance(matrix, list) and len(matrix) == 6:
                m = tuple(_num(self.doc.resolve(v)) for v in matrix)  # type: ignore
            xres = self.doc.resolve(xobj.dict.get("Resources")) or resources
            saved_gs = self.gs
            saved_ts = self.ts
            saved_stack = self.gstack
            saved_path = getattr(self, "curpath", [])
            self.gs = saved_gs.copy()
            self.gs.ctm = mult_matrix(m, saved_gs.ctm)
            self.ts = _TState()
            self.gstack = []
            self.curpath = []
            self._form_depth += 1
            try:
                self.execute(self.doc.stream_data(xobj), xres, depth + 1)
            finally:
                self._form_depth -= 1
                self.gs = saved_gs
                self.ts = saved_ts
                self.gstack = saved_stack
                self.curpath = saved_path

    def _emit_image(self, name: str, xobj: Optional[PDFStream]) -> None:
        ctm = self.gs.ctm
        corners = [
            apply_matrix_pt(ctm, p)
            for p in ((0, 0), (1, 0), (0, 1), (1, 1))
        ]
        xs = [p[0] for p in corners]
        ys = [p[1] for p in corners]
        top = self._top(max(ys))
        srcsize = None
        if xobj is not None:
            w = self.doc.resolve(xobj.dict.get("Width"))
            h = self.doc.resolve(xobj.dict.get("Height"))
            if isinstance(w, (int, float)) and isinstance(h, (int, float)):
                srcsize = (int(w), int(h))
        self.images.append(
            {
                "x0": min(xs),
                "x1": max(xs),
                "top": top,
                "bottom": self._top(min(ys)),
                "doctop": self.initial_doctop + top,
                "media_ref": name,
                "srcsize": srcsize,
                "mcid": self.cur_mcid,
                "tag": self.cur_tag,
            }
        )

    def _inline_image(self, lex: Lexer) -> None:
        """BI ... ID <binary> EI — parse params, skip data, emit image."""
        params: Dict[str, Any] = {}
        while True:
            t = lex.next_token()
            if t is None:
                return
            if isinstance(t, PSKeyword) and t.name == "ID":
                break
            if isinstance(t, tuple) and t[0] == "name":
                v = lex.next_token()
                if isinstance(v, tuple) and v[0] == "name":
                    v = v[1]
                params[t[1]] = v
        data = lex.data
        pos = lex.pos + 1 if lex.pos < len(data) and data[lex.pos : lex.pos + 1] in (b" ", b"\n", b"\r") else lex.pos
        end = data.find(b"EI", pos)
        lex.pos = (end + 2) if end >= 0 else len(data)
        self._emit_image("inline", None)
