"""Deterministic span -> page-geometry layout (the synthetic decode kernel).

Plays the role of the reference's pdfminer interpreter step
(reference page.py:265-277 ``Page.layout`` + page.py:335-400
``process_object``): input-document spans are laid onto monospace pages,
producing the typed char/rect/image object tables the extraction kernels
consume. The layout is constructed so extraction *inverts* it exactly:

* every text/heading span starts a new block; blocks are separated by one
  blank line, so successive in-block lines are ``line_height`` apart and
  block boundaries are > ``para_gap_threshold`` apart;
* a maximal run of ``table_cell`` spans becomes a lattice grid of rects
  (``table_cols`` columns); runs taller than a page split at row
  boundaries into per-page grids — the row-major cell sequence is
  preserved across the split;
* ``media_ref`` spans become image objects carrying their ref;
* blocks never split across pages, so per-page extraction is complete.

Output pages are struct-of-numpy-array tables (zero-copy into the word /
table kernels), one dict per page.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..config import SynthLayoutConfig

PageDict = Dict[str, object]


class LayoutError(ValueError):
    """Raised when a span cannot be laid out (quarantined by the stage)."""


def wrap_words(text: str, max_chars: int) -> List[str]:
    """Greedy word wrap; a single over-long word gets its own line."""
    lines: List[str] = []
    cur = ""
    for w in text.split(" "):
        if not cur:
            cur = w
        elif len(cur) + 1 + len(w) <= max_chars:
            cur = cur + " " + w
        else:
            lines.append(cur)
            cur = w
    if cur:
        lines.append(cur)
    return lines or [""]


class _PageBuilder:
    """Accumulates glyphs/rects in flat Python lists; numpy arrays are
    materialized once per page in ``finish`` (per-line array allocation was
    the layout hot spot)."""

    def __init__(self, page_number: int, cfg: SynthLayoutConfig):
        self.page_number = page_number
        self.cfg = cfg
        self.initial_doctop = (page_number - 1) * cfg.page_height
        # upright text: one record per LINE, expanded vectorized in finish()
        # (per-glyph list appends were the layout hot spot)
        self.lines_rec: List[tuple] = []  # (text, x_left, top, size, font, mcid, tag)
        # rotated glyphs are rare; kept per-char
        self.g_text: List[str] = []
        self.g_k: List[int] = []      # char index within its line
        self.g_xleft: List[float] = []
        self.g_top: List[float] = []
        self.g_size: List[float] = []
        self.g_font: List[str] = []
        self.g_mcid: List[int] = []
        self.g_tag: List[str] = []
        self.r_x0: List[float] = []
        self.r_x1: List[float] = []
        self.r_top: List[float] = []
        self.r_bottom: List[float] = []
        self.r_mcid: List[int] = []
        self.r_tag: List[str] = []
        self.l_x0: List[float] = []
        self.l_x1: List[float] = []
        self.l_top: List[float] = []
        self.images: List[Dict[str, object]] = []
        self.annots: List[Dict[str, object]] = []
        self.curves: List[Dict[str, object]] = []

    def emit_line_chars(
        self, line: str, line_top: float, size: float, fontname: str,
        x_left: float, mcid: int = -1, tag: str = "P",
    ) -> None:
        if line:
            self.lines_rec.append((line, x_left, line_top, size, fontname, mcid, tag))

    def emit_rotated_chars(
        self, text: str, block_top: float, size: float, fontname: str,
        x_left: float, advance: float, mcid: int = -1, tag: str = "H",
    ) -> None:
        """Vertical (rotated, upright=False) char run: glyphs stack
        top-to-bottom at a fixed x; spaces advance the cursor but emit no
        glyph — the rotated word-break semantics of the reference's
        char_dir_rotated path (utils/text.py:55-75)."""
        for j, ch in enumerate(text):
            if ch == " ":
                continue
            self.g_text.append(ch)
            self.g_k.append(0)
            self.g_xleft.append(x_left)
            self.g_top.append(block_top + j * advance)
            self.g_size.append(size)
            self.g_font.append(fontname)
            self.g_mcid.append(mcid)
            self.g_tag.append(tag)

    def emit_rect(
        self, x0: float, top: float, x1: float, bottom: float,
        mcid: int = -1, tag: str = "TD",
    ) -> None:
        self.r_x0.append(x0)
        self.r_x1.append(x1)
        self.r_top.append(top)
        self.r_bottom.append(bottom)
        self.r_mcid.append(mcid)
        self.r_tag.append(tag)

    def emit_line_obj(self, x0: float, x1: float, top: float) -> None:
        self.l_x0.append(x0)
        self.l_x1.append(x1)
        self.l_top.append(top)

    def emit_image(
        self, x0: float, top: float, x1: float, bottom: float, ref: str,
        mcid: int = -1,
    ) -> None:
        self.images.append(
            {"x0": x0, "top": top, "x1": x1, "bottom": bottom,
             "media_ref": ref, "mcid": mcid, "tag": "Figure"}
        )

    def emit_curve(self, pts: List[tuple]) -> None:
        """Curve object from ordered (x, top) points (reference
        page.py:386-393). Diagonal point-pair segments are dropped by the
        table stage's orientation filter, so decorative curves never form
        spurious lattice cells."""
        xs = [p[0] for p in pts]
        tops = [p[1] for p in pts]
        top = min(tops)
        self.curves.append(
            {
                "x0": min(xs), "x1": max(xs), "top": top, "bottom": max(tops),
                "doctop": top + self.initial_doctop,
                "pts": [{"x": x, "top": t} for x, t in pts],
                # drawing commands + dash pattern (reference 0.11.0
                # curve["path"] / curve["dash"])
                "path": [
                    {"cmd": "m" if j == 0 else "l", "x": x, "top": t}
                    for j, (x, t) in enumerate(pts)
                ],
                "dash": {"array": [2.0, 1.0], "phase": 0.0},
            }
        )

    def emit_annot(
        self, x0: float, top: float, x1: float, bottom: float,
        uri: str = "", contents: str = "",
    ) -> None:
        """Annotation record (reference page.py:280-319: resolved /Annots
        entries with uri/contents and a top-left-origin bbox). The synthetic
        rule: headings carry a contents annotation, media a uri (link)
        annotation — so hyperlinks = annots with non-empty uri, mirroring
        reference page.py:321-323."""
        self.annots.append(
            {
                "x0": x0, "top": top, "x1": x1, "bottom": bottom,
                "doctop": top + self.initial_doctop,
                "uri": uri, "contents": contents,
            }
        )

    def _expand_lines(self) -> Dict[str, np.ndarray]:
        """Vectorized per-line -> per-glyph expansion for upright text."""
        recs = self.lines_rec
        cfg = self.cfg
        all_text = "".join(r[0] for r in recs)
        glyphs = np.array(list(all_text), dtype=object) if all_text else np.empty(0, object)
        lens = np.fromiter((len(r[0]) for r in recs), dtype=np.int64, count=len(recs))
        line_idx = np.repeat(np.arange(len(recs)), lens)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(recs) else np.empty(0, np.int64)
        k = np.arange(glyphs.shape[0]) - starts[line_idx] if glyphs.shape[0] else np.empty(0, np.int64)
        keep = glyphs != " "
        li = line_idx[keep]
        kk = k[keep]
        xl = np.fromiter((r[1] for r in recs), dtype=np.float64, count=len(recs))[li]
        tp = np.fromiter((r[2] for r in recs), dtype=np.float64, count=len(recs))[li]
        sz = np.fromiter((r[3] for r in recs), dtype=np.float64, count=len(recs))[li]
        fonts = np.array([r[4] for r in recs], dtype=object)[li]
        mcids = np.fromiter((r[5] for r in recs), dtype=np.int32, count=len(recs))[li]
        tags = np.array([r[6] for r in recs], dtype=object)[li]
        x0 = xl + kk * cfg.char_advance
        # per-char text matrix (reference page.py:367-384 stamps pdfminer's
        # 6-tuple; columnar engine stores the six components flat):
        # upright glyphs render with (size, 0, 0, size, x0, y_baseline)
        y_pdf = cfg.page_height - (tp + sz)
        return {
            "text": glyphs[keep],
            "x0": x0,
            "x1": x0 + cfg.char_width,
            "top": tp,
            "bottom": tp + sz,
            "doctop": tp + self.initial_doctop,
            "size": sz,
            "fontname": fonts,
            # upright derived from the matrix exactly as the reference
            # does (layout.py LTChar: 0 < a*d*scaling and b*c <= 0)
            "upright": _upright_from_matrix(sz, np.zeros_like(sz), np.zeros_like(sz), sz),
            "mcid": mcids,
            "tag": tags,
            "mat_a": sz,
            "mat_b": np.zeros_like(sz),
            "mat_c": np.zeros_like(sz),
            "mat_d": sz,
            "mat_e": x0,
            "mat_f": y_pdf,
        }

    def finish(self) -> PageDict:
        cfg = self.cfg
        parts = []
        if self.lines_rec:
            parts.append(self._expand_lines())
        n = len(self.g_text)
        if n:
            x0 = (
                np.asarray(self.g_xleft, dtype=np.float64)
                + np.asarray(self.g_k, dtype=np.float64) * cfg.char_advance
            )
            top = np.asarray(self.g_top, dtype=np.float64)
            size = np.asarray(self.g_size, dtype=np.float64)
            # rotated (90 deg) glyph runs: matrix (0, size, -size, 0, x, y);
            # the reference upright formula then yields a*d = 0 -> False
            zero = np.zeros_like(size)
            y_pdf = cfg.page_height - (top + size)
            parts.append({
                "text": np.asarray(self.g_text, dtype=object),
                "x0": x0,
                "x1": x0 + cfg.char_width,
                "top": top,
                "bottom": top + size,
                "doctop": top + self.initial_doctop,
                "size": size,
                "fontname": np.asarray(self.g_font, dtype=object),
                "upright": _upright_from_matrix(zero, size, -size, zero),
                "mcid": np.asarray(self.g_mcid, dtype=np.int32),
                "tag": np.asarray(self.g_tag, dtype=object),
                "mat_a": zero,
                "mat_b": size,
                "mat_c": -size,
                "mat_d": zero,
                "mat_e": x0,
                "mat_f": y_pdf,
            })
        if len(parts) == 1:
            chars = parts[0]
        elif parts:
            chars = {key: np.concatenate([p[key] for p in parts]) for key in parts[0]}
        else:
            chars = _empty_chars()
        chars["width"] = chars["x1"] - chars["x0"]
        chars["height"] = chars["bottom"] - chars["top"]
        rects = {
            "x0": np.asarray(self.r_x0, dtype=np.float64),
            "x1": np.asarray(self.r_x1, dtype=np.float64),
            "top": np.asarray(self.r_top, dtype=np.float64),
            "bottom": np.asarray(self.r_bottom, dtype=np.float64),
            "mcid": np.asarray(self.r_mcid, dtype=np.int32),
            "tag": np.asarray(self.r_tag, dtype=object),
        }
        rects["doctop"] = rects["top"] + self.initial_doctop
        n_l = len(self.l_x0)
        lines = {
            "x0": np.asarray(self.l_x0, dtype=np.float64),
            "x1": np.asarray(self.l_x1, dtype=np.float64),
            "top": np.asarray(self.l_top, dtype=np.float64),
            "mcid": np.full(n_l, -1, dtype=np.int32),
            "tag": np.full(n_l, "Artifact", dtype=object),
        }
        lines["bottom"] = lines["top"].copy()
        lines["doctop"] = lines["top"] + self.initial_doctop
        return {
            "page_number": self.page_number,
            "page_width": cfg.page_width,
            "page_height": cfg.page_height,
            "initial_doctop": self.initial_doctop,
            "chars": chars,
            "rects": rects,
            "lines": lines,
            "images": self.images,
            "annots": self.annots,
            "curves": self.curves,
        }


def _upright_from_matrix(
    a: np.ndarray, b: np.ndarray, c: np.ndarray, d: np.ndarray
) -> np.ndarray:
    """Reference LTChar upright rule: ``0 < a*d*scaling and b*c <= 0``
    (pdfminer layout model; scaling is positive here)."""
    return (a * d > 0) & (b * c <= 0)


def _empty_chars() -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {
        k: np.empty(0, dtype=np.float64)
        for k in (
            "x0", "x1", "top", "bottom", "doctop", "size",
            "mat_a", "mat_b", "mat_c", "mat_d", "mat_e", "mat_f",
        )
    }
    out["text"] = np.empty(0, dtype=object)
    out["fontname"] = np.empty(0, dtype=object)
    out["upright"] = np.empty(0, dtype=bool)
    out["mcid"] = np.empty(0, dtype=np.int32)
    out["tag"] = np.empty(0, dtype=object)
    return out


def layout_doc(spans: Sequence[Dict], cfg: Optional[SynthLayoutConfig] = None) -> List[PageDict]:
    """Lay a document's span sequence (list of span dicts) onto pages."""
    return layout_doc_fields(
        [s["kind"] for s in spans],
        [s["text"] for s in spans],
        [s["media_ref"] for s in spans],
        cfg,
    )


def layout_doc_fields(
    kinds: Sequence[str],
    texts: Sequence[str],
    medias: Sequence[str],
    cfg: Optional[SynthLayoutConfig] = None,
) -> List[PageDict]:
    """Array-of-fields layout entry (the hot path): the decode stage slices
    these directly out of the Arrow span struct children, so no per-span
    Python dicts are ever materialized. ``offset`` is not consumed — the
    layout re-derives geometry from text alone."""
    cfg = cfg or SynthLayoutConfig()
    pages: List[PageDict] = []
    builder = _PageBuilder(1, cfg)
    li = 0  # next free line slot on the current page

    def line_top(slot: int) -> float:
        return cfg.margin_top + slot * cfg.line_height

    def new_page() -> None:
        nonlocal builder, li
        pages.append(builder.finish())
        builder = _PageBuilder(builder.page_number + 1, cfg)
        li = 0

    def ensure_lines(n: int) -> None:
        nonlocal li
        if n > cfg.lines_per_page:
            raise LayoutError(
                f"block of {n} lines exceeds page capacity {cfg.lines_per_page}"
            )
        if li + n > cfg.lines_per_page and li > 0:
            new_page()

    def emit_text_block(text: str, heading: bool, mcid: int = -1) -> None:
        nonlocal li
        size = cfg.heading_size if heading else cfg.body_size
        font = cfg.heading_font if heading else cfg.body_font
        if heading and cfg.rotate_short_headings and len(text) <= 24 and len(text) % 2 == 0:
            # deterministic content rule; extraction never needs it — it
            # reconstructs the block from upright=False geometry alone
            adv = cfg.rotated_advance
            import math as _math
            n_slots = max(1, _math.ceil((len(text) * adv + size) / cfg.line_height))
            ensure_lines(n_slots)
            builder.emit_rotated_chars(
                text, line_top(li), size, font, cfg.margin_left, adv, mcid
            )
            builder.emit_annot(
                cfg.margin_left, line_top(li), cfg.margin_left + cfg.char_width,
                line_top(li) + len(text) * adv, contents=text,
            )
            li += n_slots + 1
            return
        tag = "H" if heading else "P"
        lines = wrap_words(text, cfg.max_line_chars)
        ensure_lines(len(lines))
        if heading:
            block_w = max(len(ln) for ln in lines) * cfg.char_advance
            builder.emit_annot(
                cfg.margin_left, line_top(li), cfg.margin_left + block_w,
                line_top(li + len(lines) - 1) + size, contents=text,
            )
        first_w = len(lines[0]) * cfg.char_advance
        for line in lines:
            builder.emit_line_chars(
                line, line_top(li), size, font, cfg.margin_left, mcid, tag
            )
            li += 1
        if heading and first_w > 0:
            # decorative underline: a zero-height line object in the blank
            # gap; carried through the object model (reference 'line'
            # objects) but invisible to text/tables extraction
            builder.emit_line_obj(
                cfg.margin_left, cfg.margin_left + first_w, line_top(li - 1) + size + 1.0
            )
        li += 1  # blank separator line -> paragraph gap

    def emit_table_run(cells: List[str], mcids: List[int]) -> None:
        nonlocal li
        ncols = max(2, min(cfg.table_cols, len(cells)))
        width_chars = max(len(c) for c in cells) + 2 * cfg.cell_pad_chars
        col_w = width_chars * cfg.char_advance
        cell_h = cfg.cell_height_lines * cfg.line_height
        rows_per_page = max(1, cfg.lines_per_page // cfg.cell_height_lines - 1)
        i = 0
        while i < len(cells):
            chunk = cells[i : i + rows_per_page * ncols]
            chunk_mcids = mcids[i : i + rows_per_page * ncols]
            i += len(chunk)
            nrows = math.ceil(len(chunk) / ncols)
            ensure_lines(nrows * cfg.cell_height_lines)
            grid_top = line_top(li)
            for j, cell_text in enumerate(chunk):
                r, c = divmod(j, ncols)
                cx0 = cfg.margin_left + c * col_w
                ctop = grid_top + r * cell_h
                builder.emit_rect(
                    cx0, ctop, cx0 + col_w, ctop + cell_h, chunk_mcids[j], "TD"
                )
                pad = cfg.cell_pad_chars * cfg.char_advance
                text_top = ctop + (cell_h - cfg.body_size) / 2.0
                builder.emit_line_chars(
                    cell_text, text_top, cfg.body_size, cfg.body_font,
                    cx0 + pad, chunk_mcids[j], "TD",
                )
            li += nrows * cfg.cell_height_lines + 1

    def emit_media(ref: str, mcid: int = -1) -> None:
        nonlocal li
        ensure_lines(cfg.media_height_lines)
        top = line_top(li)
        bottom = top + cfg.media_height_lines * cfg.line_height
        builder.emit_image(
            cfg.margin_left, top, cfg.margin_left + cfg.media_width, bottom, ref,
            mcid,
        )
        builder.emit_annot(
            cfg.margin_left, top, cfg.margin_left + cfg.media_width, bottom, uri=ref
        )
        # decorative zigzag under the image: a real curve object (5 pts, 4
        # diagonal segments)
        w = cfg.media_width
        builder.emit_curve(
            [
                (cfg.margin_left, bottom + 2.0),
                (cfg.margin_left + w / 4, bottom + 4.0),
                (cfg.margin_left + w / 2, bottom + 2.0),
                (cfg.margin_left + 3 * w / 4, bottom + 4.0),
                (cfg.margin_left + w, bottom + 2.0),
            ]
        )
        li += cfg.media_height_lines + 1

    i = 0
    n = len(kinds)
    while i < n:
        kind = kinds[i]
        if kind == "table_cell":
            run = [texts[i]]
            run_mcids = [i]
            while i + 1 < n and kinds[i + 1] == "table_cell":
                i += 1
                run.append(texts[i])
                run_mcids.append(i)
            emit_table_run(run, run_mcids)
        elif kind == "media_ref":
            emit_media(medias[i], i)
        elif kind == "heading":
            emit_text_block(texts[i], heading=True, mcid=i)
        else:  # text (default)
            emit_text_block(texts[i], heading=False, mcid=i)
        i += 1

    pages.append(builder.finish())
    return pages
