"""Per-page word assembly — vectorized port of the reference's
x/y-tolerance char-clustering algorithm (reference utils/text.py:423-688).

Input: a "char table" dict of equal-length arrays for ONE page:
``text`` (object), ``x0 x1 top bottom doctop size`` (float64),
``upright`` (bool), plus any ``extra_attrs`` columns.

Output: a word table dict plus char provenance (``char_indices`` /
``char_offsets``) so downstream textmap/search stages can map every emitted
glyph back to its source char row.

The scan is fully vectorized per (upright, extra_attrs) run: line ids come
from the clustering kernel, chars are lexsorted by (line, reading order),
and word-break flags are computed from shifted arrays. The reference's
word-break gap is measured from the previous char *in the current word*
(text.py:626); that equals the previous kept char in line order, because any
intervening dropped blank or punctuation split forces a break anyway — so a
shifted-array comparison reproduces the scalar semantics exactly, including
the tolerance-ratio variants (text.py:629-630) which scale by the previous
char's ``size``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import WordConfig
from .clustering import cluster_ids

CharTable = Dict[str, np.ndarray]

_EMPTY_WORD_KEYS = (
    "x0", "x1", "top", "bottom", "doctop", "width", "height",
)


def empty_words(cfg: WordConfig) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {k: np.empty(0, dtype=np.float64) for k in _EMPTY_WORD_KEYS}
    out["text"] = np.empty(0, dtype=object)
    out["upright"] = np.empty(0, dtype=bool)
    out["direction"] = np.empty(0, dtype=object)
    for a in cfg.extra_attrs:
        out[a] = np.empty(0, dtype=object)
    out["char_indices"] = np.empty(0, dtype=np.int64)
    out["char_offsets"] = np.zeros(1, dtype=np.int64)
    return out


def _line_cluster_values(chars: CharTable, idx: np.ndarray, line_dir: str) -> np.ndarray:
    """get_line_cluster_key (text.py:45-51) as an array."""
    if line_dir == "ttb":
        return chars["top"][idx]
    if line_dir == "btt":
        return -chars["bottom"][idx]
    if line_dir == "ltr":
        return chars["x0"][idx]
    return -chars["x1"][idx]  # rtl


def _char_sort_keys(chars: CharTable, idx: np.ndarray, char_dir: str):
    """get_char_sort_key (text.py:54-60): (primary, secondary)."""
    if char_dir == "ttb":
        return chars["top"][idx], chars["bottom"][idx]
    if char_dir == "btt":
        return -chars["bottom"][idx], -chars["top"][idx]
    if char_dir == "ltr":
        return chars["x0"][idx], chars["x0"][idx]
    return -chars["x1"][idx], -chars["x0"][idx]  # rtl


def _gap_breaks(
    chars: CharTable,
    sorted_idx: np.ndarray,
    direction: str,
    cfg: WordConfig,
) -> np.ndarray:
    """char_begins_new_word (text.py:516-591) between each char and its
    predecessor in sorted order. Element 0 is False (no predecessor)."""
    n = sorted_idx.shape[0]
    if n == 0:
        return np.empty(0, dtype=bool)
    x0 = chars["x0"][sorted_idx]
    x1 = chars["x1"][sorted_idx]
    top = chars["top"][sorted_idx]
    bottom = chars["bottom"][sorted_idx]

    if direction in ("ltr", "rtl"):
        intra_tol_name, inter_tol_name = "x", "y"
        ay_all, cy_all = top, top
        if direction == "ltr":
            ax_all, bx_all, cx_all = x0, x1, x0
        else:
            ax_all, bx_all, cx_all = -x1, -x0, -x1
    else:
        intra_tol_name, inter_tol_name = "y", "x"
        ay_all, cy_all = x0, x0
        if direction == "ttb":
            ax_all, bx_all, cx_all = top, bottom, top
        else:
            ax_all, bx_all, cx_all = -bottom, -top, -bottom

    # tolerances, possibly scaled by the previous char's size
    if cfg.x_tolerance_ratio is None:
        xt = np.float64(cfg.x_tolerance)
        prev_xt = xt
    else:
        prev_xt = cfg.x_tolerance_ratio * chars["size"][sorted_idx][:-1]
    if cfg.y_tolerance_ratio is None:
        prev_yt = np.float64(cfg.y_tolerance)
    else:
        prev_yt = cfg.y_tolerance_ratio * chars["size"][sorted_idx][:-1]

    # In the reference, x is the intraline tolerance and y the interline
    # tolerance *after* the upright swap (text.py:557-583).
    intra = prev_xt if intra_tol_name == "x" else prev_yt
    inter = prev_yt if inter_tol_name == "y" else prev_xt

    breaks = np.zeros(n, dtype=bool)
    if n > 1:
        ax, bx, cx = ax_all[:-1], bx_all[:-1], cx_all[1:]
        ay, cy = ay_all[:-1], cy_all[1:]
        breaks[1:] = (cx < ax) | (cx > bx + intra) | (cy > ay + inter)
    return breaks


# lookup tables over the BMP prefix that contains every isspace codepoint
# (the last is U+3000); codepoints past the table are classified scalar-wise
_LUT_SIZE = 0x3001
_SPACE_LUT: Optional[np.ndarray] = None
_PUNCT_LUTS: Dict[str, np.ndarray] = {}


def _space_lut() -> np.ndarray:
    global _SPACE_LUT
    if _SPACE_LUT is None:
        _SPACE_LUT = np.zeros(_LUT_SIZE, dtype=bool)
        for c in range(_LUT_SIZE):
            if chr(c).isspace():
                _SPACE_LUT[c] = True
    return _SPACE_LUT


def _punct_lut(punct: str) -> np.ndarray:
    lut = _PUNCT_LUTS.get(punct)
    if lut is None:
        lut = np.zeros(_LUT_SIZE, dtype=bool)
        for ch in punct:
            if ord(ch) < _LUT_SIZE:
                lut[ord(ch)] = True
        _PUNCT_LUTS[punct] = lut
    return lut


def _classify_chars(
    texts: np.ndarray, n: int, punct: str
) -> Tuple[np.ndarray, np.ndarray, Optional[str]]:
    """Vectorized isspace / in-punct-set masks: one C-level join + utf-32
    decode + table gather instead of a per-char Python loop (the hot path
    at ~450k glyphs per 512-doc batch). Falls back when a char cell holds a
    multi-glyph string (e.g. pdfminer '(cid:x)' texts). Also returns the
    joined page text (None in the fallback) so callers can cheaply probe
    for ligatures."""
    joined = "".join(texts.tolist())
    # fast path requires every cell to be EXACTLY one codepoint: total
    # length n plus no empty cells implies it (an empty cell would force
    # some other cell to hold >=2 codepoints and silently misalign masks)
    if len(joined) == n and not (texts == "").any():
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        small = codes < _LUT_SIZE
        idx = np.where(small, codes, 0)
        is_space = _space_lut()[idx] & small
        if punct:
            is_punct = _punct_lut(punct)[idx] & small
            big_punct = set(ord(c) for c in punct if ord(c) >= _LUT_SIZE)
            if big_punct and not small.all():
                for i in np.flatnonzero(~small):
                    is_punct[i] = codes[i] in big_punct
        else:
            is_punct = np.zeros(n, dtype=bool)
        return is_space, is_punct, joined
    is_space = np.fromiter((t.isspace() for t in texts), dtype=bool, count=n)
    if punct:
        is_punct = np.fromiter((t in punct for t in texts), dtype=bool, count=n)
    else:
        is_punct = np.zeros(n, dtype=bool)
    return is_space, is_punct, None


def extract_words_page(chars: CharTable, cfg: WordConfig) -> Dict[str, np.ndarray]:
    """chars (one page) -> words with provenance. Word order matches the
    reference generator order: input runs, then line position, then reading
    order within the line (text.py:664-678)."""
    n = chars["text"].shape[0] if isinstance(chars["text"], np.ndarray) else len(chars["text"])
    if n == 0:
        return empty_words(cfg)

    texts = np.asarray(chars["text"], dtype=object)
    upright = np.asarray(chars["upright"], dtype=bool)

    # --- consecutive-run grouping by (upright, *extra_attrs) (text.py:667-668)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for col in (upright, *(_attr_column(chars[a], n) for a in cfg.extra_attrs)):
        change[1:] |= col[1:] != col[:-1]
    run_starts = np.flatnonzero(change)
    run_ends = np.append(run_starts[1:], n)

    punct = cfg.punct_set
    expansions = cfg.expansions
    is_space, is_punct, joined_page = _classify_chars(texts, n, punct)
    if expansions and joined_page is not None:
        # skip the per-char expansion lookup entirely on ligature-free
        # pages (7 C-level substring probes over the page text)
        if not any(ch in joined_page for ch in expansions):
            expansions = {}

    words_parts: List[Dict[str, np.ndarray]] = []

    for rs, re_ in zip(run_starts, run_ends):
        idx = np.arange(rs, re_)
        run_upright = bool(upright[rs])
        # the stored word direction is always get_char_dir(upright)
        # (text.py:478-494), even under use_text_flow where the *break*
        # tests run with the unrotated char_dir (text.py:670-674).
        word_direction = cfg.char_dir if run_upright else cfg.resolved_char_dir_rotated
        if cfg.use_text_flow:
            break_direction = cfg.char_dir
            sorted_idx = idx
            line_of = np.zeros(idx.shape[0], dtype=np.int64)
        else:
            line_dir = cfg.line_dir if run_upright else cfg.resolved_line_dir_rotated
            break_direction = word_direction
            line_tol = cfg.y_tolerance if line_dir in ("ttb", "btt") else cfg.x_tolerance
            lids = cluster_ids(_line_cluster_values(chars, idx, line_dir), line_tol)
            primary, secondary = _char_sort_keys(chars, idx, break_direction)
            order = np.lexsort((secondary, primary, lids))
            sorted_idx = idx[order]
            line_of = lids[order]

        part = _assemble_words(
            chars, texts, sorted_idx, line_of, break_direction, word_direction,
            run_upright, is_space, is_punct, expansions, cfg,
        )
        if part is not None:
            words_parts.append(part)

    if not words_parts:
        return empty_words(cfg)
    out: Dict[str, np.ndarray] = {}
    for k in words_parts[0]:
        if k == "char_offsets":
            # re-base offsets when concatenating
            offs = [words_parts[0][k]]
            base = offs[0][-1]
            for p in words_parts[1:]:
                offs.append(p[k][1:] + base)
                base += p[k][-1]
            out[k] = np.concatenate(offs)
        else:
            out[k] = np.concatenate([p[k] for p in words_parts])
    return out


def _assemble_words(
    chars: CharTable,
    texts: np.ndarray,
    sorted_idx: np.ndarray,
    line_of: np.ndarray,
    direction: str,
    word_direction: str,
    run_upright: bool,
    is_space_all: np.ndarray,
    is_punct_all: np.ndarray,
    expansions: Dict[str, str],
    cfg: WordConfig,
):
    space = is_space_all[sorted_idx]
    punct_f = is_punct_all[sorted_idx]
    drop = space & (not cfg.keep_blank_chars)
    kept_pos = np.flatnonzero(~drop)
    if kept_pos.shape[0] == 0:
        return None

    gap_break = _gap_breaks(chars, sorted_idx, direction, cfg)

    kp = kept_pos
    new_word = np.ones(kp.shape[0], dtype=bool)
    if kp.shape[0] > 1:
        prev_kp = kp[:-1]
        cur_kp = kp[1:]
        same_line = line_of[cur_kp] == line_of[prev_kp]
        adjacent = cur_kp == prev_kp + 1  # no dropped blank in between
        prev_punct = punct_f[prev_kp]
        cur_punct = punct_f[cur_kp]
        # gap break applies only when the predecessor in sort order is the
        # previous kept char (adjacent); otherwise the dropped blank already
        # forced a break.
        g = gap_break[cur_kp]
        new_word[1:] = (~same_line) | (~adjacent) | prev_punct | cur_punct | (adjacent & g)

    word_ids = np.cumsum(new_word) - 1
    starts = np.flatnonzero(new_word)
    ends = np.append(starts[1:], kp.shape[0])

    sel = sorted_idx[kp]
    x0 = np.minimum.reduceat(chars["x0"][sel], starts)
    x1 = np.maximum.reduceat(chars["x1"][sel], starts)
    top = np.minimum.reduceat(chars["top"][sel], starts)
    bottom = np.maximum.reduceat(chars["bottom"][sel], starts)
    first = sel[starts]
    doctop = top + (chars["doctop"][first] - chars["top"][first])

    kept_texts = texts[sel]
    if expansions:
        kept_texts = np.array(
            [expansions.get(t, t) for t in kept_texts], dtype=object
        )
    # per-word join stays a Python loop on purpose: an Arrow
    # binary_join over a list view was measured ~1.6x SLOWER here (the
    # np->Arrow conversion per call dominates at this granularity)
    joined = np.empty(starts.shape[0], dtype=object)
    kt = kept_texts.tolist()
    for w, (s, e) in enumerate(zip(starts, ends)):
        joined[w] = "".join(kt[s:e])

    nwords = starts.shape[0]
    out: Dict[str, np.ndarray] = {
        "text": joined,
        "x0": x0,
        "x1": x1,
        "top": top,
        "bottom": bottom,
        "doctop": doctop,
        "width": x1 - x0,
        "height": bottom - top,
        "upright": np.full(nwords, run_upright, dtype=bool),
        "direction": np.full(nwords, word_direction, dtype=object),
        "char_indices": sel.astype(np.int64),
        "char_offsets": np.concatenate([starts, [kp.shape[0]]]).astype(np.int64),
    }
    for a in cfg.extra_attrs:
        out[a] = _attr_column(chars[a], len(chars[a]))[first]
    _ = word_ids  # word ids are implicit in offsets
    return out


def _attr_column(vals, n: int) -> np.ndarray:
    """1-D object array of attribute values. Sequence-valued attributes
    (e.g. color tuples) would auto-broadcast to a 2-D array under
    ``np.asarray``; keep each value an opaque scalar instead."""
    arr = np.asarray(vals, dtype=object)
    if arr.ndim > 1:
        flat = np.empty(len(vals), dtype=object)
        flat[:] = [tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v for v in vals]
        return flat
    return arr
