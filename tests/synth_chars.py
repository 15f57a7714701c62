"""Deterministic synthetic char tables used by kernel parity tests."""

from __future__ import annotations

from typing import Dict, List

import numpy as np

WORDS = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "line", "sort", "window", "query",
    "ﬁle", "ﬂow", "a.b,c", "x;y:z", "(ok)", "end.",
]


def make_chars(
    seed: int = 42,
    n_lines: int = 6,
    words_per_line: int = 5,
    rotated_lines: int = 1,
    jitter: float = 0.0,
    blanks: bool = True,
    page_offset: float = 0.0,
) -> List[Dict]:
    """Monospace page of char dicts: lines at top=72+i*13, chars advance
    7.25 with glyph width 6; single space chars between words when
    ``blanks``; the last ``rotated_lines`` lines are upright=False."""
    rng = np.random.default_rng(seed)
    chars: List[Dict] = []
    for li in range(n_lines):
        top = 72.0 + li * 13.0
        upright = li < (n_lines - rotated_lines)
        x = 72.0
        toks = [WORDS[int(rng.integers(0, len(WORDS)))] for _ in range(words_per_line)]
        line_text = " ".join(toks)
        for ch in line_text:
            jx = float(rng.uniform(-jitter, jitter)) if jitter else 0.0
            jy = float(rng.uniform(-jitter, jitter)) if jitter else 0.0
            size = 10.0 if li % 3 else 12.0
            chars.append(
                {
                    "text": ch,
                    "x0": x + jx,
                    "x1": x + 6.0 + jx,
                    "top": top + jy,
                    "bottom": top + size + jy,
                    "doctop": page_offset + top + jy,
                    "height": size,
                    "width": 6.0,
                    "size": size,
                    "fontname": "SynthMono" if li % 2 else "SynthSerif",
                    "upright": upright,
                }
            )
            if ch == " " and not blanks:
                chars.pop()
            x += 7.25
    return chars


def to_arrays(chars: List[Dict]) -> Dict[str, np.ndarray]:
    if not chars:
        return {
            "text": np.empty(0, dtype=object),
            **{k: np.empty(0, dtype=np.float64)
               for k in ("x0", "x1", "top", "bottom", "doctop", "size", "height", "width")},
            "upright": np.empty(0, dtype=bool),
            "fontname": np.empty(0, dtype=object),
        }
    out: Dict[str, np.ndarray] = {}
    for k in ("x0", "x1", "top", "bottom", "doctop", "size", "height", "width"):
        out[k] = np.array([c[k] for c in chars], dtype=np.float64)
    out["text"] = np.array([c["text"] for c in chars], dtype=object)
    out["fontname"] = np.array([c["fontname"] for c in chars], dtype=object)
    out["upright"] = np.array([c["upright"] for c in chars], dtype=bool)
    return out
