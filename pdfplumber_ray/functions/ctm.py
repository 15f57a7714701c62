"""Vectorized CTM (current transformation matrix) decomposition.

Reference ctm.py:8-38; PDF Reference 6th Ed. §4.2.2. Operates on six
parallel arrays (a, b, c, d, e, f) and returns derived columns.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def decompose_ctm(
    a: np.ndarray, b: np.ndarray, c: np.ndarray, d: np.ndarray,
    e: np.ndarray, f: np.ndarray,
) -> Dict[str, np.ndarray]:
    return {
        "scale_x": np.sqrt(a * a + b * b),
        "scale_y": np.sqrt(c * c + d * d),
        "skew_x": np.degrees(np.arctan2(d, c)) - 90.0,
        "skew_y": np.degrees(np.arctan2(b, a)),
        "translation_x": np.asarray(e, dtype=np.float64),
        "translation_y": np.asarray(f, dtype=np.float64),
    }
