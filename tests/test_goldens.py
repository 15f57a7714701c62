"""Byte-for-byte golden-output tests (the reference's
tests/comparisons/scotus-transcript-p1.txt pattern, test_utils.py:357-384):
frozen expected strings for layout, default, and simple text extraction on
a fixed synthetic page. Any kernel change that shifts spacing, newline
imputation, ligature expansion, or ordering fails these."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from synth_chars import make_chars, to_arrays  # noqa: E402

from pdfplumber_ray.functions.textmap import (  # noqa: E402
    extract_text_page,
    extract_text_simple_page,
)

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _golden(name: str) -> str:
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return f.read()


def _chars():
    return to_arrays(make_chars(seed=123, n_lines=8, words_per_line=6, rotated_lines=0))


def test_layout_text_golden():
    assert extract_text_page(_chars(), layout=True) == _golden("layout_page_seed123.txt")


def test_default_text_golden():
    assert extract_text_page(_chars()) == _golden("text_page_seed123.txt")


def test_simple_text_golden():
    assert extract_text_simple_page(_chars()) == _golden("simple_page_seed123.txt")
