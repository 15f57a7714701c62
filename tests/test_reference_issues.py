"""Mirrors of the reference's issue regressions (reference
tests/test_issues.py) that pin concrete values — run against this
engine's kernels over the same PDFs."""

import os
import re

import numpy as np
import pytest

from pdfplumber_ray.config import TableConfig, WordConfig
from pdfplumber_ray.functions.textmap import extract_text_page
from pdfplumber_ray.functions.words import extract_words_page
from pdfplumber_ray.pdfio.document import PDFDocument
from pdfplumber_ray.pdfio.fonts import fix_fontname_bytes
from pdfplumber_ray.pdfio.interp import PageInterpreter
from pdfplumber_ray.pdfio.reader import decode_pdf_doc

REF = "/root/reference/tests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus not available"
)


def _interp(pdf_name: str, page_index: int = 0):
    doc = PDFDocument(open(f"{REF}/pdfs/{pdf_name}", "rb").read())
    it = PageInterpreter(doc, doc.pages()[page_index])
    it.run()
    return doc, it


def _char_table(chars):
    return {
        "text": np.array([c["text"] for c in chars], dtype=object),
        "x0": np.array([c["x0"] for c in chars]),
        "x1": np.array([c["x1"] for c in chars]),
        "top": np.array([c["top"] for c in chars]),
        "bottom": np.array([c["bottom"] for c in chars]),
        "doctop": np.array([c["doctop"] for c in chars]),
        "size": np.array([c["size"] for c in chars]),
        "upright": np.array([c["upright"] for c in chars]),
        "fontname": np.array([c["fontname"] for c in chars], dtype=object),
    }


def test_pr_88_word_count():
    """Reference test_issues.py:117-123: 25 words."""
    _, it = _interp("pr-88-example.pdf")
    words = extract_words_page(_char_table(it.chars), WordConfig())
    assert len(words["text"]) == 25


def test_pr_138_char_count():
    """Reference test_issues.py:137-148: 5140 chars."""
    _, it = _interp("pr-138-example.pdf")
    assert len(it.chars) == 5140


def test_issue_461_and_842_byte_fontnames():
    """Reference test_issues.py:199-222: CP936 byte-encoded font names
    resolve to friendly names; every char fontname is a str."""
    assert fix_fontname_bytes(b"RGJSAP+\xcb\xce\xcc\xe5") == "RGJSAP+SimSun,Regular"
    assert fix_fontname_bytes(b"\xcb\xce\xcc\xe5") == "SimSun,Regular"

    _, it = _interp("issue-461-example.pdf")
    names = set(c["fontname"] for c in it.chars)
    assert all(isinstance(n, str) for n in names)
    assert "SimSun,Regular" in names

    _, it = _interp("issue-842-example.pdf")
    names = set(c["fontname"] for c in it.chars)
    assert all(isinstance(n, str) for n in names)
    assert {"DTLNCR+SimFang,Regular", "KXAQYK+SimHei,Regular",
            "RGJSAP+SimSun,Regular"} <= names


def test_issue_463_utf16_annot_contents():
    """Reference test_issues.py:224-231: UTF-16 annotation contents
    decode instead of raising."""
    rows, err = decode_pdf_doc(
        "a", open(f"{REF}/pdfs/issue-463-example.pdf", "rb").read()
    )
    assert err is None
    assert rows[0]["annots"][0]["contents"] == "日本語"


def test_issue_598_ligatures():
    """Reference test_issues.py:233-249: ligatures expand by default;
    expand_ligatures=False preserves them."""
    _, it = _interp("issue-598-example.pdf")
    ct = _char_table(it.chars)

    a = extract_text_page(ct)
    assert "fiction" in a and "ﬁction" not in a
    b = extract_text_page(ct, expand_ligatures=False)
    assert "ﬁction" in b and "fiction" not in b

    assert extract_words_page(ct, WordConfig())["text"][53] == "fiction"
    assert (
        extract_words_page(ct, WordConfig(expand_ligatures=False))["text"][53]
        == "ﬁction"
    )


def test_issue_216_no_table_returns_none():
    """Reference test_issues.py:162-170: a crop with no table content
    yields no table instead of crashing."""
    from pdfplumber_ray.functions.geometry import clip_to_bbox
    from pdfplumber_ray.functions.tables import find_tables_page
    from pdfplumber_ray.stages.flatten import page_edge_union

    _, it = _interp("issue-140-example.pdf")
    page = {
        "rects": {
            k: np.array([r[k] for r in it.rects])
            for k in ("x0", "top", "x1", "bottom")
        },
        "lines": None,
        "curves": [],
        "page_width": it.width,
        "page_height": it.height,
    }
    edges = page_edge_union(page)
    clipped, _ = clip_to_bbox(edges, (0.0, 0.0, 1.0, 1.0))
    tables = find_tables_page(clipped, TableConfig(), (0.0, 0.0, 1.0, 1.0))
    assert tables == []


def test_issue_297_integer_metadata():
    """Reference test_issues.py:172-178: integer-typed metadata values
    survive as ints."""
    doc = PDFDocument(open(f"{REF}/pdfs/issue-297-example.pdf", "rb").read())
    assert isinstance(doc.metadata()["Copies"], int)


def test_issue_316_indirect_metadata():
    """Reference test_issues.py:180-188: metadata holding indirect
    object refs resolves recursively with text decoding."""
    doc = PDFDocument(open(f"{REF}/pdfs/issue-316-example.pdf", "rb").read())
    md = doc.metadata()
    assert md["Changes"][0]["CreationDate"] == "D:20061207105020Z00'00'"


def test_issue_683_search_with_ligatures():
    """Reference test_issues.py:251-265: searching a page whose chars
    carry multi-char ligature text must not crash."""
    from pdfplumber_ray.functions.textmap import search_page

    _, it = _interp("issue-71-duplicate-chars-2.pdf")
    hits = search_page(_char_table(it.chars), r"\d+", regex=True)
    assert isinstance(hits, list)


def test_issue_982_use_text_flow():
    """Reference test_issues.py:267-282: use_text_flow orders text and
    words identically. Page.extract_text routes through the textmap
    path (reference page.py:504-505), where flow order is preserved —
    mirrored here via chars_to_textmap_page."""
    from pdfplumber_ray.config import LayoutConfig
    from pdfplumber_ray.functions.textmap import chars_to_textmap_page

    _, it = _interp("issue-982-example.pdf")
    ct = _char_table(it.chars)
    tm, _ = chars_to_textmap_page(
        ct,
        WordConfig(use_text_flow=True),
        LayoutConfig(use_text_flow=True),
    )
    text = re.sub(r"\s+", " ", tm.string)
    words = " ".join(
        extract_words_page(ct, WordConfig(use_text_flow=True))["text"].tolist()
    )
    assert text[0:100] == words[0:100]


def test_dedupe_chars_reference_values():
    """Reference tests/test_dedupe_chars.py: OCR'd CJK doc with doubled
    glyphs — exact coordinates and strings before/after dedupe."""
    from pdfplumber_ray.functions.dedupe import dedupe_chars_mask

    _, it = _interp("issue-71-duplicate-chars.pdf")
    ct = _char_table(it.chars)

    w = extract_words_page(ct, WordConfig())
    assert w["text"][-1] == "名名模模意意义义一一些些有有意意义义一一些些"
    assert round(float(w["x0"][-1]), 3) == 440.143
    assert round(float(w["x1"][-1]), 3) == 534.992
    assert round(float(w["top"][-1]), 3) in (791.849, 794.357)
    assert round(float(w["bottom"][-1]), 3) == 802.961
    assert bool(w["upright"][-1])

    mask = dedupe_chars_mask(ct)
    ct2 = {k: np.asarray(v)[mask] for k, v in ct.items()}
    w2 = extract_words_page(ct2, WordConfig())
    assert w2["text"][-1] == "名模意义一些有意义一些"
    assert round(float(w2["x0"][-1]), 3) == 440.143
    assert round(float(w2["x1"][-1]), 3) == 534.719

    assert (
        extract_text_page(ct).split("\n")[-1]
        == "微微软软 培培训训课课程程：： 名名模模意意义义一一些些有有意意义义一一些些"
    )
    assert (
        extract_text_page(ct2).split("\n")[-1]
        == "微软 培训课程： 名模意义一些有意义一些"
    )

    _, it2 = _interp("issue-71-duplicate-chars-2.pdf")
    ctb = _char_table(it2.chars)
    ctb2 = {k: np.asarray(v)[dedupe_chars_mask(ctb)] for k, v in ctb.items()}
    assert (
        extract_text_page(ctb2, y_tolerance=6).splitlines()[4]
        == "UE 8. Circulation - Métabolismes"
    )


def test_invalid_crops_reference_semantics():
    """Reference test_basics.py:113-141: zero-area, inverted,
    out-of-page, and partially-outside crop boxes raise ValueError;
    strict=False accepts an oversized box."""
    from pdfplumber_ray.functions.geometry import test_proposed_bbox

    page_bbox = (0.0, 0.0, 612.0, 792.0)
    for bad in (
        (0, 0, 0, 0),
        (0, 0, 10000, 10),
        (-10, 0, 10, 10),
        (100, 0, 0, 100),
        (0, 100, 100, 0),
        (0, 0, 622, 802),
    ):
        with pytest.raises(ValueError):
            test_proposed_bbox(tuple(float(v) for v in bad), page_bbox)
    # valid box passes
    test_proposed_bbox((0.0, 0.0, 100.0, 100.0), page_bbox)


def test_extract_words_directions_issue_192():
    """Reference test_utils.py:78-100 via the modern direction API
    (the reference's deprecated vertical_ttb/horizontal_ltr flags map
    to char_dir_rotated='btt' with the default rotated line_dir 'ltr' /
    char_dir='rtl'). Every pinned value reference-exact."""
    _, it = _interp("issue-192-example.pdf")
    ct = _char_table(it.chars)

    w = extract_words_page(
        ct, WordConfig(char_dir_rotated="btt", line_dir_rotated="ltr")
    )
    assert w["text"][0] == "Agaaaaa:"
    assert w["direction"][0] == "ltr"
    assert "size" not in w

    wa = extract_words_page(
        ct,
        WordConfig(
            char_dir_rotated="btt", line_dir_rotated="ltr",
            extra_attrs=("size",),
        ),
    )
    assert round(float(wa["size"][0]), 2) == 9.96

    ws = extract_words_page(
        ct,
        WordConfig(
            char_dir_rotated="btt", line_dir_rotated="ltr",
            keep_blank_chars=True,
        ),
    )
    assert ws["text"][0] == "Agaaaaa: AAAA"

    idx = [i for i in range(len(w["text"])) if not w["upright"][i]]
    assert w["text"][idx[0]] == "Aaaaaabag8"
    assert w["direction"][idx[0]] == "btt"

    wr = extract_words_page(ct, WordConfig(char_dir="rtl"))
    assert wr["text"][1] == "baaabaaA/AAA"
    assert wr["direction"][1] == "rtl"
