"""Decoder robustness regressions (round-3 ADVICE items): indirect
stream /Length resolution, unsigned /P permission flags, and malformed
structure trees — each a real-corpus failure mode the reference handles
via pdfminer."""

from __future__ import annotations

import os
import re

import pytest

from pdfplumber_ray.pdfio import PDFDocument
from pdfplumber_ray.pdfio.reader import decode_pdf_doc
from pdfplumber_ray.pdfio.structure import structure_flat_rows

REF = "/root/reference/tests"


def _minimal_pdf(content: bytes, length_obj: bytes) -> bytes:
    """A one-page PDF whose content stream /Length is the indirect ref
    ``6 0 R`` defined by ``length_obj``. The body deliberately contains
    the literal bytes ``endstream`` inside a text string, so a scanning
    fallback truncates it while proper Length resolution does not."""
    objs = []
    objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objs.append(
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    )
    objs.append(
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
    )
    objs.append(
        b"4 0 obj\n<< /Length 6 0 R >>\nstream\n" + content + b"\nendstream\nendobj\n"
    )
    objs.append(
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
    )
    objs.append(length_obj)
    header = b"%PDF-1.4\n"
    offsets = []
    pos = len(header)
    for o in objs:
        offsets.append(pos)
        pos += len(o)
    xref_pos = pos
    xref = b"xref\n0 7\n0000000000 65535 f \n" + b"".join(
        b"%010d 00000 n \n" % off for off in offsets
    )
    trailer = (
        b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    )
    return header + b"".join(objs) + xref + trailer


def test_indirect_stream_length_resolved():
    """A stream whose /Length is an indirect ref and whose payload
    contains the literal bytes 'endstream' must decode in full — the
    endstream-scan fallback alone would truncate it (ADVICE r2,
    syntax.py:314; pdfminer resolves indirect Length)."""
    content = (
        b"BT /F1 12 Tf 72 720 Td (endstream) Tj 0 -20 Td (AFTERMARKER) Tj ET"
    )
    pdf = _minimal_pdf(content, b"6 0 obj\n%d\nendobj\n" % len(content))
    rows, err = decode_pdf_doc("t", pdf)
    assert err is None
    text = "".join(c["text"] for c in rows[0]["chars"])
    assert "endstream" in text
    assert "AFTERMARKER" in text, "stream truncated at embedded 'endstream'"


def test_indirect_length_cycle_does_not_hang():
    """/Length pointing at the stream's own object must fall back to the
    scan, not recurse forever."""
    content = b"BT /F1 12 Tf 72 720 Td (ok) Tj ET"
    # 6 0 obj exists but /Length refs 4 0 R (the stream itself)
    pdf = _minimal_pdf(content, b"6 0 obj\n999999\nendobj\n").replace(
        b"/Length 6 0 R", b"/Length 4 0 R"
    )
    rows, err = decode_pdf_doc("t", pdf)
    assert err is None
    assert "ok" in "".join(c["text"] for c in rows[0]["chars"])


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference corpus not available")
def test_unsigned_permission_flags():
    """Some producers store /P as the unsigned form of the signed 32-bit
    value (ADVICE r2, crypt.py:74). Rewriting password-example's /P -4 as
    4294967292 must still authenticate and decrypt."""
    data = open(f"{REF}/pdfs/password-example.pdf", "rb").read()
    m = re.search(rb"52\s+0\s+obj.{0,400}?endobj", data, re.S)
    old = m.group(0)
    new = old.replace(b"/P -4", b"/P 4294967292")
    # reclaim the 8 extra bytes from indentation so xref offsets stay valid
    new = new.replace(b"   /O <", b"/O <").replace(b"   /U <", b"/U <")
    new = new.replace(b"   /Filter", b" /Filter")
    assert len(new) == len(old)
    patched = data[: m.start()] + new + data[m.end() :]
    rows, err = decode_pdf_doc("pw", patched, password="test")
    assert err is None, err
    assert sum(len(r["chars"]) for r in rows) > 1000


def test_structure_flat_rows_malformed_tree(monkeypatch):
    """structure_flat_rows must degrade to no-structure on malformed
    tagged PDFs (cyclic /K → RecursionError) instead of crashing
    (ADVICE r2, structure.py:352)."""
    import pdfplumber_ray.pdfio.structure as st

    class Boom:
        def __init__(self, *a, **k):
            raise RecursionError("cyclic /K")

    monkeypatch.setattr(st, "StructTree", Boom)
    doc = PDFDocument(_minimal_pdf(b"BT ET", b"6 0 obj\n5\nendobj\n"))
    assert st.structure_flat_rows(doc, "d") == []


def test_cyclic_struct_tree_prune():
    """A structure tree whose /K points back at an ancestor must not
    recurse forever in prune()."""
    content = b"BT /F1 12 Tf 72 720 Td (x) Tj ET"
    pdf = _minimal_pdf(content, b"6 0 obj\n%d\nendobj\n" % len(content))
    # graft a cyclic StructTreeRoot: 7 <-> 8 cycle via /K and /P
    extra = (
        b"7 0 obj\n<< /Type /StructTreeRoot /K [8 0 R] >>\nendobj\n"
        b"8 0 obj\n<< /Type /StructElem /S /Sect /P 7 0 R /K [9 0 R] /Pg 3 0 R >>\nendobj\n"
        b"9 0 obj\n<< /Type /StructElem /S /P /P 8 0 R /K [8 0 R] /Pg 3 0 R >>\nendobj\n"
    )
    pdf = pdf.replace(
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Catalog /Pages 2 0 R /StructTreeRoot 7 0 R >>",
    )
    # append objects; the altered offsets force the scan-recovery path,
    # which indexes every 'N G obj' it finds — fine for this test
    pdf = pdf.replace(b"xref\n0 7\n", extra + b"xref\n0 7\n")
    doc = PDFDocument(pdf)
    rows = structure_flat_rows(doc, "d")  # must terminate, not RecursionError
    assert isinstance(rows, list)


def test_tiff_predictor_all_depths():
    """TIFF predictor 2 at every legal BitsPerComponent, validated
    against a naive per-sample reference differencer."""
    import random

    from pdfplumber_ray.pdfio.filters import apply_tiff_predictor

    rng = random.Random(7)

    def pack(samples, bpc, colors, columns):
        # samples: row-major list of rows, each columns*colors ints
        out = bytearray()
        for row in samples:
            acc = 0
            nbits = 0
            for s in row:
                acc = (acc << bpc) | s
                nbits += bpc
                while nbits >= 8:
                    out.append((acc >> (nbits - 8)) & 0xFF)
                    nbits -= 8
            if nbits:
                out.append((acc << (8 - nbits)) & 0xFF)
        return bytes(out)

    def encode(samples, bpc, colors):
        # forward differencing (what a writer applies before Flate)
        mask = (1 << bpc) - 1
        enc = []
        for row in samples:
            erow = list(row)
            for j in range(len(row) - 1, colors - 1, -1):
                erow[j] = (row[j] - row[j - colors]) & mask
            enc.append(erow)
        return enc

    for bpc in (1, 2, 4, 8, 16):
        for colors in (1, 3):
            columns = 11
            mask = (1 << bpc) - 1
            samples = [
                [rng.randint(0, mask) for _ in range(columns * colors)]
                for _ in range(5)
            ]
            enc = encode(samples, bpc, colors)
            if bpc == 16:
                raw = b"".join(
                    s.to_bytes(2, "big") for row in enc for s in row
                )
                expect = b"".join(
                    s.to_bytes(2, "big") for row in samples for s in row
                )
            elif bpc == 8:
                raw = bytes(s for row in enc for s in row)
                expect = bytes(s for row in samples for s in row)
            else:
                raw = pack(enc, bpc, colors, columns)
                expect = pack(samples, bpc, colors, columns)
            got = apply_tiff_predictor(raw, colors, columns, bpc)
            assert got == expect, f"bpc={bpc} colors={colors}"


def test_form_xobject_token_memoization():
    """A form XObject executed by several pages is tokenized once per
    document, and repeated execution emits identical glyphs each time."""
    from pdfplumber_ray.pdfio import syntax as syn

    form_body = b"BT /F1 10 Tf 72 700 Td (Form) Tj ET"
    npages = 3
    kids = b" ".join(b"%d 0 R" % (10 + i) for i in range(npages))
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % npages),
        (3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
        (
            4,
            b"<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Length %d >>\nstream\n"
            % len(form_body)
            + form_body
            + b"\nendstream",
        ),
        (5, b"<< /Length 11 >>\nstream\nq /Fm1 Do Q\nendstream"),
    ]
    for i in range(npages):
        objs.append(
            (
                10 + i,
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /XObject << /Fm1 4 0 R >> >> /Contents 5 0 R >>",
            )
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for n, body in objs:
        offsets[n] = len(out)
        out += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    xref_pos = len(out)
    maxn = max(offsets) + 1
    out += b"xref\n0 %d\n0000000000 65535 f \n" % maxn
    for n in range(1, maxn):
        out += (
            (b"%010d 00000 n \n" % offsets[n])
            if n in offsets
            else b"0000000000 65535 f \n"
        )
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
        % (maxn, xref_pos)
    )

    calls = []
    orig = syn.tokenize_content

    def counting(data):
        calls.append(len(data))
        return orig(data)

    syn.tokenize_content = counting
    try:
        import pdfplumber_ray.pdfio.interp as interp_mod

        saved = interp_mod.tokenize_content
        interp_mod.tokenize_content = counting
        try:
            rows, err = decode_pdf_doc("formdoc", bytes(out))
        finally:
            interp_mod.tokenize_content = saved
    finally:
        syn.tokenize_content = orig

    assert err is None
    assert len(rows) == npages
    # each page renders the form's glyphs
    for r in rows:
        assert "".join(c["text"] for c in r["chars"]) == "Form"
    # page content + form each tokenized exactly once despite 3 pages
    assert len(calls) == 2


def test_type3_font_matrix_scaling():
    """Type3 glyph widths live in glyph space: /FontMatrix scales them
    (ISO 32000-1 §9.6.5). A /FontMatrix [0.02 0 0 0.02 0 0] font with
    /Widths [300 400] at 10pt must advance 300*0.02*10 = 60pt — treating
    the widths as thousandths (the pre-fix behavior) would give 3pt."""
    content = b"BT /F1 10 Tf 72 700 Td (AB) Tj ET"
    font = (
        b"<< /Type /Font /Subtype /Type3 /Name /F1 "
        b"/FontBBox [0 -10 50 40] /FontMatrix [0.02 0 0 0.02 0 0] "
        b"/FirstChar 65 /LastChar 66 /Widths [300 400] "
        b"/Encoding << /Type /Encoding /Differences [65 /A /B] >> "
        b"/CharProcs << >> >>"
    )
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (
            3,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        ),
        (4, b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream"),
        (5, font),
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for n, body in objs:
        offsets[n] = len(out)
        out += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    xref_pos = len(out)
    maxn = max(offsets) + 1
    out += b"xref\n0 %d\n0000000000 65535 f \n" % maxn
    for n in range(1, maxn):
        out += b"%010d 00000 n \n" % offsets[n]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
        % (maxn, xref_pos)
    )

    rows, err = decode_pdf_doc("t3", bytes(out))
    assert err is None and len(rows) == 1
    chars = rows[0]["chars"]
    assert [c["text"] for c in chars] == ["A", "B"]
    a, b = chars
    assert a["x1"] - a["x0"] == pytest.approx(300 * 0.02 * 10)  # 60pt
    assert b["x1"] - b["x0"] == pytest.approx(400 * 0.02 * 10)  # 80pt
    assert b["x0"] == pytest.approx(a["x0"] + 60)
    # descent comes from FontBBox[1] * vscale: bottom = baseline-origin
    # 700 -> y0 = 700 + (-10 * 0.02 * 10) = 698
    assert a["bottom"] == pytest.approx(792 - (700 - 2))
