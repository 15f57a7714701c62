"""Deterministic synthetic PDF fixtures.

The reference corpus has no true vertical-writing (Identity-V) PDF —
issue-192 is rotated Identity-H — so the vertical-mode fixture is built
from scratch here. Kept in the package (not tests/) because the
``vertical_text`` oracle query in ``__ray_entry__.py`` decodes the same
bytes inside Ray workers.
"""

from __future__ import annotations

TOUNICODE_CJK = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def
/CMapName /Adobe-Identity-UCS def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
4 beginbfchar
<0001> <4E00>
<0002> <4E8C>
<0003> <4E09>
<0004> <56DB>
endbfchar
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""

# three columns of CJK text, right-to-left column order as vertical
# Japanese layout does, plus a TJ gap adjustment in the middle column
VERTICAL_CONTENT = (
    b"BT /F1 24 Tf 1 0 0 1 400 700 Tm <0001000200030004> Tj ET "
    b"BT /F1 24 Tf 1 0 0 1 360 700 Tm [<00010002> 500 <0003>] TJ ET "
    b"BT /F1 18 Tf 1 0 0 1 320 700 Tm <00040003> Tj ET"
)


def make_vertical_pdf(content: bytes = VERTICAL_CONTENT) -> bytes:
    """One-page PDF with an Identity-V Type0 font: /DW2 defaults
    [880 -1000], a /W2 override for CID 1 (w1y=-1000 vx=500 vy=880),
    and a ToUnicode CMap mapping CIDs 1-4 to CJK codepoints."""
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n",
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream\nendobj\n",
        b"5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /TestCJK "
        b"/Encoding /Identity-V /DescendantFonts [6 0 R] /ToUnicode 8 0 R >>\n"
        b"endobj\n",
        b"6 0 obj\n<< /Type /Font /Subtype /CIDFontType2 /BaseFont /TestCJK "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /FontDescriptor 7 0 R /DW 1000 "
        b"/DW2 [880 -1000] /W2 [1 [-1000 500 880]] >>\nendobj\n",
        b"7 0 obj\n<< /Type /FontDescriptor /FontName /TestCJK /Flags 4 "
        b"/FontBBox [0 -200 1000 900] /Descent -120 /Ascent 880 "
        b"/ItalicAngle 0 /StemV 80 >>\nendobj\n",
        b"8 0 obj\n<< /Length %d >>\nstream\n" % len(TOUNICODE_CJK)
        + TOUNICODE_CJK
        + b"\nendstream\nendobj\n",
    ]
    header = b"%PDF-1.6\n"
    offsets = []
    pos = len(header)
    for o in objs:
        offsets.append(pos)
        pos += len(o)
    xref = b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1) + b"".join(
        b"%010d 00000 n \n" % off for off in offsets
    )
    trailer = b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1,
        pos,
    )
    return header + b"".join(objs) + xref + trailer
