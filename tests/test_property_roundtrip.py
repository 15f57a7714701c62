"""Property-based round-trip: arbitrary span sequences satisfying the
documented input constraints (non-empty texts, table runs >= 2 cells, no
single span taller than a page) must survive layout -> extraction exactly.
"""

from hypothesis import given, settings, strategies as st

from pdfplumber_ray.stages.flatten import extract_doc_spans
from pdfplumber_ray.stages.layout import layout_doc

WORD = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8
)
TEXT = st.lists(WORD, min_size=1, max_size=40).map(" ".join)
CELL = st.lists(WORD, min_size=1, max_size=2).map(" ".join)


def _text_span(kind):
    return TEXT.map(lambda t: {"kind": kind, "text": t, "media_ref": "", "offset": 0})


TABLE_RUN = st.lists(CELL, min_size=2, max_size=8).map(
    lambda cells: [
        {"kind": "table_cell", "text": c, "media_ref": "", "offset": 0} for c in cells
    ]
)

BLOCK = st.one_of(
    _text_span("text").map(lambda s: [s]),
    _text_span("heading").map(lambda s: [s]),
    TABLE_RUN,
    st.just([{"kind": "media_ref", "text": "", "media_ref": "media://x/0", "offset": 0}]),
)


def _merge_blocks(blocks):
    # adjacent table runs would merge into one lattice; insert a text span
    # between them to preserve the documented "maximal run" structure
    out = []
    prev_table = False
    for b in blocks:
        is_table = b[0]["kind"] == "table_cell"
        if is_table and prev_table:
            out.append({"kind": "text", "text": "sep", "media_ref": "", "offset": 0})
        out.extend(b)
        prev_table = is_table
    total = 0
    for i, s in enumerate(out):
        s = dict(s)
        s["offset"] = total
        total += len(s["text"])
        s["media_ref"] = f"media://doc/{i}" if s["kind"] == "media_ref" else ""
        out[i] = s
    return out


DOC = st.lists(BLOCK, min_size=1, max_size=12).map(_merge_blocks)


def span_key(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


@settings(max_examples=60, deadline=None)
@given(DOC)
def test_roundtrip_property(spans):
    out = extract_doc_spans(layout_doc(spans))
    assert span_key(out) == span_key(spans)
