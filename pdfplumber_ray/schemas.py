"""Arrow schema constants for every table that crosses a stage boundary.

The reference keeps objects as schemaless Python dicts
(reference _typing.py:7, page.py:416-425); here every inter-stage table is a
declared ``pyarrow.Schema`` so blocks stay zero-copy Arrow end to end.
"""

from __future__ import annotations

import pyarrow as pa

# ---- input (the authoritative input_hint shape) ----
SPAN = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCS = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN))])

# ---- decoded per-page object tables (one row per page) ----
CHAR = pa.struct(
    [
        ("text", pa.string()),
        ("x0", pa.float64()),
        ("x1", pa.float64()),
        ("top", pa.float64()),
        ("bottom", pa.float64()),
        ("doctop", pa.float64()),
        ("size", pa.float64()),
        ("fontname", pa.string()),
        ("upright", pa.bool_()),
        ("mcid", pa.int32()),  # marked-content id = source span ordinal; -1 when absent
        ("tag", pa.string()),  # marked-content tag ('P'/'H'/'TD'...; reference page.py:128-176)
        # per-char text matrix — the reference's 6-tuple (page.py:367-384)
        # stored as six flat float64 columns (columnar, zero-copy);
        # `upright` derives from it via the reference's LTChar rule
        ("mat_a", pa.float64()),
        ("mat_b", pa.float64()),
        ("mat_c", pa.float64()),
        ("mat_d", pa.float64()),
        ("mat_e", pa.float64()),
        ("mat_f", pa.float64()),
    ]
)

# mcid/tag are stamped on rect/line/image objects too (reference 0.10.3:
# marked-content sequences on char/rect/line/curve/image)
RECT = pa.struct(
    [
        ("x0", pa.float64()),
        ("x1", pa.float64()),
        ("top", pa.float64()),
        ("bottom", pa.float64()),
        ("doctop", pa.float64()),
        ("mcid", pa.int32()),
        ("tag", pa.string()),
    ]
)

# zero-height/width stroked line objects (reference 'line' kind)
LINE = RECT

# curve objects: bbox + ordered points (reference page.py:386-393 converts
# pdfminer pts/path to top-left coords; curves decompose to point-pair
# edge segments in the table stage, geometry.py:189-204)
CURVE_PT = pa.struct([("x", pa.float64()), ("top", pa.float64())])
# path = drawing commands ('m' moveto / 'l' lineto per point) and dash =
# stroke pattern, mirroring reference 0.11.0's curve["path"] / curve["dash"]
CURVE_PATH_STEP = pa.struct(
    [("cmd", pa.string()), ("x", pa.float64()), ("top", pa.float64())]
)
CURVE_DASH = pa.struct([("array", pa.list_(pa.float64())), ("phase", pa.float64())])
CURVE = pa.struct(
    [
        ("x0", pa.float64()),
        ("x1", pa.float64()),
        ("top", pa.float64()),
        ("bottom", pa.float64()),
        ("doctop", pa.float64()),
        ("pts", pa.list_(CURVE_PT)),
        ("path", pa.list_(CURVE_PATH_STEP)),
        ("dash", CURVE_DASH),
    ]
)

IMAGE = pa.struct(
    [
        ("x0", pa.float64()),
        ("x1", pa.float64()),
        ("top", pa.float64()),
        ("bottom", pa.float64()),
        ("media_ref", pa.string()),
        ("mcid", pa.int32()),
        ("tag", pa.string()),
    ]
)

# annotation objects (reference page.py:280-319 parsed /Annots records:
# uri/title/contents + top-left bbox; hyperlinks = annots with a uri,
# reference page.py:321-323)
ANNOT = pa.struct(
    [
        ("x0", pa.float64()),
        ("x1", pa.float64()),
        ("top", pa.float64()),
        ("bottom", pa.float64()),
        ("doctop", pa.float64()),
        ("uri", pa.string()),
        ("contents", pa.string()),
        # full resolved annotation dict as JSON (reference page.py:315
        # keeps the raw pdfminer dict under "data"); null on the synth path
        ("data", pa.string()),
    ]
)

PAGES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("page_number", pa.int32()),
        ("page_width", pa.float64()),
        ("page_height", pa.float64()),
        ("initial_doctop", pa.float64()),
        ("chars", pa.list_(CHAR)),
        ("rects", pa.list_(RECT)),
        ("lines", pa.list_(LINE)),
        ("images", pa.list_(IMAGE)),
        ("annots", pa.list_(ANNOT)),
        ("curves", pa.list_(CURVE)),
    ]
)

# ---- flat object tables (one row per object; operator-level API) ----
CHARS_FLAT = pa.schema(
    [
        ("doc_id", pa.string()),
        ("page_number", pa.int32()),
        ("text", pa.string()),
        ("x0", pa.float64()),
        ("x1", pa.float64()),
        ("top", pa.float64()),
        ("bottom", pa.float64()),
        ("doctop", pa.float64()),
        ("width", pa.float64()),
        ("height", pa.float64()),
        ("size", pa.float64()),
        ("fontname", pa.string()),
        ("upright", pa.bool_()),
        ("mcid", pa.int32()),  # marked-content id = source span ordinal; -1 when absent
        ("tag", pa.string()),
    ]
)

WORDS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("page_number", pa.int32()),
        ("text", pa.string()),
        ("x0", pa.float64()),
        ("x1", pa.float64()),
        ("top", pa.float64()),
        ("bottom", pa.float64()),
        ("doctop", pa.float64()),
        ("width", pa.float64()),
        ("height", pa.float64()),
        ("upright", pa.bool_()),
        ("direction", pa.string()),
    ]
)

TABLES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("page_number", pa.int32()),
        ("table_index", pa.int32()),
        ("x0", pa.float64()),
        ("top", pa.float64()),
        ("x1", pa.float64()),
        ("bottom", pa.float64()),
        ("rows", pa.list_(pa.list_(pa.string()))),  # nullable inner cells
    ]
)

PAGE_TEXT = pa.schema(
    [
        ("doc_id", pa.string()),
        ("page_number", pa.int32()),
        ("text", pa.string()),
    ]
)

# ---- output (north rule) ----
OUT_SPANS = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN))])

ERRORS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("stage", pa.string()),
        ("error", pa.string()),
    ]
)

METRICS = pa.schema(
    [
        ("partition_id", pa.string()),
        ("docs", pa.int64()),
        ("pages", pa.int64()),
        ("spans_out", pa.int64()),
        ("errors", pa.int64()),
        ("wall_sec", pa.float64()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
