"""CSV / JSON serialization sinks with the reference's column contract.

Column ordering replicates ``Container.to_csv`` (reference
container.py:130-179 + convert.py:15-30): ``object_type`` first, then the
geometry prepend list, then the remaining attributes sorted; include /
exclude attribute filters follow ``get_attr_filter``
(convert.py:33-56), and float precision rounding follows
``Serializer.do_float`` (convert.py:101-103) via ``pyarrow.compute.round``.
"""

from __future__ import annotations

from typing import Any, List, Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

Dataset = ray.data.Dataset

CSV_COLS_REQUIRED = ["object_type"]
CSV_COLS_TO_PREPEND = [
    "page_number",
    "x0",
    "x1",
    "y0",
    "y1",
    "doctop",
    "top",
    "bottom",
    "width",
    "height",
]


def csv_column_order(
    fields: List[str],
    include_attrs: Optional[List[str]] = None,
    exclude_attrs: Optional[List[str]] = None,
) -> List[str]:
    if include_attrs is not None and exclude_attrs is not None:
        raise ValueError(
            "Cannot specify `include_attrs` and `exclude_attrs` at the same time."
        )
    if exclude_attrs is not None:
        bad = set(exclude_attrs) & set(CSV_COLS_REQUIRED)
        if bad:
            raise ValueError(f"Cannot exclude these required properties: {sorted(bad)}")

    non_req = CSV_COLS_TO_PREPEND + sorted(
        set(fields) - set(CSV_COLS_REQUIRED + CSV_COLS_TO_PREPEND)
    )
    if include_attrs is not None:
        keep = set(CSV_COLS_REQUIRED + include_attrs)
        flt = lambda c: c in keep  # noqa: E731
    elif exclude_attrs is not None:
        excl = set(exclude_attrs)
        flt = lambda c: c not in excl  # noqa: E731
    else:
        flt = lambda c: True  # noqa: E731
    cols = CSV_COLS_REQUIRED + [c for c in non_req if flt(c)]
    return [c for c in cols if c in fields or c in CSV_COLS_REQUIRED]


# decode fallback chain for byte values, mirroring the reference
# (convert.py:8-13 ENCODINGS_TO_TRY + convert.py:118-127 do_bytes)
ENCODINGS_TO_TRY = ["utf-8", "latin-1", "utf-16", "utf-16le"]


def bytes_to_text(data: bytes) -> Optional[str]:
    """Reference ``Serializer.do_bytes``: try each encoding in order; the
    reference returns None from inside the loop on the first failure —
    and latin-1 never fails — so in practice this is utf-8-else-latin-1."""
    for e in ENCODINGS_TO_TRY:
        try:
            return data.decode(e)
        except UnicodeDecodeError:
            return None
    return None


def stream_to_b64(rawdata: bytes) -> dict:
    """Reference ``Serializer.do_PDFStream`` (convert.py:112-113): binary
    stream payloads serialize as ``{"rawdata": <base64>}``."""
    import base64

    return {"rawdata": base64.b64encode(rawdata).decode("ascii")}


def serialize_scalar(v: Any, precision: Optional[int] = None) -> Any:
    """Scalar serialization matching the reference ``Serializer.serialize``
    type dispatch (convert.py:75-127): None/int/str pass through, floats
    round to ``precision``, bools become ints, bytes decode with the
    fallback chain, and anything else falls back to ``str``."""
    if v is None or isinstance(v, str):
        return v
    if isinstance(v, bool):  # must precede int (bool is an int subclass)
        return int(v)
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return round(v, precision) if precision is not None else v
    if isinstance(v, bytes):
        return bytes_to_text(v)
    if isinstance(v, (list, tuple)):
        return [serialize_scalar(x, precision) for x in v]
    if isinstance(v, dict):
        return {k: serialize_scalar(x, precision) for k, x in v.items()}
    return str(v)


def objects_csv_ds(
    objects: Dataset,
    object_type: str,
    precision: Optional[int] = None,
    include_attrs: Optional[List[str]] = None,
    exclude_attrs: Optional[List[str]] = None,
) -> Dataset:
    """Project an objects dataset (e.g. chars) into reference CSV column
    order with an ``object_type`` column and optional float rounding."""

    def fn(batch: pa.Table) -> pa.Table:
        t = batch
        if "object_type" not in t.column_names:
            t = t.append_column(
                "object_type", pa.array([object_type] * t.num_rows, pa.string())
            )
        if precision is not None:
            for name in t.column_names:
                col = t.column(name)
                if pa.types.is_floating(col.type):
                    t = t.set_column(
                        t.column_names.index(name),
                        name,
                        pc.round(col, ndigits=precision),
                    )
        order = csv_column_order(t.column_names, include_attrs, exclude_attrs)
        present = [c for c in order if c in t.column_names]
        return t.select(present)

    return objects.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def write_objects_csv(
    objects: Dataset,
    path: str,
    object_type: str,
    **kwargs: Any,
) -> None:
    objects_csv_ds(objects, object_type, **kwargs).write_csv(path)


def pages_json_ds(
    pages: Dataset,
    precision: Optional[int] = None,
    media_payloads: Optional[dict] = None,
    indent: Optional[int] = None,
) -> Dataset:
    """Nested per-page JSON documents mirroring ``Container.to_json``
    (container.py:106-128): one row per page with doc metadata and nested
    object lists, serialized to a JSON string column. ``media_payloads``
    optionally maps media_ref -> raw bytes; matching image objects gain a
    ``stream: {rawdata: <b64>}`` entry (reference convert.py:112-113)."""
    import json

    def fn(batch: pa.Table) -> pa.Table:
        from ..stages.decode import arrow_pages_to_dicts

        doc_ids: List[str] = []
        pns: List[int] = []
        payloads: List[str] = []

        def f(v: float) -> float:
            return round(float(v), precision) if precision is not None else float(v)

        for doc_id, page in arrow_pages_to_dicts(batch):
            chars = page["chars"]
            n = chars["x0"].shape[0]
            obj = {
                "doc_id": doc_id,
                "page_number": int(page["page_number"]),
                "width": f(page["page_width"]),
                "height": f(page["page_height"]),
                "initial_doctop": f(page["initial_doctop"]),
                "chars": [
                    {
                        "text": str(chars["text"][i]),
                        "x0": f(chars["x0"][i]),
                        "x1": f(chars["x1"][i]),
                        "top": f(chars["top"][i]),
                        "bottom": f(chars["bottom"][i]),
                        "doctop": f(chars["doctop"][i]),
                        "size": f(chars["size"][i]),
                        "fontname": str(chars["fontname"][i]),
                        "upright": bool(chars["upright"][i]),
                        "object_type": "char",
                    }
                    for i in range(n)
                ],
                "rects": [
                    {
                        "x0": f(page["rects"]["x0"][i]),
                        "x1": f(page["rects"]["x1"][i]),
                        "top": f(page["rects"]["top"][i]),
                        "bottom": f(page["rects"]["bottom"][i]),
                        "object_type": "rect",
                    }
                    for i in range(page["rects"]["x0"].shape[0])
                ],
                "lines": [
                    {
                        "x0": f(page["lines"]["x0"][i]),
                        "x1": f(page["lines"]["x1"][i]),
                        "top": f(page["lines"]["top"][i]),
                        "bottom": f(page["lines"]["bottom"][i]),
                        "object_type": "line",
                    }
                    for i in range(page["lines"]["x0"].shape[0])
                ]
                if page.get("lines") is not None
                else [],
                "images": [
                    {
                        "x0": f(img["x0"]),
                        "x1": f(img["x1"]),
                        "top": f(img["top"]),
                        "bottom": f(img["bottom"]),
                        "media_ref": img["media_ref"],
                        "object_type": "image",
                        # reference do_PDFStream: binary payloads -> b64
                        **(
                            {"stream": stream_to_b64(media_payloads[img["media_ref"]])}
                            if media_payloads and img["media_ref"] in media_payloads
                            else {}
                        ),
                    }
                    for img in page["images"]
                ],
            }
            doc_ids.append(doc_id)
            pns.append(int(page["page_number"]))
            payloads.append(json.dumps(obj, sort_keys=True, indent=indent))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "page_number": pa.array(pns, pa.int32()),
                "json": pa.array(payloads, pa.string()),
            }
        )

    return pages.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
