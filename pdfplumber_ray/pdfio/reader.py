"""Ray Data stage: raw PDF bytes -> the engine's PAGES rows.

``decode_pdf_batch`` is the real-PDF twin of the synthetic decode stage
(stages/layout.py): it emits the same PAGES schema, so every downstream
kernel — words, layout textmap, table finder, crop, search — consumes
real-PDF pages unchanged. Failures quarantine as data (error column),
never as task failures (reference repair.py's dead-letter role).

Scale shape: one document decodes whole inside one map task (the decoder
is per-doc stateful: fonts, xref, doctop prefix). Parallelism comes from
docs-per-batch across the task pool; a pathological document costs one
task, not a stage.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from ..schemas import ANNOT, CHAR, CURVE, IMAGE, LINE, RECT
from .document import PDFDocument
from .fonts import decode_pdf_text
from .interp import PageInterpreter

Dataset = ray.data.Dataset


def _char_rows(chars: List[Dict]) -> List[Dict]:
    return [
        {
            "text": c["text"],
            "x0": c["x0"],
            "x1": c["x1"],
            "top": c["top"],
            "bottom": c["bottom"],
            "doctop": c["doctop"],
            "size": c["size"],
            "fontname": c["fontname"],
            "upright": c["upright"],
            "mcid": -1 if c["mcid"] is None else int(c["mcid"]),
            "tag": c["tag"] or "",
            "mat_a": c["matrix"][0],
            "mat_b": c["matrix"][1],
            "mat_c": c["matrix"][2],
            "mat_d": c["matrix"][3],
            "mat_e": c["matrix"][4],
            "mat_f": c["matrix"][5],
        }
        for c in chars
    ]


def _box_rows(objs: List[Dict]) -> List[Dict]:
    return [
        {
            "x0": o["x0"],
            "x1": o["x1"],
            "top": o["top"],
            "bottom": o["bottom"],
            "doctop": o["doctop"],
            "mcid": -1 if o.get("mcid") is None else int(o["mcid"]),
            "tag": o.get("tag") or "",
        }
        for o in objs
    ]


def _image_rows(objs: List[Dict]) -> List[Dict]:
    return [
        {
            "x0": o["x0"],
            "x1": o["x1"],
            "top": o["top"],
            "bottom": o["bottom"],
            "media_ref": o.get("media_ref") or "",
            "mcid": -1 if o.get("mcid") is None else int(o["mcid"]),
            "tag": o.get("tag") or "",
        }
        for o in objs
    ]


def _curve_rows(objs: List[Dict]) -> List[Dict]:
    return [
        {
            "x0": o["x0"],
            "x1": o["x1"],
            "top": o["top"],
            "bottom": o["bottom"],
            "doctop": o["doctop"],
            "pts": [{"x": x, "top": t} for (x, t) in o["pts"]],
            "path": [
                {"cmd": cmd, "x": x, "top": t} for (cmd, x, t) in o["path"]
            ],
            "dash": o["dash"],
        }
        for o in objs
    ]


def _annot_data_json(doc: PDFDocument, annot: Any) -> str:
    """Resolved annotation dict as JSON (reference page.py:315 keeps the
    raw dict under "data"). Resolution is DEPTH-BOUNDED and skips the /P
    page backref (the reference replaces it with the live Page object) —
    an unbounded resolve_all walks the whole document graph through
    Parent/Dest chains, which is both a blow-up and meaningless output."""
    import base64
    import json

    from .document import PDFStream
    from ..sinks.serialize import serialize_scalar

    def bounded(obj: Any, depth: int) -> Any:
        obj = doc.resolve(obj)
        if isinstance(obj, PDFStream):
            raw = obj.rawdata or b""
            return {"rawdata": base64.b64encode(raw[:1 << 16]).decode("ascii")}
        if isinstance(obj, dict):
            if depth <= 0:
                return "<...>"
            return {
                k: bounded(v, depth - 1)
                for k, v in obj.items()
                if k != "P"  # page backref: carried as page_number instead
            }
        if isinstance(obj, list):
            if depth <= 0:
                return "<...>"
            return [bounded(v, depth - 1) for v in obj]
        return serialize_scalar(obj)

    return json.dumps(bounded(annot, 6), sort_keys=True, default=str)


def _annot_rows(doc: PDFDocument, page, height: float, doctop: float) -> List[Dict]:
    """Resolved /Annots -> ANNOT rows (reference page.py:280-319)."""
    out: List[Dict] = []
    for a in page.annots:
        a = doc.resolve(a)
        if not isinstance(a, dict):
            continue
        rect = [float(doc.resolve(v)) for v in (doc.resolve(a.get("Rect")) or [0, 0, 0, 0])]
        x0, x1 = sorted((rect[0], rect[2]))
        y0, y1 = sorted((rect[1], rect[3]))
        uri = None
        action = doc.resolve(a.get("A"))
        if isinstance(action, dict):
            uri = doc.resolve(action.get("URI"))
        if isinstance(uri, bytes):
            uri = decode_pdf_text(uri)
        contents = doc.resolve(a.get("Contents"))
        if isinstance(contents, bytes):
            contents = decode_pdf_text(contents)
        top = height - y1
        try:
            data_json = _annot_data_json(doc, a)
        except Exception:
            data_json = "{}"
        out.append(
            {
                "x0": x0,
                "x1": x1,
                "top": top,
                "bottom": height - y0,
                "doctop": doctop + top,
                "uri": uri or "",
                "contents": contents or "",
                "data": data_json,
            }
        )
    return out


def decode_pdf_doc(
    doc_id: str, data: bytes, password: str = "", columnar: bool = False
) -> Tuple[List[Dict], Optional[str]]:
    """One document's bytes -> list of PAGES row dicts (+ error).

    ``columnar=True`` (the production batch path) carries chars as the
    interpreter's struct-of-arrays columns under ``chars_cols`` instead
    of per-glyph dicts — the Arrow assembly in ``decode_pdf_batch``
    consumes them zero-conversion."""
    try:
        doc = PDFDocument(data, password=password)
        pages = doc.pages()
        rows: List[Dict] = []
        doctop = 0.0  # page-height prefix sum (reference pdf.py:135-145)
        for pg in pages:
            it = PageInterpreter(doc, pg, initial_doctop=doctop)
            it.run()
            row = {
                "doc_id": doc_id,
                "page_number": pg.page_number,
                "page_width": it.width,
                "page_height": it.height,
                "initial_doctop": doctop,
                "rects": _box_rows(it.rects),
                "lines": _box_rows(it.lines),
                "images": _image_rows(it.images),
                "annots": _annot_rows(doc, pg, it.height, doctop),
                "curves": _curve_rows(it.curves),
            }
            if columnar:
                row["chars_cols"] = it.char_columns()
            else:
                row["chars"] = _char_rows(it.chars)
            rows.append(row)
            doctop += it.height
        return rows, None
    except Exception as e:  # quarantine, never raise (north-rule dead letter)
        return [], f"{type(e).__name__}: {e}"


_CHAR_NP_FIELDS = (
    ("x0", pa.float64()),
    ("x1", pa.float64()),
    ("top", pa.float64()),
    ("bottom", pa.float64()),
    ("doctop", pa.float64()),
    ("size", pa.float64()),
)


def _chars_list_array(rows: List[Dict]) -> pa.ListArray:
    """Per-page ``chars_cols`` dicts -> list<CHAR> array, built from the
    flat per-field columns (no per-glyph Python objects)."""
    offsets = [0]
    total = 0
    cols: List[Dict] = []
    for r in rows:
        cc = r.get("chars_cols")
        if cc is None:
            cc = {"n": 0}
        cols.append(cc)
        total += cc["n"]
        offsets.append(total)

    def cat(key: str) -> List:
        return [c[key] for c in cols if c["n"]]

    if total == 0:
        struct = pa.array([], CHAR)
    else:
        text: List[str] = []
        for c in cols:
            if c["n"]:
                text.extend(c["text"])
        arrays = [pa.array(text, pa.string())]
        for key, typ in _CHAR_NP_FIELDS:
            arrays.append(pa.array(np.concatenate(cat(key)), type=typ))
        arrays.append(pa.array(np.concatenate(cat("fontname")), pa.string()))
        arrays.append(pa.array(np.concatenate(cat("upright")), pa.bool_()))
        arrays.append(pa.array(np.concatenate(cat("mcid")), pa.int32()))
        arrays.append(pa.array(np.concatenate(cat("tag")), pa.string()))
        for key in ("mat_a", "mat_b", "mat_c", "mat_d", "mat_e", "mat_f"):
            arrays.append(pa.array(np.concatenate(cat(key)), pa.float64()))
        struct = pa.StructArray.from_arrays(
            arrays, fields=[CHAR.field(i) for i in range(CHAR.num_fields)]
        )
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)


def decode_pdf_batch(batch: pa.Table, password: str = "") -> pa.Table:
    """(doc_id: string, pdf_bytes: binary) -> PAGES rows + error column.

    Failed documents emit one row with empty object lists and the error
    message set — the dead-letter pattern of the synthetic decode stage."""
    doc_ids = batch.column("doc_id").to_pylist()
    blobs = batch.column("pdf_bytes").to_pylist()
    rows: List[Dict] = []
    errors: List[Optional[str]] = []
    for did, data in zip(doc_ids, blobs):
        prows, err = decode_pdf_doc(
            did, data or b"", password=password, columnar=True
        )
        if err is not None or not prows:
            rows.append(
                {
                    "doc_id": did,
                    "page_number": 0,
                    "page_width": 0.0,
                    "page_height": 0.0,
                    "initial_doctop": 0.0,
                    "chars_cols": None,
                    "rects": [],
                    "lines": [],
                    "images": [],
                    "annots": [],
                    "curves": [],
                }
            )
            errors.append(err or "empty document")
        else:
            rows.extend(prows)
            errors.extend([None] * len(prows))
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "page_number": pa.array(
                [r["page_number"] for r in rows], pa.int32()
            ),
            "page_width": pa.array(
                [r["page_width"] for r in rows], pa.float64()
            ),
            "page_height": pa.array(
                [r["page_height"] for r in rows], pa.float64()
            ),
            "initial_doctop": pa.array(
                [r["initial_doctop"] for r in rows], pa.float64()
            ),
            "chars": _chars_list_array(rows),
            "rects": pa.array([r["rects"] for r in rows], pa.list_(RECT)),
            "lines": pa.array([r["lines"] for r in rows], pa.list_(LINE)),
            "images": pa.array([r["images"] for r in rows], pa.list_(IMAGE)),
            "annots": pa.array([r["annots"] for r in rows], pa.list_(ANNOT)),
            "curves": pa.array([r["curves"] for r in rows], pa.list_(CURVE)),
            "error": pa.array(errors, pa.string()),
        }
    )


def read_pdf_corpus(paths: Any, password: str = "", **kwargs: Any) -> Dataset:
    """Binary PDF files -> pages Dataset (PAGES schema + error column).

    ``paths`` may be a directory, file, or list. At 100 TB the input is a
    Lance/Parquet table with a binary column instead — feed that through
    ``decode_pdf_batch`` directly after renaming to (doc_id, pdf_bytes)."""
    import os

    ds = ray.data.read_binary_files(paths, include_paths=True, **kwargs)

    def to_docs(batch: pa.Table) -> pa.Table:
        names = [os.path.basename(p) for p in batch.column("path").to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(names, pa.string()),
                "pdf_bytes": batch.column("bytes"),
            }
        )

    docs = ds.map_batches(to_docs, batch_format="pyarrow", zero_copy_batch=True)
    return docs.map_batches(
        decode_pdf_batch,
        fn_kwargs={"password": password},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
