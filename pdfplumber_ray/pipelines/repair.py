"""Document repair with dead-letter quarantine.

The reference shells out to Ghostscript to rewrite broken PDFs
(reference repair.py:8-54) and raises on failure; at corpus scale a
malformed document must never kill a 200-doc block, so this stage is the
engine's analogue: deterministically repair what is repairable, tag the
rest for a dead-letter dataset, never raise.

Repair rules over the interleaved-span model (applied per document):

* spans missing entirely / empty         -> ``quarantined`` (dead letter)
* offsets strictly increasing            -> ``ok`` (no-op)
* offsets distinct but out of order      -> ``sorted_offsets`` (the span
  list was scrambled; offsets are authoritative — re-sort by offset)
* offsets degenerate (dupes/negatives)   -> ``recomputed_offsets`` (list
  order is authoritative — rebuild the running char offsets)

Stateless ``map_batches`` stage; the per-doc loop is the cold path (most
batches are mostly ``ok`` and fall through cheap vector checks).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pyarrow as pa
import ray.data

from ..schemas import SPAN

Dataset = ray.data.Dataset

STATUS_OK = "ok"
STATUS_SORTED = "sorted_offsets"
STATUS_RECOMPUTED = "recomputed_offsets"
STATUS_QUARANTINED = "quarantined"


def repair_doc(spans: List[Dict]) -> tuple:
    """One document's span list -> (repaired spans, status)."""
    if not spans:
        return [], STATUS_QUARANTINED
    offs = np.array([s["offset"] for s in spans], dtype=np.int64)
    if offs.shape[0] == 1 or (np.diff(offs) > 0).all():
        if offs[0] >= 0:
            return spans, STATUS_OK
    distinct = np.unique(offs).shape[0] == offs.shape[0]
    if distinct and (offs >= 0).all():
        order = np.argsort(offs, kind="stable")
        return [spans[i] for i in order], STATUS_SORTED
    # offsets are garbage: keep list order, rebuild running offsets
    out = []
    off = 0
    for s in spans:
        s2 = dict(s)
        s2["offset"] = off
        out.append(s2)
        off += len(s["text"] or "") + 1
    return out, STATUS_RECOMPUTED


def repair_docs_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id")
    out_spans: List[List[Dict]] = []
    statuses: List[str] = []
    for spans in batch.column("spans").to_pylist():
        fixed, status = repair_doc(spans or [])
        out_spans.append(fixed)
        statuses.append(status)
    return pa.table(
        {
            "doc_id": doc_ids,
            "spans": pa.array(out_spans, pa.list_(SPAN)),
            "repair_status": pa.array(statuses, pa.string()),
        }
    )


def repair_docs_ds(docs: Dataset) -> Dataset:
    """DOCS -> DOCS + repair_status column (quarantined docs keep empty
    spans; split them off with :func:`dead_letters_ds` / :func:`repaired_ds`)."""
    return docs.map_batches(
        repair_docs_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def repaired_ds(repaired: Dataset) -> Dataset:
    """The healthy side: repairable docs, DOCS schema."""

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.not_equal(batch.column("repair_status"), STATUS_QUARANTINED)
        return batch.filter(m).select(["doc_id", "spans"])

    return repaired.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def dead_letters_ds(repaired: Dataset) -> Dataset:
    """The dead-letter side: irreparable docs (doc_id + status)."""

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.equal(batch.column("repair_status"), STATUS_QUARANTINED)
        return batch.filter(m).select(["doc_id", "repair_status"])

    return repaired.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def repair_pdf_batch(batch: pa.Table, password: str = "") -> pa.Table:
    """Raw PDF bytes -> structurally rewritten bytes (the gs-repair
    analogue, pdfio/rewrite.py): broken xrefs healed, encryption
    stripped, supported filter chains decoded. Unloadable documents
    dead-letter with the error string instead of failing the block."""
    from ..pdfio.rewrite import rewrite_pdf

    ids = batch.column("doc_id")
    out: List[bytes] = []
    statuses: List[str] = []
    errors: List = []
    for blob in batch.column("pdf_bytes").to_pylist():
        try:
            out.append(rewrite_pdf(blob, password=password))
            statuses.append("rewritten")
            errors.append(None)
        except Exception as e:
            out.append(b"")
            statuses.append(STATUS_QUARANTINED)
            errors.append(f"{type(e).__name__}: {e}")
    return pa.table(
        {
            "doc_id": ids,
            "pdf_bytes": pa.array(out, pa.binary()),
            "repair_status": pa.array(statuses, pa.string()),
            "error": pa.array(errors, pa.string()),
        }
    )


def repair_pdf_docs_ds(docs: Dataset, password: str = "") -> Dataset:
    """(doc_id, pdf_bytes) -> rewritten docs + status/error columns."""
    import functools

    return docs.map_batches(
        functools.partial(repair_pdf_batch, password=password),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
