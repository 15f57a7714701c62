"""Repair + dead-letter stage (pipelines/repair.py): the engine analogue
of the reference's Ghostscript repair path (reference repair.py:8-54) —
fix what is deterministic, quarantine the rest, never raise."""

import pyarrow as pa

from pdfplumber_ray.pipelines.repair import (
    STATUS_OK,
    STATUS_QUARANTINED,
    STATUS_RECOMPUTED,
    STATUS_SORTED,
    dead_letters_ds,
    repair_doc,
    repair_docs_ds,
    repaired_ds,
)
from pdfplumber_ray.schemas import SPAN


def _span(text, offset):
    return {"kind": "text", "text": text, "media_ref": "", "offset": offset}


def test_repair_doc_rules():
    ok = [_span("a", 0), _span("b", 2), _span("c", 4)]
    assert repair_doc(ok) == (ok, STATUS_OK)

    scrambled = ok[::-1]
    fixed, status = repair_doc(scrambled)
    assert status == STATUS_SORTED
    assert [s["text"] for s in fixed] == ["a", "b", "c"]

    zeroed = [_span("aa", 0), _span("bb", 0), _span("cc", 0)]
    fixed, status = repair_doc(zeroed)
    assert status == STATUS_RECOMPUTED
    assert [s["offset"] for s in fixed] == [0, 3, 6]
    assert [s["text"] for s in fixed] == ["aa", "bb", "cc"]

    assert repair_doc([]) == ([], STATUS_QUARANTINED)

    neg = [_span("a", -5)]
    fixed, status = repair_doc(neg)
    assert status == STATUS_RECOMPUTED
    assert fixed[0]["offset"] == 0


def test_repair_pipeline_split(ray_session):
    import ray.data

    rows = {
        "doc_id": pa.array(["good", "scrambled", "empty"]),
        "spans": pa.array(
            [
                [_span("x", 0), _span("y", 2)],
                [_span("y", 2), _span("x", 0)],
                [],
            ],
            pa.list_(SPAN),
        ),
    }
    docs = ray.data.from_arrow(pa.table(rows))
    rep = repair_docs_ds(docs)
    healthy = repaired_ds(rep).to_pandas()
    dead = dead_letters_ds(rep).to_pandas()
    assert sorted(healthy.doc_id) == ["good", "scrambled"]
    assert list(dead.doc_id) == ["empty"]
    by_id = {r.doc_id: r.spans for r in healthy.itertuples()}
    assert [s["text"] for s in by_id["scrambled"]] == ["x", "y"]


def test_corrupted_adapter_roundtrip(ray_session):
    import ray.data

    from pdfplumber_ray.pipelines import extract_spans_ds
    from pdfplumber_ray.sources.synth_corpus import docs_corrupted_batch

    raw = pa.table(
        {
            "doc_id": pa.array(list(range(9)), pa.int64()),
            "text": pa.array(
                [" ".join(f"w{i}n{j}" for j in range(30)) for i in range(9)]
            ),
        }
    )
    docs = ray.data.from_arrow(docs_corrupted_batch(raw))
    healthy = repaired_ds(repair_docs_ds(docs))
    out = extract_spans_ds(healthy).to_pandas()
    out["key"] = out.doc_id.str.rsplit("-", n=1).str[1].astype(int)
    out = out.sort_values("key").reset_index(drop=True)
    texts = [" ".join(s["text"] for s in spans) for spans in out.spans]
    assert texts == raw.column("text").to_pylist()
