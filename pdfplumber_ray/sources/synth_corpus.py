"""Deterministic interleaved text+media document corpus (the input_hint shape).

Two sources for ``DOCS``-schema tables
``(doc_id:string, spans:list<struct<kind,text,media_ref,offset:int32>>)``:

* :func:`make_docs_table` / :func:`write_corpus` — pure synthetic corpus per
  FIXTURES.md §1: span kinds drawn from {text, heading, table_cell,
  media_ref}, ~1 % pathological docs with 100x median span count (skew
  tests). Seeded per-doc (`default_rng((seed, doc_index))`) so generation is
  identical regardless of sharding or parallelism.
* :func:`docs_from_documents_batch` — adapter from the driver's
  ``documents.parquet`` table (doc_id:int64, text:string, ...): each doc's
  text is chunked into fixed-size word windows, one ``text`` span per chunk.
  Joining the extracted span texts with single spaces reproduces the original
  ``text`` column exactly — the SQL-oracle-checkable round trip.

In production the corpus lives in Lance (``ray.data.read_lance``); in this
sandbox Parquet with the identical Arrow schema stands in (SURVEY.md intro).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import DOCS, SPAN

VOCAB = (
    "the quick data batch spark table scan merge sort row line key value part "
    "order window filter group query hash join agg column vector stream fast "
    "slow small big dup customer supplier region nation total price qty flag "
    "status ship date disc tax net gross sum avg min max count rank page doc "
    "span text media cell grid lattice edge snap join word char font"
).split()

KIND_TEXT = "text"
KIND_HEADING = "heading"
KIND_CELL = "table_cell"
KIND_MEDIA = "media_ref"


def assign_offsets(texts: Sequence[str]) -> List[int]:
    """Running char offset: span i starts at the sum of all previous span
    text lengths. Shared by the generator and the flatten stage so the
    round-trip equality includes ``offset``."""
    out: List[int] = []
    total = 0
    for t in texts:
        out.append(total)
        total += len(t)
    return out


def make_doc_spans(
    doc_index: int,
    seed: int = 42,
    pathological_rate: float = 0.01,
) -> List[Dict]:
    """Deterministic span list for one document."""
    rng = np.random.default_rng((seed, doc_index))
    n_spans = int(rng.lognormal(2.5, 0.6)) + 4
    if rng.random() < pathological_rate:
        n_spans *= 100  # skew: pathological doc
    doc_id = f"doc-{doc_index:08d}"

    kinds: List[str] = []
    texts: List[str] = []
    media: List[str] = []
    n_media = 0
    prev_was_cell = False
    while len(kinds) < n_spans:
        r = rng.random()
        if r < 0.62 or (prev_was_cell and r < 0.77):
            nw = int(rng.integers(3, 28))
            kinds.append(KIND_TEXT)
            texts.append(" ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), nw)))
            media.append("")
            prev_was_cell = False
        elif r < 0.72:
            nw = int(rng.integers(2, 6))
            kinds.append(KIND_HEADING)
            texts.append(" ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), nw)))
            media.append("")
            prev_was_cell = False
        elif r < 0.87 and not prev_was_cell:
            # a lattice-table run: >= 2 cells (singleton cell groups are
            # dropped by cells_to_tables, reference table.py:352-355)
            ncells = 2 + int(rng.geometric(0.25))
            for _ in range(ncells):
                nw = int(rng.integers(1, 3))
                kinds.append(KIND_CELL)
                texts.append(" ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), nw)))
                media.append("")
            prev_was_cell = True
        else:
            kinds.append(KIND_MEDIA)
            texts.append("")
            media.append(f"media://{doc_id}/{n_media}")
            n_media += 1
            prev_was_cell = False

    offsets = assign_offsets(texts)
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": o}
        for k, t, m, o in zip(kinds, texts, media, offsets)
    ]


def make_docs_table(
    n_docs: int,
    seed: int = 42,
    start_index: int = 0,
    pathological_rate: float = 0.01,
) -> pa.Table:
    doc_ids = [f"doc-{i:08d}" for i in range(start_index, start_index + n_docs)]
    spans = [
        make_doc_spans(i, seed=seed, pathological_rate=pathological_rate)
        for i in range(start_index, start_index + n_docs)
    ]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans, pa.list_(SPAN)),
        }
    )


ROW_GROUP_SIZE = 128  # small row groups so ray.data reads split into many
                      # blocks and map stages are never bundle-starved


def write_corpus(
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    docs_per_shard: int = 2000,
    pathological_rate: float = 0.01,
) -> List[str]:
    """Sharded parquet corpus — one file per shard so reads parallelize and
    a resumable run can skip finished shards."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for shard, start in enumerate(range(0, n_docs, docs_per_shard)):
        path = os.path.join(out_dir, f"docs-{shard:05d}.parquet")
        if not os.path.exists(path):
            n = min(docs_per_shard, n_docs - start)
            t = make_docs_table(
                n, seed=seed, start_index=start, pathological_rate=pathological_rate
            )
            pq.write_table(t, path, row_group_size=ROW_GROUP_SIZE)
        paths.append(path)
    return paths


def ensure_corpus_ray(
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    docs_per_shard: int = 2000,
    pathological_rate: float = 0.01,
) -> List[str]:
    """Like :func:`write_corpus` but generates missing shards in parallel
    Ray tasks (generation is per-doc seeded, so shard boundaries don't
    affect content). Existing shards are skipped — corpus prep is
    resumable and cached across bench runs."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    todo = []
    paths = []
    for shard, start in enumerate(range(0, n_docs, docs_per_shard)):
        path = os.path.join(out_dir, f"docs-{shard:05d}.parquet")
        paths.append(path)
        if not os.path.exists(path):
            todo.append((path, start, min(docs_per_shard, n_docs - start)))
    if todo:
        @ray.remote(num_cpus=1)
        def _write(path: str, start: int, n: int) -> str:
            t = make_docs_table(
                n, seed=seed, start_index=start, pathological_rate=pathological_rate
            )
            tmp = path + ".tmp"
            pq.write_table(t, tmp, row_group_size=ROW_GROUP_SIZE)
            os.replace(tmp, path)  # atomic: partial writes never count as done
            return path

        ray.get([_write.remote(*args) for args in todo])
    return paths


# ---- adapter: driver documents table -> interleaved DOCS rows ----

def chunk_text(text: str, chunk_words: int) -> List[str]:
    words = text.split(" ")
    return [
        " ".join(words[i : i + chunk_words]) for i in range(0, len(words), chunk_words)
    ]


def docs_from_documents_batch(batch: pa.Table, chunk_words: int = 12) -> pa.Table:
    """Adapter for ``/root/testdata/*/documents.parquet``: every document
    becomes an interleaved doc whose ``text`` spans are ``chunk_words``-word
    windows of the original text. ``' '.join(span texts)`` == original text.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_ids: List[str] = []
    out_spans: List[List[Dict]] = []
    for did, text in zip(doc_ids, texts):
        chunks = [c for c in chunk_text(text or "", chunk_words) if c]
        offsets = assign_offsets(chunks)
        out_ids.append(f"doc-{did:08d}" if isinstance(did, int) else str(did))
        out_spans.append(
            [
                {"kind": KIND_TEXT, "text": c, "media_ref": "", "offset": o}
                for c, o in zip(chunks, offsets)
            ]
        )
    return pa.table(
        {
            "doc_id": pa.array(out_ids, pa.string()),
            "spans": pa.array(out_spans, pa.list_(SPAN)),
        }
    )


# punctuation-free and long on purpose: invisible to the shallow nav rule,
# removable only by the cross-document template-frequency rule
FOOTER = (
    "this site is operated by example corp and all rights are reserved "
    "worldwide including text and data mining twenty twenty six"
)


def docs_with_boilerplate_batch(batch: pa.Table, chunk_words: int = 12) -> pa.Table:
    """Adapter for the main-content (boilerplate-strip) pipeline: wraps each
    document's body chunks with (a) a doc-specific separator-dense nav bar
    (caught by the shallow-feature rule alone — its fingerprint is unique
    per doc) and (b) a site-wide footer shared by every doc (caught by the
    cross-document template-frequency rule). Stripping must recover exactly
    the original body text."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_ids: List[str] = []
    out_spans: List[List[Dict]] = []
    for did, text in zip(doc_ids, texts):
        chunks = [c for c in chunk_text(text or "", chunk_words) if c]
        key = f"doc-{did:08d}" if isinstance(did, int) else str(did)
        nav = f"| Home | Page {did if isinstance(did, int) else 0} | Back |"
        spans = [{"kind": KIND_TEXT, "text": nav, "media_ref": "", "offset": 0}]
        off = len(nav) + 1
        for c in chunks:
            spans.append({"kind": KIND_TEXT, "text": c, "media_ref": "", "offset": off})
            off += len(c) + 1
        spans.append({"kind": KIND_TEXT, "text": FOOTER, "media_ref": "", "offset": off})
        out_ids.append(key)
        out_spans.append(spans)
    return pa.table(
        {
            "doc_id": pa.array(out_ids, pa.string()),
            "spans": pa.array(out_spans, pa.list_(SPAN)),
        }
    )


def documents_with_unicode_batch(batch: pa.Table) -> pa.Table:
    """Adapter for the text-normalization op: wraps each document text
    with deterministic dirt (tab runs, a control char, a decomposed
    e + combining acute) that the oracle reconstructs with chr() in SQL."""
    texts = [
        f"\t {t}\x07  caf{'e'}́ " for t in batch.column("text").to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "text": pa.array(texts, pa.string()),
        }
    )


def documents_with_pii_batch(batch: pa.Table) -> pa.Table:
    """Adapter for the PII-redaction op: appends a deterministic email /
    long number / URL per doc that the oracle reconstructs in SQL."""
    ids = batch.column("doc_id").to_pylist()
    texts = [
        f"{t} contact user{d}@example.com or call 555{d:07d} see "
        f"https://example.com/doc/{d}?ref=x"
        for d, t in zip(ids, batch.column("text").to_pylist())
    ]
    return pa.table(
        {"doc_id": batch.column("doc_id"), "text": pa.array(texts, pa.string())}
    )


def docs_corrupted_batch(batch: pa.Table, chunk_words: int = 12) -> pa.Table:
    """Adapter for the repair pipeline: deterministically corrupts each
    document's span list (doc_id % 3 == 0: scrambled order, offsets
    intact; == 1: offsets zeroed, order intact; == 2: untouched) so
    ``repair_docs_ds`` must restore every doc before extraction."""
    base = docs_from_documents_batch(batch, chunk_words=chunk_words)
    ids = base.column("doc_id").to_pylist()
    out_spans: List[List[Dict]] = []
    for key, spans in zip(ids, base.column("spans").to_pylist()):
        n = int(key.rsplit("-", 1)[1])
        if n % 3 == 0:
            spans = spans[::-1]
        elif n % 3 == 1:
            spans = [{**s, "offset": 0} for s in spans]
        out_spans.append(spans)
    return pa.table(
        {
            "doc_id": base.column("doc_id"),
            "spans": pa.array(out_spans, pa.list_(SPAN)),
        }
    )


def docs_with_annots_batch(batch: pa.Table, chunk_words: int = 6) -> pa.Table:
    """Adapter for annotation queries: the first ``chunk_words``-word window
    of each document becomes a *heading* span (emits a contents annotation),
    the rest stay text spans, and one trailing ``media_ref`` span is added
    (emits a uri/link annotation) — all arithmetic the DuckDB oracle can
    reproduce from ``documents.doc_id``/``text`` alone."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_ids: List[str] = []
    out_spans: List[List[Dict]] = []
    for did, text in zip(doc_ids, texts):
        chunks = [c for c in chunk_text(text or "", chunk_words) if c]
        offsets = assign_offsets(chunks)
        key = f"doc-{did:08d}" if isinstance(did, int) else str(did)
        spans = [
            {
                "kind": KIND_HEADING if i == 0 else KIND_TEXT,
                "text": c,
                "media_ref": "",
                "offset": o,
            }
            for i, (c, o) in enumerate(zip(chunks, offsets))
        ]
        spans.append(
            {
                "kind": KIND_MEDIA,
                "text": "",
                "media_ref": f"media://{key}/0",
                "offset": offsets[-1] + len(chunks[-1]) + 1 if chunks else 0,
            }
        )
        out_ids.append(key)
        out_spans.append(spans)
    return pa.table(
        {
            "doc_id": pa.array(out_ids, pa.string()),
            "spans": pa.array(out_spans, pa.list_(SPAN)),
        }
    )
