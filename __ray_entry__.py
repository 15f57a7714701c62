"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose each implemented operator with a
DuckDB-checkable SQL twin (column names match on both sides).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, Dict, List

import numpy as np
import pyarrow as pa

import ray.data

from pdfplumber_ray.config import PipelineConfig
from pdfplumber_ray.pipelines import (
    decode_pages_ds,
    extract_spans_ds,
    read_docs,
    words_ds,
)
from pdfplumber_ray.sources.synth_corpus import docs_from_documents_batch


def _interleaved_docs(sf_dir: str) -> ray.data.Dataset:
    """documents.parquet -> interleaved DOCS rows (deterministic adapter)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        docs_from_documents_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _doc_id_to_int(doc_ids: List[str]) -> pa.Array:
    return pa.array([int(d.rsplit("-", 1)[1]) for d in doc_ids], pa.int64())


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: interleaved docs ->
    decode/layout -> kernel extraction -> ordered out_spans."""
    return extract_spans_ds(_interleaved_docs("/root/testdata/sf0.001"), PipelineConfig())


# ---- queries & oracles -------------------------------------------------


def q_roundtrip_text(sf_dir: str) -> ray.data.Dataset:
    """Full extraction round trip: the joined extracted span texts must
    equal the original document text (geometry -> words -> blocks path)."""
    out = extract_spans_ds(_interleaved_docs(sf_dir))

    def rejoin(batch: pa.Table) -> pa.Table:
        ids = _doc_id_to_int(batch.column("doc_id").to_pylist())
        texts = [
            " ".join(s["text"] for s in spans)
            for spans in batch.column("spans").to_pylist()
        ]
        return pa.table({"doc_id": ids, "text": pa.array(texts, pa.string())})

    return out.map_batches(rejoin, batch_format="pyarrow", zero_copy_batch=True)


def q_word_count(sf_dir: str) -> ray.data.Dataset:
    """Per-document word count via the decode -> extract_words kernel path
    (reference utils/text.py:423-688), aggregated distributedly."""
    pages = decode_pages_ds(_interleaved_docs(sf_dir))
    w = words_ds(pages)

    # partial aggregation inside map_batches, then a tiny groupby
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = batch.group_by("doc_id").aggregate([("doc_id", "count")])
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "partial_n": g.column("doc_id_count").cast(pa.int64()),
            }
        )

    partials = w.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby("doc_id").sum("partial_n")

    def finish(batch: pa.Table) -> pa.Table:
        ids = _doc_id_to_int(batch.column("doc_id").to_pylist())
        n = batch.column("sum(partial_n)").cast(pa.int64())
        return pa.table({"doc_id": ids, "n_words": n})

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


QUERIES: Dict[str, Callable[[str], Any]] = {
    "roundtrip_text": q_roundtrip_text,
    "word_count": q_word_count,
}

ORACLES: Dict[str, str] = {
    "roundtrip_text": "SELECT doc_id, text FROM documents",
    "word_count": (
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words "
        "FROM documents"
    ),
}


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
