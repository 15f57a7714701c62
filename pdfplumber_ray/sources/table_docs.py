"""Relational rows -> interleaved table documents (lattice-oracle source).

Turns each ``lineitem`` order group into one interleaved document whose
spans are all ``table_cell``: the decode stage lays them into a lattice
grid (rects), and table extraction must recover every cell in row-major
order — giving the full edge/intersection/cell/table chain a SQL-checkable
oracle over real relational data (row_number + unnest on the same table).
"""

from __future__ import annotations

from typing import List

import pyarrow as pa
import ray.data

from ..schemas import SPAN

CELL_COLS = ("l_linenumber", "l_returnflag", "l_linestatus")
N_CELL_COLS = len(CELL_COLS)


def order_group_to_doc(group: pa.Table) -> pa.Table:
    """One lineitem order group -> one DOCS row of table_cell spans,
    lineitems ordered by l_linenumber, N_CELL_COLS cells per lineitem."""
    import numpy as np

    ln = group.column("l_linenumber").to_numpy()
    flags = group.column("l_returnflag").to_pylist()
    stats = group.column("l_linestatus").to_pylist()
    # l_linenumber is not unique within an order; use a total order so the
    # SQL oracle's ROW_NUMBER sees the identical sequence
    order = sorted(
        range(len(ln)), key=lambda i: (int(ln[i]), flags[i], stats[i])
    )
    okey = group.column("l_orderkey")[0].as_py()
    cells: List[str] = []
    for i in order:
        cells.extend((str(int(ln[i])), flags[i], stats[i]))
    offs = 0
    spans = []
    for c in cells:
        spans.append({"kind": "table_cell", "text": c, "media_ref": "", "offset": offs})
        offs += len(c)
    return pa.table(
        {
            "doc_id": pa.array([f"order-{okey:010d}"], pa.string()),
            "spans": pa.array([spans], pa.list_(SPAN)),
        }
    )


def docs_from_lineitem(sf_dir: str) -> ray.data.Dataset:
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"],
    )
    return li.groupby("l_orderkey").map_groups(order_group_to_doc, batch_format="pyarrow")


def cells_table_from_spans(batch: pa.Table) -> pa.Table:
    """out_spans rows -> (doc_key:int64, cell_index:int64, cell_text)."""
    doc_ids = batch.column("doc_id").to_pylist()
    span_lists = batch.column("spans").to_pylist()
    keys: List[int] = []
    idxs: List[int] = []
    texts: List[str] = []
    for did, spans in zip(doc_ids, span_lists):
        okey = int(did.rsplit("-", 1)[1])
        for i, s in enumerate(spans):
            keys.append(okey)
            idxs.append(i)
            texts.append(s["text"])
    return pa.table(
        {
            "doc_key": pa.array(keys, pa.int64()),
            "cell_index": pa.array(idxs, pa.int64()),
            "cell_text": pa.array(texts, pa.string()),
        }
    )
