"""End-to-end ``ray.data`` pipelines (docs -> out_spans and operator tables).

All stages are streaming ``map_batches`` over zero-copy Arrow; nothing here
materializes the dataset or loops rows on the driver. Actor-pool stages
autoscale ``concurrency=(1, max)`` so the same pipeline saturates an 8-CPU
or a 256-node cluster without config changes; correctness never depends on
block/execution order (ordering is data: ``page_number`` and in-row span
lists — SURVEY.md §4).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Union

import pyarrow as pa
import ray.data

from ..config import PipelineConfig, TableConfig, WordConfig
from ..stages.decode import (
    ExtractSpans,
    PagesToTables,
    PagesToText,
    PagesToWords,
    SynthDecodePages,
    pages_batch_to_chars,
)

Dataset = ray.data.Dataset

# autoscaling actor-pool bounds: let Ray size the pool to the cluster; the
# cap only bounds actor churn on very large clusters.
_ACTOR_POOL = (1, 64)


def read_docs(paths: Union[str, Sequence[str]], **kwargs: Any) -> Dataset:
    """Read an interleaved-doc corpus. Parquet in this sandbox; in
    production the same call sites use ``ray.data.read_lance`` (pylance is
    not installable offline — SURVEY.md intro)."""
    return ray.data.read_parquet(paths, **kwargs)


def extract_spans_ds(docs: Dataset, cfg: Optional[PipelineConfig] = None) -> Dataset:
    """Flagship: docs -> OUT_SPANS (+ n_pages, error cols). One fused
    actor-pool stage; embarrassingly parallel, shuffle-free."""
    cfg = cfg or PipelineConfig()
    return docs.map_batches(
        ExtractSpans,
        fn_constructor_kwargs={"cfg": cfg},
        batch_size=cfg.batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=cfg.concurrency or _ACTOR_POOL,
        num_cpus=cfg.num_cpus,
    )


def split_errors(out_spans: Dataset) -> Dataset:
    """Dead-letter view: quarantined docs only (vectorized Arrow filter)."""
    import pyarrow.compute as pc

    def _keep_errors(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column("error")))

    return out_spans.map_batches(
        _keep_errors, batch_format="pyarrow", zero_copy_batch=True
    )


def decode_pages_ds(docs: Dataset, cfg: Optional[PipelineConfig] = None) -> Dataset:
    cfg = cfg or PipelineConfig()
    return docs.map_batches(
        SynthDecodePages,
        fn_constructor_kwargs={"cfg": cfg},
        batch_size=cfg.batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=cfg.concurrency or _ACTOR_POOL,
        num_cpus=cfg.num_cpus,
    )


def chars_ds(pages: Dataset) -> Dataset:
    return pages.map_batches(
        pages_batch_to_chars, batch_format="pyarrow", zero_copy_batch=True
    )


def words_ds(pages: Dataset, word_cfg: Optional[WordConfig] = None) -> Dataset:
    return pages.map_batches(
        PagesToWords,
        fn_constructor_kwargs={"word_cfg": word_cfg},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=_ACTOR_POOL,
    )


def page_text_ds(pages: Dataset, mode: str = "default", **kwargs: Any) -> Dataset:
    return pages.map_batches(
        PagesToText,
        fn_constructor_kwargs={"mode": mode, **kwargs},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=_ACTOR_POOL,
    )


def tables_ds(pages: Dataset, table_cfg: Optional[TableConfig] = None) -> Dataset:
    return pages.map_batches(
        PagesToTables,
        fn_constructor_kwargs={"table_cfg": table_cfg},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=_ACTOR_POOL,
    )
