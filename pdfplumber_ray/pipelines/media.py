"""Multimodal dataset pipelines: payload attach -> decode / resize /
frame-sample actor stages. Small default batch sizes: payload bytes x
batch x concurrency must fit the worker heap (SURVEY.md §4 memory note).
"""

from __future__ import annotations

from typing import Optional

import ray.data

from ..config import PipelineConfig
from ..stages.multimodal import (
    FrameSample,
    MediaDecode,
    MediaFeatures,
    MediaResize,
    attach_payloads,
)
from .extract import stage_map_batches

Dataset = ray.data.Dataset

MEDIA_BATCH_SIZE = 128  # large binary rows -> smaller batches than text

# Media stages default to a bounded ACTOR pool: a real decoder loads codec
# state (models, ffmpeg contexts) too heavy to rebuild on worker churn —
# exactly the case PipelineConfig.use_actors exists for.
_MEDIA_CFG_DEFAULT = None


def _media_cfg(cfg):
    from ..config import PipelineConfig

    return cfg or PipelineConfig(use_actors=True, concurrency=(2, 16))


def with_payloads(docs: Dataset, id_col: str = "doc_id") -> Dataset:
    def fn(batch):
        return attach_payloads(batch, id_col=id_col)

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def media_decode_ds(
    docs: Dataset, cfg: Optional[PipelineConfig] = None, id_col: str = "doc_id"
) -> Dataset:
    cfg = _media_cfg(cfg)
    return stage_map_batches(
        with_payloads(docs, id_col),
        MediaDecode,
        {"id_col": id_col},
        batch_size=MEDIA_BATCH_SIZE,
        use_actors=cfg.use_actors,
        concurrency=cfg.concurrency,
    )


def media_resize_ds(
    docs: Dataset,
    target_w: int,
    target_h: int,
    cfg: Optional[PipelineConfig] = None,
    id_col: str = "doc_id",
) -> Dataset:
    cfg = _media_cfg(cfg)
    return stage_map_batches(
        with_payloads(docs, id_col),
        MediaResize,
        {"target_w": target_w, "target_h": target_h, "id_col": id_col},
        batch_size=MEDIA_BATCH_SIZE,
        use_actors=cfg.use_actors,
        concurrency=cfg.concurrency,
    )


def frame_sample_ds(
    docs: Dataset,
    stride: int = 5,
    cfg: Optional[PipelineConfig] = None,
    id_col: str = "doc_id",
) -> Dataset:
    cfg = _media_cfg(cfg)
    return stage_map_batches(
        with_payloads(docs, id_col),
        FrameSample,
        {"stride": stride, "id_col": id_col},
        batch_size=MEDIA_BATCH_SIZE,
        use_actors=cfg.use_actors,
        concurrency=cfg.concurrency,
    )


def media_features_ds(
    docs: Dataset, cfg: Optional[PipelineConfig] = None, id_col: str = "doc_id"
) -> Dataset:
    """Batched feature extraction over the binary media column (the
    model-inference shape: weights loaded once per actor in __init__)."""
    cfg = _media_cfg(cfg)
    return stage_map_batches(
        with_payloads(docs, id_col),
        MediaFeatures,
        {"id_col": id_col},
        batch_size=MEDIA_BATCH_SIZE,
        use_actors=cfg.use_actors,
        concurrency=cfg.concurrency,
    )


def phash_dedup_ds(
    docs: Dataset, cfg: Optional[PipelineConfig] = None, id_col: str = "doc_id"
) -> Dataset:
    """Perceptual-hash image dedup: dHash-56 per payload (actor stage)
    -> exact dedup groups over the hash — the multimodal counterpart of
    text exact-dedup (near-identical images collide on the gradient
    hash). Output: one row per distinct hash with ``keep_doc_id`` (min
    id) and ``n_docs``. Combiner-before-groupby: each block reduces to
    one (dhash, min-id, count) partial per distinct hash, so only
    partials shuffle."""
    import pyarrow as pa
    from ray.data.aggregate import Min, Sum

    from ..stages.multimodal import PerceptualHash

    cfg = _media_cfg(cfg)
    hashed = stage_map_batches(
        with_payloads(docs, id_col),
        PerceptualHash,
        {"id_col": id_col},
        batch_size=MEDIA_BATCH_SIZE,
        use_actors=cfg.use_actors,
        concurrency=cfg.concurrency,
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("dhash").aggregate(
            [(id_col, "min"), (id_col, "count")]
        )
        return pa.table(
            {
                "dhash": g.column("dhash"),
                "keep_partial": g.column(f"{id_col}_min"),
                "n_partial": g.column(f"{id_col}_count").cast(pa.int64()),
            }
        )

    agg = (
        hashed.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dhash")
        .aggregate(Min("keep_partial"), Sum("n_partial"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dhash": batch.column("dhash").cast(pa.int64()),
                "keep_doc_id": batch.column("min(keep_partial)").cast(pa.int64()),
                "n_docs": batch.column("sum(n_partial)").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
