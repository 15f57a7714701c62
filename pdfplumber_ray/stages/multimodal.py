"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Real decode libraries (PIL/ffmpeg/torchaudio) are not in this container,
so the *codec* is stubbed with a deterministic synthetic container format
(``SYNM`` header, struct-packed fields) while everything Ray-side — binary
column schema, actor-pool stage shape, batch sizing for large payloads,
output layout — is real and tested. Swapping in a real decoder means
replacing ``_decode_payload`` only; a non-synthetic payload raises
``NotImplementedError`` with a clear message rather than garbage.

Payload layout (big-endian):
    0:4   magic  b"SYNM"
    4:5   kind   (1=image, 2=audio, 3=video)
    5:7   width  uint16
    7:9   height uint16
    9:11  n_frames uint16
    11:.. body   (width*height)//64 pseudo bytes
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

MAGIC = b"SYNM"
KIND_IMAGE, KIND_AUDIO, KIND_VIDEO = 1, 2, 3
_HEADER = struct.Struct(">4sBHHH")


def pack_payload(kind: int, width: int, height: int, n_frames: int) -> bytes:
    body_len = (width * height) // 64
    body = bytes((i * 31 + width + height) % 256 for i in range(body_len))
    return _HEADER.pack(MAGIC, kind, width, height, n_frames) + body


def _decode_payload(payload: bytes) -> Dict[str, int]:
    if payload[:4] != MAGIC:
        raise NotImplementedError(
            "real image/audio decode requires PIL/ffmpeg (not available in "
            "this environment); only the SYNM synthetic container is supported"
        )
    magic, kind, width, height, n_frames = _HEADER.unpack_from(payload)
    return {
        "kind": kind,
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "n_bytes": len(payload),
    }


def payloads_for_doc_ids(doc_ids: List[int], kind: int = KIND_VIDEO) -> List[bytes]:
    """Deterministic payload per doc id (width/height/frames are simple
    arithmetic on the id, so SQL oracles can predict the decoded values)."""
    return [
        pack_payload(
            kind,
            64 + int(d) % 1024,
            64 + (int(d) * 7) % 1024,
            1 + int(d) % 30,
        )
        for d in doc_ids
    ]


def attach_payloads(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    return pa.table(
        {
            id_col: batch.column(id_col),
            "media_ref": pa.array([f"media://doc-{int(d):08d}/0" for d in ids]),
            "payload": pa.array(payloads_for_doc_ids(ids), pa.binary()),
        }
    )


class MediaDecode:
    """Actor-pool stage: binary payload -> typed metadata columns.

    A real decoder would load its codec state in ``__init__`` (once per
    actor); per-batch work stays a tight loop over the binary column."""

    def __init__(self, id_col: str = "doc_id"):
        self.id_col = id_col
        self.header = _HEADER  # codec state resolved once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        metas = [_decode_payload(p) for p in payloads]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "media_ref": batch.column("media_ref"),
                "media_kind": pa.array([m["kind"] for m in metas], pa.int32()),
                "width": pa.array([m["width"] for m in metas], pa.int64()),
                "height": pa.array([m["height"] for m in metas], pa.int64()),
                "n_frames": pa.array([m["n_frames"] for m in metas], pa.int64()),
                "n_bytes": pa.array([m["n_bytes"] for m in metas], pa.int64()),
            }
        )


class MediaFeatures:
    """Actor-pool feature-extraction stage — the batched-model-inference
    shape: a real extractor would load its model weights in ``__init__``
    (once per actor) and run a batched forward pass per ``__call__``. Here
    the "model" is a deterministic function of the payload (header fields
    + a body checksum) so a SQL oracle can verify the plumbing end to end.
    Emits a quantized feature vector as typed columns."""

    def __init__(self, id_col: str = "doc_id"):
        self.id_col = id_col
        self.header = _HEADER  # model/codec state resolved once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        checksums: List[int] = []
        f0: List[int] = []
        f1: List[int] = []
        f2: List[int] = []
        for p in payloads:
            meta = _decode_payload(p)
            body = np.frombuffer(p, dtype=np.uint8, offset=_HEADER.size)
            checksums.append(int(body.sum(dtype=np.int64)) % 65536)
            # pure integer quantization: floor division avoids the
            # round-half-even vs round-half-away divergence on exact .5s
            f0.append(meta["width"] * 1_000_000 // 1024)
            f1.append(meta["height"] * 1_000_000 // 1024)
            f2.append(meta["n_frames"] * 1_000_000 // 30)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "checksum": pa.array(checksums, pa.int64()),
                "f0_e6": pa.array(f0, pa.int64()),
                "f1_e6": pa.array(f1, pa.int64()),
                "f2_e6": pa.array(f2, pa.int64()),
            }
        )


class MediaResize:
    """Actor-pool stage: deterministic 'resize' — header rewritten to the
    target size, body resampled by stride (stands in for a real kernel)."""

    def __init__(self, target_w: int, target_h: int, id_col: str = "doc_id"):
        self.tw = target_w
        self.th = target_h
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: List[bytes] = []
        for p in batch.column("payload").to_pylist():
            meta = _decode_payload(p)
            body = p[_HEADER.size :]
            tgt_len = (self.tw * self.th) // 64
            if len(body) >= tgt_len:
                stride = max(1, len(body) // max(tgt_len, 1))
                body2 = body[::stride][:tgt_len]
            else:
                body2 = (body * ((tgt_len // max(len(body), 1)) + 1))[:tgt_len]
            out.append(
                _HEADER.pack(MAGIC, meta["kind"], self.tw, self.th, meta["n_frames"])
                + body2
            )
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "media_ref": batch.column("media_ref"),
                "payload": pa.array(out, pa.binary()),
            }
        )


class FrameSample:
    """Actor-pool stage: video payload -> one row per sampled frame index
    (every ``stride``-th frame)."""

    def __init__(self, stride: int = 5, id_col: str = "doc_id"):
        self.stride = stride
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        refs = batch.column("media_ref").to_pylist()
        out_id: List = []
        out_ref: List[str] = []
        out_fi: List[int] = []
        for i, (d, r) in enumerate(zip(ids, refs)):
            meta = _decode_payload(batch.column("payload")[i].as_py())
            for fi in range(0, meta["n_frames"], self.stride):
                out_id.append(d)
                out_ref.append(r)
                out_fi.append(fi)
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "media_ref": pa.array(out_ref),
                "frame_index": pa.array(out_fi, pa.int64()),
            }
        )
