"""Multimodal stage plumbing: synthetic container decode, resize,
frame-sampling, and the unsupported-codec error path."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from pdfplumber_ray.stages import multimodal as mm
from pdfplumber_ray.pipelines.media import frame_sample_ds, media_decode_ds, media_resize_ds


def test_payload_roundtrip():
    p = mm.pack_payload(mm.KIND_IMAGE, 320, 200, 1)
    meta = mm._decode_payload(p)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (320, 200, 1)
    assert meta["n_bytes"] == 11 + (320 * 200) // 64


def test_non_synthetic_payload_raises():
    with pytest.raises(NotImplementedError):
        mm._decode_payload(b"\x89PNG\r\n\x1a\n....")


@pytest.fixture(scope="module")
def ids_ds(ray_session):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0, 5, 1030, 42], pa.int64())})
    )


def test_media_decode_pipeline(ids_ds):
    rows = {r["doc_id"]: r for r in media_decode_ds(ids_ds).take_all()}
    assert rows[5]["width"] == 64 + 5
    assert rows[5]["height"] == 64 + 35
    assert rows[1030]["width"] == 64 + (1030 % 1024)
    assert rows[42]["n_frames"] == 1 + 42 % 30
    assert rows[42]["media_ref"] == "media://doc-00000042/0"


def test_media_resize_pipeline(ids_ds):
    out = media_resize_ds(ids_ds, 128, 128).take_all()
    for r in out:
        meta = mm._decode_payload(r["payload"])
        assert (meta["width"], meta["height"]) == (128, 128)
        assert meta["n_bytes"] == 11 + (128 * 128) // 64


def test_frame_sample_pipeline(ids_ds):
    out = frame_sample_ds(ids_ds, stride=5).take_all()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_index"])
    assert sorted(by_doc[42]) == list(range(0, 1 + 42 % 30, 5))
    assert sorted(by_doc[0]) == [0]


def test_media_features(ray_session):
    """Feature-extraction stage: header-derived dims + body checksum."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pdfplumber_ray.pipelines.media import media_features_ds
    from pdfplumber_ray.stages.multimodal import _HEADER, payloads_for_doc_ids

    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0, 7, 1023], pa.int64())})
    )
    out = media_features_ds(docs).to_pandas().set_index("doc_id")
    for did in (0, 7, 1023):
        p = payloads_for_doc_ids([did])[0]
        body = np.frombuffer(p, dtype=np.uint8, offset=_HEADER.size)
        w, h, nf = 64 + did % 1024, 64 + (did * 7) % 1024, 1 + did % 30
        row = out.loc[did]
        assert row.checksum == int(body.sum()) % 65536
        assert row.f0_e6 == w * 1_000_000 // 1024
        assert row.f1_e6 == h * 1_000_000 // 1024
        assert row.f2_e6 == nf * 1_000_000 // 30
