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


def test_unknown_container_raises():
    with pytest.raises(NotImplementedError):
        mm._decode_payload(b"RIFFxxxxWAVE....")  # audio: no codec here


def test_real_png_metadata_decodes():
    """Real-codec path (PNG): dims from IHDR, no imaging dep. The PNG is
    produced by the repo's own encoder, so the bytes are a real image."""
    from pdfplumber_ray.display import encode_png

    png = encode_png(np.zeros((48, 64, 3), dtype=np.uint8))
    meta = mm._decode_payload(png)
    assert (meta["width"], meta["height"], meta["kind"]) == (64, 48, mm.KIND_IMAGE)
    assert meta["n_frames"] == 1 and meta["n_bytes"] == len(png)
    # the decode stage consumes it like any other payload
    out = mm.MediaDecode()(
        pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),
                "media_ref": pa.array(["media://real/0"]),
                "payload": pa.array([png], pa.binary()),
            }
        )
    )
    assert out.column("width").to_pylist() == [64]
    assert out.column("height").to_pylist() == [48]


def test_real_jpeg_metadata_decodes():
    """Real-codec path (JPEG): dims from the SOF0 marker scan."""
    sof0 = b"\xff\xc0" + (8 + 3).to_bytes(2, "big") + bytes([8]) + (
        (120).to_bytes(2, "big") + (200).to_bytes(2, "big") + bytes([3])
    ) + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
    jpeg = b"\xff\xd8" + b"\xff\xe0\x00\x04\x4a\x46" + sof0 + b"\xff\xd9"
    meta = mm._decode_payload(jpeg)
    assert (meta["width"], meta["height"]) == (200, 120)


def test_real_image_resize_requires_pil():
    from pdfplumber_ray.display import encode_png

    png = encode_png(np.zeros((8, 8, 3), dtype=np.uint8))
    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "media_ref": pa.array(["media://real/0"]),
            "payload": pa.array([png], pa.binary()),
        }
    )
    if mm.HAVE_PIL:  # pragma: no cover - PIL absent in sandbox
        out = mm.MediaResize(4, 4)(t)
        assert mm._decode_payload(out.column("payload")[0].as_py())["width"] == 4
    else:
        with pytest.raises(NotImplementedError):
            mm.MediaResize(4, 4)(t)


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


def test_real_wav_metadata_decodes():
    """Real-codec path (WAV): rate/channels/frames from RIFF chunks. The
    bytes come from the stdlib wave writer, so they are a real file."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x00\x00" * 2 * 123)  # 123 stereo frames
    payload = buf.getvalue()
    meta = mm._decode_payload(payload)
    assert meta["kind"] == mm.KIND_AUDIO
    assert meta["width"] == 16000      # sample rate
    assert meta["height"] == 2         # channels
    assert meta["n_frames"] == 123


def test_media_resize_rejects_wav():
    """A RIFF/WAVE payload must be rejected, not silently repacked under a
    SYNM header (which would be garbage output)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 16)
    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "media_ref": pa.array(["media://real/wav"]),
            "payload": pa.array([buf.getvalue()], pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError, match="WAV"):
        mm.MediaResize(32, 32)(t)


def test_jpeg_meta_skips_fill_bytes():
    """0xFF fill bytes between JPEG segments are legal padding; the marker
    scan must not read a segment length out of the marker byte."""
    sof0 = b"\xff\xc0" + (8 + 3).to_bytes(2, "big") + bytes([8]) + (
        (120).to_bytes(2, "big") + (200).to_bytes(2, "big") + bytes([3])
    ) + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
    # APP0, then three fill bytes before the SOF0 marker
    jpeg = b"\xff\xd8" + b"\xff\xe0\x00\x04\x4a\x46" + b"\xff\xff\xff" + sof0[1:] + b"\xff\xd9"
    meta = mm._decode_jpeg_meta(jpeg)
    assert (meta["width"], meta["height"]) == (200, 120)


class _FakePILModule:
    """Stand-in for PIL.Image (absent in this sandbox): parses the real
    container's header for dims, resizes by re-encoding a blank canvas at
    the target size via the repo's own PNG encoder — so the PIL branch in
    MediaDecode/MediaResize runs against payloads that survive a real
    round-trip through _decode_payload."""

    class _Im:
        def __init__(self, payload):
            meta = (
                mm._decode_png_meta(payload)
                if payload[:8] == mm._PNG_MAGIC
                else mm._decode_jpeg_meta(payload)
            )
            self.width = meta["width"]
            self.height = meta["height"]
            self.n_frames = meta["n_frames"]
            self.format = "PNG" if payload[:8] == mm._PNG_MAGIC else "JPEG"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def resize(self, wh):
            self._target = wh
            return self

        def save(self, buf, format=None):
            from pdfplumber_ray.display import encode_png

            w, h = self._target
            buf.write(encode_png(np.zeros((h, w, 3), dtype=np.uint8)))

    @staticmethod
    def open(fp):
        return _FakePILModule._Im(fp.read())


def test_pil_branch_decode_and_resize(monkeypatch):
    """With an imaging lib present (stubbed here — the sandbox has none),
    MediaDecode reads dims through PIL and MediaResize produces a REAL
    re-encoded image at the target size; the output payload must decode
    back through _decode_payload with the new dims."""
    from pdfplumber_ray.display import encode_png

    monkeypatch.setattr(mm, "HAVE_PIL", True)
    monkeypatch.setattr(mm, "_PILImage", _FakePILModule)
    png = encode_png(np.zeros((48, 64, 3), dtype=np.uint8))
    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "media_ref": pa.array(["media://real/0"]),
            "payload": pa.array([png], pa.binary()),
        }
    )
    dec = mm.MediaDecode()(batch)
    assert dec.column("width").to_pylist() == [64]
    assert dec.column("height").to_pylist() == [48]
    res = mm.MediaResize(target_w=32, target_h=16)(batch)
    out_payload = res.column("payload")[0].as_py()
    meta = mm._decode_payload(out_payload)
    assert (meta["width"], meta["height"]) == (32, 16)
    # synthetic containers still take the SYNM path under the flag
    synm = pa.table(
        {
            "doc_id": pa.array([2], pa.int64()),
            "media_ref": pa.array(["media://synm/0"]),
            "payload": pa.array(
                [mm.pack_payload(mm.KIND_IMAGE, 320, 200, 1)], pa.binary()
            ),
        }
    )
    res2 = mm.MediaResize(target_w=32, target_h=16)(synm)
    m2 = mm._decode_payload(res2.column("payload")[0].as_py())
    assert (m2["width"], m2["height"]) == (32, 16)


def test_perceptual_hash_synm_known_bits(ray_session):
    from pdfplumber_ray.stages import multimodal as mm

    # hand-check one payload: w=h=64 -> body[i] = (i*31 + 128) % 256,
    # L = 64 -> idx = p (identity sampling), gradient always +31 except
    # at the mod-256 wraparound
    ph = mm.PerceptualHash()
    payload = mm.pack_payload(mm.KIND_IMAGE, 64, 64, 1)
    batch = pa.table(
        {"doc_id": pa.array([0], pa.int64()), "payload": pa.array([payload], pa.binary())}
    )
    (h,) = ph(batch).column("dhash").to_pylist()
    body = bytes((i * 31 + 128) % 256 for i in range(64))
    expect = 0
    for p in range(63):
        if p % 8 < 7 and body[p + 1] > body[p]:
            expect |= 1 << ((p // 8) * 7 + (p % 8))
    assert h == expect and 0 <= h < (1 << 56)


def test_perceptual_hash_rejects_real_images_without_pil():
    from pdfplumber_ray.stages import multimodal as mm

    if mm.HAVE_PIL:
        pytest.skip("PIL present: real decode path active")
    ph = mm.PerceptualHash()
    with pytest.raises(NotImplementedError):
        ph._grid(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(NotImplementedError):
        ph._grid(b"RIFFxxxxWAVE" + b"\x00" * 16)


def test_phash_dedup_groups_and_partition_invariance(ray_session):
    from pdfplumber_ray.pipelines.media import phash_dedup_ds

    # ids 0 and 1024 produce identical payloads (w, h wrap mod 1024)
    ids = [0, 1024, 3, 5]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64())})
    )
    rows = {r["dhash"]: (r["keep_doc_id"], r["n_docs"])
            for r in phash_dedup_ds(docs).take_all()}
    dups = [v for v in rows.values() if v[1] == 2]
    assert dups == [(0, 2)]
    assert sum(n for _, n in rows.values()) == 4
    rows2 = {r["dhash"]: (r["keep_doc_id"], r["n_docs"])
             for r in phash_dedup_ds(docs.repartition(4)).take_all()}
    assert rows2 == rows
