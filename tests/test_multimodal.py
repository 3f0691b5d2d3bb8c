"""Multimodal stage plumbing tests (deterministic fake decode; schema,
row expansion, actor signature are the real surface)."""

import pyarrow as pa
import pytest
import ray.data

from webextract.stages.multimodal import (
    FrameSampler,
    ImageDecoder,
    ImageResizer,
    audio_features_batch,
)


def _payloads():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "image": pa.array([b"\x89PNGfakedata" * 50, b"\xff\xd8jpegish" * 9, b""],
                              type=pa.binary()),
        }
    )


def test_image_decoder_deterministic():
    out1 = ImageDecoder()(_payloads())
    out2 = ImageDecoder()(_payloads())
    assert out1.column("width").to_pylist() == out2.column("width").to_pylist()
    assert out1.column("width")[2].as_py() == 0  # empty payload
    feats = out1.column("features")[0].as_py()
    assert len(feats) == 16 and abs(sum(feats) - 1.0) < 1e-9


def test_image_decoder_strict_raises():
    with pytest.raises(NotImplementedError, match="cv2/PIL"):
        ImageDecoder(strict=True)(_payloads())


def test_resizer_records_scale_metadata():
    out = ImageResizer(max_side=100)(ImageDecoder()(_payloads()))
    for w, h, rw, rh, s in zip(
        out.column("width").to_pylist(),
        out.column("height").to_pylist(),
        out.column("resized_w").to_pylist(),
        out.column("resized_h").to_pylist(),
        out.column("scale").to_pylist(),
    ):
        assert max(rw, rh) <= 100 or s == 1.0
        assert rw == int(w * s) and rh == int(h * s)


def test_frame_sampler_row_expansion():
    t = pa.table(
        {
            "doc_id": pa.array([7], type=pa.int64()),
            "video": pa.array([b"v" * 5000], type=pa.binary()),
        }
    )
    out = FrameSampler(every_n=2)(t)
    assert out.column_names == ["doc_id", "frame_idx", "ts_ms"]
    assert out.num_rows == 3  # 6 fake frames sampled every 2
    assert out.column("doc_id").to_pylist() == [7, 7, 7]
    assert out.column("frame_idx").to_pylist() == [0, 2, 4]


def test_audio_features():
    t = pa.table({"audio": pa.array([b"wavdata123", b""], type=pa.binary())})
    out = audio_features_batch(t)
    assert len(out.column("mfcc")[0].as_py()) == 8
    assert out.column("mfcc")[1].as_py() == [0.0] * 8


def test_actor_pool_integration(ray_session):
    ds = ray.data.from_arrow(_payloads())
    out = ds.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=2, concurrency=1
    ).to_pandas()
    assert len(out) == 3 and "features" in out.columns
