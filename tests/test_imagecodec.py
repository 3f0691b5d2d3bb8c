"""Real pure-numpy codecs: PPM/PGM/BMP round-trip, WAV decode, features."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from webextract.stages.imagecodec import (
    UnsupportedImageError,
    audio_features,
    decode_image,
    decode_wav,
    encode_ppm,
    encode_wav,
    image_features,
    resize_nearest,
    sniff_format,
)


def _img(h=40, w=60):
    rng = np.arange(h * w * 3, dtype=np.uint64)
    return ((rng * 2654435761) % 256).astype(np.uint8).reshape(h, w, 3)


def _bmp24(img):
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    return hdr + data


def test_ppm_roundtrip():
    img = _img()
    back = decode_image(encode_ppm(img))
    assert np.array_equal(back, img)


def test_ppm_header_with_comment():
    img = _img(4, 5)
    payload = b"P6\n# a comment\n5 4\n255\n" + img.tobytes()
    assert np.array_equal(decode_image(payload), img)


def test_pgm_decodes_to_gray_rgb():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    payload = b"P5\n4 3\n255\n" + gray.tobytes()
    img = decode_image(payload)
    assert img.shape == (3, 4, 3)
    assert np.array_equal(img[:, :, 0], gray)


def test_bmp24_decode():
    img = _img(10, 7)
    assert np.array_equal(decode_image(_bmp24(img)), img)


def test_unsupported_raises():
    with pytest.raises(UnsupportedImageError):
        decode_image(b"\x89PNG\r\n\x1a\nxxxx")
    assert sniff_format(b"\xff\xd8\xffjj") == "jpeg"


def test_resize_nearest_max_side_and_scale():
    img = _img(100, 200)
    rimg, s = resize_nearest(img, 50)
    assert rimg.shape == (25, 50, 3) and abs(s - 0.25) < 1e-9
    same, s1 = resize_nearest(img, 500)  # never upscale
    assert s1 == 1.0 and same.shape == img.shape


def test_image_features_histogram():
    img = np.full((8, 8, 3), 255, dtype=np.uint8)
    f = image_features(img, dim=16)
    assert f[-1] == 1.0 and f[:-1].sum() == 0.0


def test_wav_roundtrip_and_features():
    t = np.arange(16000) / 16000.0
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, rate = decode_wav(encode_wav(sine, 16000))
    assert rate == 16000
    assert np.allclose(samples, sine, atol=1e-3)
    f = audio_features(samples, rate, n_bands=8)
    assert abs(f[0] - 0.3535) < 0.01  # RMS of 0.5-amp sine
    assert f[1] > 0.0  # zero crossings present


def test_multimodal_real_paths():
    from webextract.stages.multimodal import (
        ImageDecoder,
        ImageResizer,
        audio_features_batch,
    )

    img = _img(100, 200)
    b = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "image": pa.array([encode_ppm(img), b"\xff\xd8\xffjunk" * 10],
                              type=pa.binary()),
        }
    )
    out = ImageDecoder()(b)
    assert out.column("codec").to_pylist() == ["ppm", "fake"]
    assert out.column("width")[0].as_py() == 200
    assert out.column("height")[0].as_py() == 100
    rz = ImageResizer(max_side=50)(out)
    assert rz.column("resized_w")[0].as_py() == 50
    resized = rz.column("resized")[0].as_py()
    assert decode_image(resized).shape == (25, 50, 3)
    assert rz.column("resized")[1].as_py() is None  # fake path: metadata only

    wav = encode_wav(0.5 * np.sin(np.arange(8000) * 0.2), 8000)
    a = pa.table({"audio": pa.array([wav], type=pa.binary())})
    mf = audio_features_batch(a).column("mfcc")[0].as_py()
    assert len(mf) == 8 and mf[0] > 0.3
