"""Multimodal payload stages: opaque binary columns + typed metadata.

Images/audio/video ride through the engine as `binary` columns with typed
metadata columns — exactly how `html` bytes do. Decode is REAL for the
formats a pure-numpy codec can handle (`webextract.stages.imagecodec`):
**PPM/PGM/BMP** images are actually decoded to pixels (dims, intensity
histogram features, true nearest-neighbor resize + PPM re-encode) and
**PCM WAV** audio is actually parsed (RMS / zero-crossing / log-spectral
bands). Compressed formats (JPEG/PNG/MP4) need libraries absent from this
container, so those payloads route through:

* a clearly marked ``NotImplementedError`` when ``strict=True``, or
* a deterministic fake decode (default) driven by the payload bytes, so
  the plumbing stays testable end-to-end; the `codec` column says which
  path produced each row (never silently fake).

The reference analog is `DecodeImage` (cv2.imdecode behind a per-record
transform, `mindocr/data/transforms/general_transforms.py:56-86`) and the
resize/normalize family; swapping the fake for cv2/PIL/ffmpeg is a
one-function change per stage.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from webextract.corpus import mix
from webextract.stages.imagecodec import (
    UnsupportedImageError,
    audio_features,
    decode_image,
    decode_wav,
    encode_ppm,
    image_features,
    resize_nearest,
    sniff_format,
)


def _fake_dims(payload: bytes) -> tuple:
    """Deterministic fake "decode": dimensions derived from a stable hash
    of the payload bytes (stands in for actual header parsing)."""
    from hashlib import blake2b

    h = int.from_bytes(blake2b(payload, digest_size=8).digest(), "little")
    return 64 + h % 1920, 64 + (h >> 16) % 1080


class ImageDecoder:
    """Actor-pool UDF: `image` binary -> width/height/codec metadata +
    feature vector.

    PPM/PGM/BMP payloads get a REAL decode (pixel dims + gray-intensity
    histogram from actual pixels); other formats fall back to the
    deterministic fake and are labeled `codec="fake"` — or raise when
    ``strict=True`` (real JPEG/PNG decode requires cv2/PIL, absent here).

    Keep `batch_size` SMALL for large payloads (batch bytes = batch_size x
    payload size must fit the worker heap — SURVEY.md §7.4 wide-row note).
    """

    def __init__(self, strict: bool = False, feature_dim: int = 16,
                 payload_col: str = "image"):
        self.strict = strict
        self.feature_dim = feature_dim
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths: List[int] = []
        heights: List[int] = []
        feats: List[List[float]] = []
        codecs: List[str] = []
        for payload in batch.column(self.payload_col).to_pylist():
            if not payload:
                widths.append(0)
                heights.append(0)
                feats.append([0.0] * self.feature_dim)
                codecs.append("empty")
                continue
            try:
                img = decode_image(payload)
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                feats.append(image_features(img, self.feature_dim).tolist())
                codecs.append(sniff_format(payload))
                continue
            except UnsupportedImageError:
                if self.strict:
                    raise NotImplementedError(
                        f"real decode of {sniff_format(payload)!r} requires "
                        "cv2/PIL (not in this container); run with "
                        "strict=False for the deterministic fake"
                    ) from None
            w, h = _fake_dims(payload)
            widths.append(w)
            heights.append(h)
            # fake "feature extract": byte-histogram folded to feature_dim
            arr = np.frombuffer(payload[:4096], dtype=np.uint8)
            hist = np.bincount(arr % self.feature_dim, minlength=self.feature_dim)
            total = hist.sum() or 1
            feats.append((hist / total).astype(np.float64).tolist())
            codecs.append("fake")
        return (
            batch.append_column("width", pa.array(widths, type=pa.int32()))
            .append_column("height", pa.array(heights, type=pa.int32()))
            .append_column(
                "features", pa.array(feats, type=pa.list_(pa.float64()))
            )
            .append_column("codec", pa.array(codecs, type=pa.string()))
        )


class ImageResizer:
    """Actor-pool UDF: max-side-limited resize. Natively decodable payloads
    (PPM/PGM/BMP) get a REAL nearest-neighbor resize with the result
    re-encoded as PPM in a `resized` column; others record metadata only.
    Mirrors DetResize's contract of recording the scale factor needed for
    inverse mapping (`det_transforms.py:375-551` `shape_list`)."""

    def __init__(self, max_side: int = 512, payload_col: str = "image"):
        self.max_side = max_side
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        payloads = (
            batch.column(self.payload_col).to_pylist()
            if self.payload_col in batch.column_names
            else [None] * batch.num_rows
        )
        out_w, out_h, scale, resized = [], [], [], []
        for w, h, payload in zip(widths, heights, payloads):
            if payload:
                try:
                    img = decode_image(payload)
                    rimg, s = resize_nearest(img, self.max_side)
                    out_h.append(rimg.shape[0])
                    out_w.append(rimg.shape[1])
                    scale.append(s)
                    resized.append(encode_ppm(rimg))
                    continue
                except UnsupportedImageError:
                    pass
            s = min(1.0, self.max_side / max(w, h, 1))
            out_w.append(int(w * s))
            out_h.append(int(h * s))
            scale.append(s)
            resized.append(None)
        return (
            batch.append_column("resized_w", pa.array(out_w, type=pa.int32()))
            .append_column("resized_h", pa.array(out_h, type=pa.int32()))
            .append_column("scale", pa.array(scale, type=pa.float64()))
            .append_column("resized", pa.array(resized, type=pa.binary()))
        )


class FrameSampler:
    """Actor-pool UDF: `video` binary -> one row PER SAMPLED FRAME
    (flat_map-style row expansion, the VQA chunking pattern,
    `layoutlm_transforms.py:315-535`). Fake: frame count derived from
    payload length; real impl would call ffmpeg."""

    def __init__(self, every_n: int = 10, id_col: str = "doc_id",
                 payload_col: str = "video"):
        self.every_n = every_n
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: List[int] = []
        frame_idx: List[int] = []
        ts_ms: List[int] = []
        ids = batch.column(self.id_col).to_pylist()
        for i, payload in enumerate(batch.column(self.payload_col).to_pylist()):
            n_frames = 0 if not payload else 1 + len(payload) // 1000
            for f in range(0, n_frames, self.every_n):
                ids_out.append(ids[i])
                frame_idx.append(f)
                ts_ms.append(f * 33)
        return pa.table(
            {
                self.id_col: pa.array(ids_out, type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "ts_ms": pa.array(ts_ms, type=pa.int32()),
            }
        )


def audio_features_batch(batch: pa.Table, payload_col: str = "audio",
                         n_mfcc: int = 8) -> pa.Table:
    """Audio feature extract. PCM WAV payloads get REAL features (RMS,
    zero-crossing rate, log-spectral bands from one FFT — imagecodec.py);
    other containers (mp3/ogg/...) fall back to a stable fake vector
    (real decode needs ffmpeg/librosa, absent here)."""
    feats = []
    for payload in batch.column(payload_col).to_pylist():
        if not payload:
            feats.append([0.0] * n_mfcc)
            continue
        try:
            samples, rate = decode_wav(payload)
            feats.append(audio_features(samples, rate, n_mfcc).tolist())
            continue
        except UnsupportedImageError:
            pass
        seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
        feats.append(
            [((mix(seed & 0x7FFFFFFF, 300 + j) % 10_000) / 10_000.0)
             for j in range(n_mfcc)]
        )
    return batch.append_column("mfcc", pa.array(feats, type=pa.list_(pa.float64())))
