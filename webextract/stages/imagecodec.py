"""Pure-numpy image/audio codecs for the multimodal stages.

This container has no cv2/PIL/ffmpeg, but several real formats need no
external library at all — their codecs are a header parse plus a
`np.frombuffer` reshape. Implemented REAL (decode + re-encode, tested
round-trip):

* **PPM (P6)** / **PGM (P5)** — binary netpbm, 8-bit;
* **BMP** — uncompressed 24/32-bit bottom-up Windows DIB;
* **WAV** — RIFF PCM 8/16-bit mono/stereo.

Compressed formats (JPEG/PNG/MP4...) still go through the deterministic
fallback in `webextract.stages.multimodal` — the split is explicit:
`decode_image` raises ``UnsupportedImageError`` and the caller chooses
fake/quarantine/strict. The reference analog is `DecodeImage`'s
cv2.imdecode (`mindocr/data/transforms/general_transforms.py:56-86`);
`resize_nearest` mirrors `DetResize`'s max-side-limited scale with the
scale factor recorded for inverse mapping (`det_transforms.py:375-551`).
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


class UnsupportedImageError(ValueError):
    """Payload is not one of the natively decodable formats."""


def sniff_format(payload: bytes) -> str:
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return "unknown"


def _pnm_header(payload: bytes) -> Tuple[int, int, int, int]:
    """Parse P5/P6 header: returns (width, height, maxval, data_offset).
    Netpbm allows '#' comments and arbitrary whitespace between fields."""
    pos = 2
    fields = []
    n = len(payload)
    while len(fields) < 3 and pos < n:
        c = payload[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == ord("#"):
            nl = payload.find(b"\n", pos)
            pos = n if nl < 0 else nl + 1
        else:
            end = pos
            while end < n and payload[end] not in b" \t\r\n":
                end += 1
            fields.append(int(payload[pos:end]))
            pos = end
    if len(fields) != 3:
        raise UnsupportedImageError("truncated netpbm header")
    return fields[0], fields[1], fields[2], pos + 1  # one ws after maxval


def decode_image(payload: bytes) -> np.ndarray:
    """bytes -> (H, W, 3) uint8 RGB array. Raises UnsupportedImageError for
    formats needing external codecs (JPEG/PNG/...)."""
    fmt = sniff_format(payload)
    if fmt == "ppm":
        w, h, maxv, off = _pnm_header(payload)
        if maxv > 255:
            raise UnsupportedImageError("16-bit netpbm unsupported")
        arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off)
        return arr.reshape(h, w, 3).copy()
    if fmt == "pgm":
        w, h, maxv, off = _pnm_header(payload)
        if maxv > 255:
            raise UnsupportedImageError("16-bit netpbm unsupported")
        arr = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=off)
        return np.repeat(arr.reshape(h, w, 1), 3, axis=2)
    if fmt == "bmp":
        if len(payload) < 54:
            raise UnsupportedImageError("truncated BMP header")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        if hdr_size < 40:
            raise UnsupportedImageError("ancient BMP header unsupported")
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if comp != 0 or bpp not in (24, 32):
            raise UnsupportedImageError(f"BMP bpp={bpp} comp={comp} unsupported")
        flip = h > 0
        h = abs(h)
        ch = bpp // 8
        stride = (w * ch + 3) & ~3
        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                             offset=data_off).reshape(h, stride)
        img = rows[:, : w * ch].reshape(h, w, ch)
        if flip:
            img = img[::-1]
        # BGR(A) -> RGB
        return img[:, :, 2::-1].copy() if ch >= 3 else img.copy()
    raise UnsupportedImageError(f"format {fmt!r} needs an external codec")


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM bytes (the re-encode side)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img.astype(np.uint8)
    ).tobytes()


def resize_nearest(img: np.ndarray, max_side: int) -> Tuple[np.ndarray, float]:
    """Max-side-limited nearest-neighbor resize; returns (resized, scale).
    Never upscales (DetResize's limit_side_len contract)."""
    h, w = img.shape[:2]
    s = min(1.0, max_side / max(h, w, 1))
    if s >= 1.0:
        return img, 1.0
    nh, nw = max(1, int(h * s)), max(1, int(w * s))
    yi = (np.arange(nh) * (h / nh)).astype(np.int64)
    xi = (np.arange(nw) * (w / nw)).astype(np.int64)
    return img[yi][:, xi], s


def image_features(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Real feature vector: normalized `dim`-bin histogram of gray
    intensity (vectorized; deterministic)."""
    gray = img.mean(axis=2)
    hist, _ = np.histogram(gray, bins=dim, range=(0.0, 256.0))
    total = hist.sum() or 1
    return (hist / total).astype(np.float64)


# --- WAV / audio -------------------------------------------------------------


def decode_wav(payload: bytes) -> Tuple[np.ndarray, int]:
    """RIFF PCM WAV -> (float64 mono samples in [-1, 1], sample_rate)."""
    if sniff_format(payload) != "wav":
        raise UnsupportedImageError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise UnsupportedImageError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise UnsupportedImageError(f"WAV fmt={audio_fmt} bits={bits} unsupported")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    if channels > 1:
        samples = samples[: len(samples) // channels * channels]
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float mono [-1,1] -> 16-bit PCM WAV bytes."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


def audio_features(samples: np.ndarray, rate: int, n_bands: int = 8) -> np.ndarray:
    """Real audio features: RMS, zero-crossing rate, and (n_bands - 2)
    log-spectral band energies from one FFT (MFCC-shaped, librosa-free)."""
    if len(samples) == 0:
        return np.zeros(n_bands)
    rms = float(np.sqrt(np.mean(samples**2)))
    zcr = float(np.mean(np.abs(np.diff(np.sign(samples))) > 0))
    spec = np.abs(np.fft.rfft(samples[: 1 << 16]))
    nb = max(1, n_bands - 2)
    edges = np.linspace(0, len(spec), nb + 1, dtype=np.int64)
    bands = [
        float(np.log1p(spec[edges[i] : max(edges[i + 1], edges[i] + 1)].sum()))
        for i in range(nb)
    ]
    return np.array([rms, zcr] + bands, dtype=np.float64)
