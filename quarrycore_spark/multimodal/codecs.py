"""Pure-stdlib/numpy media codecs — REAL decode kernels for the formats
that need no external libraries:

* WAV (PCM)            — stdlib ``wave`` + numpy frombuffer;
* BMP (24/32-bit, uncompressed) — struct header + numpy row slicing;
* PPM (P6 binary)      — header parse + numpy frombuffer.

Compressed formats (JPEG/PNG/MP4/…) still require codec libraries absent
from this container and raise ``UnsupportedMediaError`` — the dead-letter
path in extract_media_features handles them. This keeps the multimodal
stage honest: real schema, real partitioning, and a real decode for the
self-describing formats, with the library-dependent formats clearly gated.

Feature kernels (used for multimodal near-dup detection):
* images — 64-bit difference hash (dHash) over an 8×9 nearest-neighbor
  downsample + per-channel mean/std (the standard perceptual-dedup recipe);
* audio  — RMS, zero-crossing rate, and 8-band frame-energy profile.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


class UnsupportedMediaError(ValueError):
    """Format requires a codec library not present in this environment."""


# --- WAV ---------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """PCM WAV → (samples[int16/int32/uint8 as float64, shape (n, ch)],
    sample_rate, n_channels)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            ch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise UnsupportedMediaError(f"not a PCM WAV: {e}") from e
    dt = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dt is None:
        raise UnsupportedMediaError(f"unsupported WAV sample width {width}")
    arr = np.frombuffer(frames, dtype=dt).astype(np.float64)
    if width == 1:
        arr -= 128.0  # 8-bit WAV is unsigned
    n = len(arr) // ch * ch
    return arr[:n].reshape(-1, ch), rate, ch


def audio_features(samples: np.ndarray, rate: int, bands: int = 8) -> np.ndarray:
    """(rms, zero-crossing-rate, 8-band energy profile) as float32[10]."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    if len(mono) == 0:
        return np.zeros(2 + bands, dtype=np.float32)
    scale = max(np.abs(mono).max(), 1.0)
    x = mono / scale
    rms = float(np.sqrt((x * x).mean()))
    zcr = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean())
    seg = len(x) // bands
    if seg == 0:
        energies = np.zeros(bands)
    else:
        trimmed = x[: seg * bands].reshape(bands, seg)
        energies = (trimmed * trimmed).mean(axis=1)
    return np.concatenate(([rms, zcr], energies)).astype(np.float32)


# --- BMP ---------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → (H, W, 3) uint8 RGB."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise UnsupportedMediaError("BMP core headers unsupported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise UnsupportedMediaError(f"BMP bpp={bpp} compression={compression}")
    flip = h > 0
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    need = data_off + stride * h
    if len(payload) < need:
        raise UnsupportedMediaError("truncated BMP")
    rows = np.frombuffer(payload, dtype=np.uint8, offset=data_off, count=stride * h)
    rows = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
    rgb = rows[:, :, 2::-1]  # BGR(A) → RGB
    return (rgb[::-1] if flip else rgb).copy()


# --- PPM (P6) ----------------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval<=255) → (H, W, 3) uint8 RGB."""
    if not payload.startswith(b"P6"):
        raise UnsupportedMediaError("not a binary PPM")
    # header = magic, width, height, maxval separated by whitespace/comments
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError as e:
        raise UnsupportedMediaError(f"bad PPM header: {e}") from e
    if maxval > 255:
        raise UnsupportedMediaError("16-bit PPM unsupported")
    need = w * h * 3
    if len(payload) - i < need:
        raise UnsupportedMediaError("truncated PPM")
    return (
        np.frombuffer(payload, dtype=np.uint8, offset=i, count=need)
        .reshape(h, w, 3)
        .copy()
    )


# --- image feature kernels -----------------------------------------------------


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize — the distributed-pipeline preprocessing op
    (deterministic, no interpolation library needed)."""
    src_h, src_w = img.shape[:2]
    ys = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    xs = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return img[ys][:, xs]


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash: 8×9 grayscale downsample, bit = left<right.
    The standard perceptual near-dup fingerprint (Hamming-comparable, pairs
    via the same pigeonhole banding as SimHash). Returned reinterpreted as
    SIGNED int64 (the Spark BIGINT / xxhash64 convention)."""
    gray = img.astype(np.float64).mean(axis=2) if img.ndim == 3 else img.astype(np.float64)
    small = resize_nearest(gray, 9, 8)
    bits = (small[:, 1:] > small[:, :-1]).flatten()
    total = (bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()
    return int(np.uint64(total).astype(np.int64))


def image_features(img: np.ndarray) -> np.ndarray:
    """Per-channel mean/std + downsample profile as float32[10]."""
    f = img.astype(np.float64) / 255.0
    if f.ndim == 2:
        f = f[:, :, None].repeat(3, axis=2)
    means = f.mean(axis=(0, 1))
    stds = f.std(axis=(0, 1))
    gray4 = resize_nearest(f.mean(axis=2), 2, 2).flatten()
    return np.concatenate((means, stds, gray4)).astype(np.float32)


def decode_media(payload: bytes, mime: str) -> dict:
    """Dispatch decode by mime. Returns {kind-specific fields}; raises
    UnsupportedMediaError for formats needing absent codec libraries."""
    m = (mime or "").lower()
    if m in ("audio/wav", "audio/x-wav", "audio/wave"):
        samples, rate, ch = decode_wav(payload)
        return {
            "kind": "audio",
            "feature": audio_features(samples, rate),
            "duration_ms": int(len(samples) * 1000 / max(rate, 1)),
            "phash": None,
        }
    if m in ("image/bmp", "image/x-ms-bmp"):
        img = decode_bmp(payload)
    elif m in ("image/x-portable-pixmap", "image/ppm"):
        img = decode_ppm(payload)
    else:
        raise UnsupportedMediaError(
            f"mime {mime!r} requires codec libraries not in this environment"
        )
    return {
        "kind": "image",
        "feature": image_features(img),
        "duration_ms": None,
        "phash": dhash64(img),
    }
