"""Pure-python codec kernels: WAV/BMP/PPM decode, dHash, resize, features.
No Spark needed — these run before the cluster ever sees a payload."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from quarrycore_spark.multimodal.codecs import (
    UnsupportedMediaError,
    audio_features,
    decode_bmp,
    decode_media,
    decode_ppm,
    decode_wav,
    dhash64,
    image_features,
    resize_nearest,
)


def make_wav(freq=440, rate=8000, n=800, ch=1, width=2) -> bytes:
    t = np.arange(n) / rate
    x = (np.sin(2 * np.pi * freq * t) * 20000).astype(np.int16)
    if ch == 2:
        x = np.column_stack([x, x]).flatten()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def make_bmp(img: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP writer (test-only)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    data = bytearray()
    for row in img[::-1]:  # bottom-up
        line = row[:, ::-1].tobytes()  # RGB → BGR
        data += line + b"\0" * (stride - len(line))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + bytes(data)


def make_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return f"P6\n# test\n{w} {h}\n255\n".encode() + img.tobytes()


def random_img(seed=0, h=32, w=48):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)


def test_wav_roundtrip_mono_stereo():
    for ch in (1, 2):
        payload = make_wav(ch=ch)
        samples, rate, got_ch = decode_wav(payload)
        assert rate == 8000 and got_ch == ch
        assert samples.shape == (800, ch)
        f = audio_features(samples, rate)
        assert f.shape == (10,) and 0.4 < f[0] < 0.9  # sine RMS ~ 0.707
    with pytest.raises(UnsupportedMediaError):
        decode_wav(b"RIFFgarbage")


def test_bmp_and_ppm_roundtrip():
    img = random_img(1)
    assert (decode_bmp(make_bmp(img)) == img).all()
    assert (decode_ppm(make_ppm(img)) == img).all()
    with pytest.raises(UnsupportedMediaError):
        decode_bmp(b"notabmp")
    with pytest.raises(UnsupportedMediaError):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")  # ascii PPM unsupported
    # truncated payloads are rejected, not mis-read
    with pytest.raises(UnsupportedMediaError):
        decode_bmp(make_bmp(img)[:-10])


def test_resize_and_dhash_perceptual():
    img = random_img(2, 64, 64)
    small = resize_nearest(img, 16, 8)
    assert small.shape == (8, 16, 3)
    h1 = dhash64(img)
    # same image, different encoding container → identical hash
    assert dhash64(decode_bmp(make_bmp(img))) == h1
    # one-pixel change → small hamming distance
    near = img.copy()
    near[0, 0] = 255 - near[0, 0]
    mask = (1 << 64) - 1
    d_near = bin((h1 ^ dhash64(near)) & mask).count("1")
    d_far = bin((h1 ^ dhash64(random_img(3, 64, 64))) & mask).count("1")
    assert d_near <= 4 < d_far
    assert image_features(img).shape == (10,)


def test_decode_media_dispatch():
    img = random_img(4)
    out = decode_media(make_bmp(img), "image/bmp")
    assert out["kind"] == "image" and out["phash"] == dhash64(img)
    out = decode_media(make_wav(), "audio/wav")
    assert out["kind"] == "audio" and out["duration_ms"] == 100
    with pytest.raises(UnsupportedMediaError):
        decode_media(b"\x89PNG\r\n", "image/png")  # needs absent codec lib
