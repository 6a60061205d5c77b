"""Multimodal plumbing: schema, Arrow batching, deterministic fake decode."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from lighthouse_spark.pipeline import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes([i % 251]) * (100 + i * 37)) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, media binary")
    return mm.attach_media_meta(df, "media", kind="image", mime="image/png").cache()


def test_meta_schema(media):
    f = dict(media.dtypes)["media_meta"]
    assert "kind" in f and "duration_ms" in f


def test_fake_features_deterministic(media):
    a = mm.extract_features(media, "id", "media").orderBy("id").collect()
    b = mm.extract_features(media, "id", "media").orderBy("id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    r0 = a[0]
    assert r0["sha256"] == hashlib.sha256(bytes([0]) * 100).hexdigest()
    assert len(r0["embedding"]) == 16
    assert abs(sum(x * x for x in r0["embedding"]) - 1.0) < 1e-5  # unit norm
    assert r0["kind"] == "image"


def test_real_decoder_gated_for_compressed_formats(media):
    # the fixture payloads are not PPM/BMP/WAV -> the real decoder must
    # refuse (JPEG/PNG/MP4 need external codecs, absent here)
    with pytest.raises(Exception) as e:
        mm.extract_features(media, "id", "media", decoder="real").collect()
    assert "NotImplementedError" in str(e.value) or isinstance(
        e.value, NotImplementedError
    )


def _grad_image(h, w):
    import numpy as np

    y = np.arange(h, dtype=np.uint8)[:, None]
    x = np.arange(w, dtype=np.uint8)[None, :]
    return np.stack([y + 0 * x, 0 * y + x, (y + x) % 256], axis=-1).astype("uint8")


def test_real_ppm_decode_roundtrip(spark):
    """Pure-numpy PPM decode: mean_luma from extract_features(real)
    equals the numpy ground truth of the encoded pixels."""
    import numpy as np

    imgs = {1: _grad_image(8, 12), 2: _grad_image(16, 5)}
    rows = [(i, mm.encode_ppm(a)) for i, a in imgs.items()]
    df = mm.attach_media_meta(
        spark.createDataFrame(rows, "id long, media binary"),
        "media", kind="image", mime="image/x-portable-pixmap",
    )
    out = {r["id"]: r for r in mm.extract_features(df, "id", "media", decoder="real").collect()}
    for i, a in imgs.items():
        want = float((a.astype(np.float64) @ np.array([0.299, 0.587, 0.114])).mean() / 255.0)
        assert out[i]["mean_luma"] == pytest.approx(want, abs=1e-9)
        assert len(out[i]["embedding"]) == 16
        assert abs(sum(x * x for x in out[i]["embedding"]) - 1.0) < 1e-5


def test_bmp_decode_matches_ppm():
    """BMP decode (bottom-up, BGR, padded rows) reproduces the same
    pixel array as the PPM path."""
    import numpy as np
    import struct

    a = _grad_image(6, 7)  # w=7 -> stride padding exercised
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = a[y][:, ::-1].tobytes()  # RGB->BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    pixel_data = b"".join(rows)
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    payload = header + info + pixel_data
    assert np.array_equal(mm.decode_bmp(payload), a)
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(a)), a)


def test_real_wav_decode(spark):
    """PCM-16 WAV decode: RMS level and windowed-RMS features."""
    import numpy as np

    t = np.arange(8000)
    wave = (np.sin(2 * np.pi * 440 * t / 8000) * 16384).astype("<i2").reshape(-1, 1)
    payload = mm.encode_wav(wave, 8000)
    dec, rate = mm.decode_wav(payload)
    assert rate == 8000 and np.array_equal(dec, wave)
    df = mm.attach_media_meta(
        spark.createDataFrame([(1, payload)], "id long, media binary"),
        "media", kind="audio", mime="audio/wav",
    )
    r = mm.extract_features(df, "id", "media", decoder="real").collect()[0]
    want_rms = float(np.sqrt(((wave[:, 0] / 32768.0) ** 2).mean()))
    assert r["mean_luma"] == pytest.approx(want_rms, abs=1e-9)
    assert abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-5


def test_resize_nearest():
    import numpy as np

    a = _grad_image(8, 8)
    small = mm.resize_nearest(a, 4, 4)
    assert small.shape == (4, 4, 3)
    assert np.array_equal(small[0, 0], a[0, 0])


def test_frame_sampling(media):
    frames = mm.sample_frames(media, "id", "media", every_ms=500).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["id"], []).append(r)
    doc0 = sorted(by_id[0], key=lambda r: r["frame_idx"])
    assert [r["ts_ms"] for r in doc0] == [i * 500 for i in range(len(doc0))]
    assert len({r["frame_sha256"] for r in doc0}) == len(doc0)
    assert max(len(v) for v in by_id.values()) <= 16


def test_invalid_decoder(media):
    with pytest.raises(ValueError):
        mm.extract_features(media, "id", "media", decoder="bogus")


def test_pil_decode_skipped_or_green():
    """Optional-dependency JPEG decoder: green when Pillow is
    installed, a NAMED NotImplementedError otherwise (never a silent
    fake). PNG no longer routes here — decode_png is stdlib-only."""
    import numpy as np
    import pytest

    from lighthouse_spark.pipeline.multimodal import _pil_decode, _real_decode

    jpeg_magic = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError, match="Pillow"):
            _pil_decode(jpeg_magic)
        with pytest.raises(NotImplementedError, match="Pillow"):
            _real_decode(jpeg_magic, "image", 16)
    else:
        # a real 2x2 JPEG decodes to an RGB array
        import io
        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (2, 2), (10, 20, 30)).save(buf, format="JPEG")
        arr = _pil_decode(buf.getvalue())
        assert arr.shape == (2, 2, 3) and arr.dtype == np.uint8


# ---- stdlib PNG decoder (VERDICT r6 next #4) ----------------------------

def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _make_png(w, h, color, filtered_rows: bytes, plte: bytes | None = None) -> bytes:
    import struct
    import zlib

    out = b"\x89PNG\r\n\x1a\n"
    out += _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    out += _png_chunk(b"IDAT", zlib.compress(filtered_rows))
    out += _png_chunk(b"IEND", b"")
    return out


def _spec_filter(img, ftype_per_row) -> bytes:
    """Forward PNG filtering per the spec — an INDEPENDENT (encode-side)
    implementation the decoder must invert."""
    import numpy as np

    h, w, ch = img.shape
    rows = img.reshape(h, w * ch).astype(np.int32)
    out = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        r = rows[y]
        ft = ftype_per_row[y % len(ftype_per_row)]
        f = np.zeros_like(r)
        for x in range(w * ch):
            a = r[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            f[x] = (r[x] - pred) % 256
        out.append(ft)
        out += bytes(f.astype(np.uint8))
        prev = r
    return bytes(out)


def test_png_golden_pixels():
    """Fixed 2x2 RGB, filter 0 everywhere — absolute pixel anchor."""
    import numpy as np

    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
    )
    raw = b"\x00" + px[0].tobytes() + b"\x00" + px[1].tobytes()
    got = mm.decode_png(_make_png(2, 2, 2, raw))
    assert np.array_equal(got, px)


def test_png_all_filters_roundtrip():
    """Every spec filter type (0..4) on a deterministic image must
    invert exactly — RGB, grayscale, gray+alpha and RGBA variants."""
    import numpy as np

    rng = np.random.default_rng(7)
    for color, ch in ((2, 3), (0, 1), (4, 2), (6, 4)):
        img = rng.integers(0, 256, size=(7, 5, ch), dtype=np.uint8)
        payload = _make_png(5, 7, color, _spec_filter(img, [0, 1, 2, 3, 4]))
        got = mm.decode_png(payload)
        if color == 2:
            exp = img
        elif color == 0:
            exp = np.repeat(img, 3, axis=2)
        elif color == 4:
            exp = np.repeat(img[:, :, :1], 3, axis=2)
        else:
            exp = img[:, :, :3]
        assert np.array_equal(got, exp), f"color type {color}"


def test_png_palette():
    import numpy as np

    plte = bytes([250, 0, 0, 0, 250, 0, 0, 0, 250, 7, 8, 9])
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)[:, :, None]
    payload = _make_png(2, 2, 3, _spec_filter(idx, [0, 2]), plte=plte)
    got = mm.decode_png(payload)
    exp = np.frombuffer(plte, dtype=np.uint8).reshape(4, 3)[idx[:, :, 0]]
    assert np.array_equal(got, exp)


def test_png_unsupported_named():
    import struct

    # 16-bit depth -> named NotImplementedError, never a wrong decode
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", b"x\x9c\x03\x00\x00\x00\x00\x01")
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="depth=16"):
        mm.decode_png(payload)


def test_png_through_real_decoder_pipeline(spark):
    """decode_png wired into extract_features(decoder='real'): the
    mean-luma of a solid-gray PNG is exact."""
    import numpy as np

    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    payload = _make_png(8, 8, 2, _spec_filter(img, [1, 4]))
    df = spark.createDataFrame([(1, payload)], "id long, media binary")
    df = mm.attach_media_meta(df, "media", kind="image", mime="image/png")
    row = mm.extract_features(df, "id", "media", decoder="real").collect()[0]
    assert abs(row["mean_luma"] - 128.0 / 255.0) < 1e-9
    assert len(row["embedding"]) == 16
