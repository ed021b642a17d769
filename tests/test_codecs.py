"""Codec probe tiers: built-in PNG/WAV decode for real in this container;
PIL / soundfile branches auto-activate (and are tested) when installed;
formats with no tier stay codec-gated. The Spark plan (mapInPandas stage
shape) is identical whichever tier decodes."""

from __future__ import annotations

import numpy as np
import pytest
import struct
import zlib

from eirepolitic_data_pipeline_spark.enrich import codecs
from eirepolitic_data_pipeline_spark.enrich.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    decode_images,
    image_thumbnails,
)


def _img(h, w, c, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


# ---------------------------------------------------------------------------
# built-in PNG codec
# ---------------------------------------------------------------------------

def test_png_roundtrip_rgb_and_gray_and_alpha():
    for c in (1, 2, 3, 4):
        a = _img(13, 7, c, seed=c)
        assert (codecs.png_decode(codecs.png_encode(a)) == a).all()


def test_png_decode_all_filter_types():
    """Defiltering parity for every PNG filter type (0/1/2/3/4): build the
    filtered scanlines by hand from a known image and check the decode
    inverts them exactly."""
    a = _img(5, 6, 3, seed=9)
    h, w, c = a.shape
    stride = w * c
    flat = a.reshape(h, stride).astype(np.int32)
    lines = []
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        left = np.concatenate([np.zeros(c, dtype=np.int32), cur[:-c]])
        upleft = np.concatenate([np.zeros(c, dtype=np.int32), prev[:-c]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - ((left + prev) >> 1)
        else:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            filt = cur - pred
        lines.append(bytes([ftype]) + (filt & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (codecs.PNG_MAGIC + codecs._png_chunk(b"IHDR", ihdr)
            + codecs._png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + codecs._png_chunk(b"IEND", b""))
    assert (codecs.png_decode(blob) == a).all()


def test_png_rejects_unsupported():
    a = _img(4, 4, 3)
    blob = bytearray(codecs.png_encode(a))
    blob[24] = 16  # bit depth 16
    with pytest.raises(ValueError):
        codecs.png_decode(bytes(blob))
    with pytest.raises(ValueError):
        codecs.png_decode(b"\xff\xd8\xffnot-a-png")


# ---------------------------------------------------------------------------
# Spark stages pick up the built-in tiers (real-decode branch in THIS
# container — no external libraries present)
# ---------------------------------------------------------------------------

def test_decode_images_png_real_branch(spark):
    a = _img(10, 20, 3)
    df = spark.createDataFrame(
        [(1, "image", bytearray(codecs.png_encode(a)), "image/png",
          None, None, None, None)], schema=MEDIA_SCHEMA)
    out = decode_images(df).collect()[0]  # NB: no fake=True — real decode
    assert (out["width"], out["height"], out["channels"]) == (20, 10, 3)
    assert abs(out["mean_intensity"] - float(a.mean())) < 1e-9


def test_image_thumbnails_png_real_branch(spark):
    from eirepolitic_data_pipeline_spark.enrich.multimodal import (
        decode_raw_image, resize_nearest)
    a = _img(40, 30, 3)
    df = spark.createDataFrame(
        [(2, "image", bytearray(codecs.png_encode(a)), "image/png",
          None, None, None, None)], schema=MEDIA_SCHEMA)
    out = image_thumbnails(df, max_side=10).collect()[0]
    assert (out["thumb_w"], out["thumb_h"]) == (7, 10)
    assert (decode_raw_image(bytes(out["thumbnail"]))
            == resize_nearest(a, 7, 10)).all()


def test_audio_features_wav_real_branch(spark):
    t = np.arange(8000)
    samples = (2000 * np.sin(2 * np.pi * 220 * t / 8000)).astype(np.int16)
    blob = codecs.wav_encode(samples, 8000)
    assert codecs.is_wav(blob)
    df = spark.createDataFrame(
        [(3, "audio", bytearray(blob), "audio/wav",
          None, None, None, None)], schema=MEDIA_SCHEMA)
    out = audio_features(df).collect()[0]  # real decode, no fake=True
    assert out["sample_rate"] == 8000 and out["duration_ms"] == 1000
    x = samples.astype(np.float64)
    assert abs(out["rms"] - float(np.sqrt((x * x).mean()))) < 1e-9
    assert out["peak"] == int(np.abs(samples).max())


def test_wav_stereo_mixdown():
    stereo = np.array([100, -100, 300, 100], dtype=np.int16)  # 2ch x 2 frames
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(4000)
        wf.writeframes(stereo.tobytes())
    rate, mono = codecs.wav_decode(buf.getvalue())
    assert rate == 4000 and mono.tolist() == [0, 200]


# ---------------------------------------------------------------------------
# external-library tiers: exercised when installed, skipped otherwise
# ---------------------------------------------------------------------------

@pytest.mark.skipif(codecs.pil_image() is None,
                    reason="PIL not installed in this container — pip install pillow to exercise the JPEG/real-image decode tier (see README: Multimodal codec tiers)")
def test_pil_branch_decodes_jpeg(spark):
    import io
    pil = codecs.pil_image()
    a = _img(8, 8, 3)
    buf = io.BytesIO()
    pil.fromarray(a).save(buf, format="JPEG")
    df = spark.createDataFrame(
        [(4, "image", bytearray(buf.getvalue()), "image/jpeg",
          None, None, None, None)], schema=MEDIA_SCHEMA)
    out = decode_images(df).collect()[0]
    assert (out["width"], out["height"]) == (8, 8)


@pytest.mark.skipif(codecs.soundfile_mod() is None,
                    reason="soundfile not installed in this container — pip install soundfile to exercise the compressed-audio decode tier (see README: Multimodal codec tiers)")
def test_soundfile_branch(spark):
    sf = codecs.soundfile_mod()
    assert sf is not None


def test_formats_without_any_tier_stay_gated(spark):
    df = spark.createDataFrame(
        [(5, "image", bytearray(b"GIF89a fake-gif"), "image/gif",
          None, None, None, None)], schema=MEDIA_SCHEMA)
    if codecs.pil_image() is None:
        with pytest.raises(Exception) as ei:
            decode_images(df).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError)
    out = decode_images(df, fake=True).collect()[0]
    assert out["channels"] == 3


def test_corrupt_png_falls_through_to_codec_gate(spark):
    """A blob with PNG magic but corrupt contents must surface as
    ValueError inside the codec (not zlib/struct errors), so the decode
    stages' dispatch can fall through to the gate / fake path instead of
    crashing the task."""
    good = codecs.png_encode(_img(6, 6, 3))
    truncated = good[: len(good) - 20]          # broken IDAT/IEND
    bad_ihdr = good[:12] + b"\x01\x02"          # mangled header
    for blob in (truncated, bad_ihdr, codecs.PNG_MAGIC + b"garbage"):
        with pytest.raises(ValueError):
            codecs.png_decode(blob)
    df = spark.createDataFrame(
        [(9, "image", bytearray(truncated), "image/png",
          None, None, None, None)], schema=MEDIA_SCHEMA)
    out = decode_images(df, fake=True).collect()  # falls through, no crash
    assert out[0]["channels"] == 3
    with pytest.raises(Exception):
        decode_images(df).collect()               # gated without fake


def test_png_sub_filter_vectorized_roundtrip():
    """Filter-1 (Sub) lines decode via the cumsum fast path — pin parity
    against the definitionally-filtered bytes."""
    a = _img(4, 50, 3, seed=11)
    h, w, c = a.shape
    stride = w * c
    flat = a.reshape(h, stride).astype(np.int32)
    lines = []
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(c, dtype=np.int32), cur[:-c]])
        lines.append(b"\x01" + ((cur - left) & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (codecs.PNG_MAGIC + codecs._png_chunk(b"IHDR", ihdr)
            + codecs._png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + codecs._png_chunk(b"IEND", b""))
    assert (codecs.png_decode(blob) == a).all()
