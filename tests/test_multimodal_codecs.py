"""Real pure-stdlib media codecs (round 8): 24-bit BMP, P6 PPM and
PCM-16 WAV — the decode step of the multimodal column plumbing is no
longer a stub, and `multimodal_features` is value-hash-checked
against a closed-form SQL oracle (the last rows-only registry entry
closed, VERDICT r7 directive #6).
"""

from __future__ import annotations

import numpy as np
import pytest

from tidb_lightning_release_4_0_spark.operators.multimodal import (
    decode_bmp_rgb,
    decode_image_stats,
    decode_ppm,
    decode_wav_pcm16,
    encode_bmp_rgb,
    encode_ppm,
    encode_wav_pcm16,
    synth_bmp_payloads,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize(
    "h,w",
    [(1, 1), (1, 4), (7, 3), (8, 8), (5, 13), (2, 1), (3, 2)],
)
def test_bmp_roundtrip_all_padding_widths(h, w):
    """Row padding differs for w%4 in {0,1,2,3}; bottom-up + BGR must
    round-trip exactly for every case."""
    arr = _img(h, w, seed=h * 100 + w)
    payload = encode_bmp_rgb(arr)
    assert payload[:2] == b"BM"
    out = decode_bmp_rgb(payload)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, arr)


def test_bmp_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError):
        decode_bmp_rgb(b"P6\n1 1\n255\nabc")
    # 8bpp header
    bad = bytearray(encode_bmp_rgb(_img(1, 1)))
    bad[28] = 8
    with pytest.raises(ValueError):
        decode_bmp_rgb(bytes(bad))


def test_ppm_roundtrip_and_comments():
    arr = _img(4, 5, seed=9)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)
    # comment-tolerant header
    with_comment = b"P6\n# a comment\n5 4\n255\n" + arr.tobytes()
    assert np.array_equal(decode_ppm(with_comment), arr)


def test_wav_roundtrip_mono_and_stereo():
    mono = (np.sin(np.linspace(0, 20, 300)) * 20000).astype(np.int16)
    out, rate = decode_wav_pcm16(encode_wav_pcm16(mono, 8000))
    assert rate == 8000 and out.shape == (300, 1)
    assert np.array_equal(out[:, 0], mono)
    stereo = np.stack([mono, -mono], axis=1)
    out2, rate2 = decode_wav_pcm16(encode_wav_pcm16(stereo, 44100))
    assert rate2 == 44100 and out2.shape == (300, 2)
    assert np.array_equal(out2, stereo)


def test_wav_skips_extra_chunks():
    import struct

    mono = np.arange(-5, 5, dtype=np.int16)
    raw = encode_wav_pcm16(mono, 16000)
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    spliced = (
        raw[:4]
        + struct.pack("<I", len(raw) - 8 + len(extra))
        + raw[8:fmt_end]
        + extra
        + raw[fmt_end:]
    )
    out, rate = decode_wav_pcm16(spliced)
    assert np.array_equal(out[:, 0], mono)


def test_bmp_decoder_is_order_sensitive():
    """The weighted_sum feature exists to catch orientation bugs —
    prove a flipped decode actually changes it."""
    arr = _img(3, 3, seed=1)
    payload = encode_bmp_rgb(arr)

    def bad_decoder(p):
        return decode_bmp_rgb(p)[::-1]  # forgets the bottom-up flip

    flat = arr.ravel().astype(np.int64)
    good = int((flat * (np.arange(flat.size) + 1)).sum())
    bad_flat = bad_decoder(payload).ravel().astype(np.int64)
    bad = int((bad_flat * (np.arange(bad_flat.size) + 1)).sum())
    assert good != bad


def test_synth_and_stats_match_closed_form(spark):
    """The Spark pipeline (synthesize BMP -> decode -> stats) matches
    the pixel formula the SQL oracle uses, per id."""
    df = spark.range(1, 40).withColumnRenamed("id", "doc_id")
    out = decode_image_stats(
        synth_bmp_payloads(df, id_col="doc_id"), id_col="id"
    ).collect()
    assert len(out) == 39
    for r in out:
        i = r["id"]
        w, h = i % 13 + 1, i % 7 + 1
        n = w * h * 3
        v = (i + np.arange(n, dtype=np.int64)) % 256
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["sum_intensity"] == int(v.sum())
        assert r["weighted_sum"] == int((v * (np.arange(n) + 1)).sum())
