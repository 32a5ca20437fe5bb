"""Real pure-stdlib media codecs (round 8): 24-bit BMP, P6 PPM and
PCM-16 WAV — the decode step of the multimodal column plumbing is no
longer a stub, and `multimodal_features` is value-hash-checked
against a closed-form SQL oracle (the last rows-only registry entry
closed, VERDICT r7 directive #6).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

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


# ---------------------------------------------------------------------------
# PNG (round 9: a real COMPRESSED format, pure stdlib via zlib)
# ---------------------------------------------------------------------------


@given(st.integers(1, 24), st.integers(1, 24))
@settings(max_examples=25, deadline=None)
def test_png_roundtrip_all_filters(h, w):
    """encode(filter_mode='cycle') assigns scanline y filter y%5, so
    any image with >= 5 rows roundtrips through every PNG filter
    reconstruction (None/Sub/Up/Average/Paeth)."""
    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        decode_png_rgb,
        encode_png_rgb,
    )

    rng = np.random.default_rng(h * 100 + w)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    for mode in ("cycle", "none"):
        back = decode_png_rgb(encode_png_rgb(arr, mode))
        assert back.shape == arr.shape
        assert (back == arr).all()


def test_png_decoder_spec_golden_handcrafted():
    """Pin the decoder to the PNG SPEC, not the encoder: scanlines
    filtered BY HAND per RFC 2083 §6 (Sub subtracts the pixel bpp
    bytes left, Up the prior scanline, Average their floor-mean,
    Paeth the predictor), stored-block deflate so no compressor
    variance. A 2x2 RGB image, row 0 filter Sub, row 1 filter Paeth."""
    import struct
    import zlib

    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        decode_png_rgb,
    )

    # target pixels: row0 = (10,20,30),(13,24,35); row1 = (5,5,5),(60,70,80)
    # row 0, Sub: first pixel raw, second = cur - left
    r0 = bytes([1, 10, 20, 30, (13 - 10) % 256, (24 - 20) % 256, (35 - 30) % 256])
    # row 1, Paeth: x<bpp -> pred = prior[x] (a=0,c=0 => b wins ties);
    # x>=bpp -> pred = paeth(left=cur[x-3], up=prior[x], ul=prior[x-3])
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    row0 = [10, 20, 30, 13, 24, 35]
    row1 = [5, 5, 5, 60, 70, 80]
    f1 = [4]
    for x in range(6):
        a = row1[x - 3] if x >= 3 else 0
        c = row0[x - 3] if x >= 3 else 0
        f1.append((row1[x] - paeth(a, row0[x], c)) % 256)
    raw = r0 + bytes(f1)
    # stored (uncompressed) zlib stream: header 0x78 0x01, one final
    # stored block
    stored = (
        b"\x78\x01"
        + b"\x01"
        + struct.pack("<HH", len(raw), len(raw) ^ 0xFFFF)
        + raw
        + struct.pack(">I", zlib.adler32(raw))
    )
    assert zlib.decompress(stored) == raw  # the handcraft is valid zlib

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", stored)
        + chunk(b"IEND", b"")
    )
    out = decode_png_rgb(png)
    assert out.tolist() == [
        [[10, 20, 30], [13, 24, 35]],
        [[5, 5, 5], [60, 70, 80]],
    ]


def test_png_rejects_bad_crc_and_unsupported():
    import pytest

    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        decode_png_rgb,
        encode_png_rgb,
    )

    arr = np.zeros((2, 2, 3), np.uint8)
    good = encode_png_rgb(arr)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png_rgb(b"BM" + good)
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png_rgb(bytes(bad))


def test_png_multi_idat_and_ancillary_chunks():
    """Multi-IDAT streams and ancillary chunks (tEXt) must decode —
    real PNG writers split IDAT and add metadata chunks."""
    import struct
    import zlib

    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        decode_png_rgb,
        encode_png_rgb,
    )

    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    whole = encode_png_rgb(arr, "none")
    # re-split: take the single IDAT payload, split into two chunks,
    # and inject a tEXt chunk between them
    sig = whole[:8]
    pos, chunks = 8, []
    while pos < len(whole):
        (ln,) = struct.unpack_from(">I", whole, pos)
        chunks.append((whole[pos + 4: pos + 8], whole[pos + 8: pos + 8 + ln]))
        pos += 12 + ln

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    idat = next(d for t, d in chunks if t == b"IDAT")
    ihdr = next(d for t, d in chunks if t == b"IHDR")
    rebuilt = (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat[: len(idat) // 2])
        + chunk(b"tEXt", b"Comment\x00hello")
        + chunk(b"IDAT", idat[len(idat) // 2:])
        + chunk(b"IEND", b"")
    )
    out = decode_png_rgb(rebuilt)
    assert (out == arr).all()


def test_resize_image_matches_pool_arithmetic(spark):
    """resize_image over real PNGs: exact pooled features equal the
    closed-form floor-mean arithmetic recomputed in numpy from the
    synth pixel rule."""
    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        resize_image,
        synth_png_payloads,
    )

    df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    out = resize_image(
        synth_png_payloads(df, id_col="doc_id"), target=(2, 2)
    ).collect()
    assert len(out) == 40
    for r in out:
        i = r["id"]
        w, h = i % 13 + 1, i % 7 + 1
        arr = ((i + np.arange(h * w * 3, dtype=np.int64)) % 256).reshape(
            h, w, 3
        )
        oh, ow = min(2, h), min(2, w)
        fh, fw = max(h // 2, 1), max(w // 2, 1)
        pooled = (
            arr[: fh * oh, : fw * ow]
            .reshape(oh, fh, ow, fw, -1)
            .mean(axis=(1, 3))
            .astype(np.uint8)
            .ravel()
            .astype(np.int64)
        )
        assert (r["out_h"], r["out_w"]) == (oh, ow)
        assert r["sum_resized"] == int(pooled.sum())
        assert r["weighted_resized"] == int(
            (pooled * (np.arange(pooled.size) + 1)).sum()
        )


# ---------------------------------------------------------------------------
# AVI (round 9: a real VIDEO container — RIFF + uncompressed DIB frames)
# ---------------------------------------------------------------------------


@given(st.integers(1, 6), st.integers(1, 8), st.integers(1, 8))
@settings(max_examples=20, deadline=None)
def test_avi_roundtrip(n, h, w):
    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        decode_avi_dib,
        encode_avi_dib,
    )

    rng = np.random.default_rng(n * 100 + h * 10 + w)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    back = decode_avi_dib(encode_avi_dib(frames))
    assert back.shape == frames.shape
    assert (back == frames).all()


def test_avi_rejects_non_avi_and_compressed():
    import struct

    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        decode_avi_dib,
        encode_avi_dib,
    )

    arr = np.zeros((1, 2, 2, 3), np.uint8)
    good = encode_avi_dib(arr)
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi_dib(b"RIFF" + b"\x00" * 4 + b"WAVE")
    # flip the stream handler to a compressed fourcc
    bad = good.replace(b"DIB ", b"mjpg", 1)
    with pytest.raises(ValueError, match="codec"):
        decode_avi_dib(bad)


def test_avi_skips_junk_chunks():
    """Real AVI writers interleave JUNK/idx1 chunks; the walker must
    skip them (incl. odd-size word alignment)."""
    import struct

    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        decode_avi_dib,
        encode_avi_dib,
    )

    arr = np.arange(2 * 2 * 3 * 3, dtype=np.uint8).reshape(2, 2, 3, 3)
    good = encode_avi_dib(arr)
    # splice a JUNK chunk (odd size -> pad byte) before the movi LIST
    movi_at = good.index(b"LIST", 12, None)
    movi_at = good.index(b"movi") - 8
    junk = struct.pack("<4sI", b"JUNK", 5) + b"abcde\x00"
    spliced = good[:movi_at] + junk + good[movi_at:]
    # RIFF size field is informational for our walker; decode anyway
    out = decode_avi_dib(spliced)
    assert (out == arr).all()


def test_frame_sample_matches_closed_form(spark):
    """frame_sample over real AVIs: every-2nd-frame features equal
    the closed-form pixel rule."""
    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        frame_sample,
        synth_avi_payloads,
    )

    df = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    out = frame_sample(
        synth_avi_payloads(df, id_col="doc_id"), every_n=2, max_frames=4
    ).collect()
    by_key = {(r["id"], r["frame_idx"]): r for r in out}
    n_expected = 0
    for i in range(30):
        nf, w, h = i % 5 + 1, i % 6 + 2, i % 4 + 2
        v = (i + np.arange(nf * h * w * 3, dtype=np.int64)) % 256
        frames = v.reshape(nf, h, w, 3)
        for k in list(range(0, nf, 2))[:4]:
            n_expected += 1
            r = by_key[(i, k)]
            flat = frames[k].ravel()
            assert (r["height"], r["width"]) == (h, w)
            assert r["sum_intensity"] == int(flat.sum())
            assert r["weighted_sum"] == int(
                (flat * (np.arange(flat.size) + 1)).sum()
            )
    assert len(out) == n_expected


def test_parse_image_header_meta_jvm(spark):
    """JVM-side header parse: real dims out of real BMP and PNG
    bytes, strict raise on unknown magic, and a corrupted width byte
    visibly changes the parsed value (proving the bytes are read, not
    derived)."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        encode_bmp_rgb,
        encode_png_rgb,
        parse_image_header_meta,
    )

    bmp = encode_bmp_rgb(_img(5, 300, seed=3))   # width > 255: multi-byte LE
    png = encode_png_rgb(_img(7, 260, seed=4))   # width > 255: multi-byte BE
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    df = spark.createDataFrame(
        [Row(id=1, payload=bmp), Row(id=2, payload=png)], schema
    )
    out = {r["id"]: r for r in parse_image_header_meta(df).collect()}
    assert (out[1]["mime"], out[1]["width"], out[1]["height"]) == (
        "image/bmp", 300, 5,
    )
    assert (out[2]["mime"], out[2]["width"], out[2]["height"]) == (
        "image/png", 260, 7,
    )
    assert out[1]["n_bytes"] == len(bmp)

    # corrupt the BMP width's low byte (offset 18, 0-based): parse
    # must follow the bytes
    corrupt = bytearray(bmp)
    corrupt[18] ^= 0xFF
    df2 = spark.createDataFrame([Row(id=3, payload=bytes(corrupt))], schema)
    got = parse_image_header_meta(df2).first()
    assert got["width"] != 300

    bad = spark.createDataFrame([Row(id=4, payload=b"GIF89a....")], schema)
    import pytest as _pytest

    with _pytest.raises(Exception, match="magic"):
        parse_image_header_meta(bad).collect()

    # JPEG (round 10, r11: marker-segment walk): dims out of the
    # SOF0 segment reached by skipping each header segment by its
    # length field. 300 > 255 exercises the high byte.
    from tidb_lightning_release_4_0_spark.operators.jpeg_codec import (
        encode_jpeg,
    )

    jpg = encode_jpeg(
        np.ascontiguousarray(_img(5, 300, seed=6)[:, :, 0])
    )
    dfj = spark.createDataFrame([Row(id=5, payload=jpg)], schema)
    got = parse_image_header_meta(dfj).first()
    assert (got["mime"], got["width"], got["height"]) == (
        "image/jpeg", 300, 5,
    )
    # a JPEG with no SOF0 must raise, not return garbage dims
    truncated = jpg[: jpg.index(b"\xff\xc0")] + b"\xff\xd9"
    dft = spark.createDataFrame([Row(id=6, payload=truncated)], schema)
    with _pytest.raises(Exception, match="SOF0"):
        parse_image_header_meta(dft).collect()


def test_png_gray_and_rgba_decode_paths():
    """The decoder supports 8-bit gray (color 0) and RGBA (color 6);
    the encoder only writes RGB, so pin those paths with hand-built
    stored-deflate payloads (filter 0 and Up)."""
    import struct
    import zlib

    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        decode_png_rgb,
    )

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    def stored(raw):
        return (
            b"\x78\x01\x01"
            + struct.pack("<HH", len(raw), len(raw) ^ 0xFFFF)
            + raw
            + struct.pack(">I", zlib.adler32(raw))
        )

    def png(w, h, color, raw):
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + chunk(b"IDAT", stored(raw))
            + chunk(b"IEND", b"")
        )

    # 3x2 grayscale: row0 unfiltered, row1 Up-filtered
    row0 = [10, 200, 30]
    row1 = [15, 210, 25]
    raw = bytes([0] + row0 + [2] + [(b - a) % 256 for a, b in zip(row0, row1)])
    out = decode_png_rgb(png(3, 2, 0, raw))
    assert out.shape == (2, 3)
    assert out.tolist() == [row0, row1]

    # 2x1 RGBA, unfiltered
    px = [1, 2, 3, 255, 9, 8, 7, 128]
    out = decode_png_rgb(png(2, 1, 6, bytes([0] + px)))
    assert out.shape == (1, 2, 4)
    assert out.ravel().tolist() == px


def test_parse_image_header_meta_exif_thumbnail(spark):
    """ADVICE r10 #1: an APP1 (EXIF-style) segment whose body embeds
    a COMPLETE thumbnail JPEG — with its own SOF0 carrying different
    dims — must not shadow the primary frame header. The marker walk
    skips the APP1 segment by its length field; the retired
    whole-payload regexp matched the thumbnail's FF C0 first and
    returned the thumbnail's dims."""
    import struct as _struct

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from tidb_lightning_release_4_0_spark.operators.jpeg_codec import (
        encode_jpeg,
    )
    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        parse_image_header_meta,
    )

    thumb = encode_jpeg(
        np.ascontiguousarray(_img(3, 4, seed=7)[:, :, 0])
    )
    main = encode_jpeg(
        np.ascontiguousarray(_img(5, 300, seed=8)[:, :, 0])
    )
    assert b"\xff\xc0" in thumb and main[:2] == b"\xff\xd8"
    app1_body = b"Exif\x00\x00" + thumb
    app1 = b"\xff\xe1" + _struct.pack(">H", len(app1_body) + 2) + app1_body
    # splice APP1 right after SOI — thumbnail SOF0 now sits BEFORE
    # the main SOF0 in the byte stream
    payload = main[:2] + app1 + main[2:]
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    df = spark.createDataFrame([Row(id=1, payload=payload)], schema)
    got = parse_image_header_meta(df).first()
    assert (got["mime"], got["width"], got["height"]) == (
        "image/jpeg", 300, 5,
    )

    # FF fill bytes before a marker (T.81 B.1.1.2) are consumed
    padded = main[:2] + b"\xff\xff" + main[2:]
    dfp = spark.createDataFrame([Row(id=2, payload=padded)], schema)
    got = parse_image_header_meta(dfp).first()
    assert (got["width"], got["height"]) == (300, 5)


def test_mjpeg_avi_roundtrip_exact():
    """r11 directive #3: Motion-JPEG AVI — constant-8x8-block
    grayscale frames (all-ones quant) roundtrip BIT-EXACTLY through
    container + DCT entropy coding, including DRI/RSTn streams."""
    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    rng = np.random.default_rng(5)
    for nf, bh, bw, ri in ((1, 1, 1, 0), (3, 2, 3, 1), (5, 1, 2, 2)):
        bv = rng.integers(0, 256, size=(nf, bh, bw))
        frames = np.repeat(np.repeat(bv.astype(np.uint8), 8, 1), 8, 2)
        out = decode_avi_mjpeg(
            encode_avi_mjpeg(frames, restart_interval=ri)
        )
        assert out.shape == frames.shape
        assert np.array_equal(out, frames), (nf, bh, bw, ri)


def test_mjpeg_avi_rejects_other_streams():
    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        decode_avi_dib,
        decode_avi_mjpeg,
        encode_avi_dib,
        encode_avi_mjpeg,
    )

    rng = np.random.default_rng(6)
    dib = encode_avi_dib(
        rng.integers(0, 256, size=(2, 4, 4, 3)).astype(np.uint8)
    )
    with pytest.raises(ValueError, match="MJPEG"):
        decode_avi_mjpeg(dib)
    mj = encode_avi_mjpeg(np.full((2, 8, 8), 9, np.uint8))
    with pytest.raises(ValueError, match="codec"):
        decode_avi_dib(mj)  # the DIB decoder refuses MJPG streams
    with pytest.raises(ValueError, match="RIFF"):
        decode_avi_mjpeg(b"\x89PNG not an avi")


def test_parse_image_header_meta_progressive(spark):
    """r11: the metadata walk reads dims from SOF2 frames too — the
    decoder supports progressive, so the 100 TB metadata pass must
    not reject them."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from tidb_lightning_release_4_0_spark.operators.jpeg_codec import (
        encode_jpeg_progressive,
    )
    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        parse_image_header_meta,
    )

    jpg = encode_jpeg_progressive(
        np.ascontiguousarray(_img(5, 300, seed=9)[:, :, 0])
    )
    assert b"\xff\xc2" in jpg
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    df = spark.createDataFrame([Row(id=1, payload=jpg)], schema)
    got = parse_image_header_meta(df).first()
    assert (got["mime"], got["width"], got["height"]) == (
        "image/jpeg", 300, 5,
    )


def test_mjpeg_avi_color_frames():
    """Color MJPEG (the real-camera case): encode RGB frames as
    per-frame color JPEGs ('420' like actual MJPEG cameras), decode
    the stream, and match the per-frame JPEG decode exactly —
    container framing must not change pixels."""
    from tidb_lightning_release_4_0_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )
    from tidb_lightning_release_4_0_spark.operators.multimodal import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(3, 16, 24, 3), dtype=np.uint8)
    for sub in ("444", "420"):
        out = decode_avi_mjpeg(
            encode_avi_mjpeg(frames, subsampling=sub, restart_interval=1)
        )
        want = np.stack(
            [
                decode_jpeg(
                    encode_jpeg(f, subsampling=sub, restart_interval=1)
                )
                for f in frames
            ]
        )
        assert out.shape == (3, 16, 24, 3)
        assert np.array_equal(out, want), sub
