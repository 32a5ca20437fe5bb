"""Baseline JPEG codec (operators/jpeg_codec.py): exactness contract,
entropy-layer roundtrips, spec pins, and rejection paths.

The media_decode_jpeg / media_resize_jpeg oracle entries hash-verify
the constant-block DC path end to end at the driver; these tests pin
everything the closed-form oracle cannot reach — AC run/size coding
(ZRL, EOB, categories to 10), the zigzag order, the canonical Huffman
construction, the IDCT against a naive O(8^4) reference, and the
bitstream conventions via a hand-derived golden scan.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tidb_lightning_release_4_0_spark.operators import jpeg_codec as J

# --- spec pins -------------------------------------------------------------

# T.81 figure A.6 zigzag order as flat row-major indices
_SPEC_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def test_zigzag_matches_spec():
    assert list(J._ZFLAT) == _SPEC_ZIGZAG


def test_huffman_tables_valid_and_cover_all_symbols():
    """Canonical validity (Kraft sum <= 1, no 17-bit overflow) plus
    full coverage: DC categories 0..11, AC {EOB, ZRL} and every
    (run 0..15, size 1..10) — everything the encoder can emit."""
    need_ac = {0x00, 0xF0} | {
        (r << 4) | s for r in range(16) for s in range(1, 11)
    }
    for bits, vals in (
        (J.DC_LUMA_BITS, J.DC_LUMA_VALS),
        (J.DC_CHROMA_BITS, J.DC_CHROMA_VALS),
    ):
        assert sum(bits) == len(vals) == 12
        assert set(vals) == set(range(12))
        assert sum(n / (1 << l) for l, n in enumerate(bits, 1)) <= 1
    for bits, vals in (
        (J.AC_LUMA_BITS, J.AC_LUMA_VALS),
        (J.AC_CHROMA_BITS, J.AC_CHROMA_VALS),
    ):
        assert sum(bits) == len(vals) == 162
        assert set(vals) == need_ac
        assert sum(n / (1 << l) for l, n in enumerate(bits, 1)) <= 1
    # encode and decode tables must be inverses
    enc = J._build_encode_table(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    dec = J._build_decode_table(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    assert all(dec[(ln, code)] == sym for sym, (code, ln) in enc.items())


def test_idct_matches_naive_reference():
    rng = np.random.default_rng(7)
    coeffs = rng.integers(-500, 500, size=(3, 8, 8)).astype(np.float64)
    got = J.idct2(coeffs)
    cu = np.where(np.arange(8) == 0, 1 / np.sqrt(2), 1.0)
    for n in range(3):
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        s += (
                            cu[u] * cu[v] / 4 * coeffs[n, u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                assert abs(got[n, x, y] - s) < 1e-9


def test_fdct_idct_are_inverses():
    rng = np.random.default_rng(11)
    blocks = rng.uniform(-128, 127, size=(5, 8, 8))
    assert np.allclose(J.idct2(J.fdct2(blocks)), blocks, atol=1e-10)


# --- entropy layer: exact coefficient roundtrip ----------------------------


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_coefficient_roundtrip_exact(data):
    """encode_block -> decode_block is the identity on arbitrary
    in-range quantized coefficient vectors — including long zero runs
    (ZRL), trailing zeros (EOB), a nonzero at k=63 (no EOB), negative
    values, and DC diffs across a chain of blocks."""
    n_blocks = data.draw(st.integers(1, 4))
    blocks = []
    for _ in range(n_blocks):
        zz = np.zeros(64, np.int64)
        zz[0] = data.draw(st.integers(-1024, 1024))
        for _ in range(data.draw(st.integers(0, 8))):
            k = data.draw(st.integers(1, 63))
            v = data.draw(
                st.integers(-1023, 1023).filter(lambda x: x != 0)
            )
            zz[k] = v
        blocks.append(zz)
    dc_e = J._build_encode_table(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac_e = J._build_encode_table(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    dc_d = J._build_decode_table(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac_d = J._build_decode_table(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    bw = J._BitWriter()
    prev = 0
    for zz in blocks:
        prev = J._encode_block(zz, prev, bw, dc_e, ac_e)
    br = J._BitReader(bw.flush())
    prev = 0
    for zz in blocks:
        got, prev = J._decode_block(br, prev, dc_d, ac_d)
        assert np.array_equal(got, zz)


def test_zrl_long_runs_roundtrip():
    """>=32 zeros between nonzeros forces chained ZRL symbols."""
    zz = np.zeros(64, np.int64)
    zz[0] = 5
    zz[40] = -3   # 39 zeros -> 2x ZRL + run 7
    zz[63] = 1    # 22 zeros -> 1x ZRL + run 6, and no EOB after k=63
    dc_e = J._build_encode_table(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac_e = J._build_encode_table(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    bw = J._BitWriter()
    J._encode_block(zz, 0, bw, dc_e, ac_e)
    br = J._BitReader(bw.flush())
    got, _ = J._decode_block(
        br,
        0,
        J._build_decode_table(J.DC_LUMA_BITS, J.DC_LUMA_VALS),
        J._build_decode_table(J.AC_LUMA_BITS, J.AC_LUMA_VALS),
    )
    assert np.array_equal(got, zz)


# --- full-image paths -------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 70),
    st.integers(0, 2**31 - 1),
)
def test_constant_block_exactness(h, w, seed):
    """The media_decode_jpeg contract: constant 8x8 blocks + all-ones
    quant decode BIT-EXACTLY through the lossy pipeline."""
    rng = np.random.default_rng(seed)
    bv = rng.integers(0, 256, size=(-(-h // 8), -(-w // 8)))
    img = np.repeat(np.repeat(bv, 8, 0), 8, 1)[:h, :w].astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


@settings(max_examples=10, deadline=None)
@given(st.integers(1, 48), st.integers(1, 48), st.integers(0, 2**31 - 1))
def test_gray_allones_quant_error_bound(h, w, seed):
    """Arbitrary grayscale with quant=1: the only loss is coefficient
    rounding (<= 0.5 per coefficient), which bounds the spatial error
    to ~4 gray levels; empirically <= 2. Shape and crop must be
    exact."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_rgb_roundtrip_error_bound():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(33, 17, 3)).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img))
    assert out.shape == img.shape
    # quant rounding + two float YCbCr conversions with rounding
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_standard_quant_tables_lossy_but_sane():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img, quant_luma=J.QUANT_LUMA_STD))
    assert out.shape == img.shape
    # random noise is JPEG's worst case; still far from garbage
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 40


def test_smooth_gradient_high_fidelity_with_std_tables():
    y, x = np.mgrid[0:32, 0:32]
    img = ((y * 3 + x * 2) % 256).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img, quant_luma=J.QUANT_LUMA_STD))
    smooth = np.abs(out.astype(int)[2:-2, 2:-2] - img.astype(int)[2:-2, 2:-2])
    assert smooth.mean() < 12  # wrap seams excluded, interior faithful


# --- chroma subsampling (4:2:0 / 4:2:2) -------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.sampled_from(["420", "422"]),
    st.integers(1, 37),
    st.integers(1, 37),
    st.integers(0, 2**31 - 1),
)
def test_subsampled_roundtrip_constant_chroma(mode, h, w, seed):
    """R=G=B input has (near-)constant chroma, so the box-mean
    downsample + replication upsample loses almost nothing and the
    error bound stays at the 4:4:4 level — across non-multiple-of-16
    dims (partial MCUs at both edges)."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    img = np.stack([g, g, g], axis=-1)
    out = J.decode_jpeg(J.encode_jpeg(img, subsampling=mode))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_subsampled_roundtrip_smooth_chroma_bounded():
    """Smoothly-varying color: 4:2:0's 2x2 chroma box-mean +
    replication bounds the chroma error by the local gradient — a
    generous but real bound; and the file is genuinely smaller than
    4:4:4 (that is the point of subsampling)."""
    y, x = np.mgrid[0:33, 0:29]
    img = np.stack(
        [
            (100 + y * 2) % 256,
            (80 + x * 2) % 256,
            (60 + y + x) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    full = J.encode_jpeg(img, subsampling="444")
    sub = J.encode_jpeg(img, subsampling="420")
    out = J.decode_jpeg(sub)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 16
    assert len(sub) < len(full)


def test_subsampled_sof_bytes_and_mcu_geometry():
    """4:2:0 writes luma sampling 0x22 / chroma 0x11 in SOF0, and a
    17x17 image (3 partial MCUs) decodes to exact dims."""
    import struct as _struct

    img = np.full((17, 17, 3), 90, np.uint8)
    payload = J.encode_jpeg(img, subsampling="420")
    sof = payload.index(b"\xff\xc0")
    assert payload[sof + 11] == 0x22  # luma H=2,V=2
    assert payload[sof + 14] == 0x11  # Cb
    assert payload[sof + 17] == 0x11  # Cr
    hgt, wdt = _struct.unpack_from(">HH", payload, sof + 5)
    assert (hgt, wdt) == (17, 17)
    out = J.decode_jpeg(payload)
    assert out.shape == (17, 17, 3)
    # constant-color input: flat through subsample + roundtrip
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


# --- bitstream conventions: hand-derived golden -----------------------------


def test_golden_scan_bytes_hand_derived():
    """8x8 constant 130 with all-ones quant: DC = 8*(130-128) = 16,
    category 5 (DC luma canonical code 110), 5 value bits 10000, then
    EOB (AC luma canonical code 1010), padded with 1-bits =>
    1101 0000 1010 1111 = D0 AF. Pins MSB-first bit order, canonical
    code construction, category/value coding and flush padding
    against an independent hand derivation."""
    img = np.full((8, 8), 130, np.uint8)
    payload = J.encode_jpeg(img)
    # entropy data sits between the SOS segment and EOI
    sos = payload.rindex(b"\xff\xda")
    ln = struct.unpack_from(">H", payload, sos + 2)[0]
    scan = payload[sos + 2 + ln: -2]
    assert scan == b"\xd0\xaf"
    assert np.array_equal(J.decode_jpeg(payload), img)


def test_byte_stuffing_roundtrip():
    """A scan that emits an 0xFF byte must be stuffed (FF 00) and
    unstuffed transparently."""
    bw = J._BitWriter()
    bw.write(0xFF, 8)
    bw.write(0xFF, 8)
    raw = bw.flush()
    assert raw == b"\xff\x00\xff\x00"
    br = J._BitReader(raw)
    assert br.read_bits(16) == 0xFFFF


# --- rejection paths ---------------------------------------------------------


def test_rejects_non_jpeg_and_unsupported_flavors():
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"\x89PNG\r\n\x1a\n")
    base = J.encode_jpeg(np.full((8, 8), 9, np.uint8))
    # SOF2 is SUPPORTED since r11 — but a baseline stream merely
    # relabeled progressive is malformed (its single scan has
    # Ss=0, Se=63; a progressive DC scan requires Se == 0)
    prog = base.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError, match="Se == 0"):
        J.decode_jpeg(prog)
    # genuinely-unsupported SOF flavors still raise
    ext = base.replace(b"\xff\xc0", b"\xff\xc1")
    with pytest.raises(ValueError, match="SOF0"):
        J.decode_jpeg(ext)
    # r11: DRI is SUPPORTED now — but a DRI promising restarts the
    # scan does not contain must fail loudly at the first boundary
    multi = J.encode_jpeg(
        np.arange(32 * 8, dtype=np.uint8).reshape(8, 32)
    )  # 4 MCUs, no RST markers
    sos = multi.index(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x02"  # interval 2
    with pytest.raises(ValueError, match="RSTn"):
        J.decode_jpeg(multi[:sos] + dri + multi[sos:])
    # sampling factors beyond 2 per axis: patch the SOF sampling byte
    sof = base.index(b"\xff\xc0")
    patched = bytearray(base)
    patched[sof + 11] = 0x33  # (id, SAMPLING, tq) triple starts at +10
    with pytest.raises(ValueError, match="sampling factors"):
        J.decode_jpeg(bytes(patched))
    with pytest.raises(ValueError, match="subsampling"):
        J.encode_jpeg(np.zeros((4, 4, 3), np.uint8), subsampling="411")


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="uint8"):
        J.encode_jpeg(np.zeros((4, 4), np.int64))
    with pytest.raises(ValueError, match="h,w"):
        J.encode_jpeg(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError, match="range"):
        J.encode_jpeg(np.zeros((0, 4), np.uint8))


# --- restart markers (r11 directive #4) --------------------------------------


@pytest.mark.parametrize("interval", [1, 2, 3, 7])
def test_dri_roundtrip_exact_gray(interval):
    """Constant-8x8-block grayscale with all-ones quant roundtrips
    bit-exactly THROUGH restart markers: the encoder emits DRI + RSTm
    (byte-aligned, DC predictors reset, m cycling 0..7), the decoder
    resyncs at every boundary. 10 MCUs crosses the m=7 -> m=0 wrap at
    interval 1."""
    rng = np.random.default_rng(interval)
    blocks = rng.integers(0, 256, size=(1, 10), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    payload = J.encode_jpeg(img, restart_interval=interval)
    assert b"\xff\xdd" in payload
    assert b"\xff\xd0" in payload  # at least RST0
    out = J.decode_jpeg(payload)
    assert np.array_equal(out, img)
    # the same image without restarts decodes to the same pixels
    assert np.array_equal(J.decode_jpeg(J.encode_jpeg(img)), img)


def test_dri_roundtrip_color_subsampled():
    """4:2:0 color + restarts: decoded pixels must equal the
    no-restart decode exactly (restart markers change framing, not
    coefficients)."""
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(24, 48, 3), dtype=np.uint8)
    with_rst = J.decode_jpeg(
        J.encode_jpeg(img, subsampling="420", restart_interval=1)
    )
    without = J.decode_jpeg(J.encode_jpeg(img, subsampling="420"))
    assert np.array_equal(with_rst, without)


def test_rst_out_of_sequence_raises():
    img = np.arange(32 * 8, dtype=np.uint8).reshape(8, 32)  # 4 MCUs
    payload = J.encode_jpeg(img, restart_interval=1)
    # corrupt the first RST0 -> RST5
    broken = payload.replace(b"\xff\xd0", b"\xff\xd5", 1)
    with pytest.raises(ValueError, match="sequence"):
        J.decode_jpeg(broken)


def test_encoder_rejects_out_of_range_quant_and_interval():
    """ADVICE r10 #2: quant values outside 1..255 (or a non-8x8
    table) must raise, not wrap modulo 256 into a silently-wrong
    bitstream."""
    img = np.full((8, 8), 7, np.uint8)
    with pytest.raises(ValueError, match="1..255"):
        J.encode_jpeg(img, quant_luma=np.full((8, 8), 300, np.int64))
    with pytest.raises(ValueError, match="1..255"):
        J.encode_jpeg(img, quant_luma=np.zeros((8, 8), np.int64))
    with pytest.raises(ValueError, match="shape"):
        J.encode_jpeg(img, quant_luma=np.ones((4, 4), np.int64))
    with pytest.raises(ValueError, match="1..255"):
        J.encode_jpeg(
            np.full((8, 8, 3), 7, np.uint8),
            quant_chroma=np.full((8, 8), 256, np.int64),
        )
    with pytest.raises(ValueError, match="u16"):
        J.encode_jpeg(img, restart_interval=1 << 16)


def test_fill_bytes_and_standalone_markers():
    """ADVICE r10 #4: legal 0xFF fill bytes before a marker are
    consumed (not misparsed as marker 0xFFFF with a garbage length);
    a standalone marker (TEM) between header segments raises an
    explicit error instead of desynchronizing."""
    img = np.full((8, 8), 77, np.uint8)
    base = J.encode_jpeg(img)
    padded = base[:2] + b"\xff\xff\xff" + base[2:]
    assert np.array_equal(J.decode_jpeg(padded), img)
    tem = base[:2] + b"\xff\x01" + base[2:]
    with pytest.raises(ValueError, match="standalone"):
        J.decode_jpeg(tem)


# --- progressive (SOF2, r11) -------------------------------------------------


def test_progressive_equals_baseline_gray_and_color():
    """The progressive script (DC first + refinements, two spectral
    AC bands each with first + refinement scans) codes the SAME
    quantized coefficients as the sequential scan, so decoded pixels
    must equal the baseline decode EXACTLY — any drift in the
    successive-approximation arithmetic (truncate-toward-zero,
    correction bits, EOBRUN) shows up here."""
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg_progressive(g)),
        J.decode_jpeg(J.encode_jpeg(g)),
    )
    for sub in ("444", "422", "420"):
        c = rng.integers(0, 256, size=(9, 23, 3), dtype=np.uint8)
        assert np.array_equal(
            J.decode_jpeg(J.encode_jpeg_progressive(c, subsampling=sub)),
            J.decode_jpeg(J.encode_jpeg(c, subsampling=sub)),
        ), sub


def test_progressive_constant_block_exact():
    rng = np.random.default_rng(3)
    bv = rng.integers(0, 256, size=(3, 5), dtype=np.uint8)
    img = np.repeat(np.repeat(bv, 8, 0), 8, 1)
    payload = J.encode_jpeg_progressive(img)
    assert b"\xff\xc2" in payload  # SOF2, not SOF0
    assert np.array_equal(J.decode_jpeg(payload), img)


@pytest.mark.parametrize("al", [0, 1, 3])
@pytest.mark.parametrize("ri", [0, 1, 3])
def test_progressive_approximation_depths_and_restarts(al, ri):
    rng = np.random.default_rng(al * 10 + ri)
    img = rng.integers(0, 256, size=(33, 49), dtype=np.uint8)
    got = J.decode_jpeg(
        J.encode_jpeg_progressive(img, al=al, restart_interval=ri)
    )
    assert np.array_equal(got, J.decode_jpeg(J.encode_jpeg(img)))


def test_progressive_eobrun_multi_block_decode():
    """EOBn with n > 0 (an end-of-band run spanning several blocks)
    is legal Annex-G that our encoder never emits (it closes each
    block with EOB0) — pin the DECODER path with a hand-built
    bitstream: a custom AC table containing the EOB2 symbol (0x20),
    coding 'block0: coeff then EOB2+bits covering 3 blocks' over 4
    blocks; block 3 codes its own coefficient after the run."""
    # tiny canonical table: symbols 0x01 (len 1), 0x20 (len 2), 0x00 (len 3)
    bits = [1, 1, 1] + [0] * 13
    vals = [0x01, 0x20, 0x00]
    enc = J._build_encode_table(bits, vals)
    dec = J._build_decode_table(bits, vals)
    bw = J._BitWriter()
    # block 0: (run 0, size 1) value 1 at k=1, then EOB2 -> eobrun =
    # 4 + extra(2 bits = 0b11 = 3) - wait: eobrun = (1<<2) + bits(2)
    code, ln = enc[0x01]; bw.write(code, ln); bw.write(1, 1)  # +1 at k=1
    code, ln = enc[0x20]; bw.write(code, ln); bw.write(2, 2)  # eobrun = 4+2
    # run covers the REST of block 0 plus blocks 1..5 (6 total minus
    # the current one -> 5 more blocks)
    br = J._BitReader(bw.flush())
    blocks = [np.zeros(64, np.int64) for _ in range(6)]
    eobrun = 0
    for zz in blocks:
        eobrun = J._prog_dec_ac_first_block(br, zz, dec, 1, 63, 0, eobrun)
    assert blocks[0][1] == 1
    assert all(not b.any() for b in blocks[1:])
    assert eobrun == 0


def test_progressive_refine_correction_bits_roundtrip():
    """Coefficient-level roundtrip of the AC refinement protocol:
    random bands encoded at Al=1 then refined to Al=0 must restore
    the exact signed values — exercises newly-significant sign bits,
    buffered correction bits across zero runs and ZRL, and EOB0."""
    rng = np.random.default_rng(7)
    enc_ac = J._build_encode_table(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    dec_ac = J._build_decode_table(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    for trial in range(40):
        n_blocks = int(rng.integers(1, 5))
        blocks = []
        for _ in range(n_blocks):
            zz = np.zeros(64, np.int64)
            for _ in range(int(rng.integers(0, 10))):
                k = int(rng.integers(1, 64))
                zz[k] = int(rng.integers(-40, 41))
            blocks.append(zz)
        bw1 = J._BitWriter()
        for zz in blocks:
            J._prog_enc_ac_first_block(zz, bw1, enc_ac, 1, 63, 1)
        bw2 = J._ProgBitWriter()
        for zz in blocks:
            J._prog_enc_ac_refine_block(zz, bw2, enc_ac, 1, 63, 0)
        got = [np.zeros(64, np.int64) for _ in range(n_blocks)]
        br = J._BitReader(bw1.flush())
        eob = 0
        for zz in got:
            eob = J._prog_dec_ac_first_block(br, zz, dec_ac, 1, 63, 1, eob)
        br = J._BitReader(bw2.flush())
        eob = 0
        for zz in got:
            eob = J._prog_dec_ac_refine_block(br, zz, dec_ac, 1, 63, 0, eob)
        for want, have in zip(blocks, got):
            assert np.array_equal(want, have), trial
