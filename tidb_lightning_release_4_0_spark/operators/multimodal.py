"""Multimodal columns: image/audio/video as opaque binary + metadata.

Beyond-reference operators (BASELINE.json north star). Design for
100 TB of media:

- A media column is ``binary`` payload + a typed metadata struct
  (mime, width/height or sample-rate, duration, byte length) — the
  payload stays opaque to Catalyst, metadata columns are prunable /
  filterable (partition elimination on mime, size predicates push
  into the scan).
- Decode / feature-extract / resize / frame-sample run as
  Arrow-batched ``mapInPandas`` kernels: per-batch numpy work, no
  per-row pickling, no shuffle (narrow transforms).
- The codec step is pluggable: ``decoder=`` takes any
  bytes->ndarray callable. Seven REAL pure-stdlib(+numpy) codecs ship
  — 24-bit uncompressed BMP (BGR bottom-up, 4-byte row padding),
  binary PPM (P6), PCM-16 WAV, PNG (zlib DEFLATE + full
  scanline-filter reconstruction), baseline JPEG (jpeg_codec.py:
  marker walk, DHT Huffman, dequant, vectorized IDCT, YCbCr, DRI/RSTn
  restarts), uncompressed AVI (RIFF chunk tree, DIB frames) and
  Motion-JPEG AVI (r11: the compressed-video path — one full JPEG
  decode per '00dc' chunk) — so EVERY modality's decode path (image,
  DEFLATE- and DCT-compressed image, audio, raw and compressed video)
  is genuinely exercised end to end and the ``multimodal_features`` /
  ``media_decode_png`` / ``media_decode_jpeg`` / ``media_resize_png``
  / ``media_frame_sample_avi`` / ``media_frame_sample_mjpeg`` registry
  entries are value-hash-checked against closed-form oracles. The
  last ``_stub`` symbols (``resize_stub`` + ``_stub_decode``) were
  retired in round 11: every kernel now defaults to a real codec.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_media_metadata(
    df: DataFrame, payload_col: str = "payload", mime: str = "image/fake"
) -> DataFrame:
    """Derive the typed metadata struct from a raw binary column.

    Real deployments parse headers here (cheap, JVM-side length +
    magic bytes); the stub fills deterministic dimensions."""
    p = F.col(payload_col)
    h = F.conv(F.substring(F.md5(p.cast("string")), 1, 4), 16, 10).cast("int")
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            (F.pmod(h, F.lit(512)) + 16).alias("width"),
            (F.pmod(h + 7, F.lit(512)) + 16).alias("height"),
            F.length(p).cast("long").alias("n_bytes"),
        ),
    )


# ---------------------------------------------------------------------------
# real pure-stdlib codecs (trivial containers)
# ---------------------------------------------------------------------------


def parse_image_header_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "id"
) -> DataFrame:
    """REAL header parsing, entirely JVM-side (no UDF, no Python in
    the plan): sniff the magic bytes of a binary image column and
    extract (mime, width, height) from the container header with
    pure expressions — PNG's IHDR carries big-endian u32 dims at
    offsets 17/21, BMP's BITMAPINFOHEADER little-endian i32 dims at
    19/23 (1-based), and baseline JPEG's SOF0 segment carries
    big-endian u16 (height, width) 4/6 bytes past its FF C0 marker,
    located by WALKING the marker segments (r11, ADVICE r10 #1):
    each segment is skipped by its big-endian length field exactly
    as jpeg_codec.decode_jpeg does, so an APPn/EXIF body embedding a
    complete thumbnail JPEG — whose own FF C0 sits before the real
    frame header — can no longer shadow the primary SOF0 the way the
    retired whole-payload hex regexp allowed. The walk is a bounded
    fold (``F.aggregate`` over 32 steps, far more header segments
    than any real pre-scan list; FF fill bytes are consumed, hitting
    SOS or desyncing lands in the raise_error arm below). Byte
    access is substring-on-binary -> hex -> conv, so the whole
    projection stays inside whole-stage codegen; at 100 TB this is
    the cheap metadata pass that runs BEFORE any Arrow decode kernel
    (prune by mime/dims without touching pixel bytes)."""
    p = F.col(payload_col)

    def be_u32(off: int) -> Column:  # 1-based offset
        return F.conv(F.hex(F.substring(p, off, 4)), 16, 10).cast("int")

    def le_u32(off: int) -> Column:
        b = [
            F.conv(F.hex(F.substring(p, off + k, 1)), 16, 10).cast("long")
            for k in range(4)
        ]
        return (
            b[0] + b[1] * F.lit(256) + b[2] * F.lit(65536)
            + b[3] * F.lit(16777216)
        ).cast("int")

    is_png = F.substring(p, 1, 8) == F.lit(_PNG_SIG)
    is_bmp = F.substring(p, 1, 2) == F.lit(b"BM")
    is_jpg = F.substring(p, 1, 2) == F.lit(b"\xff\xd8")

    def _u8_at(off: Column) -> Column:  # off: 1-based dynamic
        return F.conv(
            F.hex(F.substring(p, off, F.lit(1))), 16, 10
        ).cast("int")

    def _u16_at(off: Column) -> Column:  # off: 1-based dynamic
        return F.conv(
            F.hex(F.substring(p, off, F.lit(2))), 16, 10
        ).cast("int")

    # SOF0 (baseline) and SOF2 (progressive — supported by the r11
    # decoder) share the frame-header layout, so the metadata pass
    # accepts both; other SOF flavors fall through to the raise arm
    _SOF0, _SOF2, _SOS = 0xFFC0, 0xFFC2, 0xFFDA

    def _is_sof(off: Column) -> Column:
        m = _u16_at(off)
        return (m == _SOF0) | (m == _SOF2)

    def _walk_step(acc: Column, _x: Column) -> Column:
        # acc = 1-based offset of the current marker's FF byte;
        # 0 = terminal error (desync / SOS reached without a frame
        # header)
        return (
            F.when(acc <= 0, acc)
            .when(_is_sof(acc), acc)  # found — freeze
            .when(_u8_at(acc) != 255, F.lit(0))  # desynchronized
            .when(_u8_at(acc + 1) == 255, acc + 1)  # FF fill byte
            .when(_u16_at(acc) == _SOS, F.lit(0))  # scan, no header
            .otherwise(acc + 2 + _u16_at(acc + 2))  # skip by length
        )

    # 1-based offset of the primary frame header's FF byte (0 if the
    # pre-scan segment list holds no SOF0/SOF2 — an unsupported SOF
    # flavor, truncated, or desynchronized input -> the raise_error
    # arm below)
    sof0 = F.aggregate(
        F.sequence(F.lit(1), F.lit(32)), F.lit(3), _walk_step
    )
    # ADVICE r9 #3: a BITMAPCOREHEADER file or a top-down BMP
    # (negative biHeight) would silently compose garbage dims out of
    # the two's-complement bytes — validate biSize == 40 and a
    # non-negative height MSB with the same raise_error pattern as
    # unknown magic, instead of returning wrong metadata.
    bmp_ok = (le_u32(15) == 40) & (
        F.conv(F.hex(F.substring(p, 26, 1)), 16, 10).cast("int") < 128
    )
    jpg_ok = (sof0 > 0) & _is_sof(sof0)
    mime = (
        F.when(is_png, F.lit("image/png"))
        .when(is_bmp & bmp_ok, F.lit("image/bmp"))
        .when(
            is_bmp,
            F.raise_error(
                F.lit(
                    "parse_image_header_meta: unsupported BMP (need "
                    "bottom-up BITMAPINFOHEADER, biSize=40, "
                    "biHeight>=0)"
                )
            ),
        )
        .when(is_jpg & jpg_ok, F.lit("image/jpeg"))
        .when(
            is_jpg,
            F.raise_error(
                F.lit(
                    "parse_image_header_meta: JPEG without a "
                    "SOF0/SOF2 frame header"
                )
            ),
        )
        .otherwise(
            F.raise_error(
                F.lit("parse_image_header_meta: unknown magic bytes")
            )
        )
    )
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        mime.alias("mime"),
        F.when(is_png, be_u32(17))
        .when(is_jpg, _u16_at(sof0 + 7))
        .otherwise(le_u32(19))
        .alias("width"),
        F.when(is_png, be_u32(21))
        .when(is_jpg, _u16_at(sof0 + 5))
        .otherwise(le_u32(23))
        .alias("height"),
        F.length(p).cast("long").alias("n_bytes"),
    )


def encode_bmp_rgb(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (BITMAPINFOHEADER,
    BI_RGB): pixel rows stored BOTTOM-UP in BGR order, each row padded
    to a 4-byte boundary — the format every BMP reader must undo."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += arr[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    img_size = len(body)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(body)


def decode_bmp_rgb(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP -> (h, w, 3) uint8 RGB (undoes bottom-up row
    order, BGR channel order and the 4-byte row padding). Raises on
    any other BMP flavor — this is a codec, not a sniffer."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    out = np.empty((h, w, 3), np.uint8)
    for r in range(h):
        off = data_off + r * stride
        row = np.frombuffer(payload, np.uint8, row_bytes, off).reshape(w, 3)
        out[h - 1 - r if flip else r] = row[:, ::-1]  # BGR -> RGB
    return out


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6, maxval 255)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8 RGB. Handles the standard
    whitespace/comment-tolerant header grammar."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos: pos + 1].isspace():
            pos += 1
        if payload[pos: pos + 1] == b"#":  # comment to end of line
            while payload[pos: pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos: pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return np.frombuffer(payload, np.uint8, h * w * 3, pos).reshape(h, w, 3)


def encode_wav_pcm16(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """(n,) or (n, channels) int16 -> RIFF/WAVE PCM-16."""
    s = np.asarray(samples, np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    data = s.tobytes()  # interleaved little-endian
    byte_rate = sample_rate * n_ch * 2
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, n_ch, sample_rate, byte_rate,
            n_ch * 2, 16,
        )
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 -> ((n, channels) int16, sample_rate); walks
    the chunk list so extra chunks (LIST/fact) don't break it."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n_ch, rate, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt, n_ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={fmt}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if n_ch is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    arr = np.frombuffer(data, "<i2").reshape(-1, n_ch)
    return arr, rate


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9.4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png_rgb(arr: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """(h, w, 3) uint8 RGB -> a real PNG (8-bit, color type 2,
    zlib-compressed scanlines). A COMPRESSED format end-to-end with
    pure stdlib (zlib). ``filter_mode='cycle'`` assigns scanline y
    the filter type y % 5, so a roundtrip exercises every PNG filter
    reconstruction (None/Sub/Up/Average/Paeth); ``'none'`` writes
    unfiltered rows."""
    import zlib

    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    bpp = 3
    raw = bytearray()
    prior = np.zeros(w * bpp, np.int64)
    for y in range(h):
        row = arr[y].reshape(-1).astype(np.int64)
        ft = (y % 5) if filter_mode == "cycle" else 0
        raw.append(ft)
        if ft == 0:
            out = row
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
            out = (row - left) % 256
        elif ft == 2:  # Up
            out = (row - prior) % 256
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
            out = (row - (left + prior) // 2) % 256
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int64), prior[:-bpp]])
            pred = np.asarray(
                [
                    _paeth(int(a), int(b), int(cc))
                    for a, b, cc in zip(left, prior, upleft)
                ],
                np.int64,
            )
            out = (row - pred) % 256
        raw += out.astype(np.uint8).tobytes()
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_rgb(payload: bytes) -> np.ndarray:
    """PNG -> (h, w, channels) uint8: full scanline filter
    reconstruction (None/Sub/Up/Average/Paeth, spec §9), multi-IDAT
    concatenation, ancillary chunks skipped, per-chunk CRC verified.
    Supports the 8-bit non-interlaced flavors (gray / RGB / RGBA);
    raises on anything else — a codec, not a sniffer."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    w = h = None
    bpp = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4: pos + 8]
        data = payload[pos + 8: pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, interlace={interlace})"
                )
            bpp = {0: 1, 2: 3, 6: 4}.get(color)
            if bpp is None:
                raise ValueError(f"unsupported PNG color type {color}")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has the wrong size")
    out = np.empty((h, stride), np.int64)
    prior = np.zeros(stride, np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:
            cur = row
        elif ft == 2:  # Up
            cur = (row + prior) % 256
        elif ft in (1, 3, 4):  # Sub / Average / Paeth: sequential scan
            cur = np.empty(stride, np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                if ft == 1:
                    cur[x] = (row[x] + a) % 256
                elif ft == 3:
                    cur[x] = (row[x] + (a + prior[x]) // 2) % 256
                else:
                    c = prior[x - bpp] if x >= bpp else 0
                    cur[x] = (row[x] + _paeth(a, prior[x], int(c))) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = cur
        prior = cur
    arr = out.astype(np.uint8)
    return arr.reshape(h, w, bpp) if bpp > 1 else arr.reshape(h, w)


def synth_png_payloads(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id) -> (id, payload): a REAL zlib-compressed PNG per row with
    the SAME closed-form pixel rule as synth_bmp_payloads (width =
    id%13+1, height = id%7+1, pixel byte k = (id+k)%256) so the same
    plain-SQL oracle applies — but the bytes now roundtrip through
    DEFLATE and the per-scanline filter cycle (y%5), exercising every
    PNG filter reconstruction at driver scale."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    d = df.select(F.col(id_col).cast("long").alias("id"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["id"]:
                i = int(i)
                w, h = i % 13 + 1, i % 7 + 1
                v = (i + np.arange(h * w * 3, dtype=np.int64)) % 256
                arr = v.astype(np.uint8).reshape(h, w, 3)
                ids.append(i)
                blobs.append(encode_png_rgb(arr))
            yield pd.DataFrame({"id": ids, "payload": blobs})

    return d.mapInPandas(kernel, schema=out_schema)


def synth_jpeg_payloads(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id) -> (id, payload): a REAL baseline JPEG per row (SOF0,
    Huffman entropy coding, FDCT, all-ones quantization) with a
    closed-form pixel rule the decode can reproduce EXACTLY despite
    the lossy format: every 8x8 block is constant — width =
    (id%13+1)*5, height = (id%7+1)*5 (1..9 x 1..5 blocks, edge blocks
    partial), pixel (y, x) = (id + (y//8)*ceil(w/8) + x//8) % 256.
    A constant block's float FDCT is DC = 8*(v-128) (+ ~1e-13 noise,
    rounds exact) with all-zero AC, and the DC-only IDCT is exactly
    constant again, so the decoded bytes match the rule bit-for-bit
    — while the bitstream still exercises real marker parsing, DHT
    Huffman decode, DC difference coding across up to 45 blocks, EOB,
    dequantization, IDCT and edge cropping. Grayscale (1 component):
    the RGB path's YCbCr transform is float-rounding lossy by nature
    and is pinned by error-bound property tests instead."""
    from .jpeg_codec import encode_jpeg

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    d = df.select(F.col(id_col).cast("long").alias("id"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["id"]:
                i = int(i)
                w, h = (i % 13 + 1) * 5, (i % 7 + 1) * 5
                nbx = -(-w // 8)
                yy, xx = np.mgrid[0:h, 0:w]
                arr = ((i + (yy // 8) * nbx + xx // 8) % 256).astype(
                    np.uint8
                )
                ids.append(i)
                blobs.append(encode_jpeg(arr))
            yield pd.DataFrame({"id": ids, "payload": blobs})

    return d.mapInPandas(kernel, schema=out_schema)


def synth_jpeg_progressive_payloads(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id) -> (id, payload): a REAL PROGRESSIVE JPEG per row (SOF2,
    r11) — the SAME closed-form constant-block pixel rule as
    synth_jpeg_payloads (width = (id%13+1)*5, height = (id%7+1)*5,
    pixel (y, x) = (id + (y//8)*ceil(w/8) + x//8) % 256), but coded
    through the multi-scan Annex-G pipeline: an interleaved-geometry
    DC first scan at point transform 1 plus a DC refinement scan,
    two spectral AC bands (1..5, 6..63) each with first + refinement
    scans, EOBRUN end-of-band codes, and a per-doc DRI of id%3
    blocks. Constant blocks are DC-only, so the decode is bit-exact
    and the SAME SQL oracle as the baseline entry applies — a bug
    anywhere in the scan scheduling, successive-approximation
    arithmetic or restart resync hash-mismatches."""
    from .jpeg_codec import encode_jpeg_progressive

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    d = df.select(F.col(id_col).cast("long").alias("id"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["id"]:
                i = int(i)
                w, h = (i % 13 + 1) * 5, (i % 7 + 1) * 5
                nbx = -(-w // 8)
                yy, xx = np.mgrid[0:h, 0:w]
                arr = ((i + (yy // 8) * nbx + xx // 8) % 256).astype(
                    np.uint8
                )
                ids.append(i)
                blobs.append(
                    encode_jpeg_progressive(
                        arr, restart_interval=i % 3
                    )
                )
            yield pd.DataFrame({"id": ids, "payload": blobs})

    return d.mapInPandas(kernel, schema=out_schema)


def resize_image(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "id",
    target: tuple[int, int] = (2, 2),
    decoder: Callable[[bytes], np.ndarray] = decode_png_rgb,
) -> DataFrame:
    """REAL decode -> mean-pool resize -> exact integer features (no
    stub): pools the image to at most (th, tw) cells (factor
    max(h//th, 1) x max(w//tw, 1), trailing remainder cropped — the
    same arithmetic a strided average-pool does), emits the pooled
    bytes' sum and order-weighted sum so orientation bugs in decode
    OR pool hash-mismatch. The uint8 cast truncates the mean, exactly
    like the SQL oracle's floor(avg(...))."""
    th, tw = target
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("out_h", T.IntegerType()),
            T.StructField("out_w", T.IntegerType()),
            T.StructField("sum_resized", T.LongType()),
            T.StructField("weighted_resized", T.LongType()),
        ]
    )
    d = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(payload_col).alias("payload"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ohs, ows, sums, wsums = [], [], [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                arr = decoder(bytes(payload))
                h, w = arr.shape[0], arr.shape[1]
                oh, ow = min(th, h), min(tw, w)
                fh, fw = max(h // th, 1), max(w // tw, 1)
                pooled = (
                    arr[: fh * oh, : fw * ow]
                    .reshape(oh, fh, ow, fw, -1)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                flat = pooled.ravel().astype(np.int64)
                ids.append(int(i))
                ohs.append(oh)
                ows.append(ow)
                sums.append(int(flat.sum()))
                wsums.append(int((flat * (np.arange(flat.size) + 1)).sum()))
            yield pd.DataFrame(
                {
                    "id": ids, "out_h": ohs, "out_w": ows,
                    "sum_resized": sums, "weighted_resized": wsums,
                }
            )

    return d.mapInPandas(kernel, schema=out_schema)


def encode_avi_dib(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 RGB -> a real AVI (RIFF 'AVI ', one 'vids'
    stream, uncompressed DIB '00db' frames — each frame laid out like
    a 24-bit BMP pixel array: bottom-up rows, BGR, 4-byte row
    padding). The simplest real video container, fully expressible
    with stdlib struct — the video analog of the BMP/WAV codecs."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    frame_size = (row_bytes + pad) * h

    def dib(arr: np.ndarray) -> bytes:
        body = bytearray()
        for y in range(h - 1, -1, -1):
            body += arr[y, :, ::-1].tobytes()
            body += b"\x00" * pad
        return bytes(body)

    def chunk(cid: bytes, data: bytes) -> bytes:
        out = struct.pack("<4sI", cid, len(data)) + data
        if len(data) & 1:
            out += b"\x00"  # RIFF chunks are word-aligned
        return out

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_size * fps, 0, 0x10, n, 0, 1,
        frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_size,
        -1, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_avi_dib(payload: bytes) -> np.ndarray:
    """AVI with uncompressed DIB frames -> (n, h, w, 3) uint8 RGB:
    walks the RIFF chunk tree (hdrl for dimensions, movi for '00db'
    frames), undoing bottom-up row order, BGR and row padding per
    frame. Raises on compressed streams — a codec, not a sniffer."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", payload, pos)
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)
            elif cid == b"avih":
                w, h = struct.unpack_from("<II", payload, body_start + 32)
            elif cid == b"strh":
                fcc, handler = struct.unpack_from(
                    "<4s4s", payload, body_start
                )
                if fcc == b"vids" and handler not in (
                    b"DIB ", b"\x00\x00\x00\x00"
                ):
                    raise ValueError(
                        f"unsupported AVI video codec {handler!r}"
                    )
            elif cid in (b"00db", b"00dc"):
                frames.append(payload[body_start: body_start + size])
            pos = body_start + size + (size & 1)

    walk(12, len(payload))
    if w is None or not frames:
        raise ValueError("AVI missing avih header or frames")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    out = np.empty((len(frames), h, w, 3), np.uint8)
    for fi, data in enumerate(frames):
        if len(data) != stride * h:
            raise ValueError("AVI frame has the wrong DIB size")
        for r in range(h):
            row = np.frombuffer(
                data, np.uint8, row_bytes, r * stride
            ).reshape(w, 3)
            out[fi, h - 1 - r] = row[:, ::-1]
    return out


def encode_avi_mjpeg(
    frames: np.ndarray,
    fps: int = 10,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """(n, h, w) uint8 grayscale or (n, h, w, 3) RGB -> Motion-JPEG
    AVI (r11 directive #3): the same RIFF layout as
    ``encode_avi_dib`` but the stream handler is 'MJPG' and every
    '00dc' chunk is an INDEPENDENT baseline JPEG
    (jpeg_codec.encode_jpeg) — the first *compressed* video path,
    composed from the r9 container walker + the r10 DCT codec.
    ``restart_interval`` passes through to each frame's encoder so
    DRI/RSTn streams ride the lane too; ``subsampling`` applies to
    color frames (4:2:0 is the real-camera MJPEG default)."""
    from .jpeg_codec import encode_jpeg

    if frames.ndim == 4:
        n, h, w, c = frames.shape
        assert c == 3
    else:
        n, h, w = frames.shape
    assert frames.dtype == np.uint8

    def chunk(cid: bytes, data: bytes) -> bytes:
        out = struct.pack("<4sI", cid, len(data)) + data
        if len(data) & 1:
            out += b"\x00"  # RIFF chunks are word-aligned
        return out

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    jpegs = [
        encode_jpeg(
            f, restart_interval=restart_interval,
            **({"subsampling": subsampling} if f.ndim == 3 else {}),
        )
        for f in frames
    ]
    max_size = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, max_size * fps, 0, 0x10, n, 0, 1,
        max_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, max_size,
        -1, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", max_size, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_avi_mjpeg(payload: bytes) -> np.ndarray:
    """Motion-JPEG AVI -> (n, h, w) uint8 grayscale or (n, h, w, 3)
    RGB: RIFF chunk walk (handler must be 'MJPG'), then one full
    JPEG decode per '00dc' frame — marker walk, DHT Huffman, dequant,
    IDCT, DRI/RSTn resync, YCbCr for color frames. Raises on
    non-MJPG streams and on frames whose decoded dims or colorspace
    disagree (a codec, not a sniffer)."""
    from .jpeg_codec import decode_jpeg

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    handler = None
    spans: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        nonlocal handler
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", payload, pos)
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)
            elif cid == b"strh":
                fcc, hnd = struct.unpack_from("<4s4s", payload, body_start)
                if fcc == b"vids":
                    handler = hnd
            elif cid in (b"00dc", b"00db"):
                spans.append((body_start, body_start + size))
            pos = body_start + size + (size & 1)

    walk(12, len(payload))
    if handler != b"MJPG":
        raise ValueError(f"not an MJPEG AVI (handler {handler!r})")
    if not spans:
        raise ValueError("MJPEG AVI has no frames")
    frames = [decode_jpeg(payload[a:b]) for a, b in spans]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("MJPEG frames disagree on shape/colorspace")
    return np.stack(frames)


def synth_mjpeg_avi_payloads(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id) -> (id, payload): a REAL compressed (Motion-JPEG) AVI per
    row with closed-form frames — n_frames = id%5+1, w = 8*(id%3+1),
    h = 8*(id%2+1); every 8x8 block of frame f is CONSTANT value
    (id + 11*f + 3*block_row + block_col) % 256, and frames carry a
    per-doc DRI of id%3 MCUs (0 = none), so the bit-exact
    constant-block contract of the JPEG codec makes the per-frame
    features SQL-computable while the payload rides full DCT entropy
    coding + restart markers."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    d = df.select(F.col(id_col).cast("long").alias("id"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["id"]:
                i = int(i)
                nf, bw, bh = i % 5 + 1, i % 3 + 1, i % 2 + 1
                f_idx = np.arange(nf)[:, None, None]
                by = np.arange(bh)[None, :, None]
                bx = np.arange(bw)[None, None, :]
                bv = (i + 11 * f_idx + 3 * by + bx) % 256
                frames = np.repeat(
                    np.repeat(bv.astype(np.uint8), 8, axis=1), 8, axis=2
                )
                ids.append(i)
                blobs.append(
                    encode_avi_mjpeg(frames, restart_interval=i % 3)
                )
            yield pd.DataFrame({"id": ids, "payload": blobs})

    return d.mapInPandas(kernel, schema=out_schema)


def synth_avi_payloads(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id) -> (id, payload): a REAL multi-frame AVI per row with
    closed-form geometry and pixels — n_frames = id%5+1, width =
    id%6+2, height = id%4+2, pixel byte k (C-order over frames then
    rows then RGB) = (id + k) % 256 — so per-frame features are
    computable in plain SQL without parsing bytes."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    d = df.select(F.col(id_col).cast("long").alias("id"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["id"]:
                i = int(i)
                nf, w, h = i % 5 + 1, i % 6 + 2, i % 4 + 2
                v = (i + np.arange(nf * h * w * 3, dtype=np.int64)) % 256
                frames = v.astype(np.uint8).reshape(nf, h, w, 3)
                ids.append(i)
                blobs.append(encode_avi_dib(frames))
            yield pd.DataFrame({"id": ids, "payload": blobs})

    return d.mapInPandas(kernel, schema=out_schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "id",
    every_n: int = 2,
    max_frames: int = 4,
    decoder: Callable[[bytes], np.ndarray] = decode_avi_dib,
) -> DataFrame:
    """REAL video frame sampling (no stub): decode the container,
    keep every ``every_n``-th frame up to ``max_frames``, emit one
    row per kept frame with exact integer features (sum + C-order
    weighted sum of the frame's RGB bytes — orientation/channel/
    padding bugs all flip the weighted sum). One input row fans out
    to <= max_frames rows INSIDE the Arrow batch, never on the
    driver."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("sum_intensity", T.LongType()),
            T.StructField("weighted_sum", T.LongType()),
        ]
    )
    d = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(payload_col).alias("payload"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hs, ws, sums, wsums = [], [], [], [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                arr = decoder(bytes(payload))
                kept = list(range(0, arr.shape[0], every_n))[:max_frames]
                for k in kept:
                    flat = arr[k].ravel().astype(np.int64)
                    ids.append(int(i))
                    idxs.append(k)
                    hs.append(arr.shape[1])
                    ws.append(arr.shape[2])
                    sums.append(int(flat.sum()))
                    wsums.append(
                        int((flat * (np.arange(flat.size) + 1)).sum())
                    )
            yield pd.DataFrame(
                {
                    "id": ids, "frame_idx": idxs, "height": hs,
                    "width": ws, "sum_intensity": sums,
                    "weighted_sum": wsums,
                }
            )

    return d.mapInPandas(kernel, schema=out_schema)


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], np.ndarray] = decode_bmp_rgb,
    batch_size_hint: int = 256,
) -> DataFrame:
    """payload -> per-item feature vector (mean channel intensities +
    shape), via an Arrow-batched mapInPandas kernel.

    Output schema: (id, height, width, channels, mean_intensity,
    feature float[16]). One narrow stage; at 100 TB parallelism is
    the input partitioning (media files arrive as many objects).
    ``decoder`` is any bytes->ndarray codec (BMP default; PNG/JPEG/
    PPM ship in this module) — the r1-era content-seeded stub default
    was retired in r11 along with the last ``_stub`` symbols."""
    dec = decoder
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("mean_intensity", T.DoubleType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )
    d = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, cs, means, feats = [], [], [], [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                arr = dec(bytes(payload) if payload is not None else b"")
                ids.append(i)
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                cs.append(arr.shape[2] if arr.ndim > 2 else 1)
                means.append(float(arr.mean()))
                flat = arr.astype(np.float32).ravel()
                # 16-bin intensity histogram as the toy feature
                hist, _ = np.histogram(flat, bins=16, range=(0, 256))
                feats.append((hist / max(flat.size, 1)).astype(np.float32))
            yield pd.DataFrame(
                {
                    "id": ids, "height": hs, "width": ws, "channels": cs,
                    "mean_intensity": means, "feature": feats,
                }
            )

    return d.mapInPandas(kernel, schema=out_schema)


def synth_bmp_payloads(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id) -> (id, payload): a REAL 24-bit BMP per row with
    closed-form dimensions and pixels — width = id%13+1, height =
    id%7+1, pixel byte k (C-order RGB) = (id + k) % 256 — so any
    feature of the decoded image is computable in plain SQL without
    parsing bytes (the multimodal_features oracle). Arrow-batched
    encode; at scale this models the ingest side of a media column
    (real deployments read the payload bytes from object storage)."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    d = df.select(F.col(id_col).cast("long").alias("id"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["id"]:
                i = int(i)
                w, h = i % 13 + 1, i % 7 + 1
                v = (i + np.arange(h * w * 3, dtype=np.int64)) % 256
                arr = v.astype(np.uint8).reshape(h, w, 3)
                ids.append(i)
                blobs.append(encode_bmp_rgb(arr))
            yield pd.DataFrame({"id": ids, "payload": blobs})

    return d.mapInPandas(kernel, schema=out_schema)


def decode_image_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "id",
    decoder: Callable[[bytes], np.ndarray] = decode_bmp_rgb,
) -> DataFrame:
    """payload -> EXACT integer image features via a real decoder:
    (id, height, width, channels, sum_intensity, weighted_sum) where
    weighted_sum multiplies each pixel byte by its 1-based C-order
    linear index — row-order, channel-order and padding bugs in the
    decoder all flip it, unlike permutation-invariant means. Integer
    outputs make the result value-hash-checkable against a SQL
    oracle (float features round differently across engines)."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("sum_intensity", T.LongType()),
            T.StructField("weighted_sum", T.LongType()),
        ]
    )
    d = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(payload_col).alias("payload"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, cs, sums, wsums = [], [], [], [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                arr = decoder(bytes(payload))
                flat = arr.ravel().astype(np.int64)
                ids.append(int(i))
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                cs.append(arr.shape[2] if arr.ndim > 2 else 1)
                sums.append(int(flat.sum()))
                wsums.append(
                    int((flat * (np.arange(flat.size) + 1)).sum())
                )
            yield pd.DataFrame(
                {
                    "id": ids, "height": hs, "width": ws, "channels": cs,
                    "sum_intensity": sums, "weighted_sum": wsums,
                }
            )

    return d.mapInPandas(kernel, schema=out_schema)


