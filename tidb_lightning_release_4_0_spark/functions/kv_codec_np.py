"""Vectorized (numpy) twin of the kv_codec encoders: the fast path
for the ``kv_crc64`` checksum mode.

Same bytes as the scalar functions in ``kv_codec`` (which remain the
property-test oracle), assembled per COLUMN instead of per row: each
column encodes into an (n_rows, width) byte-fragment matrix with
per-row lengths, fragments are scattered into one zero-padded row
matrix per KV pair, and ``hashing.crc64_matrix`` folds each pair in
O(max_len/8) vectorized steps. Per-row Python survives only in the
utf-8 encode of string cells and in the object fallback for JSON
(arbitrary nesting stays Python, batch-amortized), and only for
those columns. Everything else is vectorized: DECIMAL at every
precision (<= 18 ships the unscaled int64, wider ships an exact
sign+digits string the kernel digit-matrixes in one C pass — with a
hard validity check so a broken rendering contract raises instead
of corrupting), DATE ships days-since-epoch packing as its midnight
datetime, ENUM/SET/BIT pre-resolve to uint64 JVM-side (ordinal /
bitwise-OR bitmask aggregate / int — each with the strict raise
preserved), and TIME pre-parses to signed nanoseconds JVM-side
(durationFlag + comparable int64 keys/values, smallest-LE v2
cells).

Covers BOTH row formats: v1's [colID, flagged datum] pairs and v2's
sectioned layout (version/flag, u16 counts, ascending not-null /
null column ids, cell end-offsets, cell payloads — small AND big
variants). v2's per-row null re-sorting vectorizes because the
column id order is fixed: each column contributes conditional
fragments (id byte when not-null, null-id byte when null-with-
default, offset when not-null) whose per-row lengths the fragment
scatter already handles; the big layout rides the same fragments by
emitting little-endian u32 ids/offsets and taking a per-row prefix
(1-or-4 / 2-or-4 bytes — an LE u32 of a small value starts with its
LE u8/u16 bytes).
"""

from __future__ import annotations

import numpy as np

from . import kv_codec as KC
from .hashing import crc64_matrix

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_SIGN = np.uint64(0x8000000000000000)
_U1 = np.uint64(1)
_U7 = np.uint64(7)
_U8 = np.uint64(8)


def _be8(u: np.ndarray) -> np.ndarray:
    """(n,) uint64 -> (n, 8) big-endian bytes."""
    return u.astype(">u8").view(np.uint8).reshape(-1, 8)


def _uvarint_byte_count(z: np.ndarray) -> np.ndarray:
    """Vectorized LEB128 byte count of uint64 (0 -> 1): one 7-bit
    group per started 7 bits, counted directly by threshold
    comparisons (r12 opt — replaces the 6-pass binary-search bit
    length, whose masked copy-shift passes profiled at ~8% of the kv
    kernel; nine branch-free compares cost less than one of them)."""
    nb = np.ones(len(z), np.int64)
    for k in range(1, 10):  # z >= 2^(7k)  =>  needs more than k groups
        nb += z >= (_U1 << np.uint64(7 * k))
    return nb


def _uvarint_frag(z: np.ndarray, valid: np.ndarray):
    """(n,) uint64 -> LEB128 fragment (mat (n, w), lens)."""
    nb = _uvarint_byte_count(z)
    w = int(nb[valid].max()) if valid.any() else 1
    ks = np.arange(w, dtype=np.uint64)
    mat = (
        (z[:, None] >> (_U7 * ks[None, :])) & np.uint64(0x7F)
    ).astype(np.uint8)
    more = ks[None, :].astype(np.int64) < (nb[:, None] - 1)
    mat |= more.astype(np.uint8) << 7
    return mat, np.where(valid, nb, 0)


def _zigzag(v: np.ndarray) -> np.ndarray:
    u = v.view(np.uint64) if v.dtype == np.int64 else v.astype(np.int64).view(np.uint64)
    sign = np.where(v < 0, _M64, np.uint64(0))
    return ((u << _U1) & _M64) ^ sign


def _packed_datetime_us(us: np.ndarray) -> np.ndarray:
    """int64 epoch-microseconds -> MySQL packed datetime uint64
    (kv_codec.pack_datetime, vectorized via the civil-date algo)."""
    day_us = np.int64(86_400_000_000)
    days = np.floor_divide(us, day_us)
    rem = us - days * day_us
    # days-since-epoch -> (y, m, d), Gregorian, vectorized
    z = days + 719468
    era = np.floor_divide(z, 146097)
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + 3 - 12 * (mp // 10)
    y = y + (mp // 10)
    h = rem // 3_600_000_000
    rem -= h * 3_600_000_000
    mi = rem // 60_000_000
    rem -= mi * 60_000_000
    s = rem // 1_000_000
    micro = rem - s * 1_000_000
    ymd = ((y * 13 + m) << 5) | d
    hms = (h << 12) | (mi << 6) | s
    return ((((ymd << 17) | hms) << 24) | micro).astype(np.int64).view(
        np.uint64
    )


def _const_frag(n: int, data: bytes):
    mat = np.broadcast_to(
        np.frombuffer(data, np.uint8)[None, :], (n, len(data))
    )
    return mat, np.full(n, len(data), np.int64)


def _flat_strings(series, mask: np.ndarray, trunc: int | None = None):
    """Object series of str/bytes -> (flat uint8, offsets, lens);
    ``trunc`` applies TruncateIndexValue prefix-index truncation
    (characters for str, bytes for binary) before the utf-8 encode.

    Fast path (r11 opt, guide §1.2): a pure-string series converts
    through Arrow — the values buffer already IS the flat utf-8 bytes
    plus offsets, and prefix truncation maps to utf8_slice_codeunits
    (code-POINT slicing, exactly str[:trunc]) — replacing the per-row
    Python encode loop that profiled at ~20% of the kv kernel. Mixed
    str/bytes or exotic inputs fall back to the loop unchanged."""
    try:
        import pyarrow as pa

        arr = pa.Array.from_pandas(series)
        if (
            pa.types.is_string(arr.type)
            or pa.types.is_large_string(arr.type)
        ) and arr.offset == 0:
            if trunc is not None:
                import pyarrow.compute as pc

                arr = pc.utf8_slice_codeunits(arr, 0, trunc)
            arr = arr.cast(pa.large_binary())
            if arr.offset == 0:
                bufs = arr.buffers()
                offs_all = np.frombuffer(bufs[1], np.int64)[
                    : len(arr) + 1
                ]
                # consumers (_gather/_group8_frag) group-read up to 8
                # bytes past any offset — keep the same zero slack the
                # loop path appends
                flat = np.concatenate(
                    [
                        np.frombuffer(bufs[2], np.uint8)
                        if bufs[2] is not None
                        else np.zeros(0, np.uint8),
                        np.zeros(8, np.uint8),
                    ]
                )
                lens = np.diff(offs_all)
                offs = offs_all[:-1].copy()
                if mask.any():
                    lens = np.where(mask, 0, lens)
                # nulls Arrow carries that the mask does not cover
                # (shouldn't happen: mask IS the null flags) still
                # yield len 0 via equal offsets
                return flat, offs, lens.astype(np.int64)
    except Exception:
        pass
    vals = series.to_numpy(dtype=object)
    if trunc is None:
        bs = [
            b""
            if mask[i]
            else (
                v
                if isinstance(v, (bytes, bytearray))
                else str(v).encode("utf-8")
            )
            for i, v in enumerate(vals)
        ]
    else:
        bs = [
            b""
            if mask[i]
            else (
                bytes(v)[:trunc]
                if isinstance(v, (bytes, bytearray))
                else str(v)[:trunc].encode("utf-8")
            )
            for i, v in enumerate(vals)
        ]
    lens = np.fromiter((len(b) for b in bs), np.int64, len(bs))
    flat = np.frombuffer(b"".join(bs) + b"\x00" * 8, np.uint8)
    offs = np.zeros(len(bs), np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    return flat, offs, lens


def _gather(flat: np.ndarray, offs: np.ndarray, lens: np.ndarray):
    """Flat source bytes -> padded (n, max_len) fragment matrix."""
    w = int(lens.max()) if len(lens) and lens.max() > 0 else 0
    if w == 0:
        return np.zeros((len(lens), 0), np.uint8), lens
    cols = np.arange(w)
    m = cols[None, :] < lens[:, None]
    idx = np.where(m, offs[:, None] + cols[None, :], 0)
    return np.where(m, flat[idx], 0).astype(np.uint8), lens


def _concat_frags(parts):
    """Concatenate sub-fragments [(mat, lens), ...] row-wise into one
    fragment (variable-width pieces packed per row).

    r11 opt (guide §1.2 per-task work): indexes the ACTUAL bytes of
    each part through flat 1-D gathers/scatters with int32 index
    arithmetic. The previous formulation materialized three padded
    (n, part_width) int64/bool temporaries per part (mask, positions,
    row ids) — ~200 MB of allocation traffic per wide part at 600k
    rows — and profiled at 87% of the whole kv_crc64 kernel; this
    version allocates index arrays proportional to the real
    (unpadded) byte count only, fixed-width parts skip the source
    gather entirely, and the per-row write cursor is kept as ONE
    flat-output index (row base folded in). Byte-identical output
    (property-tested against the scalar encoder)."""
    n = len(parts[0][1])
    total = parts[0][1].copy()
    for _, plens in parts[1:]:
        total = total + plens
    w = int(total.max()) if n else 0
    W = max(w, 1)
    big = n * W >= 2**31
    idt = np.int64 if big else np.int32
    out = np.zeros(n * W, np.uint8)
    if n == 0:
        # keep the pre-r11 empty-input contract: the fixed-width fast
        # branch below calls lens.min()/lens.max(), which raise on a
        # zero-row batch (callers like kv_pairs_crc_np short-circuit
        # n == 0 today, but the helper must not depend on that)
        return out.reshape(0, W), total
    rows = np.arange(n, dtype=idt)
    # flat-output write cursor: row base + bytes emitted so far
    cursor = rows * idt(W)
    for mat, lens in parts:
        pw = mat.shape[1]
        if pw == 0:
            continue
        flat = mat.reshape(-1)
        if int(lens.min()) == pw and int(lens.max()) == pw:
            # fixed-width part: every source byte lands, in order —
            # no source gather, single fused destination index
            dst = np.repeat(cursor, pw)
            dst += np.tile(np.arange(pw, dtype=idt), n)
            out[dst] = flat
        else:
            lens_i = lens.astype(idt)
            ends = np.cumsum(lens_i, dtype=idt)
            tot = int(ends[-1]) if n else 0
            if tot == 0:
                cursor += lens_i
                continue
            starts = ends - lens_i  # exclusive prefix sums
            # within-part byte index, per actual byte
            intra = np.arange(tot, dtype=idt)
            intra -= np.repeat(starts, lens_i)
            # source gather: row*pw + intra, built in place
            src_idx = np.repeat(rows * idt(pw), lens_i)
            src_idx += intra
            dst = np.repeat(cursor, lens_i)
            dst += intra
            out[dst] = flat[src_idx]
        cursor += lens.astype(idt)
    return out.reshape(n, W), total


# Strict JSON grammar slices for the scalar fast path. Anything not
# matched falls to the json.loads path, so acceptance here must be a
# SUBSET of valid JSON: the int/number productions are RFC 8259
# exactly; the string production only escape-free, control-char-free
# bodies (escapes and \uXXXX go through the real parser).
_JSON_WS = " \t\n\r"  # the only insignificant whitespace JSON allows
_JSON_INT_RE = r"-?(?:0|[1-9][0-9]*)"
_JSON_NUM_RE = _JSON_INT_RE + r"(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?"
_JSON_STR_RE = r'"[^"\\\x00-\x1f]*"'


def _json_frag(series, mask: np.ndarray, with_flag: bool):
    """JSON column encode, two tiers:

    1. Vectorized scalar fast path (round 10 — caps the all-distinct
       worst case): literals / int64s (<= 18 digits) / float64s /
       escape-free strings classify with pandas regex fullmatch and
       pack with numpy astype + byte views — no json.loads, no
       per-row Python parse. These are the vt.json shape and the
       overwhelming share of real JSON columns' scalar cells.
    2. Batch-amortized memo path for everything else (nested arrays/
       objects, escaped strings, 19+-digit ints straddling the
       int64/uint64/float64 boundaries): each DISTINCT text in the
       Arrow batch parses + binary-encodes exactly once; the loop
       body is a dict hit for every repeat.

    Acceptance in tier 1 is a strict SUBSET of valid JSON, so
    malformed cells keep raising from the real parser and every
    accepted cell's bytes are property-pinned identical to the scalar
    ``json_datum_bytes`` oracle."""
    import pandas as pd

    vals = series.to_numpy(dtype=object)
    pre = b"\x0A" if with_flag else b""
    npre = len(pre)
    n = len(vals)
    done = np.asarray(mask, bool).copy()

    # fragment table built class-by-class: offs/lens may point ANYWHERE
    # in the flat buffer (the _gather scatter is offset-addressed), so
    # fixed-width classes append one matrix block, literals append one
    # shared copy every row points at, and only genuinely variable
    # bytes (strings, tier-2 values) pay a per-row Python step.
    blocks: list[bytes] = []
    base = 0
    offs = np.zeros(n, np.int64)
    lens = np.zeros(n, np.int64)

    def _append(block: bytes) -> int:
        nonlocal base
        blocks.append(block)
        start = base
        base += len(block)
        return start

    str_rows = np.fromiter(
        (not done[i] and isinstance(v, str) for i, v in enumerate(vals)),
        bool,
        n,
    )
    if str_rows.any():
        idx = np.nonzero(str_rows)[0]
        s = pd.Series(vals[idx]).str.strip(_JSON_WS)
        handled = np.zeros(len(idx), bool)
        for lit, code in (
            ("null", KC.JSON_LITERAL_NIL),
            ("true", KC.JSON_LITERAL_TRUE),
            ("false", KC.JSON_LITERAL_FALSE),
        ):
            m = (s == lit).to_numpy()
            if m.any():
                frag = pre + bytes([KC.JSON_TYPE_LITERAL, code])
                start = _append(frag)  # one copy, every row points at it
                offs[idx[m]] = start
                lens[idx[m]] = len(frag)
                handled |= m
        is_num = s.str.fullmatch(_JSON_NUM_RE).to_numpy(dtype=bool)
        num_idx = ~handled & is_num
        if num_idx.any():
            frac = s[num_idx].str.contains(
                "[.eE]", regex=True
            ).to_numpy(dtype=bool)
            # sign + <=18 digits always fits int64; the 19/20-digit
            # boundary cases (int64 edge, uint64, float64 overflow
            # normalization) keep the real parser's semantics in tier 2
            short = (s[num_idx].str.len() <= 18).to_numpy(dtype=bool)
            for sel, dt, tc in (
                (~frac & short, "<i8", KC.JSON_TYPE_INT64),
                (frac, "<f8", KC.JSON_TYPE_FLOAT64),
            ):
                m = num_idx.copy()
                m[num_idx] = sel
                if not m.any():
                    continue
                packed = (
                    s[m].astype(np.float64 if dt == "<f8" else np.int64)
                    .to_numpy().astype(dt).view(np.uint8).reshape(-1, 8)
                )
                k, w = len(packed), npre + 9
                mat = np.empty((k, w), np.uint8)
                mat[:, : npre + 1] = np.frombuffer(
                    pre + bytes([tc]), np.uint8
                )
                mat[:, npre + 1:] = packed
                start = _append(mat.tobytes())
                offs[idx[m]] = start + np.arange(k, dtype=np.int64) * w
                lens[idx[m]] = w
                handled |= m
        m_str = ~handled & s.str.fullmatch(_JSON_STR_RE).to_numpy(
            dtype=bool
        )
        if m_str.any():
            inner = s[m_str].str.slice(1, -1).str.encode("utf-8")
            tc = pre + bytes([KC.JSON_TYPE_STRING])
            frags = [
                tc + KC.encode_uvarint(len(b)) + b
                for b in inner.to_numpy()
            ]
            flens = np.fromiter(
                (len(b) for b in frags), np.int64, len(frags)
            )
            start = _append(b"".join(frags))
            fo = np.zeros(len(frags), np.int64)
            np.cumsum(flens[:-1], out=fo[1:])
            offs[idx[m_str]] = start + fo
            lens[idx[m_str]] = flens
            handled |= m_str
        done[idx[handled]] = True

    rest = np.nonzero(~done)[0]
    if len(rest):
        cache: dict = {}
        frags = []
        for i in rest:
            v = vals[i]
            if isinstance(v, str):
                b = cache.get(v)
                if b is None:
                    b = pre + KC.json_datum_bytes(v)
                    cache[v] = b
            else:
                b = pre + KC.json_datum_bytes(v)
            frags.append(b)
        flens = np.fromiter((len(b) for b in frags), np.int64, len(frags))
        start = _append(b"".join(frags))
        fo = np.zeros(len(frags), np.int64)
        np.cumsum(flens[:-1], out=fo[1:])
        offs[rest] = start + fo
        lens[rest] = flens

    flat = np.frombuffer(b"".join(blocks) + b"\x00" * 8, np.uint8)
    return _gather(flat, offs, lens)


def _object_frag(series, mask: np.ndarray, encode_fn):
    """Fallback: per-row Python encode of one column's datums."""
    vals = series.to_numpy(dtype=object)
    bs = [b"" if mask[i] else encode_fn(v) for i, v in enumerate(vals)]
    lens = np.fromiter((len(b) for b in bs), np.int64, len(bs))
    flat = np.frombuffer(b"".join(bs) + b"\x00" * 8, np.uint8)
    offs = np.zeros(len(bs), np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    return _gather(flat, offs, lens)


def decimal_ships_scaled(dt) -> bool:
    """True when the projection ships this DECIMAL column as its
    UNSCALED int64 (value * 10^scale, exact JVM-side for precision
    <= 18) so the kernel can pack the myDecimal binary with pure
    numpy. Wider decimals ship a sign + zero-padded digit string
    instead (decimal_ships_digits)."""
    return dt.precision <= 18


def decimal_ships_digits(dt) -> bool:
    """True when the projection ships this DECIMAL column as a
    fixed-width '<sign><p digits>' string (the unscaled value exceeds
    int64): sign char then the dot-free, left-zero-padded digits —
    still exact (decimal->string is exact JVM-side) and still
    vectorized (the kernel converts the fixed-width strings to a
    digit matrix in one C-level pass, no per-row Python)."""
    return dt.precision > 18


def _mydecimal_mat(series, valid, p, s):
    """Scaled-int64 series (value * 10^s) -> the myDecimal binary
    (kv_codec.encode_mydecimal) as an (n, W) byte matrix + lens.
    The layout is FIXED by (p, s), so W is constant: base-10^9 digit
    groups big-endian (partial leading / full integer / full fraction
    / partial trailing), first byte MSB-flipped, all bytes inverted
    for negatives. Group words stay < 2^(8w-1), so the MSB flip is
    an addition and byte-wise NOT of a w-byte word is (2^8w-1)-word."""
    scaled = series.to_numpy(np.int64, na_value=0)
    neg = scaled < 0
    a = np.abs(scaled).astype(np.uint64)
    ten_s = np.uint64(10**s)
    ipart = (a // ten_s) if s else a
    fpart = (a % ten_s) if s else np.zeros_like(a)
    intg = p - s
    segs = []  # ((n,) uint64 group words, byte width), layout order
    lead = intg % 9
    nig = intg // 9
    if lead:
        segs.append((ipart // np.uint64(10 ** (9 * nig)),
                     KC._DIG2BYTES[lead]))
    for k in range(nig - 1, -1, -1):
        segs.append(((ipart // np.uint64(10 ** (9 * k)))
                     % np.uint64(10**9), 4))
    nfg = s // 9
    tail = s % 9
    for g in range(nfg):
        segs.append(((fpart // np.uint64(10 ** (s - 9 * (g + 1))))
                     % np.uint64(10**9), 4))
    if tail:
        segs.append((fpart % np.uint64(10**tail), KC._DIG2BYTES[tail]))
    return _mydecimal_pack(segs, neg, valid)


def _mydecimal_pack(segs, neg, valid):
    """Shared packing tail: [(group words, byte width)] in layout
    order -> (n, W) big-endian bytes with the first byte's MSB flip
    and the negative whole-bytes invert."""
    mats = []
    for gi, (v, w) in enumerate(segs):
        v = v.astype(np.uint64, copy=True)
        if gi == 0:
            v += np.uint64(0x80 << (8 * (w - 1)))
        mask_w = np.uint64((1 << (8 * w)) - 1)
        v = np.where(neg, mask_w - v, v)
        mats.append(_be8(v)[:, 8 - w:])
    mat = np.concatenate(mats, axis=1) if len(mats) > 1 else mats[0]
    return mat, np.where(valid, mat.shape[1], 0)


def _mydecimal_mat_digits(series, valid, p, s):
    """Wide-decimal (precision > 18) variant: the projection ships a
    fixed-width '<sign><p digits>' string per value (dot-free,
    left-zero-padded, '+000…0' on NULL rows); one C-level conversion
    yields a digit matrix and each myDecimal group word is a small
    base-10 dot product over its <= 9 digit columns — no per-row
    Python at any precision."""
    n = len(valid)
    # width p + 2 so an over-wide rendering leaves a nonzero byte in
    # the sentinel column instead of being silently truncated
    buf = series.to_numpy(dtype=f"S{p + 2}")
    wide = np.frombuffer(
        buf.tobytes(), np.uint8
    ).reshape(n, p + 2)
    mat = wide[:, : p + 1]
    neg = mat[:, 0] == ord("-")
    digits = mat[:, 1:].astype(np.int64) - ord("0")
    # the '<sign><p digits>' contract is load-bearing: any byte
    # outside '0'..'9' in the digit region (e.g. a Spark build that
    # renders wide decimals in scientific notation: '1E-38'), a sign
    # char other than +/-, or a width != p+1 would otherwise encode
    # WRONG KV bytes with no error — raise loudly instead
    bad = valid & (
        ((digits < 0) | (digits > 9)).any(axis=1)
        | (~neg & (mat[:, 0] != ord("+")))
        | (wide[:, p + 1] != 0)
    )
    if bad.any():
        i = int(np.argmax(bad))
        got = bytes(buf[i]).rstrip(b"\x00")
        raise ValueError(
            "wide-decimal projection violated the '<sign><p digits>' "
            f"contract for DECIMAL({p},{s}): got {got!r} "
            "(scientific notation or wrong width?)"
        )
    digits = np.where(valid[:, None], digits, 0)
    intg = p - s

    def group(lo, hi):
        nd = hi - lo
        pw = np.array([10 ** (nd - 1 - j) for j in range(nd)], np.int64)
        return (digits[:, lo:hi] * pw[None, :]).sum(axis=1).astype(
            np.uint64
        )

    segs = []
    lead = intg % 9
    nig = intg // 9
    pos = 0
    if lead:
        segs.append((group(0, lead), KC._DIG2BYTES[lead]))
        pos = lead
    for _ in range(nig):
        segs.append((group(pos, pos + 9), 4))
        pos += 9
    nfg = s // 9
    tail = s % 9
    for _ in range(nfg):
        segs.append((group(pos, pos + 9), 4))
        pos += 9
    if tail:
        segs.append((group(pos, pos + tail), KC._DIG2BYTES[tail]))
    return _mydecimal_pack(segs, neg, valid)


def _nil_part(n: int, valid: np.ndarray):
    """A 1-byte NilFlag fragment emitted ONLY on null rows. Placed
    FIRST in a datum's part list: null rows then encode as the single
    0x00 byte while valid rows contribute nothing here and take their
    flag+payload parts (whose lens are 0 on null rows) — the r12
    replacement for the _with_nil overlay, which re-concatenated and
    copied every column's datum matrix just to stamp that byte."""
    return np.zeros((n, 1), np.uint8), np.where(valid, 0, 1)


def _flag_frag(n: int, data: bytes, valid: np.ndarray):
    """A constant flag/prefix fragment present on VALID rows only."""
    mat, lens = _const_frag(n, data)
    return mat, np.where(valid, lens, 0)


def _value_datum_frag(series, mask, dt_name, dt, u64=False, wrap=None,
                      dur=False):
    """One column's v1 row-VALUE datum (flag + payload) as a PART
    LIST ``[(mat, lens), ...]`` whose row-wise concatenation is the
    datum bytes for the non-null rows; every part's lens are 0 on
    null rows (the caller appends a NilFlag part / applies CanSkip).
    Returning parts instead of a pre-concatenated matrix lets the
    caller's single outer ``_concat_frags`` assemble each byte
    exactly ONCE (r12 opt, guide §1.2: the per-column inner concats
    re-copied every datum byte and profiled at ~45% of the kernel).
    ``u64`` marks BIGINT UNSIGNED columns (decimal-typed Spark-side,
    KindUint64 in the encoding); ``dur`` marks TIME columns
    pre-parsed JVM-side to signed nanoseconds (KindMysqlDuration:
    durationFlag + comparable int64); ``wrap`` is the MySQL-kind
    coercion (json — the one remaining object-path kind)."""
    n = len(mask)
    valid = ~mask
    if dur:
        ns = series.to_numpy(np.int64, na_value=0)
        comp = ns.view(np.uint64) ^ _SIGN
        return [
            _flag_frag(n, b"\x07", valid),
            (_be8(comp), np.where(valid, 8, 0)),
        ], valid
    if wrap is not None:
        if getattr(wrap, "kind", None) == "json":
            return [_json_frag(series, mask, with_flag=True)], valid
        enc = lambda v: KC._encode_datum_v1(wrap(v))  # noqa: E731
        return [_object_frag(series, mask, enc)], valid
    if u64:
        if series.dtype.kind in "iu":
            # the projection pre-resolved this column to an int64
            # within uint64 range (ENUM ordinal / BIT value):
            # uintFlag + plain uvarint, fully vectorized
            u = series.to_numpy(np.int64, na_value=0).astype(np.uint64)
            mat, lens = _uvarint_frag(u, valid)
            return [_flag_frag(n, b"\x09", valid), (mat, lens)], valid
        enc = lambda v: KC._encode_datum_v1(KC.Uint64Datum(v))  # noqa: E731
        return [_object_frag(series, mask, enc)], valid
    if dt_name in ("byte", "short", "integer", "long", "boolean"):
        v = series.to_numpy(np.int64, na_value=0)
        mat, lens = _uvarint_frag(_zigzag(v), valid)
        return [_flag_frag(n, b"\x08", valid), (mat, lens)], valid
    if dt_name in ("float", "double"):
        # no na_value: NULLs were coalesced to 0.0 SPARK-side, so any
        # NaN here is a genuine NaN double and must encode as one
        # (na_value would silently replace it - pandas counts NaN
        # as NA)
        f = series.to_numpy(np.float64)
        u = f.view(np.uint64)
        comp = np.where(f >= 0, u | _SIGN, ~u & _M64)
        return [
            _flag_frag(n, b"\x05", valid),
            (_be8(comp), np.where(valid, 8, 0)),
        ], valid
    if dt_name in ("string", "binary"):
        flat, offs, lens = _flat_strings(series, mask)
        head = _uvarint_frag(_zigzag(lens), valid)
        body = _gather(flat, offs, np.where(valid, lens, 0))
        return [_flag_frag(n, b"\x02", valid), head, body], valid
    if dt_name in ("timestamp", "timestamp_ntz"):
        # the projection shipped unix-micros as BIGINT
        us = np.where(valid, series.to_numpy(np.int64, na_value=0), 0)
        mat, lens = _uvarint_frag(_packed_datetime_us(us), valid)
        return [_flag_frag(n, b"\x09", valid), (mat, lens)], valid
    if dt_name == "date":
        # the projection shipped days-since-epoch; a DATE packs as
        # its midnight datetime
        d = np.where(valid, series.to_numpy(np.int64, na_value=0), 0)
        mat, lens = _uvarint_frag(
            _packed_datetime_us(d * np.int64(86_400_000_000)), valid
        )
        return [_flag_frag(n, b"\x09", valid), (mat, lens)], valid
    if dt_name == "decimal":
        # [decimalFlag, precision u8, frac u8, myDecimal binary];
        # p <= 18 ships the unscaled int64, wider ships digit strings
        p, s = dt.precision, dt.scale
        pack = (
            _mydecimal_mat if decimal_ships_scaled(dt)
            else _mydecimal_mat_digits
        )
        mat, lens = pack(series, valid, p, s)
        return [
            _flag_frag(n, bytes([0x06, p, s]), valid),
            (mat, lens),
        ], valid
    # object fallback (DATE, anything else): scalar oracle
    return [_object_frag(series, mask, KC._encode_datum_v1)], valid


def _key_datum_frag(series, mask, dt_name, dt, trunc=None, u64=False,
                    wrap=None, dur=False):
    """One column's memory-comparable KEY datum (EncodeKey) as a PART
    LIST ``[(mat, lens), ...]`` (same r12 once-only-assembly contract
    as _value_datum_frag). NULLs encode as NilFlag — the first part
    is a NilFlag byte emitted only on null rows, and every other
    part's lens are 0 there, so the concatenation yields the single
    0x00 byte without the old _with_nil re-concat + overlay copy.
    ``trunc`` is the prefix-index truncation for string/binary
    columns, ``u64`` the BIGINT UNSIGNED marker, ``dur`` the TIME-as-
    nanoseconds marker (codec.go writes durationFlag + EncodeInt in
    key position too), ``wrap`` the MySQL-kind coercion (prefix
    truncation doesn't apply to wrapped kinds — prefix indexes exist
    only on string/binary columns)."""
    n = len(mask)
    valid = ~mask
    nil = _nil_part(n, valid)
    if dur:
        ns = series.to_numpy(np.int64, na_value=0)
        comp = ns.view(np.uint64) ^ _SIGN
        return [
            nil,
            _flag_frag(n, b"\x07", valid),
            (_be8(comp), np.where(valid, 8, 0)),
        ]
    if wrap is not None:
        if getattr(wrap, "kind", None) == "json":
            # encode_key_datum writes the same jsonFlag layout
            mat, lens = _json_frag(series, mask, with_flag=True)
        else:
            enc = lambda v: KC.encode_key_datum(wrap(v))  # noqa: E731
            mat, lens = _object_frag(series, mask, enc)
        return [nil, (mat, np.where(valid, lens, 0))]
    if u64:
        if series.dtype.kind in "iu":
            u = series.to_numpy(np.int64, na_value=0).astype(np.uint64)
            return [
                nil,
                _flag_frag(n, b"\x04", valid),
                (_be8(u), np.where(valid, 8, 0)),
            ]
        enc = lambda v: KC.encode_key_datum(KC.Uint64Datum(v))  # noqa: E731
        mat, lens = _object_frag(series, mask, enc)
        return [nil, (mat, np.where(valid, lens, 0))]
    if dt_name in ("byte", "short", "integer", "long", "boolean"):
        v = series.to_numpy(np.int64, na_value=0)
        comp = v.view(np.uint64) ^ _SIGN
        return [
            nil,
            _flag_frag(n, b"\x03", valid),
            (_be8(comp), np.where(valid, 8, 0)),
        ]
    if dt_name in ("float", "double"):
        # no na_value: NULLs were coalesced to 0.0 SPARK-side, so any
        # NaN here is a genuine NaN double and must encode as one
        # (na_value would silently replace it - pandas counts NaN
        # as NA)
        f = series.to_numpy(np.float64)
        u = f.view(np.uint64)
        comp = np.where(f >= 0, u | _SIGN, ~u & _M64)
        return [
            nil,
            _flag_frag(n, b"\x05", valid),
            (_be8(comp), np.where(valid, 8, 0)),
        ]
    if dt_name in ("timestamp", "timestamp_ntz"):
        us = series.to_numpy(np.int64, na_value=0)
        packed = _packed_datetime_us(np.where(valid, us, 0))
        return [
            nil,
            _flag_frag(n, b"\x04", valid),
            (_be8(packed), np.where(valid, 8, 0)),
        ]
    if dt_name == "date":
        d = series.to_numpy(np.int64, na_value=0)
        packed = _packed_datetime_us(
            np.where(valid, d, 0) * np.int64(86_400_000_000)
        )
        return [
            nil,
            _flag_frag(n, b"\x04", valid),
            (_be8(packed), np.where(valid, 8, 0)),
        ]
    if dt_name in ("string", "binary"):
        flat, offs, lens = _flat_strings(series, mask, trunc)
        mat, glens = _group8_frag(flat, offs, np.where(valid, lens, 0), valid)
        return [nil, _flag_frag(n, b"\x01", valid), (mat, glens)]
    if dt_name == "decimal":
        # EncodeDecimal is memory-comparable: same bytes as the value
        p, s = dt.precision, dt.scale
        pack = (
            _mydecimal_mat if decimal_ships_scaled(dt)
            else _mydecimal_mat_digits
        )
        dmat, dlens = pack(series, valid, p, s)
        return [
            nil,
            _flag_frag(n, bytes([0x06, p, s]), valid),
            (dmat, dlens),
        ]
    mat, lens = _object_frag(series, mask, KC.encode_key_datum)
    return [nil, (mat, np.where(valid, lens, 0))]


def _group8_frag(flat, offs, lens, valid):
    """codec.EncodeBytes group-of-8 layout, vectorized: output length
    is (len//8 + 1) * 9; position p holds source byte 8*(p//9)+(p%9)
    (zero-padded) or the group marker 0xFF - pad at p%9 == 8."""
    n = len(lens)
    out_lens = np.where(valid, (lens // 8 + 1) * 9, 0)
    w = int(out_lens.max()) if n and out_lens.max() > 0 else 0
    if w == 0:
        return np.zeros((n, 0), np.uint8), out_lens
    p = np.arange(w)
    g = p // 9
    r = p % 9
    src_idx = 8 * g[None, :] + r[None, :]
    in_src = (r[None, :] < 8) & (src_idx < lens[:, None])
    idx = np.where(in_src, offs[:, None] + src_idx, 0)
    mat = np.where(in_src, flat[idx], 0).astype(np.uint8)
    remain = lens[:, None] - 8 * g[None, :]
    pad = np.clip(8 - remain, 0, 8)
    is_marker = r[None, :] == 8
    mat = np.where(is_marker, (0xFF - pad).astype(np.uint8), mat)
    inside = p[None, :] < out_lens[:, None]
    mat = np.where(inside, mat, 0)
    return mat, out_lens


def _v2_int_lens(v: np.ndarray, valid: np.ndarray) -> np.ndarray:
    lens = np.full(len(v), 8, np.int64)
    lens[(v >= -(1 << 31)) & (v < (1 << 31))] = 4
    lens[(v >= -(1 << 15)) & (v < (1 << 15))] = 2
    lens[(v >= -(1 << 7)) & (v < (1 << 7))] = 1
    return np.where(valid, lens, 0)


def _v2_uint_lens(u: np.ndarray, valid: np.ndarray) -> np.ndarray:
    lens = np.full(len(u), 8, np.int64)
    lens[u < (1 << 32)] = 4
    lens[u < (1 << 16)] = 2
    lens[u < (1 << 8)] = 1
    return np.where(valid, lens, 0)


def _cell_v2_frag(series, mask, dt_name, dt, u64=False, wrap=None,
                  dur=False):
    """One column's row-format-v2 CELL payload (kv_codec
    _encode_cell_v2): smallest little-endian ints, comparable floats,
    raw bytes — lens 0 on null rows (nulls live in the id sections,
    not the payload). ``dur`` = TIME-as-nanoseconds: the smallest-LE
    signed int like any integer cell."""
    n = len(mask)
    valid = ~mask
    if dur:
        ns = series.to_numpy(np.int64, na_value=0)
        mat = ns.astype("<i8").view(np.uint8).reshape(n, 8)
        return (mat, _v2_int_lens(np.where(valid, ns, 0), valid)), valid
    if wrap is not None:
        if getattr(wrap, "kind", None) == "json":
            return _json_frag(series, mask, with_flag=False), valid
        enc = lambda v: KC._encode_cell_v2(wrap(v))  # noqa: E731
        return _object_frag(series, mask, enc), valid
    if u64:
        if series.dtype.kind in "iu":
            u = series.to_numpy(np.int64, na_value=0).astype(np.uint64)
            u = np.where(valid, u, np.uint64(0))
            mat = u.astype("<u8").view(np.uint8).reshape(n, 8)
            return (mat, _v2_uint_lens(u, valid)), valid
        enc = lambda v: KC._encode_cell_v2(KC.Uint64Datum(v))  # noqa: E731
        return _object_frag(series, mask, enc), valid
    if dt_name in ("byte", "short", "integer", "long", "boolean"):
        v = series.to_numpy(np.int64, na_value=0)
        mat = v.astype("<i8").view(np.uint8).reshape(n, 8)
        return (mat, _v2_int_lens(np.where(valid, v, 0), valid)), valid
    if dt_name in ("float", "double"):
        # no na_value: NULLs were coalesced to 0.0 SPARK-side, so any
        # NaN here is a genuine NaN double and must encode as one
        # (na_value would silently replace it - pandas counts NaN
        # as NA)
        f = series.to_numpy(np.float64)
        u = f.view(np.uint64)
        comp = np.where(f >= 0, u | _SIGN, ~u & _M64)
        return (_be8(comp), np.where(valid, 8, 0)), valid
    if dt_name in ("string", "binary"):
        flat, offs, lens = _flat_strings(series, mask)
        return _gather(flat, offs, np.where(valid, lens, 0)), valid
    if dt_name in ("timestamp", "timestamp_ntz"):
        us = np.where(valid, series.to_numpy(np.int64, na_value=0), 0)
        packed = _packed_datetime_us(us)
        mat = packed.astype("<u8").view(np.uint8).reshape(n, 8)
        return (mat, _v2_uint_lens(packed, valid)), valid
    if dt_name == "date":
        d = np.where(valid, series.to_numpy(np.int64, na_value=0), 0)
        packed = _packed_datetime_us(d * np.int64(86_400_000_000))
        mat = packed.astype("<u8").view(np.uint8).reshape(n, 8)
        return (mat, _v2_uint_lens(packed, valid)), valid
    if dt_name == "decimal":
        # v2 keeps EncodeDecimal's payload minus the flag byte;
        # lens must be 0 on null rows (nulls live in the id sections)
        p, s = dt.precision, dt.scale
        pack = (
            _mydecimal_mat if decimal_ships_scaled(dt)
            else _mydecimal_mat_digits
        )
        dmat, dlens = pack(series, valid, p, s)
        cmat, clens = _concat_frags(
            [_const_frag(n, bytes([p, s])), (dmat, dlens)]
        )
        return (cmat, np.where(valid, clens, 0)), valid
    return _object_frag(series, mask, KC._encode_cell_v2), valid


def _v2_value_frags(pdf, cols, dtypes, col_ids, default_null_ids, masks,
                    u64_flags=None, wraps=None, dur_flags=None):
    """The row-format-v2 VALUE as a fragment list (kv_codec
    encode_row_v2 semantics incl. CanSkip): columns walk in
    ascending-id order so the conditional per-column fragments land
    exactly where the sorted id/offset sections expect them."""
    n = len(pdf)
    order = sorted(range(len(cols)), key=lambda i: col_ids[i])
    cells, valids, keeps = [], [], []
    for i in order:
        c = cols[i]
        dt = dtypes[i]
        (mat, lens), valid = _cell_v2_frag(
            pdf[f"__v_{i}"], masks[c], dt.typeName(), dt,
            bool(u64_flags and u64_flags[i]),
            wraps[i] if wraps else None,
            bool(dur_flags and dur_flags[i]),
        )
        skip = default_null_ids is None or col_ids[i] in default_null_ids
        keep_null = (~valid) & (not skip)
        cells.append((mat, lens))
        valids.append(valid)
        keeps.append(keep_null)
    nn = np.sum(valids, axis=0).astype(np.int64)
    nu = np.sum(keeps, axis=0).astype(np.int64)
    total = np.sum([lens for _, lens in cells], axis=0).astype(np.int64)
    # per-row layout choice: big when any included id > 255 or the
    # payload exceeds the u16 offset range (encode_row_v2 parity)
    maxcid = np.zeros(n, np.int64)
    for j, i in enumerate(order):
        inc = valids[j] | keeps[j]
        maxcid = np.maximum(maxcid, np.where(inc, col_ids[i], 0))
    big = (total > 0xFFFF) | (maxcid > 0xFF)
    idw = np.where(big, 4, 1)
    offw = np.where(big, 4, 2)

    frags = []
    head = np.zeros((n, 2), np.uint8)
    head[:, 0] = 0x80
    head[:, 1] = big.astype(np.uint8)
    frags.append((head, np.full(n, 2, np.int64)))
    frags.append(
        (nn.astype("<u2").view(np.uint8).reshape(n, 2),
         np.full(n, 2, np.int64))
    )
    frags.append(
        (nu.astype("<u2").view(np.uint8).reshape(n, 2),
         np.full(n, 2, np.int64))
    )
    for j, i in enumerate(order):
        cid_mat = np.full(n, col_ids[i], np.int64).astype(
            "<u4"
        ).view(np.uint8).reshape(n, 4)
        frags.append((cid_mat, np.where(valids[j], idw, 0)))
    for j, i in enumerate(order):
        cid_mat = np.full(n, col_ids[i], np.int64).astype(
            "<u4"
        ).view(np.uint8).reshape(n, 4)
        frags.append((cid_mat, np.where(keeps[j], idw, 0)))
    run = np.zeros(n, np.int64)
    for j in range(len(order)):
        run = run + cells[j][1]
        off_mat = run.astype("<u4").view(np.uint8).reshape(n, 4)
        frags.append((off_mat, np.where(valids[j], offw, 0)))
    frags.extend(cells)
    return frags


def kv_pairs_crc_np(
    pdf,
    cols: list[str],
    dtypes: list,
    handle_name: str,
    col_ids: list[int],
    table_id: int,
    default_null_ids,
    idx_specs,
    row_format_version: int = 1,
    u64_flags=None,
    wraps=None,
    dur_flags=None,
):
    """The batch kernel: pandas DataFrame (handle + per-column value
    and _isnull_ fields) -> (h int64 xor-of-pair-crcs, n total bytes)
    per row, byte-identical with kv_codec.encode_table_kvs."""
    n = len(pdf)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    handles = pdf[handle_name].to_numpy(np.int64)
    masks = {
        c: pdf[f"__null_{i}"].to_numpy(bool) for i, c in enumerate(cols)
    }

    # ---- data-row KV ----
    key_prefix = b"t" + KC.encode_int_comparable(table_id) + b"_r"
    hcomp = handles.view(np.uint64) ^ _SIGN
    # key prefix + comparable handle ride the one outer concat as two
    # parts (r12: every byte is scattered exactly once — the kernel's
    # only full-row materialization is the final _concat_frags per KV)
    frags = [
        _const_frag(n, key_prefix),
        (_be8(hcomp), np.full(n, 8, np.int64)),
    ]
    if row_format_version == 2:
        frags.extend(
            _v2_value_frags(
                pdf, cols, dtypes, col_ids, default_null_ids, masks,
                u64_flags, wraps, dur_flags,
            )
        )
    else:
        # per column: the (varint colid) prefix and the datum's part
        # list ALL ride the one outer concat (r11 removed the
        # per-column value concat; r12 pushes the same once-only rule
        # into the datum builders themselves — flag, varint and
        # payload arrive as separate parts and no byte is copied
        # before the single outer scatter). Null handling lives on
        # the parts: a skipped NULL zeroes the prefix and every datum
        # part's lens (the builders already zero theirs); a kept NULL
        # emits prefix + one 0x00 (NilFlag) byte via a dedicated nil
        # part — the same bytes the overlay produced.
        vlen = np.zeros(n, np.int64)
        for i, c in enumerate(cols):
            cid = col_ids[i]
            dt = dtypes[i]
            dt_name = dt.typeName()
            prefix = bytes([KC.VARINT_FLAG]) + KC.encode_varint(cid)
            dparts, valid = _value_datum_frag(
                pdf[f"__v_{i}"], masks[c], dt_name, dt,
                bool(u64_flags and u64_flags[i]),
                wraps[i] if wraps else None,
                bool(dur_flags and dur_flags[i]),
            )
            skip = default_null_ids is None or cid in default_null_ids
            nulls = ~valid
            pmat, plens = _const_frag(n, prefix)
            if skip:
                if nulls.any():
                    plens = np.where(nulls, 0, plens)
            else:
                dparts = [_nil_part(n, valid)] + dparts
            frags.append((pmat, plens))
            frags.extend(dparts)
            vlen += plens
            for _, dlens in dparts:
                vlen += dlens
        # empty value -> single NilFlag (EncodeOldRow's empty sentinel)
        frags.append(
            (np.zeros((n, 1), np.uint8), (vlen == 0).astype(np.int64))
        )
    buf, lens = _concat_frags(frags)
    crc = crc64_matrix(buf, lens)
    nbytes = lens.copy()

    # ---- index KVs ----
    pos_of = {c: i for i, c in enumerate(cols)}
    for iid, icols, unique in idx_specs or ():
        iprefix = (
            b"t" + KC.encode_int_comparable(table_id) + b"_i"
            + KC.encode_int_comparable(iid)
        )
        parts = [_const_frag(n, iprefix)]
        distinct = np.full(n, bool(unique))
        for ent in icols:
            c, plen = ent if isinstance(ent, tuple) else (ent, None)
            if c == handle_name:
                comp = handles.view(np.uint64) ^ _SIGN
                parts.append(_const_frag(n, b"\x03"))
                parts.append((_be8(comp), np.full(n, 8, np.int64)))
                continue
            i = pos_of[c]
            dt = dtypes[i]
            parts.extend(
                _key_datum_frag(
                    pdf[f"__v_{i}"], masks[c], dt.typeName(), dt, plen,
                    bool(u64_flags and u64_flags[i]),
                    wraps[i] if wraps else None,
                    bool(dur_flags and dur_flags[i]),
                )
            )
            distinct &= ~masks[c]
        # non-distinct entries append the int handle to the key:
        # intFlag + comparable BE8, built directly (fixed 9 bytes)
        hmat = np.empty((n, 9), np.uint8)
        hmat[:, 0] = 0x03
        hmat[:, 1:] = _be8(handles.view(np.uint64) ^ _SIGN)
        parts.append((hmat, np.where(distinct, 0, 9)))
        # value: BE8 handle when distinct, '0' otherwise
        vmat = np.full((n, 8), 0, np.uint8)
        vmat[:, :] = handles.astype(">i8").view(np.uint8).reshape(n, 8)
        vmat[~distinct, 0] = 0x30
        parts.append((vmat, np.where(distinct, 8, 1)))
        ibuf, ilens = _concat_frags(parts)
        crc ^= crc64_matrix(ibuf, ilens)
        nbytes += ilens
    return crc.view(np.int64), nbytes
