"""Time-series compression codecs: delta-of-delta timestamps and Gorilla
XOR values (Facebook Gorilla, VLDB'15 — public algorithm), implemented as
pure-NumPy vectorized bit-packing so they run inside Arrow-batched UDFs
without per-point Python on the encode path.

Stream convention: bits are emitted least-significant-bit-first into a
little-endian uint64 word stream; each per-point code is one integer field
whose first-transmitted bit is its LSB.

Timestamp codec (delta-of-delta), per point i >= 2:
    dod == 0                 -> '0'                                (1 bit)
    dod in [-63, 64]         -> '10' + 7  bits (dod + 63)          (9 bits)
    dod in [-255, 256]       -> '110' + 9  bits (dod + 255)        (12 bits)
    dod in [-2047, 2048]     -> '1110' + 12 bits (dod + 2047)      (16 bits)
    else                     -> '1111' + 64 bits raw               (68 bits)
Header: n (uint64), ts[0] (int64), then delta_1 as a 64-bit raw field.

Value codec (XOR), per point i >= 1 with x = bits(v_i) ^ bits(v_{i-1}):
    x == 0 -> '0'
    else   -> '1' + 5 bits leading-zero count (capped 31)
                  + 6 bits (meaningful-bit count - 1)
                  + meaningful bits
Header: n (uint64), v[0] raw (64 bits).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_dod",
    "decode_dod",
    "encode_gorilla",
    "decode_gorilla",
    "encode_tokens",
    "decode_tokens",
]


def _pack_bits(fields: np.ndarray, widths: np.ndarray) -> bytes:
    """Pack (field, width) pairs LSB-first into a little-endian byte string."""
    fields = fields.astype(np.uint64, copy=False)
    widths = widths.astype(np.int64, copy=False)
    ends = np.cumsum(widths)
    total = int(ends[-1]) if len(ends) else 0
    starts = ends - widths
    nwords = (total + 63) // 64 + 1
    buf = np.zeros(nwords, dtype=np.uint64)
    widx = (starts >> 6).astype(np.int64)
    shift = (starts & 63).astype(np.uint64)
    # mask fields to their width to keep stray high bits out of the stream
    full = widths >= 64
    mask = np.where(full, np.uint64(0xFFFFFFFFFFFFFFFF),
                    (np.uint64(1) << widths.astype(np.uint64)) - np.uint64(1))
    fields = fields & mask
    np.bitwise_or.at(buf, widx, fields << shift)
    spill = (shift.astype(np.int64) + widths) > 64
    if spill.any():
        np.bitwise_or.at(
            buf,
            widx[spill] + 1,
            fields[spill] >> (np.uint64(64) - shift[spill]),
        )
    nbytes = (total + 7) // 8
    return buf.tobytes()[:nbytes]


class _BitReader:
    __slots__ = ("words", "pos")

    def __init__(self, data: bytes):
        pad = (-len(data)) % 8
        self.words = np.frombuffer(data + b"\x00" * pad, dtype="<u8")
        self.pos = 0

    def read(self, nbits: int) -> int:
        p = self.pos
        self.pos = p + nbits
        w, s = p >> 6, p & 63
        v = int(self.words[w]) >> s
        got = 64 - s
        if got < nbits:
            v |= int(self.words[w + 1]) << got
        return v & ((1 << nbits) - 1) if nbits < 64 else v & 0xFFFFFFFFFFFFFFFF


def encode_dod(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 timestamps (any epoch unit)."""
    ts = np.asarray(ts)
    if ts.dtype.kind == "M":
        ts = ts.view(np.int64)
    ts = ts.astype(np.int64, copy=False)
    n = len(ts)
    head = np.empty(2, dtype=np.int64)
    head[0] = n
    head[1] = ts[0] if n else 0
    if n <= 1:
        return head.tobytes()
    deltas = np.diff(ts)
    dod = np.diff(deltas)  # length n-2
    du = dod.astype(np.uint64)
    # classify; every point gets TWO field slots (second is 0-width except
    # for the 69-bit escape) so packing stays fully vectorized
    c0 = dod == 0
    c1 = ~c0 & (dod >= -63) & (dod <= 64)
    c2 = ~c0 & ~c1 & (dod >= -255) & (dod <= 256)
    c3 = ~c0 & ~c1 & ~c2 & (dod >= -2047) & (dod <= 2048)
    c4 = ~(c0 | c1 | c2 | c3) & (dod >= -(1 << 31)) & (dod <= (1 << 31) - 1)
    w1 = np.select([c0, c1, c2, c3, c4], [1, 9, 12, 16, 37], default=64)
    w2 = np.where(w1 == 64, 5, 0)  # escape: '11111' + 59 low bits, + 5 high
    f1 = np.select(
        [c0, c1, c2, c3, c4],
        [
            np.uint64(0),
            np.uint64(0b01) | ((dod + 63).astype(np.uint64) << np.uint64(2)),
            np.uint64(0b011) | ((dod + 255).astype(np.uint64) << np.uint64(3)),
            np.uint64(0b0111) | ((dod + 2047).astype(np.uint64) << np.uint64(4)),
            np.uint64(0b01111) | ((du & np.uint64(0xFFFFFFFF)) << np.uint64(5)),
        ],
        default=np.uint64(0b11111) | (du << np.uint64(5)),
    )
    f2 = np.where(w2 == 5, du >> np.uint64(59), np.uint64(0))
    m = len(dod)
    fields = np.empty(2 * m + 1, dtype=np.uint64)
    widths = np.empty(2 * m + 1, dtype=np.int64)
    fields[0] = np.uint64(deltas[0])
    widths[0] = 64
    fields[1::2] = f1
    widths[1::2] = w1
    fields[2::2] = f2
    widths[2::2] = w2
    body = _pack_bits(fields, widths)
    return head.tobytes() + body


def decode_dod(data: bytes) -> np.ndarray:
    head = np.frombuffer(data[:16], dtype=np.int64)
    n = int(head[0])
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = head[1]
    if n == 1:
        return out
    r = _BitReader(data[16:])
    delta = r.read(64)
    if delta >= 1 << 63:
        delta -= 1 << 64
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        elif r.read(1) == 0:
            dod = r.read(32)
            if dod >= 1 << 31:
                dod -= 1 << 32
        else:
            dod = r.read(64)
            if dod >= 1 << 63:
                dod -= 1 << 64
        delta = delta + dod
        out[i] = out[i - 1] + delta
    return out


def encode_gorilla(values: np.ndarray) -> bytes:
    """XOR-encode float64 values (float32/int inputs are cast to float64)."""
    v = np.asarray(values).astype(np.float64, copy=False)
    n = len(v)
    head = np.empty(2, dtype=np.uint64)
    head[0] = n
    bits = v.view(np.uint64)
    head[1] = bits[0] if n else 0
    if n <= 1:
        return head.tobytes()
    x = bits[1:] ^ bits[:-1]
    zero = x == 0
    # leading zeros via float trickery-free route: use np.log2 would be
    # inexact; count with bit smearing
    lz = _clz64(x)
    tz = _ctz64(x)
    lz = np.minimum(lz, 31)
    mb = 64 - lz - tz
    mb = np.where(zero, 0, np.maximum(mb, 1))
    payload = np.where(zero, np.uint64(0), x >> tz.astype(np.uint64))
    ctrl_w = np.where(zero, 1, 12)  # '0'  vs '1' + 5 lz + 6 (mb-1)
    ctrl_f = np.where(
        zero,
        np.uint64(0),
        np.uint64(1)
        | (lz.astype(np.uint64) << np.uint64(1))
        | ((mb - 1).astype(np.uint64) << np.uint64(6)),
    )
    # interleave ctrl and payload fields
    m = len(x)
    fields = np.empty(2 * m, dtype=np.uint64)
    widths = np.empty(2 * m, dtype=np.int64)
    fields[0::2] = ctrl_f
    widths[0::2] = ctrl_w
    fields[1::2] = payload
    widths[1::2] = np.where(zero, 0, mb)
    body = _pack_bits(fields, widths)
    return head.tobytes() + body


def _clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 (vectorized)."""
    r = np.full(len(x), 64, dtype=np.int64)
    nz = x != 0
    # binary search on bit blocks
    v = x.copy()
    cnt = np.zeros(len(x), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        high = v >> np.uint64(shift)
        use_low = high == 0
        cnt = np.where(nz & use_low, cnt + shift, cnt)
        v = np.where(use_low, v, high)
    r[nz] = cnt[nz]
    return r


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Count trailing zeros of uint64 (vectorized); 64 for zero."""
    iso = x & (~x + np.uint64(1))  # lowest set bit
    return np.where(x == 0, 64, 63 - _clz64(iso))


def decode_gorilla(data: bytes) -> np.ndarray:
    head = np.frombuffer(data[:16], dtype=np.uint64)
    n = int(head[0])
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    out[0] = head[1]
    r = _BitReader(data[16:])
    prev = int(head[1])
    for i in range(1, n):
        if r.read(1):
            meta = r.read(11)
            lz = meta & 31
            mb = (meta >> 5) + 1
            payload = r.read(mb)
            tz = 64 - lz - mb
            # tz was derived from true trailing zeros unless lz got capped;
            # recover by storing payload at its true position
            prev ^= payload << tz
        out[i] = prev
    return out.view(np.float64)


# --------------------------------------------------- token-sequence codec


def encode_tokens(tokens: np.ndarray) -> bytes:
    """Fixed-width bit-pack an int32 token-id sequence.

    Token ids are small non-negative ints (vocab ~50k -> 16-17 bits), so a
    per-sequence fixed width of ``ceil(log2(max+1))`` bits beats both raw
    int32 (~2x) and general-purpose delta codecs (token streams are not
    monotone).  Header: n (uint32 LE), width (uint8); payload: each value's
    ``width`` bits, LSB-first, bit-matrix-packed — fully vectorized, no
    per-token Python.
    """
    t = np.ascontiguousarray(tokens, dtype=np.int64)
    if t.size and t.min() < 0:
        raise ValueError("token ids must be non-negative")
    n = t.size
    width = max(1, int(t.max()).bit_length()) if n else 1
    head = np.uint32(n).tobytes() + np.uint8(width).tobytes()
    if not n:
        return head
    shifts = np.arange(width, dtype=np.int64)
    bits = ((t[:, None] >> shifts) & 1).astype(np.uint8)  # (n, width) LSB-first
    return head + np.packbits(bits.ravel(), bitorder="little").tobytes()


def decode_tokens(data: bytes) -> np.ndarray:
    """Inverse of :func:`encode_tokens` -> int32 array (bit-exact)."""
    n = int(np.frombuffer(data[:4], dtype=np.uint32)[0])
    width = int(np.frombuffer(data[4:5], dtype=np.uint8)[0])
    if not n:
        return np.empty(0, dtype=np.int32)
    bits = np.unpackbits(
        np.frombuffer(data[5:], dtype=np.uint8), bitorder="little"
    )[: n * width].reshape(n, width)
    return (bits.astype(np.int64) << np.arange(width, dtype=np.int64)).sum(
        axis=1
    ).astype(np.int32)
