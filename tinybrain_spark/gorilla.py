"""Gorilla-style compression of rolled-up points (north_rule: 'Gorilla
XOR + delta-of-delta encoding ... into compact binary columns').

Public algorithm: Pelkonen et al., "Gorilla: A Fast, Scalable,
In-Memory Time Series Database", VLDB 2015 (§4.1).  Two streams:

* **Timestamps**: delta-of-delta with the paper's bucketed varint —
  ``0`` for dod==0, ``10``+7b, ``110``+9b, ``1110``+12b, ``1111``+64b.
* **Values**: XOR with the previous value; ``0`` control bit for a zero
  XOR, else ``1`` + 6-bit leading-zero count + 6-bit significant-bit
  count + the significant bits.  (A self-describing single-mode variant
  of the paper's two-mode window reuse — window reuse creates a
  sequential dependency that would kill vectorization; this variant
  keeps the stream decodable value-by-value while the ENCODER stays
  fully vectorized numpy.)

The encoder never loops over points in Python: per-point code words and
bit lengths are computed as arrays and scattered into the output bit
array with one vector op per code-bit position (≤ 77 ops total,
independent of the number of points).

The decoder is two-pass: a light boundary scan (self-delimiting
variable-length records make boundaries inherently sequential, so the
scan is O(1) Python-int arithmetic per record on 16-bit sliding words,
with a 4-records-at-once fast path for zero runs), then ONE vectorized
bit-gather for all payloads (`_read_bits_vec`, the mirror of the
encoder's scatter) and cumulative XOR / double-cumsum reconstruction.
~10x over the per-bit reader it replaced; ~1.5M pts/s single-thread.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"TBG1"


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0)."""
    x = x.astype(np.uint64, copy=True)
    out = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x >= (np.uint64(1) << np.uint64(shift))
        out[mask] += shift
        x[mask] >>= np.uint64(shift)
    out[x > 0] += 1
    return out


def _write_bits(codes: np.ndarray, lengths: np.ndarray, extra: np.ndarray,
                extra_lengths: np.ndarray) -> bytes:
    """Scatter per-point (code, extra) bit patterns into one bit array.

    Each point contributes `lengths[i]` bits from `codes[i]` (MSB-first
    within its own width) followed by `extra_lengths[i]` bits of
    `extra[i]`.  One vectorized scatter per bit position.
    """
    total_len = lengths + extra_lengths
    offsets = np.concatenate([[0], np.cumsum(total_len)[:-1]])
    nbits = int(total_len.sum())
    bits = np.zeros(nbits, dtype=np.uint8)

    max_code = int(lengths.max()) if len(lengths) else 0
    for b in range(max_code):
        sel = lengths > b
        # bit b (0 = MSB of the code's own width)
        shift = (lengths[sel] - 1 - b).astype(np.uint64)
        vals = (codes[sel] >> shift) & np.uint64(1)
        bits[offsets[sel] + b] = vals.astype(np.uint8)

    max_extra = int(extra_lengths.max()) if len(extra_lengths) else 0
    for b in range(max_extra):
        sel = extra_lengths > b
        shift = (extra_lengths[sel] - 1 - b).astype(np.uint64)
        vals = (extra[sel] >> shift) & np.uint64(1)
        bits[offsets[sel] + lengths[sel] + b] = vals.astype(np.uint8)

    return np.packbits(bits).tobytes()


def _read_bits_vec(
    bits: np.ndarray, offsets: np.ndarray, lengths: np.ndarray
) -> np.ndarray:
    """Gather variable-length MSB-first bit words — the exact mirror of
    ``_write_bits``: one vectorized gather per bit position (<= 64 ops
    total, independent of the number of points)."""
    out = np.zeros(len(offsets), dtype=np.uint64)
    for length in np.unique(lengths):
        if length == 0:
            continue
        sel = np.nonzero(lengths == length)[0]
        idx = offsets[sel][:, None] + np.arange(length)
        words = bits[idx].astype(np.uint64)  # (k, L) gather
        pw = (np.uint64(1) << np.arange(length - 1, -1, -1).astype(np.uint64))
        out[sel] = words @ pw
    return out


def encode_values(values: np.ndarray) -> bytes:
    """XOR-encode an int sequence (first value stored raw in the header)."""
    v = np.asarray(values).astype(np.int64).view(np.uint64)
    n = len(v)
    header = struct.pack("<Iq", n, int(v[0].view(np.int64)) if n else 0)
    if n <= 1:
        return header
    prev = v[:-1]
    cur = v[1:]
    xor = cur ^ prev

    zero = xor == 0
    sig = _bit_length_u64(xor)  # significant bits incl. leading 1
    lz = (64 - sig).clip(0, 63)
    nbits = np.where(zero, 0, sig).astype(np.int64)

    # control+meta word: '0' (len 1) or '1'+6b lz+6b (nbits-1) (len 13)
    codes = np.where(
        zero,
        np.uint64(0),
        (np.uint64(1) << np.uint64(12))
        | (lz.astype(np.uint64) << np.uint64(6))
        | (nbits - 1).clip(0).astype(np.uint64),
    )
    lengths = np.where(zero, 1, 13).astype(np.int64)
    extra = np.where(zero, np.uint64(0), xor)  # low `nbits` bits are the payload
    extra_lengths = nbits
    return header + _write_bits(codes, lengths, extra, extra_lengths)


def decode_values(buf: bytes) -> np.ndarray:
    """Two-pass vectorized decode: a light boundary scan (one 6-bit dot
    per nonzero record — the stream is self-delimiting, so boundaries
    are inherently sequential), then one vectorized bit-gather for ALL
    xor payloads and a cumulative-XOR reconstruction."""
    n, first = struct.unpack_from("<Iq", buf, 0)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.array([first], dtype=np.int64)
    by = np.frombuffer(buf, dtype=np.uint8, offset=12)
    bits = np.unpackbits(by)
    # 16-bit sliding words (one per byte) make any <=9-bit field at any
    # bit offset a single shift/mask on a plain Python int — the
    # boundary scan is inherently sequential (self-delimiting records),
    # so its per-record cost is what bounds decode throughput
    w16 = (
        (np.concatenate([by, [0]]).astype(np.uint32) << 8)
        | np.concatenate([by[1:], [0, 0]]).astype(np.uint32)
    ).tolist()

    offs_l: list[int] = []
    nb_l: list[int] = []
    offs_append, nb_append = offs_l.append, nb_l.append
    m = n - 1
    i = p = 0
    while i < m:
        w = w16[p >> 3]
        if w & (0x8000 >> (p & 7)):
            # skip 6b lz (informational); 6b (nbits-1) sizes the payload
            q = p + 7
            k = ((w16[q >> 3] >> (10 - (q & 7))) & 63) + 1
            offs_append(p + 13)
            nb_append(k)
            p += 13 + k
            i += 1
        elif i + 4 <= m and not (w >> (12 - (p & 7))) & 15:
            # run fast-path: 4 consecutive zero-XOR records at once
            offs_l += (0, 0, 0, 0)
            nb_l += (0, 0, 0, 0)
            p += 4
            i += 4
        else:
            offs_append(p + 1)
            nb_append(0)
            p += 1
            i += 1
    offs = np.array(offs_l, dtype=np.int64)
    nb = np.array(nb_l, dtype=np.int64)

    xors = _read_bits_vec(bits, offs, nb)
    vals = np.empty(n, dtype=np.uint64)
    vals[0] = np.uint64(first & 0xFFFFFFFFFFFFFFFF)
    vals[1:] = xors
    return np.bitwise_xor.accumulate(vals).view(np.int64)


_DOD_BUCKETS = (
    (0, 0, 0),        # dod == 0 -> '0'
    (2, 7, -63),      # '10' + 7 bits, range [-63, 64]
    (6, 9, -255),     # '110' + 9 bits, range [-255, 256]
    (14, 12, -2047),  # '1110' + 12 bits, range [-2047, 2048]
)


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 timestamps/buckets (Gorilla §4.1.1)."""
    t = np.asarray(ts).astype(np.int64)
    n = len(t)
    first = int(t[0]) if n else 0
    first_delta = int(t[1] - t[0]) if n > 1 else 0
    header = struct.pack("<Iqq", n, first, first_delta)
    if n <= 2:
        return header
    delta = np.diff(t)
    dod = np.diff(delta)

    codes = np.empty(len(dod), dtype=np.uint64)
    lengths = np.empty(len(dod), dtype=np.int64)
    extra = np.zeros(len(dod), dtype=np.uint64)
    extra_lengths = np.zeros(len(dod), dtype=np.int64)

    done = np.zeros(len(dod), dtype=bool)
    sel = dod == 0
    codes[sel], lengths[sel] = 0, 1
    done |= sel
    for prefix, bits, lo in _DOD_BUCKETS[1:]:
        hi = lo + (1 << bits) - 1
        sel = ~done & (dod >= lo) & (dod <= hi)
        codes[sel] = np.uint64(prefix)
        lengths[sel] = (2 if prefix == 2 else (3 if prefix == 6 else 4))
        extra[sel] = (dod[sel] - lo).astype(np.uint64)
        extra_lengths[sel] = bits
        done |= sel
    sel = ~done
    codes[sel] = np.uint64(15)  # '1111'
    lengths[sel] = 4
    extra[sel] = dod[sel].view(np.uint64)
    extra_lengths[sel] = 64

    return header + _write_bits(codes, lengths, extra, extra_lengths)


def decode_timestamps(buf: bytes) -> np.ndarray:
    """Two-pass vectorized decode mirroring decode_values: boundary
    scan over the <=4-bit control prefixes, then one bit-gather for all
    payloads and double-cumsum reconstruction (delta-of-delta)."""
    n, first, first_delta = struct.unpack_from("<Iqq", buf, 0)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = first
    if n >= 2:
        out[1] = first + first_delta
    if n <= 2:
        return out
    by = np.frombuffer(buf, dtype=np.uint8, offset=20)
    raw_bits = np.unpackbits(by)
    bits = np.concatenate([raw_bits, np.zeros(4, dtype=np.uint8)])  # pad
    w16 = (
        (np.concatenate([by, [0]]).astype(np.uint32) << 8)
        | np.concatenate([by[1:], [0, 0]]).astype(np.uint32)
    ).tolist()

    m = n - 2
    # prefix class by the next 4 bits: (payload_off, plen, bias, advance)
    _T = (
        [(1, 0, 0, 1)] * 8          # '0'
        + [(2, 7, -63, 9)] * 4      # '10'  + 7b
        + [(3, 9, -255, 12)] * 2    # '110' + 9b
        + [(4, 12, -2047, 16)]      # '1110'+ 12b
        + [(4, 64, 0, 68)]          # '1111'+ 64b
    )
    offs_l: list[int] = []
    plen_l: list[int] = []
    offs_append, plen_append = offs_l.append, plen_l.append
    i = p = 0
    while i < m:
        f4 = (w16[p >> 3] >> (12 - (p & 7))) & 15
        if not f4 and i + 4 <= m:
            # run fast-path: 4 consecutive dod==0 records at once
            offs_l += (0, 0, 0, 0)
            plen_l += (0, 0, 0, 0)
            p += 4
            i += 4
            continue
        po, pl, _bi, adv = _T[f4]
        offs_append(p + po)
        plen_append(pl)
        p += adv
        i += 1
    offs = np.array(offs_l, dtype=np.int64)
    plen = np.array(plen_l, dtype=np.int64)
    bias_by_len = np.zeros(65, dtype=np.int64)
    bias_by_len[7], bias_by_len[9], bias_by_len[12] = -63, -255, -2047
    bias = bias_by_len[plen]
    is64 = plen == 64

    payload = _read_bits_vec(bits, offs, plen)
    dod = np.empty(m, dtype=np.int64)
    dod[is64] = payload[is64].view(np.int64)  # raw two's-complement
    small = ~is64
    dod[small] = payload[small].astype(np.int64) + bias[small]
    # delta_i = first_delta + cumsum(dod); out_i = out_{i-1} + delta_i
    deltas = first_delta + np.cumsum(dod)
    out[2:] = out[1] + np.cumsum(deltas)
    return out


def encode_series(buckets: np.ndarray, values: np.ndarray) -> bytes:
    """One (bucket, value) series -> one binary blob (BinaryType cell)."""
    tsb = encode_timestamps(buckets)
    vb = encode_values(values)
    return _MAGIC + struct.pack("<II", len(tsb), len(vb)) + tsb + vb


def decode_series(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    if buf[:4] != _MAGIC:
        raise ValueError("not a TBG1 gorilla blob")
    ts_len, v_len = struct.unpack_from("<II", buf, 4)
    off = 12
    ts = decode_timestamps(buf[off : off + ts_len])
    vals = decode_values(buf[off + ts_len : off + ts_len + v_len])
    return ts, vals
