"""Roaring-bitmap + Z85 codecs for Delta Lake deletion vectors — the
two PUBLIC serialization formats the Delta protocol builds its DV
descriptors on, implemented from their specs with no dependencies:

- the 32-bit RoaringBitmap portable serialization (RoaringFormatSpec):
  both cookies (12346 no-run + size, 12347 with run-container bitset
  and the packed container count), array / bitmap / run containers,
  the offset-header presence rule; and Delta's 64-bit
  `RoaringBitmapArray` "portable" wrapper (int64 LE bitmap count, then
  each 32-bit bitmap for consecutive high-32 keys);
- Z85 (ZeroMQ base-85, 4 bytes → 5 chars) used by `pathOrInlineDv`
  for both the inline-DV payload and the on-disk DV file's UUID.

Writers here emit the no-run cookie with array / bitmap containers
(always-valid choices any reader accepts); the reader accepts
everything the format allows, so DV files written by real engines
(delta-spark, delta-rs) decode bit-exactly.
"""

from __future__ import annotations

import struct

_NO_RUN_COOKIE = 12346
_RUN_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(raw: bytes) -> str:
    if len(raw) % 4:
        raise ValueError("Z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(raw), 4):
        n = struct.unpack(">I", raw[i : i + 4])[0]
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[n % 85])
            n //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("Z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i : i + 5]:
            n = n * 85 + _Z85_INDEX[c]
        out += struct.pack(">I", n)
    return bytes(out)


# --------------------------------------------------------------------------
# 32-bit RoaringBitmap (portable serialization)
# --------------------------------------------------------------------------


def _serialize_bitmap32(values: list[int]) -> bytes:
    """Serialize sorted distinct uint32 values with the no-run cookie:
    array containers up to 4096 entries, bitmap containers above."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    buf = bytearray()
    buf += struct.pack("<II", _NO_RUN_COOKIE, len(keys))
    for k in keys:
        buf += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header (always present for the no-run cookie)
    offset = len(buf) + 4 * len(keys)
    for k in keys:
        buf += struct.pack("<I", offset)
        n = len(containers[k])
        offset += 2 * n if n <= _ARRAY_MAX else 8192
    for k in keys:
        vals = containers[k]
        if len(vals) <= _ARRAY_MAX:
            buf += struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            buf += struct.pack("<1024Q", *words)
    return bytes(buf)


def _deserialize_bitmap32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Read one 32-bit roaring bitmap at `pos`; return (values,
    next_pos).  Handles both cookies and all three container types."""
    (cookie16,) = struct.unpack_from("<H", buf, pos)
    has_runs = cookie16 == _RUN_COOKIE
    if has_runs:
        (hi,) = struct.unpack_from("<H", buf, pos + 2)
        n_containers = hi + 1
        pos += 4
        bitset_len = (n_containers + 7) // 8
        run_bits = buf[pos : pos + bitset_len]
        pos += bitset_len
    else:
        (cookie32,) = struct.unpack_from("<I", buf, pos)
        if cookie32 != _NO_RUN_COOKIE:
            raise ValueError(f"bad roaring cookie {cookie32}")
        (n_containers,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_bits = b""
    keys = []
    cards = []
    for i in range(n_containers):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys.append(k)
        cards.append(c + 1)
        pos += 4
    if (not has_runs) or n_containers >= _NO_OFFSET_THRESHOLD:
        pos += 4 * n_containers  # offset header present; sequential read
    values: list[int] = []
    for i in range(n_containers):
        base = keys[i] << 16
        is_run = bool(run_bits and (run_bits[i // 8] >> (i % 8)) & 1)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + start, base + start + length + 1))
        elif cards[i] <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    lsb = w & -w
                    values.append(base + (wi << 6) + lsb.bit_length() - 1)
                    w ^= lsb
    return values, pos


# --------------------------------------------------------------------------
# 64-bit RoaringBitmapArray (Delta's portable wrapper)
# --------------------------------------------------------------------------


def serialize_rbm64(values) -> bytes:
    """Delta's RoaringBitmapArray / RoaringTreemap portable form
    (RoaringFormatSpec 64-bit extension, as written by delta-spark and
    delta-rs): int64 LE = number of NON-EMPTY 32-bit bitmaps, then for
    each, ascending: uint32 LE high-32 key + the bitmap's standard
    32-bit portable serialization.  Empty buckets are never written."""
    buckets: dict[int, list[int]] = {}
    for v in sorted(set(int(v) for v in values)):
        if v < 0:
            raise ValueError("deletion-vector positions are unsigned")
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<q", len(buckets)))
    for k in sorted(buckets):
        out += struct.pack("<I", k)
        out += _serialize_bitmap32(buckets[k])
    return bytes(out)


def deserialize_rbm64(buf: bytes) -> list[int]:
    (n,) = struct.unpack_from("<q", buf, 0)
    pos = 8
    values: list[int] = []
    prev_key = -1
    for _ in range(n):
        (key,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if key <= prev_key:
            raise ValueError(
                f"RoaringBitmapArray keys not strictly ascending ({key})"
            )
        prev_key = key
        vals, pos = _deserialize_bitmap32(buf, pos)
        values.extend((key << 32) | v for v in vals)
    if pos != len(buf):
        raise ValueError(
            f"trailing bytes after RoaringBitmapArray ({len(buf) - pos})"
        )
    return values
