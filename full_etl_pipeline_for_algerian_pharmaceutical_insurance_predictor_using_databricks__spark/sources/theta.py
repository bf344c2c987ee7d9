"""Compact Theta sketch codec — the `apache-datasketches-theta-v1`
Puffin blob type Iceberg's `statistics` metadata registers for
table-level NDV estimates (the structure Trino/Spark planners read
for distinct-count planning).

Implements the PUBLIC Apache DataSketches serialization (serial
version 3, COMPACT family, ordered) and the KMV-style estimator it
encodes: values hash through MurmurHash3 x64 128 (seed 9001, the
DataSketches default), the hash folds to 63 bits (`>>> 1`), the k
smallest distinct hash values are retained, and theta is the
(k+1)-smallest — NDV ≈ retained / (theta / 2⁶³).

Byte-level parity with the Java reference cannot be VERIFIED in this
container (no datasketches wheel, no network); the format is written
from the published layout and pinned by field-level assertions plus
estimate-accuracy floors in tests/test_theta.py.  Reference:
reference repo has no statistics tier (829-LoC notebook repo); this
is the scale-path extension real lakehouse planners expect.
"""

from __future__ import annotations

import struct

#: DataSketches' default update seed — part of the wire contract
#: (the serialized seed hash must match the reader's seed).
DEFAULT_SEED = 9001
#: Default nominal entries (lgK=12) — the library default.
DEFAULT_K = 4096

_MAX63 = (1 << 63) - 1


def _rotl64(x: int, r: int) -> int:
    x &= 0xFFFFFFFFFFFFFFFF
    return ((x << r) | (x >> (64 - r))) & 0xFFFFFFFFFFFFFFFF


def _fmix64(k: int) -> int:
    k &= 0xFFFFFFFFFFFFFFFF
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & 0xFFFFFFFFFFFFFFFF
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = DEFAULT_SEED) -> tuple[int, int]:
    """Standard MurmurHash3 x64 128 (Austin Appleby's public domain
    reference, the variant DataSketches uses) — returns (h1, h2) as
    unsigned 64-bit ints."""
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    h1 = seed & 0xFFFFFFFFFFFFFFFF
    h2 = seed & 0xFFFFFFFFFFFFFFFF
    length = len(data)
    nblocks = length // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * c1) & 0xFFFFFFFFFFFFFFFF
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & 0xFFFFFFFFFFFFFFFF
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & 0xFFFFFFFFFFFFFFFF
        h1 = (h1 * 5 + 0x52DCE729) & 0xFFFFFFFFFFFFFFFF
        k2 = (k2 * c2) & 0xFFFFFFFFFFFFFFFF
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & 0xFFFFFFFFFFFFFFFF
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & 0xFFFFFFFFFFFFFFFF
        h2 = (h2 * 5 + 0x38495AB5) & 0xFFFFFFFFFFFFFFFF
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    t = len(tail)
    if t >= 9:
        for i in range(t - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * c2) & 0xFFFFFFFFFFFFFFFF
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & 0xFFFFFFFFFFFFFFFF
        h2 ^= k2
    if t >= 1:
        for i in range(min(t, 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * c1) & 0xFFFFFFFFFFFFFFFF
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & 0xFFFFFFFFFFFFFFFF
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & 0xFFFFFFFFFFFFFFFF
    h2 = (h2 + h1) & 0xFFFFFFFFFFFFFFFF
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & 0xFFFFFFFFFFFFFFFF
    h2 = (h2 + h1) & 0xFFFFFFFFFFFFFFFF
    return h1, h2


def hash63(data: bytes, seed: int = DEFAULT_SEED) -> int:
    """A value's 63-bit theta hash: first murmur word `>>> 1` (the
    DataSketches update rule; 0 is excluded by the retention rule —
    hashes must be in (0, theta))."""
    return murmur3_x64_128(data, seed)[0] >> 1


def seed_hash(seed: int = DEFAULT_SEED) -> int:
    """DataSketches' 16-bit seed hash: murmur(seed-as-le-long, 0) low
    16 bits; 0 is reserved-invalid per the library."""
    sh = murmur3_x64_128(struct.pack("<q", seed), 0)[0] & 0xFFFF
    if sh == 0:
        raise ValueError(f"seed {seed} hashes to the reserved 0")
    return sh


_FLAG_READONLY = 2
_FLAG_EMPTY = 4
_FLAG_COMPACT = 8
_FLAG_ORDERED = 16
_SERIAL_VERSION = 3
_FAMILY_COMPACT = 3


def serialize_compact(
    hashes: list[int], k: int = DEFAULT_K, seed: int = DEFAULT_SEED
) -> bytes:
    """Serialize DISTINCT 63-bit hash values as an ordered compact
    theta sketch (serial v3).  `hashes` is everything the caller
    retained (any count); the k smallest are kept and the (k+1)-th
    becomes theta when more than k survive (estimation mode),
    otherwise theta stays 2⁶³ (exact mode)."""
    hs = sorted(set(hashes))
    if any(h <= 0 or h > _MAX63 for h in hs):
        raise ValueError("theta hashes must be in (0, 2^63]")
    sh = seed_hash(seed)
    if not hs:
        return struct.pack(
            "<BBBBBBH",
            1, _SERIAL_VERSION, _FAMILY_COMPACT, 0, 0,
            _FLAG_READONLY | _FLAG_EMPTY | _FLAG_COMPACT | _FLAG_ORDERED,
            sh,
        )
    if len(hs) > k:
        theta = hs[k]
        hs = hs[:k]
        pre_longs = 3
    else:
        theta = _MAX63 + 1
        pre_longs = 2
    out = bytearray(
        struct.pack(
            "<BBBBBBH",
            pre_longs, _SERIAL_VERSION, _FAMILY_COMPACT, 0, 0,
            _FLAG_READONLY | _FLAG_COMPACT | _FLAG_ORDERED,
            sh,
        )
    )
    out += struct.pack("<if", len(hs), 1.0)  # curCount, sampling p
    if pre_longs == 3:
        out += struct.pack("<Q", theta)
    for h in hs:
        out += struct.pack("<Q", h)
    return bytes(out)


def deserialize_compact(buf: bytes, seed: int = DEFAULT_SEED) -> dict:
    """Parse a v3 compact theta sketch into {theta, hashes, empty}.
    Refuses other families/versions or a foreign seed hash — never
    misestimate silently."""
    if len(buf) < 8:
        raise ValueError("theta sketch shorter than its preamble")
    pre_longs, ser_ver, family, _lgnom, _lgarr, flags, sh = struct.unpack_from(
        "<BBBBBBH", buf, 0
    )
    if ser_ver != _SERIAL_VERSION:
        raise ValueError(f"theta sketch serial version {ser_ver} != 3")
    if family != _FAMILY_COMPACT:
        raise ValueError(f"family {family} is not COMPACT(3)")
    if sh != seed_hash(seed):
        raise ValueError(
            "seed hash mismatch — sketch was built with a different seed"
        )
    if flags & _FLAG_EMPTY:
        return {"theta": _MAX63 + 1, "hashes": [], "empty": True}
    cur_count, _p = struct.unpack_from("<if", buf, 8)
    off = 16
    theta = _MAX63 + 1
    if pre_longs == 3:
        (theta,) = struct.unpack_from("<Q", buf, 16)
        off = 24
    hashes = list(struct.unpack_from(f"<{cur_count}Q", buf, off))
    return {"theta": theta, "hashes": hashes, "empty": False}


def estimate(buf: bytes, seed: int = DEFAULT_SEED) -> float:
    """The sketch's NDV estimate: retained / (theta / 2⁶³)."""
    sk = deserialize_compact(buf, seed)
    if sk["empty"]:
        return 0.0
    return len(sk["hashes"]) / (sk["theta"] / float(_MAX63 + 1))


def merge(bufs: list[bytes], k: int = DEFAULT_K,
          seed: int = DEFAULT_SEED) -> bytes:
    """Union of compact sketches (the a-not-b/union algebra subset
    NDV maintenance needs): pool retained hashes below the smallest
    input theta; more than k survivors re-tighten theta to the
    (k+1)-smallest (serialize_compact's rule, which is <= the pooled
    theta so the invariant holds), otherwise theta stays the pooled
    minimum — an input already in estimation mode keeps the union
    there even when few hashes survive."""
    min_theta = _MAX63 + 1
    pooled: set[int] = set()
    for b in bufs:
        sk = deserialize_compact(b, seed)
        min_theta = min(min_theta, sk["theta"])
        pooled.update(sk["hashes"])
    hs = sorted(h for h in pooled if h < min_theta)
    if len(hs) > k or min_theta > _MAX63:
        return serialize_compact(hs, k=k, seed=seed)
    # <= k survivors under an estimation-mode theta: keep that theta
    head = struct.pack(
        "<BBBBBBH", 3, _SERIAL_VERSION, _FAMILY_COMPACT, 0, 0,
        _FLAG_READONLY | _FLAG_COMPACT | _FLAG_ORDERED, seed_hash(seed),
    )
    return (
        head
        + struct.pack("<if", len(hs), 1.0)
        + struct.pack("<Q", min_theta)
        + b"".join(struct.pack("<Q", h) for h in hs)
    )
