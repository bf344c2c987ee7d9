"""FLAC container metadata scanner — implemented from the public spec
(the FLAC format document's METADATA_BLOCK grammar: STREAMINFO bit
layout, SEEKTABLE seekpoints, the Vorbis-comment block from the Vorbis
I spec) with no dependencies.

Same product shape as the MP3 scanner (operators/mpegaudio.py): a
100-TB corpus indexer does NOT decode FLAC audio (that needs the LPC /
Rice-code decoder); it walks the metadata section every `.flac` file
front-loads — `fLaC` magic, then a chain of (is-last, type, 24-bit
length) block headers — and reads stream geometry and duration out of
STREAMINFO alone.  Unlike MP3, FLAC frames carry no frame-length
field, so header-walking the audio section is impossible without
decoding; STREAMINFO's total-samples field IS the spec's answer, which
is why every real indexer (metaflac, ffprobe, mutagen) stops at the
metadata chain.  The audio section contributes only its byte length.

Refusal rules (refuse-don't-corrupt, as everywhere in this repo): bad
magic, a first block that is not STREAMINFO (spec mandates it), the
invalid block type 127, any block overrunning the stream, and a
malformed Vorbis-comment block all raise; RESERVED block types (7-126)
are skipped by length like real readers do.

The writer exists to build spec-valid fixtures; `scan_flac_stream` is
the product surface.

Reference parity note: the reference repo has no audio tier; this
module exists for the driver's multimodal extension surface.
"""

from __future__ import annotations

import struct

MAGIC = b"fLaC"

#: METADATA_BLOCK_STREAMINFO type code (must be the first block).
T_STREAMINFO = 0
T_PADDING = 1
T_SEEKTABLE = 3
T_VORBIS_COMMENT = 4
#: 127 is explicitly invalid per the spec; 7-126 are reserved (skip).
T_INVALID = 127

#: Placeholder seekpoint sample number (spec: all ones).
SEEKPOINT_PLACEHOLDER = 0xFFFFFFFFFFFFFFFF

VENDOR = b"spark-graft flac 1.0"


def _block_header(btype: int, length: int, last: bool) -> bytes:
    return bytes([(0x80 if last else 0) | btype]) + length.to_bytes(3, "big")


def build_streaminfo(
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    total_samples: int,
    block_size: int = 4096,
) -> bytes:
    """34-byte STREAMINFO body (spec bit layout: 16+16 block sizes,
    24+24 frame sizes, 20-bit sample rate, 3-bit channels-1, 5-bit
    bps-1, 36-bit total samples, 128-bit md5)."""
    if not (1 <= sample_rate < (1 << 20)):
        raise ValueError("sample rate out of STREAMINFO's 20-bit range")
    if not (1 <= channels <= 8) or not (4 <= bits_per_sample <= 32):
        raise ValueError("channels/bits-per-sample out of spec range")
    if total_samples >= (1 << 36):
        raise ValueError("total samples out of STREAMINFO's 36-bit range")
    head = struct.pack(">HHBBBBBB", block_size, block_size, 0, 0, 0, 0, 0, 0)
    # sample_rate(20) | channels-1(3) | bps-1(5) | total(36) = 64 bits
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | total_samples
    )
    return head + struct.pack(">Q", packed) + b"\x00" * 16


def build_vorbis_comment(comments: list[str]) -> bytes:
    """Vorbis-comment block body — LITTLE-endian lengths per the
    Vorbis I spec (the one little-endian corner of FLAC)."""
    out = struct.pack("<I", len(VENDOR)) + VENDOR
    out += struct.pack("<I", len(comments))
    for c in comments:
        enc = c.encode("utf-8")
        out += struct.pack("<I", len(enc)) + enc
    return out


def build_seektable(n_points: int) -> bytes:
    """SEEKTABLE body of `n_points` placeholder seekpoints (18 bytes
    each: sample number, byte offset, frame samples)."""
    return b"".join(
        struct.pack(">QQH", SEEKPOINT_PLACEHOLDER, 0, 0)
        for _ in range(n_points)
    )


def encode_flac_stream(
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    total_samples: int,
    n_seekpoints: int = 0,
    comments: list[str] | None = None,
    padding_len: int = 0,
    audio_bytes: int = 0,
) -> bytes:
    """A spec-valid FLAC metadata section over an OPAQUE audio tail
    (this repo indexes FLAC, it does not Rice-encode it): STREAMINFO
    first (mandatory), then SEEKTABLE (if any points), a
    Vorbis-comment block (always — every real encoder writes one),
    then PADDING (if any)."""
    comments = comments or []
    blocks: list[tuple[int, bytes]] = [
        (
            T_STREAMINFO,
            build_streaminfo(
                sample_rate, channels, bits_per_sample, total_samples
            ),
        )
    ]
    if n_seekpoints > 0:
        blocks.append((T_SEEKTABLE, build_seektable(n_seekpoints)))
    blocks.append((T_VORBIS_COMMENT, build_vorbis_comment(comments)))
    if padding_len > 0:
        blocks.append((T_PADDING, b"\x00" * padding_len))
    out = bytearray(MAGIC)
    for i, (btype, body) in enumerate(blocks):
        out += _block_header(btype, len(body), i == len(blocks) - 1)
        out += body
    # deterministic filler "frames": starts with a plausible sync byte
    # run but is NEVER parsed — the scanner stops at the last metadata
    # block, exactly like metaflac --list
    out += bytes((0xFF if i == 0 else (i * 37) & 0xFF) for i in range(audio_bytes))
    return bytes(out)


def scan_flac_stream(b: bytes) -> dict:
    """Walk the metadata chain and report stream geometry + duration:

    ``{"sample_rate", "channels", "bits_per_sample", "total_samples",
    "duration_ms", "n_blocks", "n_seekpoints", "n_comments",
    "audio_bytes", "stream_bytes"}``

    Duration is STREAMINFO math (total_samples / sample_rate) — the
    spec's own answer, since FLAC frames are not length-walkable
    without decoding."""
    if len(b) < 4 or b[:4] != MAGIC:
        raise ValueError("not a FLAC stream: missing fLaC magic")
    pos = 4
    first = True
    info = None
    n_blocks = 0
    n_seekpoints = 0
    n_comments = 0
    while True:
        if pos + 4 > len(b):
            raise ValueError("truncated metadata block header")
        hdr = b[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        length = int.from_bytes(b[pos + 1 : pos + 4], "big")
        body_lo = pos + 4
        body_hi = body_lo + length
        if body_hi > len(b):
            raise ValueError(f"metadata block overruns the stream at {pos}")
        if btype == T_INVALID:
            raise ValueError("invalid metadata block type 127")
        if first and btype != T_STREAMINFO:
            raise ValueError("first metadata block is not STREAMINFO")
        n_blocks += 1
        if btype == T_STREAMINFO:
            if not first:
                raise ValueError("duplicate STREAMINFO block")
            if length != 34:
                raise ValueError("STREAMINFO block is not 34 bytes")
            packed = struct.unpack_from(">Q", b, body_lo + 10)[0]
            info = {
                "sample_rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bits_per_sample": ((packed >> 36) & 0x1F) + 1,
                "total_samples": packed & ((1 << 36) - 1),
            }
            if info["sample_rate"] == 0:
                raise ValueError("STREAMINFO sample rate 0")
        elif btype == T_SEEKTABLE:
            if length % 18:
                raise ValueError("SEEKTABLE length not a multiple of 18")
            n_seekpoints += length // 18
        elif btype == T_VORBIS_COMMENT:
            vlen = struct.unpack_from("<I", b, body_lo)[0]
            cpos = body_lo + 4 + vlen
            if cpos + 4 > body_hi:
                raise ValueError("malformed Vorbis-comment vendor string")
            cnt = struct.unpack_from("<I", b, cpos)[0]
            cpos += 4
            for _ in range(cnt):
                if cpos + 4 > body_hi:
                    raise ValueError("malformed Vorbis-comment list")
                clen = struct.unpack_from("<I", b, cpos)[0]
                cpos += 4 + clen
                if cpos > body_hi:
                    raise ValueError("Vorbis comment overruns its block")
            n_comments += cnt
        # PADDING and reserved types (7-126): skip by length
        first = False
        pos = body_hi
        if last:
            break
    if info is None:
        raise ValueError("no STREAMINFO block")  # unreachable: first-gate
    duration_ms = info["total_samples"] * 1000 // info["sample_rate"]
    return {
        **info,
        "duration_ms": duration_ms,
        "n_blocks": n_blocks,
        "n_seekpoints": n_seekpoints,
        "n_comments": n_comments,
        "audio_bytes": len(b) - pos,
        "stream_bytes": len(b),
    }
