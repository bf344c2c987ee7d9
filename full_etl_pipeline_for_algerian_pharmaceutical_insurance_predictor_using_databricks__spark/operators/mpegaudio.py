"""MPEG audio (MP3) frame-header scanner — metadata extraction from
MPEG-1 Layer III streams implemented from the public spec (ISO/IEC
11172-3 header layout; the ID3v2.3 tag header from id3.org) with no
dependencies.

This is the path a 100-TB corpus scanner actually runs over `.mp3`
columns: it does NOT decode audio (that needs the Huffman tables,
IMDCT and synthesis filterbank of a full decoder); it walks the frame
headers — 11-bit sync, version/layer bits, bitrate and sample-rate
table lookups, the padding bit — skipping a leading ID3v2 tag via its
syncsafe size, and derives duration, stream geometry and CBR/VBR
classification without touching payload bytes.  Every real tool that
prints "duration / bitrate" for an MP3 without playing it (ffprobe,
mutagen, file indexers) performs exactly this walk.

A malformed stream (bad sync mid-walk, truncated final frame, a
free-format or reserved bitrate index) refuses loudly rather than
mis-reporting — the refuse-don't-corrupt rule the table-format tiers
follow.

The writer exists to build spec-valid fixtures (headers + filler
payload); `scan_mpeg_stream` is the product surface.

Reference parity note: the reference repo has no audio tier; this
module exists for the driver's multimodal extension surface.
"""

from __future__ import annotations

import struct

#: MPEG-1 Layer III bitrate table, kbps, indexed by the 4-bit field.
#: Index 0 is "free format" and 15 is forbidden — both refused here.
BITRATE_KBPS = [
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None,
]
#: MPEG-1 sample-rate table, Hz, indexed by the 2-bit field (3 reserved).
SAMPLE_RATES = [44100, 48000, 32000, None]
#: Samples per MPEG-1 Layer III frame.
SAMPLES_PER_FRAME = 1152


def frame_length(bitrate_idx: int, samplerate_idx: int, padding: int) -> int:
    """Byte length of one MPEG-1 Layer III frame (spec formula:
    144 * bitrate / samplerate + padding, integer floor)."""
    kbps = BITRATE_KBPS[bitrate_idx]
    sr = SAMPLE_RATES[samplerate_idx]
    if kbps is None or sr is None:
        raise ValueError(
            f"unsupported bitrate/samplerate index {bitrate_idx}/{samplerate_idx}"
        )
    return (144_000 * kbps) // sr + (1 if padding else 0)


def _header_word(bitrate_idx: int, samplerate_idx: int, padding: int) -> int:
    # sync(11)=all-ones | version(2)=11 MPEG-1 | layer(2)=01 Layer III
    # | no-CRC(1)=1 | bitrate(4) | samplerate(2) | padding(1) | priv(1)
    # | mode(2)=11 mono | modeext(2) | copyright(1) | original(1)=1
    # | emphasis(2)=00
    return (
        (0x7FF << 21)
        | (0b11 << 19)
        | (0b01 << 17)
        | (1 << 16)
        | (bitrate_idx << 12)
        | (samplerate_idx << 10)
        | ((1 if padding else 0) << 9)
        | (0b11 << 6)
        | (1 << 2)
    )


def encode_id3v2(payload: bytes) -> bytes:
    """A minimal ID3v2.3 tag wrapping `payload` bytes (the scanner
    only reads the 10-byte header's syncsafe size, as real scanners
    do)."""
    n = len(payload)
    if n >= 1 << 28:  # pragma: no cover - caller bug
        raise ValueError("ID3v2 payload too large for syncsafe size")
    size = bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )
    return b"ID3" + bytes([3, 0, 0]) + size + payload


def encode_mp3_stream(
    frame_specs: list[tuple[int, int, int]], id3_payload: bytes = b""
) -> bytes:
    """Build a spec-valid MPEG-1 Layer III stream: an optional ID3v2
    tag followed by one frame per (bitrate_idx, samplerate_idx,
    padding) spec.  Payload bytes after each header are deterministic
    filler — valid for a header scanner, silent for a decoder."""
    out = [encode_id3v2(id3_payload)] if id3_payload else []
    for i, (br, sr, pad) in enumerate(frame_specs):
        n = frame_length(br, sr, pad)
        header = struct.pack(">I", _header_word(br, sr, pad))
        filler = bytes((7 * i + j) & 0xFF for j in range(n - 4))
        out.append(header + filler)
    return b"".join(out)


def scan_mpeg_stream(b: bytes) -> dict:
    """Walk an MPEG-1 Layer III stream and return its metadata:

    ``{"n_frames", "sample_rate", "duration_ms", "stream_bytes",
    "frame_bytes", "is_vbr", "id3_bytes", "bitrates_kbps"}``

    Skips one leading ID3v2 tag (syncsafe size).  Refuses on a bad
    sync word, a reserved/free bitrate or sample-rate index, a
    non-MPEG-1-Layer-III frame, a truncated frame, or a sample-rate
    change mid-stream (spec-legal but pathological; real muxers never
    emit it)."""
    pos, id3_bytes = 0, 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
        if b[5] & 0x10:  # footer flag adds 10 trailing tag bytes
            size += 10
        id3_bytes = 10 + size
        pos = id3_bytes
        if pos > len(b):
            raise ValueError("ID3v2 size exceeds stream length")
    n_frames, frame_bytes, sr_seen = 0, 0, None
    bitrates: set[int] = set()
    while pos < len(b):
        if pos + 4 > len(b):
            raise ValueError(f"truncated frame header at byte {pos}")
        word = struct.unpack_from(">I", b, pos)[0]
        if (word >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"lost frame sync at byte {pos}")
        version = (word >> 19) & 0b11
        layer = (word >> 17) & 0b11
        if version != 0b11 or layer != 0b01:
            raise ValueError(
                "only MPEG-1 Layer III streams supported "
                f"(version bits {version:02b}, layer bits {layer:02b})"
            )
        br_idx = (word >> 12) & 0x0F
        sr_idx = (word >> 10) & 0b11
        padding = (word >> 9) & 1
        if BITRATE_KBPS[br_idx] is None:
            raise ValueError(f"free/forbidden bitrate index {br_idx}")
        if SAMPLE_RATES[sr_idx] is None:
            raise ValueError("reserved sample-rate index")
        if sr_seen is None:
            sr_seen = SAMPLE_RATES[sr_idx]
        elif sr_seen != SAMPLE_RATES[sr_idx]:
            raise ValueError("sample rate changed mid-stream")
        n = frame_length(br_idx, sr_idx, padding)
        if pos + n > len(b):
            raise ValueError(f"truncated frame at byte {pos} (need {n})")
        bitrates.add(BITRATE_KBPS[br_idx])
        n_frames += 1
        frame_bytes += n
        pos += n
    if n_frames == 0:
        raise ValueError("no MPEG audio frames found")
    return {
        "n_frames": n_frames,
        "sample_rate": sr_seen,
        "duration_ms": (n_frames * SAMPLES_PER_FRAME * 1000) // sr_seen,
        "stream_bytes": len(b),
        "frame_bytes": frame_bytes,
        "is_vbr": len(bitrates) > 1,
        "id3_bytes": id3_bytes,
        "bitrates_kbps": sorted(bitrates),
    }
