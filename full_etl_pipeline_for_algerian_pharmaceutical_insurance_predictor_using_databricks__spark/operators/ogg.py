"""Ogg container page walker with Vorbis identification-header parse —
implemented from the public specs (RFC 3533 Ogg page grammar; the
Vorbis I specification's identification header) with no dependencies.

The third audio-container tier, completing the metadata-walk family:

- MP3 (operators/mpegaudio): frame headers carry enough to SKIP —
  walk every frame, derive duration from the walk itself.
- FLAC (operators/flac): frames are NOT walkable; the spec front-loads
  STREAMINFO and duration is metadata math.
- Ogg (this module): PAGES are walkable — each page header carries its
  own body length via the segment lacing table, and a CRC32 over the
  whole page (poly 0x04C11DB7, unreflected, init/xorout 0) that makes
  corruption detectable without decoding.  Duration comes from the
  LAST page's granule position (for Vorbis: absolute PCM sample
  count), geometry from the Vorbis id header in the first (BOS) page.

The walk is exactly what `ogginfo`/ffprobe do for a `.ogg` file they
never decode: cost tracks page count, payload bytes are skipped via
the lacing totals.  Refusals: bad capture pattern, CRC mismatch,
stream version != 0, missing BOS, a first packet that is not a Vorbis
identification header, truncation.

The writer builds spec-valid fixtures (real lacing, real CRCs, opaque
audio packet payloads); `scan_ogg_stream` is the product surface.

Reference parity note: the reference repo has no audio tier; this
module exists for the driver's multimodal extension surface.
"""

from __future__ import annotations

import struct

CAPTURE = b"OggS"
#: header_type flags
F_CONT, F_BOS, F_EOS = 0x01, 0x02, 0x04

VENDOR = b"spark-graft ogg v1.0"  # 20 bytes — length is load-bearing
assert len(VENDOR) == 20


def _crc_table() -> list[int]:
    tbl = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            r &= 0xFFFFFFFF
        tbl.append(r)
    return tbl


_CRC = _crc_table()


def ogg_crc(b: bytes) -> int:
    """The Ogg page checksum: CRC-32, polynomial 0x04C11DB7,
    UNREFLECTED, initial value 0, no final XOR (RFC 3533 §6 — not the
    zlib CRC)."""
    r = 0
    for byte in b:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC[((r >> 24) & 0xFF) ^ byte]
    return r


def _lacing(sizes: list[int]) -> bytes:
    """Segment table for a sequence of whole packets: each packet is
    255-valued segments plus one terminating segment < 255 (a packet
    that is an exact multiple of 255 terminates with a 0)."""
    out = bytearray()
    for n in sizes:
        while n >= 255:
            out.append(255)
            n -= 255
        out.append(n)
    return bytes(out)


def _page(
    serial: int,
    seq: int,
    granule: int,
    flags: int,
    packets: list[bytes],
) -> bytes:
    segs = _lacing([len(p) for p in packets])
    body = b"".join(packets)
    head = (
        CAPTURE
        + bytes([0, flags])
        + struct.pack("<q", granule)
        + struct.pack("<I", serial)
        + struct.pack("<I", seq)
        + b"\x00\x00\x00\x00"  # CRC placeholder
        + bytes([len(segs)])
        + segs
    )
    crc = ogg_crc(head + body)
    return head[:22] + struct.pack("<I", crc) + head[26:] + body


def vorbis_id_header(sample_rate: int, channels: int) -> bytes:
    """The 30-byte Vorbis identification header (packet type 1)."""
    return (
        b"\x01vorbis"
        + struct.pack("<I", 0)  # vorbis_version
        + bytes([channels])
        + struct.pack("<I", sample_rate)
        + struct.pack("<iii", 0, 128000, 0)  # bitrate max/nominal/min
        + bytes([0xB8])  # blocksizes 2^8 / 2^11
        + bytes([1])  # framing bit
    )


def vorbis_comment_header() -> bytes:
    """Packet type 3: vendor string + zero user comments + framing."""
    return (
        b"\x03vorbis"
        + struct.pack("<I", len(VENDOR))
        + VENDOR
        + struct.pack("<I", 0)
        + b"\x01"
    )


def encode_ogg_vorbis(
    sample_rate: int,
    channels: int,
    audio_packet_sizes: list[int],
    final_granule: int,
    serial: int = 0x5047,
) -> bytes:
    """A spec-valid Ogg Vorbis stream: BOS page with the id header
    alone (the Vorbis spec requires it on its own page), a header page
    with comment + (opaque) setup packets, and one audio page of
    opaque packets carrying the final granule position and EOS."""
    id_page = _page(serial, 0, 0, F_BOS, [vorbis_id_header(sample_rate, channels)])
    setup = b"\x05vorbis" + bytes((i * 31) & 0xFF for i in range(50))
    hdr_page = _page(serial, 1, 0, 0, [vorbis_comment_header(), setup])
    audio = [
        bytes((j + i * 13) & 0xFF for i in range(n))
        for j, n in enumerate(audio_packet_sizes)
    ]
    audio_page = _page(serial, 2, final_granule, F_EOS, audio)
    return id_page + hdr_page + audio_page


def scan_ogg_stream(b: bytes) -> dict:
    """Walk every page (capture → header → lacing → CRC verify → skip
    body) and parse the Vorbis id header from the BOS page.  Returns
    ``{"sample_rate", "channels", "n_pages", "n_packets",
    "duration_ms", "stream_bytes"}`` — duration from the final granule
    position over the id header's sample rate."""
    pos = 0
    serial0 = None
    n_pages = 0
    n_packets = 0
    last_granule = 0
    info = None
    saw_bos = False
    while pos < len(b):
        if pos + 27 > len(b):
            raise ValueError("truncated Ogg page header")
        if b[pos : pos + 4] != CAPTURE:
            raise ValueError(f"bad capture pattern at byte {pos}")
        version = b[pos + 4]
        if version != 0:
            raise ValueError(f"unsupported Ogg stream version {version}")
        flags = b[pos + 5]
        granule = struct.unpack_from("<q", b, pos + 6)[0]
        serial = struct.unpack_from("<I", b, pos + 14)[0]
        if serial0 is None:
            serial0 = serial
        elif serial != serial0:
            # a second serial number means grouped (multiplexed)
            # logical streams — per-stream accounting needed; refuse
            raise ValueError("multiplexed Ogg streams unsupported")
        crc_stored = struct.unpack_from("<I", b, pos + 22)[0]
        n_segs = b[pos + 26]
        seg_lo = pos + 27
        seg_hi = seg_lo + n_segs
        if seg_hi > len(b):
            raise ValueError("truncated segment table")
        segs = b[seg_lo:seg_hi]
        body_len = sum(segs)
        body_hi = seg_hi + body_len
        if body_hi > len(b):
            raise ValueError("page body overruns the stream")
        page = bytearray(b[pos:body_hi])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc_stored:
            raise ValueError(f"Ogg page CRC mismatch at byte {pos}")
        # packets completed on this page = terminating segments (< 255)
        completed = sum(1 for s in segs if s < 255)
        n_packets += completed
        if flags & F_BOS:
            if saw_bos:
                # a second BOS page starts a CHAINED stream — duration
                # and packet counts would silently mix links; refuse
                raise ValueError(
                    "chained Ogg stream (second BOS page) unsupported"
                )
            saw_bos = True
            first = b[seg_hi : seg_hi + min(body_len, 30)]
            if len(first) < 30 or first[:7] != b"\x01vorbis":
                raise ValueError(
                    "BOS packet is not a Vorbis identification header"
                )
            if struct.unpack_from("<I", first, 7)[0] != 0:
                raise ValueError("unsupported Vorbis version")
            info = {
                "channels": first[11],
                "sample_rate": struct.unpack_from("<I", first, 12)[0],
            }
            if info["sample_rate"] == 0 or info["channels"] == 0:
                raise ValueError("Vorbis id header with zero rate/channels")
        if granule >= 0:  # -1 marks "no packet finishes on this page"
            last_granule = granule
        n_pages += 1
        pos = body_hi
    if not saw_bos or info is None:
        raise ValueError("no BOS page — not a valid Ogg stream start")
    return {
        **info,
        "n_pages": n_pages,
        "n_packets": n_packets,
        "duration_ms": last_granule * 1000 // info["sample_rate"],
        "stream_bytes": len(b),
    }
