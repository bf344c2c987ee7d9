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


def scan_ogg(b: bytes) -> list[dict]:
    """Walk EVERY logical stream in an Ogg physical stream — chained
    links (RFC 3533 §4: complete streams concatenated, each link
    opened by its own BOS pages) and grouped/multiplexed streams
    (several serials interleaved within one link, all their BOS pages
    first).  One row per (link, serial): ``{"link", "serial",
    "sample_rate", "channels", "n_pages", "n_packets", "duration_ms",
    "byte_lo", "byte_hi"}`` — byte offsets span the stream's first
    page through the end of its last page, so a chained internet-radio
    rip is seekable per link from the scan alone.

    Grammar enforcement per stream: version 0, page CRC, contiguous
    page sequence numbers (a hole refuses — a lost page would silently
    shorten the link), BOS-before-data (a data page whose serial never
    opened refuses), no BOS inside an open link, no pages after EOS.
    Every link's every stream must open with a Vorbis identification
    header (the only codec this tier speaks)."""
    pos = 0
    link = 0
    link_has_data = False
    open_serials: set[int] = set()
    streams: dict[tuple[int, int], dict] = {}
    order: list[tuple[int, int]] = []
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
        seq = struct.unpack_from("<I", b, pos + 18)[0]
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
        completed = sum(1 for s in segs if s < 255)
        if flags & F_BOS:
            if link_has_data:
                if open_serials:
                    raise ValueError(
                        "BOS page inside an open link — grouped "
                        "streams' BOS pages must precede all data "
                        "pages (RFC 3533)"
                    )
                link += 1
                link_has_data = False
            key = (link, serial)
            if key in streams:
                raise ValueError(
                    f"duplicate BOS for serial {serial} in link {link}"
                )
            first = b[seg_hi : seg_hi + min(body_len, 30)]
            if len(first) < 30 or first[:7] != b"\x01vorbis":
                raise ValueError(
                    "BOS packet is not a Vorbis identification header"
                )
            if struct.unpack_from("<I", first, 7)[0] != 0:
                raise ValueError("unsupported Vorbis version")
            channels = first[11]
            sample_rate = struct.unpack_from("<I", first, 12)[0]
            if sample_rate == 0 or channels == 0:
                raise ValueError(
                    "Vorbis id header with zero rate/channels"
                )
            streams[key] = {
                "link": link,
                "serial": serial,
                "sample_rate": sample_rate,
                "channels": channels,
                "n_pages": 0,
                "n_packets": 0,
                "last_granule": 0,
                "byte_lo": pos,
                "byte_hi": body_hi,
                "_seq": seq,
            }
            order.append(key)
            open_serials.add(serial)
            st = streams[key]
        else:
            link_has_data = True
            key = (link, serial)
            st = streams.get(key)
            if st is None:
                raise ValueError(
                    f"page for serial {serial} without a BOS — "
                    "multiplexed group missing its BOS pages, or a "
                    "corrupt stream"
                )
            if serial not in open_serials:
                raise ValueError(
                    f"page for serial {serial} after its EOS page"
                )
            if seq != st["_seq"] + 1:
                raise ValueError(
                    f"page sequence hole in serial {serial}: expected "
                    f"{st['_seq'] + 1}, found {seq}"
                )
            st["_seq"] = seq
        st["n_pages"] += 1
        st["n_packets"] += completed
        st["byte_hi"] = body_hi
        if granule >= 0:  # -1 marks "no packet finishes on this page"
            st["last_granule"] = granule
        if flags & F_EOS:
            open_serials.discard(serial)
        pos = body_hi
    if not streams:
        raise ValueError("no BOS page — not a valid Ogg stream start")
    out = []
    for key in order:
        st = streams[key]
        out.append(
            {
                "link": st["link"],
                "serial": st["serial"],
                "sample_rate": st["sample_rate"],
                "channels": st["channels"],
                "n_pages": st["n_pages"],
                "n_packets": st["n_packets"],
                "duration_ms": st["last_granule"] * 1000
                // st["sample_rate"],
                "byte_lo": st["byte_lo"],
                "byte_hi": st["byte_hi"],
            }
        )
    return out


def encode_ogg_chain(links: list[tuple[int, int, list[int], int]]) -> bytes:
    """A CHAINED physical stream: each (sample_rate, channels,
    audio_packet_sizes, final_granule) link is a complete Ogg Vorbis
    stream with its own serial number, concatenated — how internet
    radio rips and `cat a.ogg b.ogg` files arrive."""
    return b"".join(
        encode_ogg_vorbis(sr, ch, sizes, granule, serial=0x5047 + i)
        for i, (sr, ch, sizes, granule) in enumerate(links)
    )


def encode_ogg_grouped(streams: list[tuple[int, int, list[int], int]]) -> bytes:
    """A GROUPED (multiplexed) link: every stream's BOS page first
    (RFC 3533 §4), then the header and audio pages interleaved
    round-robin."""
    serials = [0x6047 + i for i in range(len(streams))]
    bos = [
        _page(s, 0, 0, F_BOS, [vorbis_id_header(sr, ch)])
        for s, (sr, ch, _sz, _g) in zip(serials, streams)
    ]
    hdrs = []
    audio = []
    for s, (_sr, _ch, sizes, granule) in zip(serials, streams):
        setup = b"\x05vorbis" + bytes((i * 31) & 0xFF for i in range(50))
        hdrs.append(_page(s, 1, 0, 0, [vorbis_comment_header(), setup]))
        pkts = [
            bytes((j + i * 13) & 0xFF for i in range(n))
            for j, n in enumerate(sizes)
        ]
        audio.append(_page(s, 2, granule, F_EOS, pkts))
    return b"".join(bos + hdrs + audio)


def scan_ogg_stream(b: bytes) -> dict:
    """Single-logical-stream scan — the common `.ogg` file shape.
    Returns ``{"sample_rate", "channels", "n_pages", "n_packets",
    "duration_ms", "stream_bytes"}``; a physical stream carrying more
    than one logical stream refuses with a pointer at `scan_ogg`
    (which returns per-link/per-stream rows)."""
    rows = scan_ogg(b)
    if len(rows) != 1:
        links = 1 + max(r["link"] for r in rows)
        if links > 1:
            raise ValueError(
                f"chained Ogg stream ({links} links) — use scan_ogg "
                "for per-link rows"
            )
        raise ValueError(
            f"multiplexed Ogg streams ({len(rows)} serials) — use "
            "scan_ogg for per-stream rows"
        )
    r = rows[0]
    return {
        "sample_rate": r["sample_rate"],
        "channels": r["channels"],
        "n_pages": r["n_pages"],
        "n_packets": r["n_packets"],
        "duration_ms": r["duration_ms"],
        "stream_bytes": len(b),
    }
