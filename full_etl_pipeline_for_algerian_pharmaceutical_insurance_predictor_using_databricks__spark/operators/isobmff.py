"""ISO Base Media File Format (MP4) container — writer and parser for
the box structure every modern media corpus carries, implemented from
the public spec (ISO/IEC 14496-12 box grammar and sample tables;
QuickTime's registered 'jpeg' VisualSampleEntry for motion-JPEG
samples) with no dependencies.

The writer emits a complete, spec-valid progressive-layout file:
``ftyp`` + ``mdat`` (concatenated JPEG sample payloads) + ``moov``
with the full metadata tree — mvhd, trak/tkhd (16.16 fixed-point
geometry), mdia/mdhd (independent media timescale), hdlr('vide'),
minf/vmhd/dinf/dref, and the four sample tables that make MP4 random
access work: stsd (sample description), stts (decode timing), stsc
(sample→chunk mapping), stsz (sizes), stco (chunk offsets).

The parser is a generic box walker (32-bit size, 64-bit largesize=1,
size=0 → to-end forms) that rebuilds the per-sample (offset, size)
list by running the real stsc/stco/stsz join — the general
multi-chunk mapping, not just the single-chunk shape the writer
emits — and converts durations across the mvhd/mdhd timescales.
Compressed codecs this repo cannot entropy-decode (avc1/hev1/vp09…)
refuse loudly at the stsd gate; 'jpeg' samples decode through
operators/jpeg.

Reference parity note: the reference repo has no video tier; this
module exists for the driver's multimodal extension surface (MP4 is
the container a 100-TB crawl actually stores).
"""

from __future__ import annotations

import struct

#: movie (mvhd) timescale — units/second for track+movie durations
MOVIE_TIMESCALE = 1000
#: media (mdhd) timescale — deliberately different so unit conversion
#: between the two clocks is exercised, as in real muxer output
MEDIA_TIMESCALE = 30_000
#: one video frame = 100 ms (10 fps)
FRAME_MS = 100

_MATRIX_IDENTITY = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), btype) + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


def _visual_sample_entry_jpeg(width: int, height: int) -> bytes:
    body = (
        b"\x00" * 6  # reserved
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)  # reserved
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname (pascal, zero)
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    return _box(b"jpeg", body)


def encode_mp4_mjpeg(frames, quality: int = 90) -> bytes:
    """numpy (n, h, w, 3) uint8 frame stack → a complete MP4 with one
    motion-JPEG video track (each sample a genuine baseline JPEG from
    operators/jpeg), 10 fps, progressive ftyp+mdat+moov layout."""
    from . import jpeg

    n, h, w = frames.shape[:3]
    payloads = [jpeg.encode_jpeg(f, quality) for f in frames]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    mdat_payload = b"".join(payloads)
    # first sample starts after ftyp + the mdat box header
    first_off = len(ftyp) + 8
    mdat = _box(b"mdat", mdat_payload)

    delta_media = MEDIA_TIMESCALE * FRAME_MS // 1000  # per-frame ticks
    dur_media = n * delta_media
    dur_movie = n * FRAME_MS * MOVIE_TIMESCALE // 1000

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, MOVIE_TIMESCALE, dur_movie)
        + struct.pack(">iH", 0x00010000, 0x0100)  # rate, volume
        + b"\x00" * 10
        + _MATRIX_IDENTITY
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = _full(
        b"tkhd", 0, 0x7,  # enabled | in movie | in preview
        struct.pack(">IIIII", 0, 0, 1, 0, dur_movie)
        + b"\x00" * 8
        + struct.pack(">hhhH", 0, 0, 0, 0)  # layer, group, volume, rsvd
        + _MATRIX_IDENTITY
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, MEDIA_TIMESCALE, dur_media)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(
        b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
    )
    dinf = _box(b"dinf", dref)
    stsd = _full(
        b"stsd", 0, 0,
        struct.pack(">I", 1) + _visual_sample_entry_jpeg(w, h),
    )
    stts = _full(
        b"stts", 0, 0, struct.pack(">III", 1, n, delta_media)
    )
    stsc = _full(
        b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1)
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(p)) for p in payloads),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def walk_boxes(b: bytes, lo: int, hi: int):
    """Yield (type, body_lo, body_hi) over the box sequence in
    b[lo:hi] — handles the 32-bit, largesize (size==1, 64-bit) and
    to-end (size==0) forms of the spec grammar."""
    pos = lo
    while pos + 8 <= hi:
        size, btype = struct.unpack_from(">I4s", b, pos)
        body = pos + 8
        if size == 1:
            if pos + 16 > hi:
                raise ValueError(f"truncated largesize box at byte {pos}")
            size = struct.unpack_from(">Q", b, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = hi - pos
        if size < body - pos or pos + size > hi:
            raise ValueError(f"box at byte {pos} overruns its container")
        yield btype, body, pos + size
        pos += size


def _find(b: bytes, lo: int, hi: int, btype: bytes):
    for t, blo, bhi in walk_boxes(b, lo, hi):
        if t == btype:
            return blo, bhi
    raise ValueError(f"missing {btype.decode()} box")


def parse_mp4(b: bytes) -> dict:
    """Parse an MP4's metadata tree and sample layout.  Returns
    ``{"movie_timescale", "duration_ms", "width", "height", "codec",
    "n_samples", "samples": [(offset, size), ...]}`` where duration
    comes from the MEDIA clock (stts total over the mdhd timescale —
    the authoritative one; mvhd duration is cross-checked against it).
    Refuses non-video handlers and any codec this repo cannot decode.
    """
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file: first box is not ftyp")
    moov = _find(b, 0, len(b), b"moov")
    mvhd = _find(b, *moov, b"mvhd")
    ver = b[mvhd[0]]
    if ver == 1:
        movie_ts, movie_dur = struct.unpack_from(">IQ", b, mvhd[0] + 4 + 16)
    else:
        movie_ts, movie_dur = struct.unpack_from(">II", b, mvhd[0] + 4 + 8)
    trak = _find(b, *moov, b"trak")
    tkhd = _find(b, *trak, b"tkhd")
    tw, th = struct.unpack_from(">II", b, tkhd[1] - 8)
    width, height = tw >> 16, th >> 16
    mdia = _find(b, *trak, b"mdia")
    mdhd = _find(b, *mdia, b"mdhd")
    if b[mdhd[0]] == 1:
        media_ts = struct.unpack_from(">I", b, mdhd[0] + 4 + 16)[0]
    else:
        media_ts = struct.unpack_from(">I", b, mdhd[0] + 4 + 8)[0]
    hdlr = _find(b, *mdia, b"hdlr")
    handler = b[hdlr[0] + 8 : hdlr[0] + 12]
    if handler != b"vide":
        raise ValueError(f"not a video track (handler {handler!r})")
    stbl = _find(b, *_find(b, *mdia, b"minf"), b"stbl")
    stsd = _find(b, *stbl, b"stsd")
    codec = b[stsd[0] + 8 + 4 : stsd[0] + 8 + 8].decode("ascii", "replace")
    if codec != "jpeg":
        raise ValueError(
            f"unsupported sample codec {codec!r}: this repo decodes "
            "motion-JPEG ('jpeg') samples only; refusing to mis-read"
        )
    stts = _find(b, *stbl, b"stts")
    n_stts = struct.unpack_from(">I", b, stts[0] + 4)[0]
    total_ticks, n_samples = 0, 0
    for i in range(n_stts):
        cnt, delta = struct.unpack_from(">II", b, stts[0] + 8 + 8 * i)
        n_samples += cnt
        total_ticks += cnt * delta
    duration_ms = total_ticks * 1000 // media_ts

    stsz = _find(b, *stbl, b"stsz")
    fixed_size, stsz_n = struct.unpack_from(">II", b, stsz[0] + 4)
    if stsz_n != n_samples:
        raise ValueError("stsz/stts sample-count mismatch")
    sizes = (
        [fixed_size] * n_samples
        if fixed_size
        else list(struct.unpack_from(f">{n_samples}I", b, stsz[0] + 12))
    )
    stco = _find(b, *stbl, b"stco")
    n_chunks = struct.unpack_from(">I", b, stco[0] + 4)[0]
    chunk_offsets = list(struct.unpack_from(f">{n_chunks}I", b, stco[0] + 8))
    stsc = _find(b, *stbl, b"stsc")
    n_stsc = struct.unpack_from(">I", b, stsc[0] + 4)[0]
    stsc_rows = [
        struct.unpack_from(">III", b, stsc[0] + 8 + 12 * i)
        for i in range(n_stsc)
    ]
    # run the general stsc expansion: each row applies from its
    # first_chunk until the next row's
    samples: list[tuple[int, int]] = []
    si = 0
    for ri, (first_chunk, per_chunk, _desc) in enumerate(stsc_rows):
        last = (
            stsc_rows[ri + 1][0] - 1 if ri + 1 < n_stsc else n_chunks
        )
        for chunk in range(first_chunk, last + 1):
            off = chunk_offsets[chunk - 1]
            for _ in range(per_chunk):
                if si >= n_samples:
                    break
                samples.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    if si != n_samples:
        raise ValueError("stsc mapping does not cover every sample")
    # cross-check the movie clock agrees with the media clock (±1 tick
    # of rounding — real muxers keep these consistent)
    if abs(movie_dur * 1000 // movie_ts - duration_ms) > 1:
        raise ValueError("mvhd/mdhd duration mismatch")
    return {
        "movie_timescale": movie_ts,
        "duration_ms": duration_ms,
        "width": width,
        "height": height,
        "codec": codec,
        "n_samples": n_samples,
        "samples": samples,
    }


def decode_mp4_frames(b: bytes):
    """Parse + entropy-decode every sample.  Returns (frames
    (n, h, w, 3) uint8, meta dict)."""
    import numpy as np

    from . import jpeg

    meta = parse_mp4(b)
    frames = np.stack(
        [jpeg.decode_jpeg(b[o : o + s]) for o, s in meta["samples"]]
    )
    return frames, meta
