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
'jpeg' samples decode through operators/jpeg.  H.264 ('avc1') tracks
get a METADATA parse — the avcC record's profile/level and an exact
SPS-header geometry decode (Exp-Golomb, crop units, no entropy
decode), cross-checked against tkhd — which is what corpus indexers
extract from real MP4s.  Codecs beyond those (hev1/vp09…) refuse
loudly at the stsd gate.

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
    return _mux_mp4(_visual_sample_entry_jpeg(w, h), payloads, w, h)


def _mux_mp4(sample_entry: bytes, payloads: list[bytes], w: int, h: int) -> bytes:
    """Shared muxer body: one video track over the given sample entry
    and sample payloads, 10 fps, progressive ftyp+mdat+moov layout."""
    n = len(payloads)
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
        struct.pack(">I", 1) + sample_entry,
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


# --------------------------------------------------------------------------
# H.264 (avc1) metadata tier: AVCDecoderConfigurationRecord + SPS
# parse — what a corpus indexer extracts from real MP4s (geometry,
# profile/level) WITHOUT entropy-decoding any sample (ISO/IEC 14496-15
# avcC record; ITU-T H.264 §7.3.2.1 SPS syntax, Exp-Golomb coding)
# --------------------------------------------------------------------------


class _BitReader:
    def __init__(self, b: bytes):
        self.b, self.pos = b, 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.b[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("malformed Exp-Golomb code in SPS")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        code = v + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def bytes_aligned(self) -> bytes:
        bits = self.bits + [1]  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for bit in bits[i : i + 8]:
                byte = (byte << 1) | bit
            out.append(byte)
        return bytes(out)


def _ebsp_to_rbsp(b: bytes) -> bytes:
    """Strip emulation-prevention bytes (00 00 03 → 00 00)."""
    out = bytearray()
    i = 0
    while i < len(b):
        if i + 2 < len(b) and b[i] == 0 and b[i + 1] == 0 and b[i + 2] == 3:
            out += b[i : i + 2]
            i += 3
        else:
            out.append(b[i])
            i += 1
    return bytes(out)


def _rbsp_to_ebsp(b: bytes) -> bytes:
    """Insert emulation-prevention bytes (00 00 0x → 00 00 03 0x for
    x ≤ 3)."""
    out = bytearray()
    zeros = 0
    for byte in b:
        if zeros >= 2 and byte <= 3:
            out.append(3)
            zeros = 0
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
    return bytes(out)


_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


def parse_sps(nal: bytes) -> dict:
    """Parse an H.264 sequence parameter set NAL → profile/level and
    EXACT coded geometry (macroblock grid minus frame cropping, crop
    units per chroma format) — no entropy decode, just the header
    syntax a corpus indexer walks."""
    if not nal or (nal[0] & 0x1F) != 7:
        raise ValueError("not an SPS NAL")
    r = _BitReader(_ebsp_to_rbsp(nal[1:]))
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1  # 4:2:0 default for non-high profiles
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            raise ValueError("SPS scaling matrices unsupported")
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pw_mbs = r.ue() + 1
    ph_map = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # crop units (spec table): 4:2:0 → (2, 2·(2−fmo)); 4:2:2 → (2, …);
    # 4:4:4/monochrome → (1, …)
    cux = 2 if chroma_format_idc in (1, 2) else 1
    cuy = (2 if chroma_format_idc == 1 else 1) * (2 - frame_mbs_only)
    width = pw_mbs * 16 - cux * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * ph_map * 16 - cuy * (crop_t + crop_b)
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "width": width,
        "height": height,
        "frame_mbs_only": bool(frame_mbs_only),
    }


def build_sps(width: int, height: int, level_idc: int = 30) -> bytes:
    """Minimal spec-valid Baseline-profile SPS NAL for the given EVEN
    geometry (4:2:0 crop units are 2 luma samples) — the fixture
    generator's half of `parse_sps`."""
    if width % 2 or height % 2:
        raise ValueError("SPS builder needs even dimensions (4:2:0 crop)")
    w = _BitWriter()
    w.u(66, 8)  # profile_idc: Baseline
    w.u(0, 8)  # constraint flags + reserved
    w.u(level_idc, 8)
    w.ue(0)  # seq_parameter_set_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type 2: no extra fields
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    pw_mbs = (width + 15) // 16
    ph_map = (height + 15) // 16
    w.ue(pw_mbs - 1)
    w.ue(ph_map - 1)
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    crop_r = (pw_mbs * 16 - width) // 2
    crop_b = (ph_map * 16 - height) // 2
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present_flag
    return b"\x67" + _rbsp_to_ebsp(w.bytes_aligned())


def build_avcc(sps: bytes, pps: bytes) -> bytes:
    """AVCDecoderConfigurationRecord body (14496-15 §5.3.3.1) for one
    SPS + one PPS, 4-byte NAL lengths."""
    return (
        bytes([1, sps[1], sps[2], sps[3], 0xFC | 3, 0xE0 | 1])
        + struct.pack(">H", len(sps))
        + sps
        + bytes([1])
        + struct.pack(">H", len(pps))
        + pps
    )


def parse_avcc(body: bytes) -> dict:
    """Parse an avcC record → profile/level + the parsed first SPS."""
    if len(body) < 7 or body[0] != 1:
        raise ValueError("malformed avcC record")
    n_sps = body[5] & 0x1F
    if n_sps < 1:
        raise ValueError("avcC with no SPS")
    ln = struct.unpack_from(">H", body, 6)[0]
    sps = body[8 : 8 + ln]
    info = parse_sps(sps)
    return {
        "profile_idc": body[1],
        "level_idc": body[3],
        "nal_length_size": (body[4] & 3) + 1,
        "sps": info,
    }


#: fixed minimal PPS NAL (id 0 → sps 0, CAVLC, no slice groups) — the
#: parser never decodes PPS contents, but the record must carry one
_PPS_MIN = b"\x68\xce\x38\x80"


def _visual_sample_entry_avc1(width: int, height: int, avcc_body: bytes) -> bytes:
    name = b"AVC Coding"
    body = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + bytes([len(name)]) + name + b"\x00" * (31 - len(name))
        + struct.pack(">Hh", 24, -1)
        + _box(b"avcC", avcc_body)
    )
    return _box(b"avc1", body)


def encode_mp4_avc1(width: int, height: int, sample_payloads: list[bytes]) -> bytes:
    """A spec-valid avc1 MP4: real SPS/PPS in the avcC record, real
    sample tables, opaque sample payloads (this repo indexes H.264, it
    does not entropy-encode it) — the fixture shape for the metadata
    tier."""
    avcc = build_avcc(build_sps(width, height), _PPS_MIN)
    return _mux_mp4(
        _visual_sample_entry_avc1(width, height, avcc),
        sample_payloads,
        width,
        height,
    )


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
    entry_lo = stsd[0] + 8  # past version/flags + entry_count
    codec = b[entry_lo + 4 : entry_lo + 8].decode("ascii", "replace")
    h264 = None
    if codec == "avc1":
        # metadata tier: parse the avcC record (profile/level + SPS
        # geometry) — no sample is entropy-decoded.  SPS geometry must
        # agree with the tkhd presentation size (square pixels; real
        # indexers flag the mismatch, we refuse).
        entry_end = struct.unpack_from(">I", b, entry_lo)[0] + entry_lo
        children_lo = entry_lo + 8 + 78  # VisualSampleEntry fixed part
        avcc = None
        for t, blo, bhi in walk_boxes(b, children_lo, entry_end):
            if t == b"avcC":
                avcc = b[blo:bhi]
                break
        if avcc is None:
            raise ValueError("avc1 sample entry without avcC record")
        h264 = parse_avcc(avcc)
    elif codec != "jpeg":
        raise ValueError(
            f"unsupported sample codec {codec!r}: this repo decodes "
            "motion-JPEG ('jpeg') samples and indexes H.264 ('avc1') "
            "metadata only; refusing to mis-read"
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
    out = {
        "movie_timescale": movie_ts,
        "duration_ms": duration_ms,
        "width": width,
        "height": height,
        "codec": codec,
        "n_samples": n_samples,
        "samples": samples,
    }
    if h264 is not None:
        sps = h264["sps"]
        if (sps["width"], sps["height"]) != (width, height):
            raise ValueError(
                f"SPS coded geometry {sps['width']}x{sps['height']} "
                f"disagrees with tkhd {width}x{height}"
            )
        out["profile_idc"] = h264["profile_idc"]
        out["level_idc"] = h264["level_idc"]
        out["nal_length_size"] = h264["nal_length_size"]
    return out


def decode_mp4_frames(b: bytes):
    """Parse + entropy-decode every sample.  Returns (frames
    (n, h, w, 3) uint8, meta dict)."""
    import numpy as np

    from . import jpeg

    meta = parse_mp4(b)
    if meta["codec"] != "jpeg":
        raise ValueError(
            f"cannot entropy-decode {meta['codec']!r} samples — "
            "metadata-only codec (use parse_mp4)"
        )
    frames = np.stack(
        [jpeg.decode_jpeg(b[o : o + s]) for o, s in meta["samples"]]
    )
    return frames, meta
