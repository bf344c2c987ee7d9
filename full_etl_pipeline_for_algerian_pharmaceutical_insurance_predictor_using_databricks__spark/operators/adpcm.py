"""IMA ADPCM audio codec (DVI4 / WAV format tag 0x0011) — a REAL
lossy-compressed audio format, implemented from the public spec (the
IMA Digital Audio Pack Compendium; the WAV block layout from the
Microsoft multimedia registration of wFormatTag 0x0011) with no
dependencies.  4 bits per sample (~4:1 over 16-bit PCM) via an
adaptive step-size predictor.

Encoder and decoder speak the canonical mono IMA-WAV block layout:
each block opens with a 4-byte state header (int16 predictor sample,
uint8 step index, reserved zero byte) followed by packed nibbles,
LOW nibble first — the order every real decoder (ffmpeg, libsndfile,
Windows ACM) expects.  The fmt chunk carries the 0x0011 tag, cbSize=2
and wSamplesPerBlock; a `fact` chunk records the true sample count
(required for compressed WAV by the RIFF spec).

Reference parity note: the reference repo has no audio tier; this
module exists for the driver's multimodal extension surface
(compressed codecs for the columns a 100-TB corpus actually carries).
"""

from __future__ import annotations

import struct

#: IMA step-size table (89 entries) and index-adjust table — spec
#: constants, identical in every implementation.
STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]

#: Default mono block: 4-byte header + 32 data bytes → 1 header
#: sample + 64 nibble samples = 65 samples per 36-byte block.
BLOCK_ALIGN = 36
SAMPLES_PER_BLOCK = (BLOCK_ALIGN - 4) * 2 + 1


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _encode_nibble(sample: int, state: list) -> int:
    """Quantize one sample against (predictor, index) state; mutates
    the state exactly as the decoder will reconstruct it (the codec's
    closed feedback loop — encoder and decoder track the same
    predictor, so error never accumulates)."""
    pred, index = state
    step = STEP_TABLE[index]
    diff = sample - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    delta = step >> 3
    if diff >= step:
        nib |= 4
        diff -= step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nib |= 1
        diff -= step >> 2
    delta += (step if nib & 4 else 0) + ((step >> 1) if nib & 2 else 0) + (
        (step >> 2) if nib & 1 else 0
    )
    pred = _clamp16(pred - delta if nib & 8 else pred + delta)
    index = min(88, max(0, index + INDEX_TABLE[nib & 7]))
    state[0], state[1] = pred, index
    return nib


def _decode_nibble(nib: int, state: list) -> int:
    pred, index = state
    step = STEP_TABLE[index]
    delta = step >> 3
    if nib & 4:
        delta += step
    if nib & 2:
        delta += step >> 1
    if nib & 1:
        delta += step >> 2
    pred = _clamp16(pred - delta if nib & 8 else pred + delta)
    index = min(88, max(0, index + INDEX_TABLE[nib & 7]))
    state[0], state[1] = pred, index
    return pred


def encode_blocks(samples) -> bytes:
    """int16 iterable → concatenated IMA-WAV blocks.  Block 1's header
    carries sample 0 verbatim (the spec's seeding rule); every later
    block re-seeds from the running predictor state, so blocks decode
    independently given only their own header."""
    out = bytearray()
    n = len(samples)
    state = [0, 0]
    i = 0
    while i < n:
        state[0] = int(samples[i])
        # spec-legal encoder freedom: the block header CARRIES the step
        # index, so seed it near the block's mean sample-to-sample
        # delta instead of 0 — kills the adaptation transient that
        # otherwise dominates short buffers (decoders just read it)
        tail = [int(samples[j]) for j in range(i, min(i + 16, n))]
        if len(tail) > 1:
            mean_d = sum(
                abs(b - a) for a, b in zip(tail, tail[1:])
            ) / (len(tail) - 1)
            state[1] = min(
                range(len(STEP_TABLE)),
                key=lambda k: abs(STEP_TABLE[k] - mean_d),
            )
        out += struct.pack("<hBx", state[0], state[1])
        i += 1
        nibs = bytearray()
        lo = None
        for _ in range(SAMPLES_PER_BLOCK - 1):
            s = int(samples[i]) if i < n else state[0]  # pad: hold last
            i += 1 if i < n else 0
            nib = _encode_nibble(s, state)
            if lo is None:
                lo = nib
            else:
                nibs.append(lo | (nib << 4))  # LOW nibble first
                lo = None
            if i >= n and lo is None and len(nibs) == (BLOCK_ALIGN - 4):
                break
        if lo is not None:
            nibs.append(lo)
        nibs += b"\x00" * (BLOCK_ALIGN - 4 - len(nibs))
        out += nibs
        if i >= n:
            break
    return bytes(out)


def decode_blocks(data: bytes, n_samples: int) -> list[int]:
    """Concatenated IMA-WAV blocks → first `n_samples` int16 values."""
    out: list[int] = []
    pos = 0
    while pos + 4 <= len(data) and len(out) < n_samples:
        pred, index = struct.unpack_from("<hBx", data, pos)
        if not 0 <= index <= 88:
            raise ValueError(f"IMA block header index {index} out of range")
        pos += 4
        state = [pred, index]
        out.append(pred)
        for _ in range((BLOCK_ALIGN - 4)):
            if pos >= len(data) or len(out) >= n_samples:
                break
            byte = data[pos]
            pos += 1
            out.append(_decode_nibble(byte & 0x0F, state))  # LOW first
            if len(out) < n_samples:
                out.append(_decode_nibble(byte >> 4, state))
        pos = ((pos + BLOCK_ALIGN - 1) // BLOCK_ALIGN) * BLOCK_ALIGN
    if len(out) < n_samples:
        raise ValueError(
            f"IMA stream ended at {len(out)} of {n_samples} samples"
        )
    return out[:n_samples]


def encode_ima_wav(samples, sample_rate: int = 8000) -> bytes:
    """mono int16 array → a real IMA-ADPCM WAV file (wFormatTag
    0x0011, cbSize=2 + wSamplesPerBlock, `fact` chunk with the true
    frame count — the compressed-WAV requirements)."""
    n = len(samples)
    data = encode_blocks(samples)
    avg_bps = sample_rate * BLOCK_ALIGN // SAMPLES_PER_BLOCK
    fmt = struct.pack(
        "<HHIIHHHH",
        0x0011, 1, sample_rate, avg_bps, BLOCK_ALIGN, 4, 2, SAMPLES_PER_BLOCK,
    )
    fact = struct.pack("<I", n)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" * (len(body) & 1)
        )

    body = b"WAVE" + chunk(b"fmt ", fmt) + chunk(b"fact", fact) + chunk(
        b"data", data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_ima_wav(b: bytes):
    """IMA-ADPCM WAV bytes → (list of int16 samples, sample_rate).
    Walks RIFF chunks by size (unknown chunks skipped), validates the
    0x0011 format tag, takes the true count from `fact`."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE magic")
    pos = 12
    fmt = fact_n = data = None
    while pos + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, pos)
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            # base 16-byte header first — a plain-PCM fmt has no
            # cbSize/wSamplesPerBlock extension and must refuse on the
            # TAG, not crash on length
            base = struct.unpack_from("<HHIIHH", body, 0)
            ext = (
                struct.unpack_from("<HH", body, 16)
                if len(body) >= 20
                else (0, 0)
            )
            fmt = base + ext
        elif cid == b"fact":
            (fact_n,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt /data chunks")
    tag, channels, rate, _bps, align, bits, _cb, spb = fmt
    if tag != 0x0011 or channels != 1 or bits != 4:
        raise ValueError(
            f"not mono IMA-ADPCM: tag={tag:#06x} ch={channels} bits={bits}"
        )
    if align != BLOCK_ALIGN or spb != SAMPLES_PER_BLOCK:
        raise ValueError(
            f"unsupported IMA block geometry: align={align} spb={spb}"
        )
    if fact_n is None:
        fact_n = (len(data) // align) * spb
    return decode_blocks(data, fact_n), rate
