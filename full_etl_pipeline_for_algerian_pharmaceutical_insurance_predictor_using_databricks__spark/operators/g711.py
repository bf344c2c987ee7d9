"""ITU-T G.711 companding codecs (mu-law / A-law) — the telephony
audio formats (WAV wFormatTag 0x0007 / 0x0006, RTP PCMU/PCMA), 8 bits
per sample, exactly 2:1 over 16-bit PCM, implemented from the public
spec (ITU-T Recommendation G.711 segment/chord tables) with no
dependencies.

Both directions are pure elementwise table math, so encode and decode
are fully numpy-vectorized (searchsorted over the eight segment
boundaries) — no per-sample Python loop, unlike the sequential ADPCM
predictor next door.  The classic self-consistency law holds and is
pinned in tests: for every one of the 256 code bytes,
``encode(decode(code)) == code`` (modulo the codec's two encodings of
zero — mu-law 0x7F/0xFF, A-law 0x55/0xD5 — where the encoder always
emits the positive form).

The WAV container speaks the canonical compressed-WAV layout: fmt
chunk with the 0x0007/0x0006 tag, 8 bits per sample, cbSize=0, plus a
`fact` chunk carrying the true sample count (required for non-PCM WAV
by the RIFF spec).

Reference parity note: the reference repo has no audio tier; this
module exists for the driver's multimodal extension surface
(compressed codecs for the columns a 100-TB corpus actually carries).
"""

from __future__ import annotations

import struct

import numpy as np

MULAW_BIAS = 0x84  # 132 — the spec's encoder bias
MULAW_CLIP = 32635  # max magnitude that survives the bias without overflow
ALAW_AMI_MASK = 0x55  # alternate-mark-inversion mask (even bits toggled)

#: WAV format tags (Microsoft multimedia registration)
WAV_TAG_ALAW = 0x0006
WAV_TAG_MULAW = 0x0007

#: segment upper bounds for the mu-law 8-chord fit of the biased value
#: (A-law uses a 13-bit table inline in encode_alaw — its chord 0 is
#: linear, one octave lower)
_MULAW_SEG_ENDS = np.array(
    [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF], dtype=np.int64
)


def encode_mulaw(samples) -> np.ndarray:
    """int16 PCM → mu-law bytes (uint8), vectorized."""
    x = np.asarray(samples, dtype=np.int64)
    neg = x < 0
    mag = np.where(neg, -x, x)
    mag = np.minimum(mag, MULAW_CLIP) + MULAW_BIAS
    exponent = np.searchsorted(_MULAW_SEG_ENDS, mag)  # 0..7
    mantissa = (mag >> (exponent + 3)) & 0x0F
    byte = (np.where(neg, 0x80, 0) | (exponent << 4) | mantissa) ^ 0xFF
    return byte.astype(np.uint8)


def decode_mulaw(codes) -> np.ndarray:
    """mu-law bytes → int16 PCM, vectorized."""
    b = np.asarray(codes, dtype=np.uint8).astype(np.int64) ^ 0xFF
    neg = (b & 0x80) != 0
    exponent = (b >> 4) & 0x07
    mantissa = b & 0x0F
    mag = (((mantissa << 3) + MULAW_BIAS) << exponent) - MULAW_BIAS
    return np.where(neg, -mag, mag).astype(np.int16)


def encode_alaw(samples) -> np.ndarray:
    """int16 PCM → A-law bytes (uint8), vectorized."""
    x = np.asarray(samples, dtype=np.int64)
    neg = x < 0
    # A-law is defined on the 13-bit magnitude: drop the 3 LSBs first
    mag = np.where(neg, -x - 1, x) >> 3  # 0..4095 in 13-bit terms? no: 0..4095<<?
    mag = np.minimum(mag, 0x0FFF)
    # segment = position of the MSB above bit 4 (13-bit domain);
    # chord 0 covers 0..31 where the code is simply mag >> 1
    exponent = np.searchsorted(
        np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF], dtype=np.int64), mag
    )  # 0..7
    mantissa = np.where(
        exponent == 0, mag >> 1, (mag >> exponent) & 0x0F
    )
    byte = (np.where(neg, 0, 0x80) | (exponent << 4) | mantissa) ^ ALAW_AMI_MASK
    return byte.astype(np.uint8)


def decode_alaw(codes) -> np.ndarray:
    """A-law bytes → int16 PCM, vectorized."""
    b = np.asarray(codes, dtype=np.uint8).astype(np.int64) ^ ALAW_AMI_MASK
    pos = (b & 0x80) != 0
    exponent = (b >> 4) & 0x07
    mantissa = b & 0x0F
    # chord 0: quantization step 2 at offset 1 (13-bit domain)
    mag13 = np.where(
        exponent == 0,
        (mantissa << 1) + 1,
        ((mantissa << 1) + 0x21) << (exponent - 1),
    )
    mag = mag13 << 3  # back to the 16-bit domain
    return np.where(pos, mag, -mag).astype(np.int16)


def encode_g711_wav(samples, law: str = "mulaw", sample_rate: int = 8000) -> bytes:
    """Mono 16-bit PCM → a complete G.711 WAV file (fmt + fact + data)."""
    if law == "mulaw":
        payload = encode_mulaw(samples).tobytes()
        tag = WAV_TAG_MULAW
    elif law == "alaw":
        payload = encode_alaw(samples).tobytes()
        tag = WAV_TAG_ALAW
    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown G.711 law {law!r}")
    n = len(payload)
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate, sample_rate, 1, 8)
    fact = struct.pack("<I", n)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", n) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_g711_wav(b: bytes):
    """G.711 WAV bytes → (int16 samples, sample_rate).  Dispatches on
    the fmt tag; refuses anything that is not mono 8-bit G.711."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, tag, rate, payload, n_fact = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, channels, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
            if channels != 1 or bits != 8:
                raise ValueError("only mono 8-bit G.711 WAV supported")
        elif cid == b"fact":
            n_fact = struct.unpack_from("<I", body)[0]
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if tag is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    if n_fact is not None:
        payload = payload[:n_fact]
    codes = np.frombuffer(payload, dtype=np.uint8)
    if tag == WAV_TAG_MULAW:
        return decode_mulaw(codes), rate
    if tag == WAV_TAG_ALAW:
        return decode_alaw(codes), rate
    raise ValueError(f"not a G.711 WAV (fmt tag 0x{tag:04x})")
