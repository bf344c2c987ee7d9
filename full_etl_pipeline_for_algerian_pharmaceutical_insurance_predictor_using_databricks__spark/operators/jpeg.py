"""Baseline-sequential JPEG (ITU T.81) encode/decode in pure numpy —
the LOSSY compressed member of the multimodal codec family (BMP/WAV/
AVI are uncompressed containers, PNG is lossless DEFLATE; real image
corpora are overwhelmingly JPEG).

Spec-complete for the baseline 8-bit 4:4:4 path:

- encode: RGB → JFIF YCbCr, level shift, 8×8 orthonormal DCT-II
  (matrix form — no scipy), Annex-K quantization tables scaled by the
  libjpeg quality formula, zigzag + DC-differential + run-length
  Huffman entropy coding with 0xFF byte stuffing, markers
  SOI/APP0/DQT/SOF0/DHT/SOS/EOI.  The Huffman tables are VALID
  canonical tables generated here (flat-length: all DC symbols 4 bits,
  all AC symbols 9 bits) and written into the stream's DHT segments —
  the spec lets an encoder ship any decodable table, so nothing is
  transcribed from Annex K's 162-entry listings; any standard decoder
  reads these files.
- decode: full marker walk (APPn/COM skipped, multi-table DQT/DHT
  segments, 16-bit quant entries), canonical Huffman table
  construction from BITS/HUFFVAL (so streams from OTHER encoders with
  Annex-K tables decode identically), entropy decode with byte
  unstuffing, dequantize, IDCT, YCbCr → RGB, crop the block padding.
  Progressive scans, subsampled chroma (4:2:0), restart intervals, and
  12-bit precision raise loudly instead of mis-decoding.

Tables generated, not transcribed: the zigzag order is derived from
the anti-diagonal walk and the Huffman codes from canonical BITS
assignment — fewer copied constants, same bytes on the wire.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constant tables (generated where possible) ---------------------------

#: Annex-K luminance/chrominance quantization tables (the two 8×8
#: matrices every JPEG encoder ships; values are part of the format).
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag index order, derived from the anti-diagonal
    walk (even diagonals run bottom-left→top-right)."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag = diag[::-1]
        order.extend(diag)
    return np.array([i * 8 + j for i, j in order], dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: forward = T @ B @ T.T."""
    T = np.zeros((8, 8))
    for i in range(8):
        c = np.sqrt(0.125) if i == 0 else 0.5
        for j in range(8):
            T[i, j] = c * np.cos((2 * j + 1) * i * np.pi / 16)
    return T


DCT_T = _dct_matrix()


def _flat_huffman(symbols: list[int], length: int):
    """A valid canonical Huffman table with every symbol at the same
    code length (requires len(symbols) < 2**length so the all-ones
    code stays unused, per the JPEG convention).  Returns
    (BITS[1..16], HUFFVAL, {symbol: (code, length)})."""
    assert len(symbols) < (1 << length)
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    codes = {s: (i, length) for i, s in enumerate(symbols)}
    return bits, list(symbols), codes


_DC_SYMBOLS = list(range(12))  # magnitude categories 0..11
_AC_SYMBOLS = (
    [0x00, 0xF0]  # EOB, ZRL
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
DC_BITS, DC_VALS, _DC_CODES = _flat_huffman(_DC_SYMBOLS, 4)
AC_BITS, AC_VALS, _AC_CODES = _flat_huffman(_AC_SYMBOLS, 9)


# --- bit-level I/O with 0xFF stuffing -------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding, per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # unstuff
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


class _ScanReader:
    """Bulk bit reader for the entropy-coded scan: the whole segment is
    unstuffed ONCE (0xFF00 → 0xFF, stopping at the first real marker),
    then bits come out of a plain integer accumulator refilled a byte
    at a time — no per-bit Python loop, which profiling put at ~60% of
    decode_jpeg's wall (1.49 M read_bit calls per 100 frames).  Bit
    semantics are identical to _BitReader's: the same consumed bit
    positions, and reading past the scan's real data raises the same
    unexpected-marker / IndexError the lazy reader raised when it
    pulled that byte."""

    __slots__ = ("data", "nbytes", "pos", "acc", "nbits", "term")

    def __init__(self, raw: bytes):
        out = bytearray()
        pos = 0
        n = len(raw)
        self.term: int | None = None  # marker byte that ends the scan
        while True:
            j = raw.find(b"\xff", pos)
            if j == -1:
                out += raw[pos:]
                break
            out += raw[pos:j]
            if j + 1 >= n:
                break  # trailing 0xFF with no byte after: data ends
            nxt = raw[j + 1]
            if nxt == 0x00:
                out.append(0xFF)
                pos = j + 2
            else:
                self.term = nxt
                break
        self.data = bytes(out)
        self.nbytes = len(out)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _exhausted(self):
        if self.term is not None:
            raise ValueError(
                f"unexpected marker 0xFF{self.term:02X} in scan"
            )
        raise IndexError("scan data exhausted")

    def peek(self, n: int) -> int:
        """The next `n` bits MSB-first, virtually 1-padded past the end
        of data (the spec's padding convention) — padding bits resolve
        prefix lookups but are never consumable."""
        while self.nbits < n and self.pos < self.nbytes:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        if self.nbits >= n:
            return (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        pad = n - self.nbits
        return (self.acc << pad) | ((1 << pad) - 1)

    def consume(self, n: int) -> None:
        if n > self.nbits:
            self._exhausted()
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n and self.pos < self.nbytes:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        if n > self.nbits:
            self._exhausted()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, raw bits) for a DC diff / AC coefficient —
    negatives encode as the one's complement of |v|."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of _magnitude."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --- tables on the wire ----------------------------------------------------


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(x) for x in table.flatten()[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality scaling of a base table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# --- encode ---------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0].astype(np.float64), img[..., 1].astype(np.float64), img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JPEG bytes (4:4:4)."""
    h, w = img.shape[:2]
    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    ycc = _rgb_to_ycbcr(img) - 128.0
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.zeros((bh * 8, bw * 8, 3))
    padded[:h, :w] = ycc
    if h < bh * 8:
        padded[h:, :w] = ycc[h - 1 : h, :]  # edge replicate
    if w < bw * 8:
        padded[:, w:] = padded[:, w - 1 : w]

    # DCT + quantize + zigzag BATCHED over every block of each
    # component (identical per-element arithmetic and one gemm per 8×8
    # block either way — byte-identity pinned in tests/test_llm_ops.py
    # golden hashes); the entropy pass below then runs over plain
    # Python ints with one fused bit-write per symbol
    blocks = (
        padded.reshape(bh, 8, bw, 8, 3)
        .transpose(4, 0, 2, 1, 3)
        .reshape(3, bh * bw, 8, 8)
    )
    coefs = DCT_T @ blocks @ DCT_T.T
    zz_comp = []
    for comp in range(3):
        q = qy if comp == 0 else qc
        quant = np.round(coefs[comp] / q).astype(np.int64)
        zz_comp.append(quant.reshape(-1, 64)[:, ZIGZAG].tolist())
    writer = _BitWriter()
    write = writer.write
    prev_dc = [0, 0, 0]
    zrl_code, zrl_len = _AC_CODES[0xF0]
    eob_code, eob_len = _AC_CODES[0x00]
    for bi in range(bh * bw):
        for comp in range(3):
            zz = zz_comp[comp][bi]
            # DC differential
            dc = zz[0]
            diff = dc - prev_dc[comp]
            prev_dc[comp] = dc
            size, bits = _magnitude(diff)
            code, length = _DC_CODES[size]
            # writing (code then raw bits) as ONE fused write emits the
            # identical bit sequence with half the accumulator spins
            write((code << size) | bits, length + size)
            # AC run-length
            run = 0
            last_nz = 0
            for i in range(63, 0, -1):
                if zz[i]:
                    last_nz = i
                    break
            for i in range(1, last_nz + 1):
                v = zz[i]
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    write(zrl_code, zrl_len)  # ZRL
                    run -= 16
                size, bits = _magnitude(v)
                c, ln = _AC_CODES[(run << 4) | size]
                write((c << size) | bits, ln + size)
                run = 0
            if last_nz < 63:
                write(eob_code, eob_len)  # EOB
    scan = writer.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += _dqt_segment(0, qy)
    out += _dqt_segment(1, qc)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # 1×1 sampling: 4:4:4
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_BITS, DC_VALS)
    out += _dht_segment(1, 0, AC_BITS, AC_VALS)
    out += _dht_segment(0, 1, DC_BITS, DC_VALS)
    out += _dht_segment(1, 1, AC_BITS, AC_VALS)
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decode ---------------------------------------------------------------


class _HuffTable:
    """Canonical Huffman decode table built from BITS/HUFFVAL exactly
    as the spec's Generate_size/code_table flowcharts prescribe — this
    is what lets streams from OTHER encoders (Annex-K tables) decode."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        # prefix-resolved fast table, sized to the table's REAL maximum
        # code length (16 entries for the flat DC table, 512 for AC —
        # never a blanket 2^16): one peek + one list index per symbol
        # replaces the per-bit walk.  The prefix property guarantees a
        # padded peek resolves to the same symbol the bitwise walk
        # found.
        self.maxlen = max(
            (ln for ln in range(1, 17) if bits[ln - 1]), default=1
        )
        size = 1 << self.maxlen
        self.fast: list[tuple[int, int] | None] = [None] * size
        for (length, code), val in self.lookup.items():
            span = 1 << (self.maxlen - length)
            base = code << (self.maxlen - length)
            self.fast[base : base + span] = [(val, length)] * span

    def decode(self, reader: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if (length, code) in self.lookup:
                return self.lookup[(length, code)]
        raise ValueError("invalid Huffman code in scan")

    def decode_fast(self, reader: _ScanReader) -> int:
        hit = self.fast[reader.peek(self.maxlen)]
        if hit is None:
            raise ValueError("invalid Huffman code in scan")
        reader.consume(hit[1])
        return hit[0]


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB.  Raises on
    progressive scans, chroma subsampling, restart intervals, or
    unsupported precision — never mis-decodes."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan_comps: list[tuple[int, int, int]] = []
    scan_start = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", b, pos + 2)
        body = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    vals = np.frombuffer(body, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:  # 16-bit entries (legal; rare)
                    vals = np.frombuffer(body, ">u2", 64, i).astype(np.int32)
                    i += 128
                table = np.zeros(64, dtype=np.int32)
                table[ZIGZAG] = vals
                quant[tq] = table.reshape(8, 8)
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            comps = []
            for c in range(nc):
                cid, sampling, tq = body[6 + 3 * c : 9 + 3 * c]
                if sampling != 0x11:
                    raise ValueError(
                        "unsupported chroma subsampling (only 4:4:4)"
                    )
                comps.append((cid, tq))
            frame = (h, w, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) not supported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cid, tabs >> 4, tabs & 0xF))
            scan_start = pos + 2 + seglen
            break
        # APPn / COM / anything else: skipped
        pos += 2 + seglen
    if frame is None or scan_start is None:
        raise ValueError("JPEG missing SOF0 or SOS")
    h, w, nc = frame
    if nc not in (1, 3):
        raise ValueError(f"unsupported component count {nc}")
    qt_of = dict(comps)
    reader = _ScanReader(b[scan_start:])
    bh, bw = (h + 7) // 8, (w + 7) // 8
    nblocks = bh * bw
    # pass 1 — entropy decode (sequential by construction: DC is
    # differential), collecting zigzag coefficients per (block, comp);
    # table-driven Huffman lookups over the bulk unstuffed reader
    tabs = [
        (huff[(0, dc_id)], huff[(1, ac_id)])
        for (_cid, dc_id, ac_id) in scan_comps
    ]
    prev_dc = [0] * nc
    coeff_rows: list[list[int]] = []
    for _bi in range(nblocks):
        for ci, (dc_tab, ac_tab) in enumerate(tabs):
            zz = [0] * 64
            size = dc_tab.decode_fast(reader)
            diff = _extend(reader.read_bits(size), size)
            prev_dc[ci] += diff
            zz[0] = prev_dc[ci]
            k = 1
            while k < 64:
                rs = ac_tab.decode_fast(reader)
                if rs == 0x00:  # EOB
                    break
                run, size = rs >> 4, rs & 0xF
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC run past block end")
                zz[k] = _extend(reader.read_bits(size), size)
                k += 1
            coeff_rows.append(zz)
    # pass 2 — dequantize + IDCT, batched over all blocks of a
    # component (identical per-element arithmetic; the 8×8 matmuls run
    # one gemm per block either way — byte-identity pinned in
    # tests/test_llm_ops.py golden hashes)
    arr = np.array(coeff_rows, dtype=np.int64).reshape(
        nblocks, len(scan_comps), 64
    )
    planes = np.zeros((nc, bh * 8, bw * 8))
    for ci, (cid, _dc_id, _ac_id) in enumerate(scan_comps):
        q = quant[qt_of[cid]]
        coef = np.zeros((nblocks, 64))
        coef[:, ZIGZAG] = arr[:, ci, :]  # un-zigzag
        blocks = coef.reshape(nblocks, 8, 8) * q
        pixels = DCT_T.T @ blocks @ DCT_T + 128.0
        planes[ci] = (
            pixels.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
    if nc == 1:
        gray = np.clip(planes[0][:h, :w], 0, 255).astype(np.uint8)
        return np.stack([gray] * 3, axis=-1)
    ycc = np.stack([planes[0], planes[1], planes[2]], axis=-1)
    return _ycbcr_to_rgb(ycc)[:h, :w]
