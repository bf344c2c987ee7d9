"""Puffin file format (reader + writer) and the Iceberg v3
``deletion-vector-v1`` blob codec.

Puffin is the Iceberg project's container for table-level statistics
and, since Iceberg format-version 3, for DELETION VECTORS — the
per-data-file roaring bitmaps that replace v2 position-delete parquet
files.  Implemented from the public specs only:

- Puffin file layout (Iceberg "Puffin spec", v1): ``Magic Blob₁ …
  Blobₙ Footer`` where ``Footer = Magic FooterPayload
  FooterPayloadSize Flags Magic``; the payload is UTF-8 JSON
  (``FileMetadata``: ``blobs`` + ``properties``), its size a 4-byte
  little-endian int, and ``Flags`` 4 bytes whose first byte's bit 0
  marks a compressed payload (we always write uncompressed and refuse
  flag bits we do not understand).
- ``deletion-vector-v1`` blob (Iceberg table spec v3, "Deletion
  vectors"): a 4-byte big-endian length of the magic+vector that
  follow, the 4-byte magic ``D1 D3 3D D1``, the vector serialized in
  the 64-bit RoaringBitmapArray "portable" format (the same
  little-endian layout Delta Lake DVs use — [[roaring]] implements
  it), and a 4-byte big-endian CRC-32 of magic+vector.  The framing
  is deliberately byte-compatible with Delta's DV framing so one
  physical file can serve both formats.

Reference parity note: the reference repo (a Databricks notebook +
SQL pipeline) has no table-format layer at all — this module extends
the driver-mandated lakehouse tier (SURVEY §2.4/§6) to the current
Iceberg spec revision.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

from . import roaring

#: Puffin file + footer delimiter magic ("PFA1").
MAGIC = b"PFA1"

#: deletion-vector-v1 payload magic (spec-mandated constant bytes).
DV_MAGIC = b"\xd1\xd3\x3d\xd1"

#: Footer flag bit 0 of byte 0: payload is zstd-compressed (unsupported).
_FLAG_COMPRESSED = 0x01


# --------------------------------------------------------------------------
# deletion-vector-v1 blob codec
# --------------------------------------------------------------------------


def dv_payload(positions) -> bytes:
    """Frame a sorted iterable of row positions as a
    ``deletion-vector-v1`` blob: BE32 length(magic+vector), magic
    ``D1 D3 3D D1``, 64-bit portable roaring bitmap, BE32 CRC-32 of
    magic+vector."""
    vec = roaring.serialize_rbm64(positions)
    body = DV_MAGIC + vec
    return struct.pack(">I", len(body)) + body + struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )


def parse_dv_payload(buf: bytes) -> list[int]:
    """Inverse of :func:`dv_payload`, validating the length prefix,
    magic, and CRC before trusting a single bit of the bitmap."""
    if len(buf) < 12:
        raise ValueError("deletion-vector-v1 blob shorter than its framing")
    (body_len,) = struct.unpack(">I", buf[:4])
    if len(buf) < 4 + body_len + 4:
        raise ValueError(
            f"deletion-vector-v1 blob truncated: framed length {body_len} "
            f"exceeds buffer ({len(buf)} bytes)"
        )
    body = buf[4 : 4 + body_len]
    if body[:4] != DV_MAGIC:
        raise ValueError(
            f"bad deletion-vector magic {body[:4].hex()} "
            f"(want {DV_MAGIC.hex()})"
        )
    (crc,) = struct.unpack(">I", buf[4 + body_len : 8 + body_len])
    actual = zlib.crc32(body) & 0xFFFFFFFF
    if crc != actual:
        raise ValueError(
            f"deletion-vector CRC mismatch: stored {crc:#010x}, "
            f"computed {actual:#010x}"
        )
    return roaring.deserialize_rbm64(body[4:])


# --------------------------------------------------------------------------
# Puffin container
# --------------------------------------------------------------------------


def write_puffin(
    file_path: str,
    blobs: list[dict],
    properties: dict | None = None,
) -> list[dict]:
    """Write a Puffin v1 file.  Each input blob dict carries ``type``
    (e.g. ``deletion-vector-v1``), ``data`` (the raw framed bytes),
    and optionally ``fields`` / ``snapshot-id`` / ``sequence-number``
    / ``properties``.  Returns the BlobMetadata records as written to
    the footer — offset and length filled in — so callers can stamp
    ``content_offset`` / ``content_size_in_bytes`` into manifest
    entries without re-reading the footer."""
    metas: list[dict] = []
    os.makedirs(os.path.dirname(file_path) or ".", exist_ok=True)
    with open(file_path, "wb") as f:
        f.write(MAGIC)
        for b in blobs:
            data = b["data"]
            meta = {
                "type": b["type"],
                "fields": list(b.get("fields") or []),
                "snapshot-id": int(b.get("snapshot-id") or 0),
                "sequence-number": int(b.get("sequence-number") or 0),
                "offset": f.tell(),
                "length": len(data),
            }
            if b.get("properties"):
                meta["properties"] = dict(b["properties"])
            f.write(data)
            metas.append(meta)
        payload = json.dumps(
            {"blobs": metas, "properties": dict(properties or {})},
            separators=(",", ":"),
        ).encode("utf-8")
        f.write(MAGIC)
        f.write(payload)
        f.write(struct.pack("<I", len(payload)))
        f.write(b"\x00\x00\x00\x00")  # flags: uncompressed footer
        f.write(MAGIC)
    return metas


def read_puffin_footer(file_path: str) -> dict:
    """Parse a Puffin file's footer into its FileMetadata dict,
    validating all three magics and refusing unknown flag bits."""
    size = os.path.getsize(file_path)
    if size < 4 + 4 + 4 + 4 + 4:
        raise ValueError(f"{file_path}: too small to be a Puffin file")
    with open(file_path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{file_path}: bad Puffin header magic")
        f.seek(size - 12)
        tail = f.read(12)
        if tail[8:] != MAGIC:
            raise ValueError(f"{file_path}: bad Puffin trailing magic")
        (payload_len,) = struct.unpack("<I", tail[:4])
        flags = tail[4:8]
        if flags[0] & _FLAG_COMPRESSED:
            raise ValueError(
                f"{file_path}: compressed Puffin footer payload — "
                "unsupported (writer always emits uncompressed)"
            )
        if (flags[0] & ~_FLAG_COMPRESSED) or flags[1] or flags[2] or flags[3]:
            raise ValueError(
                f"{file_path}: unknown Puffin footer flag bits "
                f"{flags.hex()} — refusing to mis-read"
            )
        footer_start = size - 12 - payload_len - 4
        if footer_start < 4:
            raise ValueError(f"{file_path}: Puffin footer overruns file")
        f.seek(footer_start)
        if f.read(4) != MAGIC:
            raise ValueError(f"{file_path}: bad Puffin footer-start magic")
        payload = f.read(payload_len)
    meta = json.loads(payload.decode("utf-8"))
    if not isinstance(meta, dict) or "blobs" not in meta:
        raise ValueError(f"{file_path}: Puffin footer lacks a blobs list")
    return meta


def read_blob(file_path: str, offset: int, length: int) -> bytes:
    """Raw bytes of one blob (the framed payload as written)."""
    with open(file_path, "rb") as f:
        f.seek(offset)
        data = f.read(length)
    if len(data) != length:
        raise ValueError(
            f"{file_path}: blob at {offset} truncated "
            f"({len(data)}/{length} bytes)"
        )
    return data


def read_dv(file_path: str, offset: int, length: int) -> list[int]:
    """Positions of one deletion vector stored in a Puffin file."""
    return parse_dv_payload(read_blob(file_path, offset, length))
