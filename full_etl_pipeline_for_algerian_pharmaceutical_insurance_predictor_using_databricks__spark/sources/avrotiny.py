"""Minimal Apache Avro 1.11 binary codec — just enough of the PUBLIC
Avro spec (container file + binary encoding) to read and write Iceberg
manifest / manifest-list files, with no third-party Avro dependency
(neither `avro` nor `fastavro` is installable in this sandbox).

Implements, per the Avro specification:
- binary encoding for null / boolean / int / long (zigzag varint),
  float / double (IEEE LE), bytes / string (length-prefixed), fixed,
  enum (index), record (field order), array / map (blocked, including
  the negative-count + byte-size block variant foreign writers emit),
  and unions (branch-index prefix);
- named-type references (Iceberg's manifests reference the ``r2`` /
  ``r102`` record names) and schema attributes we must preserve but
  not interpret (``field-id``, logical types, defaults);
- the object container file: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` / ``avro.codec``), 16-byte sync marker, data blocks,
  with ``null`` and ``deflate`` (raw DEFLATE, per spec) codecs both
  directions.

Reading uses the WRITER's schema embedded in the container (Avro's
rule); callers map fields by name / field-id afterwards, which is how
Iceberg consumes manifests written by other engines.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"
_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}


# --------------------------------------------------------------------------
# Schema handling
# --------------------------------------------------------------------------


def _resolve(schema, names: dict):
    """Normalize a schema node: resolve named-type string references,
    register record/enum/fixed names for later reference."""
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        if schema in names:
            return names[schema]
        raise ValueError(f"unknown Avro type reference {schema!r}")
    if isinstance(schema, list):  # union
        return [_resolve(s, names) for s in schema]
    t = schema.get("type")
    if t in ("record", "enum", "fixed"):
        # register under both short and fully-qualified names, per spec
        nm = schema.get("name")
        if nm:
            names[nm] = schema
            ns = schema.get("namespace")
            if ns:
                names[f"{ns}.{nm}"] = schema
    if t == "record":
        for f in schema["fields"]:
            f["type"] = _resolve(f["type"], names)
    elif t == "array":
        schema["items"] = _resolve(schema["items"], names)
    elif t == "map":
        schema["values"] = _resolve(schema["values"], names)
    elif isinstance(t, (dict, list)):
        # {"type": {...nested...}} wrapper form
        return _resolve(t, names)
    return schema


def parse_schema(schema_json: str | dict):
    schema = (
        json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    )
    return _resolve(schema, {})


def _type_of(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


# --------------------------------------------------------------------------
# Binary encoding
# --------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated Avro varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _union_branch(schema: list, value) -> int:
    """Pick the union branch for a python value. Handles the dominant
    Iceberg pattern ["null", X]; falls back to first type-compatible."""
    for i, s in enumerate(schema):
        t = _type_of(s)
        if value is None and t == "null":
            return i
        if value is not None and t != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {schema!r}")


def _dec_unscaled(value, scale: int) -> int:
    """Unscaled int of a decimal value at the schema's scale."""
    import decimal

    return int(decimal.Decimal(value).scaleb(scale))


def _dec_from_unscaled(unscaled: int, scale: int):
    import decimal

    return decimal.Decimal(unscaled).scaleb(-scale)


def min_signed_bytes(n: int) -> bytes:
    """Minimal big-endian two's-complement encoding of an int — the
    Avro/Iceberg `decimal` bytes form."""
    length = ((n + 1 if n < 0 else n).bit_length() // 8) + 1
    return n.to_bytes(length, "big", signed=True)


def _is_decimal(schema) -> bool:
    return (
        isinstance(schema, dict)
        and schema.get("logicalType") == "decimal"
    )


def _is_uuid_fixed(schema) -> bool:
    """fixed(16) annotated `uuid` — Iceberg's uuid partition-value
    form; decoded to/from the canonical lowercase string the way
    decimal logicals decode to Decimal."""
    return (
        isinstance(schema, dict)
        and schema.get("logicalType") == "uuid"
        and schema.get("size") == 16
    )


def write_datum(buf: io.BytesIO, schema, value) -> None:
    t = _type_of(schema)
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        if _is_decimal(schema) and not isinstance(
            value, (bytes, bytearray)
        ):
            raw = min_signed_bytes(
                _dec_unscaled(value, int(schema.get("scale") or 0))
            )
        else:
            raw = bytes(value)
        _write_long(buf, len(raw))
        buf.write(raw)
    elif t == "string":
        raw = value.encode("utf-8")
        _write_long(buf, len(raw))
        buf.write(raw)
    elif t == "fixed":
        if _is_decimal(schema) and not isinstance(
            value, (bytes, bytearray)
        ):
            # decimal logical type: sign-extend the unscaled value's
            # two's complement to the fixed size (the Avro spec form)
            raw = _dec_unscaled(
                value, int(schema.get("scale") or 0)
            ).to_bytes(schema["size"], "big", signed=True)
        elif _is_uuid_fixed(schema) and isinstance(value, str):
            import uuid as _uuid

            raw = _uuid.UUID(value).bytes
        else:
            raw = bytes(value)
        if len(raw) != schema["size"]:
            raise ValueError("fixed size mismatch")
        buf.write(raw)
    elif t == "enum":
        _write_long(buf, schema["symbols"].index(value))
    elif t == "union":
        idx = _union_branch(schema, value)
        _write_long(buf, idx)
        write_datum(buf, schema[idx], value)
    elif t == "array":
        items = list(value or [])
        if items:
            _write_long(buf, len(items))
            for it in items:
                write_datum(buf, schema["items"], it)
        _write_long(buf, 0)
    elif t == "map":
        entries = dict(value or {})
        if entries:
            _write_long(buf, len(entries))
            for k, v in entries.items():
                write_datum(buf, "string", str(k))
                write_datum(buf, schema["values"], v)
        _write_long(buf, 0)
    elif t == "record":
        rec = value or {}
        for f in schema["fields"]:
            if f["name"] not in rec and "default" not in f:
                # unions with a null branch default to null, per common
                # writer practice
                if _type_of(f["type"]) == "union" and any(
                    _type_of(s) == "null" for s in f["type"]
                ):
                    write_datum(buf, f["type"], None)
                    continue
                raise ValueError(f"missing record field {f['name']!r}")
            write_datum(buf, f["type"], rec.get(f["name"], f.get("default")))
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def read_datum(buf, schema):
    t = _type_of(schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        raw = buf.read(_read_long(buf))
        if _is_decimal(schema):
            return _dec_from_unscaled(
                int.from_bytes(raw, "big", signed=True),
                int(schema.get("scale") or 0),
            )
        return raw
    if t == "string":
        return buf.read(_read_long(buf)).decode("utf-8")
    if t == "fixed":
        raw = buf.read(schema["size"])
        if _is_decimal(schema):
            return _dec_from_unscaled(
                int.from_bytes(raw, "big", signed=True),
                int(schema.get("scale") or 0),
            )
        if _is_uuid_fixed(schema):
            import uuid as _uuid

            return str(_uuid.UUID(bytes=raw))
        return raw
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "union":
        return read_datum(buf, schema[_read_long(buf)])
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # negative count: byte size follows (skippable form)
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(read_datum(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = read_datum(buf, "string")
                out[k] = read_datum(buf, schema["values"])
    if t == "record":
        return {
            f["name"]: read_datum(buf, f["type"]) for f in schema["fields"]
        }
    raise ValueError(f"unsupported Avro type {t!r}")


# --------------------------------------------------------------------------
# Object container files
# --------------------------------------------------------------------------


def write_container(
    path: str,
    schema: str | dict,
    records: list,
    metadata: dict[str, str] | None = None,
    codec: str = "deflate",
    sync: bytes | None = None,
) -> None:
    """Write an Avro object container file (single data block — our
    manifests are small; foreign multi-block files still read fine)."""
    parsed = parse_schema(json.dumps(schema) if isinstance(schema, dict) else schema)
    schema_json = (
        json.dumps(schema) if isinstance(schema, dict) else schema
    )
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = sync or os.urandom(16)
    body = io.BytesIO()
    for rec in records:
        write_datum(body, parsed, rec)
    payload = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    for k, v in (metadata or {}).items():
        meta[k] = v.encode() if isinstance(v, str) else bytes(v)
    buf = io.BytesIO()
    buf.write(_MAGIC)
    _write_long(buf, len(meta))
    for k, v in meta.items():
        write_datum(buf, "string", k)
        write_datum(buf, "bytes", v)
    _write_long(buf, 0)
    buf.write(sync)
    if records:
        _write_long(buf, len(records))
        _write_long(buf, len(payload))
        buf.write(payload)
        buf.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def read_container(path: str) -> tuple[list, dict, dict]:
    """Read an Avro object container file → (records, file-metadata
    {str: bytes}, writer schema dict)."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{path} is not an Avro container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = read_datum(buf, "string")
            meta[k] = read_datum(buf, "bytes")
    sync = buf.read(16)
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r} in {path}")
    schema_dict = json.loads(meta["avro.schema"].decode())
    schema = parse_schema(json.dumps(schema_dict))
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(read_datum(bbuf, schema))
        if buf.read(16) != sync:
            raise ValueError(f"sync marker mismatch in {path}")
    return records, meta, schema_dict
