"""Parquet footer metadata with a JVM fallback for VARIANT files.

Both lake writers (deltaproto, iceberg) derive per-file statistics from
the parquet FOOTER after landing data.  pyarrow is the cheap path, but
the pyarrow build in this environment predates the parquet VARIANT
logical type and refuses to even OPEN a file containing one
("Metadata contains Thrift LogicalType that is not recognized") — so a
single variant column would silently cost the table every other
column's min/max pruning stats.  The fallback reads the same footer
through Spark's bundled parquet-java (the implementation that WROTE
the annotation) via py4j: driver-side, footer-only, no data IO —
metadata-scale, like every other stats probe in the lake tier.

Public surface: `read_footer(abs_path)` returning
{"num_rows": int, "columns": {dotted_leaf_name: {"null_count": int|None,
"min": value|None, "max": value|None}}} with min/max already converted
to plain Python values (UTF-8 strings for annotated binaries) and
aggregated across row groups.
"""

from __future__ import annotations

import os

__all__ = ["read_footer"]


def read_footer(abs_path: str) -> dict:
    try:
        return _via_pyarrow(abs_path)
    except Exception:
        return _via_jvm(abs_path)


def _agg(col: dict, null_count, lo, hi) -> None:
    """Fold one row group's statistics into the running column entry —
    any row group with unknown nulls/min-max poisons that stat (the
    same conservative rule both lake writers already applied)."""
    if col["null_count"] is not None and null_count is not None:
        col["null_count"] += null_count
    else:
        col["null_count"] = None
    if lo is None or hi is None:
        col["min"] = col["max"] = None
        col["minmax_ok"] = False
    elif col["minmax_ok"]:
        if col["min"] is None or lo < col["min"]:
            col["min"] = lo
        if col["max"] is None or hi > col["max"]:
            col["max"] = hi


def _new_col() -> dict:
    return {"null_count": 0, "min": None, "max": None, "minmax_ok": True}


def _dec_stat(raw, scale: int):
    """Decimal stat from its raw physical form: INT32/INT64 carry the
    unscaled int, FLBA carries big-endian two's-complement bytes."""
    import decimal

    u = (
        raw
        if isinstance(raw, int)
        else int.from_bytes(raw, "big", signed=True)
    )
    return decimal.Decimal(u).scaleb(-scale)


def _via_pyarrow(abs_path: str) -> dict:
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    cols: dict[str, dict] = {}
    for ci in range(md.num_columns):
        # .path is the dotted leaf path ("s.a"), matching the JVM
        # branch's toDotString(); .name would be the bare leaf name
        sc = md.schema.column(ci)
        name = sc.path
        lt = sc.logical_type
        dec_scale = (
            lt.scale if lt is not None and lt.type == "DECIMAL" else None
        )
        col = cols.setdefault(name, _new_col())
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None:
                _agg(col, None, None, None)
                continue
            has = st.has_min_max
            if dec_scale is not None:
                # pyarrow cannot logical-decode decimal stats (raises
                # ArrowNotImplementedError on .min) — decode the raw
                # physical form ourselves
                lo = _dec_stat(st.min_raw, dec_scale) if has else None
                hi = _dec_stat(st.max_raw, dec_scale) if has else None
            else:
                lo = st.min if has else None
                hi = st.max if has else None
            _agg(col, st.null_count, lo, hi)
    return {"num_rows": md.num_rows, "columns": cols}


#: parquet-java physical types whose generic min/max py4j converts to
#: plain Python values directly.
_JVM_NUMERIC = {"INT32", "INT64", "FLOAT", "DOUBLE", "BOOLEAN"}


def _via_jvm(abs_path: str) -> dict:
    """Footer read through Spark's parquet-java (handles every logical
    type Spark itself can write, VARIANT included)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:  # pragma: no cover - lake writers always have one
        raise RuntimeError("no active SparkSession for JVM footer read")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path("file://" + os.path.abspath(abs_path))
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jpath, hconf
    )
    rdr = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        footer = rdr.getFooter()
        num_rows = int(rdr.getRecordCount())
        cols: dict[str, dict] = {}
        for block in footer.getBlocks():
            for cc in block.getColumns():
                name = cc.getPath().toDotString()
                col = cols.setdefault(name, _new_col())
                st = cc.getStatistics()
                nulls = lo = hi = None
                if st is not None and not st.isEmpty():
                    n = int(st.getNumNulls())
                    nulls = n if n >= 0 else None
                    if st.hasNonNullValue():
                        lo, hi = _jvm_minmax(cc, st)
                _agg(col, nulls, lo, hi)
        return {"num_rows": num_rows, "columns": cols}
    finally:
        rdr.close()


def _jvm_minmax(cc, st):
    """(min, max) of one JVM column-chunk Statistics as Python values;
    (None, None) for physical types we don't map (INT96, binaries
    without a string annotation — same omission pyarrow applies)."""
    pt = cc.getPrimitiveType()
    pt_name = pt.getPrimitiveTypeName().toString()
    ann = pt.getLogicalTypeAnnotation()
    ann_s = ann.toString().lower() if ann is not None else ""
    import re as _re

    dec = _re.search(r"decimal\((\d+),\s*(\d+)\)", ann_s)
    try:
        if dec is not None:
            scale = int(dec.group(2))
            if pt_name in ("INT32", "INT64"):
                return (
                    _dec_stat(int(st.genericGetMin()), scale),
                    _dec_stat(int(st.genericGetMax()), scale),
                )
            if pt_name in ("BINARY", "FIXED_LEN_BYTE_ARRAY"):
                return (
                    _dec_stat(bytes(st.genericGetMin().getBytes()), scale),
                    _dec_stat(bytes(st.genericGetMax().getBytes()), scale),
                )
            return None, None
        if pt_name in _JVM_NUMERIC:
            # date/timestamp/time annotations ride int physical types;
            # pyarrow surfaces those as Python date/datetime objects,
            # which both consumers OMIT — match that omission rather
            # than leak raw epoch integers into the stats
            if any(k in ann_s for k in ("date", "time")):
                return None, None
            return st.genericGetMin(), st.genericGetMax()
        if pt_name == "BINARY" and "string" in ann_s:
            return (
                st.genericGetMin().toStringUsingUTF8(),
                st.genericGetMax().toStringUsingUTF8(),
            )
    except Exception:
        pass
    return None, None
