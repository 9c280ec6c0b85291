"""Avro input format — pure-Python Object Container File reader.

Re-expresses extensions-core/avro-extensions (AvroStreamInputFormat /
AvroOCFReader.java): the reference links avro-java; this container ships
neither the spark-avro datasource jar nor an avro wheel, so ``read_input``
tries the native JVM reader first (the fast path on real clusters) and falls
back to this decoder.

Format (Avro 1.x spec, "Object Container Files"): magic ``Obj\\x01``, a
metadata map carrying the writer schema JSON + codec, a 16-byte sync marker,
then blocks of ``<count><byte-size><data><sync>`` with zigzag-varint framing.
Values use Avro binary encoding: zigzag varints for int/long, little-endian
IEEE for float/double, length-prefixed bytes/string, records as field
concatenation, arrays/maps as counted blocks, unions as branch-index +
value.

Scale shape mirrors sources/protobuf.py: files land one-per-row via the
binaryFile source and ``mapInPandas`` fans decoding across executors; the
decoded columns are native Spark types so everything downstream stays
JVM-side.
"""

from __future__ import annotations

import json
import struct as _struct
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------

class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf, self.pos = buf, pos

    def read(self, n: int) -> bytes:
        out = self.buf[self.pos:self.pos + n]
        if len(out) != n:
            raise ValueError("truncated avro data")
        self.pos += n
        return out

    def long(self) -> int:
        result = shift = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                return (result >> 1) ^ -(result & 1)      # zigzag
            shift += 7
            if shift > 70:
                raise ValueError("malformed avro varint")

    def bytes_(self) -> bytes:
        return self.read(self.long())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")


def _decode_value(r: _Reader, schema) -> object:
    """Avro binary decoding against the (parsed-JSON) writer schema."""
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):                        # union: index + value
        return _decode_value(r, schema[r.long()])
    else:
        t = schema["type"]

    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.long()
    if t == "float":
        return _struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return _struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.bytes_()
    if t == "string":
        return r.string()
    if t == "record":
        return {f["name"]: _decode_value(r, f["type"]) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.long()]
    if t == "fixed":
        return r.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:                                     # block with byte size
                n, _ = -n, r.long()
            for _ in range(n):
                out.append(_decode_value(r, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n, _ = -n, r.long()
            for _ in range(n):
                key = r.string()                          # key BEFORE value —
                out[key] = _decode_value(r, schema["values"])
    raise ValueError(f"unsupported avro type {t!r}")


def read_container(blob: bytes) -> tuple[dict, list[dict]]:
    """OCF bytes → (writer schema, rows)."""
    r = _Reader(blob)
    if r.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = _decode_value(r, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = r.read(16)
    rows: list[dict] = []
    while r.pos < len(blob):
        count = r.long()
        size = r.long()
        data = r.read(size)
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        br = _Reader(data)
        for _ in range(count):
            rows.append(_decode_value(br, schema))
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return schema, rows


# ---------------------------------------------------------------------------
# Spark schema + read path
# ---------------------------------------------------------------------------

_PRIMITIVES = {"boolean": T.BooleanType(), "int": T.LongType(),
               "long": T.LongType(), "float": T.FloatType(),
               "double": T.DoubleType(), "bytes": T.BinaryType(),
               "string": T.StringType(), "enum": T.StringType()}


def spark_type(schema) -> T.DataType:
    if isinstance(schema, str):
        return _PRIMITIVES.get(schema, T.StringType())
    if isinstance(schema, list):                          # union
        branches = [b for b in schema if b != "null"]
        return spark_type(branches[0]) if branches else T.NullType()
    t = schema["type"]
    if t == "record":
        return T.StructType([T.StructField(f["name"], spark_type(f["type"]))
                             for f in schema["fields"]])
    if t == "array":
        return T.ArrayType(spark_type(schema["items"]))
    if t == "map":
        return T.MapType(T.StringType(), spark_type(schema["values"]))
    if t == "fixed":
        return T.BinaryType()
    if t == "enum":
        return T.StringType()
    return _PRIMITIVES.get(t, T.StringType())


def read_avro(spark: SparkSession, paths) -> DataFrame:
    """binaryFile scan → mapInPandas container decode.  The writer schema is
    read driver-side from the first file's header; all files must share it
    (the same constraint the reference's OCF reader imposes per task)."""
    if isinstance(paths, str):
        paths = [paths]
    with open(paths[0].removeprefix("file://"), "rb") as fh:
        schema, _ = read_container(fh.read())
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("avro input must be a record schema at top level")
    struct = spark_type(schema)
    names = [f.name for f in struct.fields]

    raw = spark.read.format("binaryFile").load(paths).select("content")

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                _, recs = read_container(bytes(content))
                rows.extend(recs)
            yield pd.DataFrame(rows, columns=names)

    return raw.mapInPandas(decode, struct)
