"""Protobuf input format — pure-Python wire-format decoder.

Re-expresses extensions-core/protobuf-extensions (ProtobufInputFormat.java,
FileBasedProtobufBytesDecoder.java): messages are decoded against a compiled
descriptor set (`protoc --descriptor_set_out`), selected by
``protoMessageType``.  The reference links protobuf-java; this container has
neither protobuf-java nor the google.protobuf wheel, so the decoder speaks the
wire format directly — it is ~5 primitives (varint, zigzag, 32/64-bit
little-endian, length-delimited) and the descriptor file is itself a protobuf
message (FileDescriptorSet) decoded with the same primitives.

Scale shape: files land as one row each via Spark's binaryFile source, then
``mapInPandas`` fans the decode across executors in Arrow batches — the
Python cost is per input row, identical to the reference's per-record
ByteBuffer decode, and the decoded columns are proper Spark types so every
downstream operator stays JVM-side.

inputFormat spec accepted (Druid shape):
    {"type": "protobuf",
     "protoBytesDecoder": {"type": "file", "descriptor": "/path/x.desc",
                            "protoMessageType": "MyMessage"},
     "delimited": false}        # true = varint-length-delimited stream files
"""

from __future__ import annotations

import struct as _struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# FieldDescriptorProto.Type enum values (descriptor.proto)
_TYPE_DOUBLE, _TYPE_FLOAT, _TYPE_INT64, _TYPE_UINT64, _TYPE_INT32 = 1, 2, 3, 4, 5
_TYPE_FIXED64, _TYPE_FIXED32, _TYPE_BOOL, _TYPE_STRING = 6, 7, 8, 9
_TYPE_MESSAGE, _TYPE_BYTES, _TYPE_UINT32, _TYPE_ENUM = 11, 12, 13, 14
_TYPE_SFIXED32, _TYPE_SFIXED64, _TYPE_SINT32, _TYPE_SINT64 = 15, 16, 17, 18
_LABEL_REPEATED = 3

_VARINT_TYPES = {_TYPE_INT64, _TYPE_UINT64, _TYPE_INT32, _TYPE_UINT32,
                 _TYPE_BOOL, _TYPE_ENUM, _TYPE_SINT32, _TYPE_SINT64}
_FIXED64_TYPES = {_TYPE_DOUBLE, _TYPE_FIXED64, _TYPE_SFIXED64}
_FIXED32_TYPES = {_TYPE_FLOAT, _TYPE_FIXED32, _TYPE_SFIXED32}


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _signed64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def _signed32(n: int) -> int:
    n &= 0xFFFFFFFF
    return n - (1 << 32) if n >= (1 << 31) else n


def parse_wire(buf: bytes, start: int = 0, end: int | None = None):
    """Raw wire parse → list of (field_number, wire_type, value)."""
    out = []
    pos, end = start, len(buf) if end is None else end
    while pos < end:
        key, pos = _read_varint(buf, pos)
        fnum, wtype = key >> 3, key & 7
        if wtype == 0:
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:
            val, pos = buf[pos:pos + 8], pos + 8
        elif wtype == 2:
            ln, pos = _read_varint(buf, pos)
            val, pos = buf[pos:pos + ln], pos + ln
        elif wtype == 5:
            val, pos = buf[pos:pos + 4], pos + 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        out.append((fnum, wtype, val))
    if pos != end:
        raise ValueError("truncated message")
    return out


def _scalar(ftype: int, wtype: int, val) -> object:
    if wtype == 0:
        if ftype in (_TYPE_SINT32, _TYPE_SINT64):
            return _zigzag(val)
        if ftype == _TYPE_BOOL:
            return bool(val)
        if ftype in (_TYPE_INT32, _TYPE_INT64):
            return _signed64(val)
        return val                                   # uint*/enum
    if wtype == 1:
        if ftype == _TYPE_DOUBLE:
            return _struct.unpack("<d", val)[0]
        n = _struct.unpack("<Q", val)[0]
        return _signed64(n) if ftype == _TYPE_SFIXED64 else n
    if wtype == 5:
        if ftype == _TYPE_FLOAT:
            return _struct.unpack("<f", val)[0]
        n = _struct.unpack("<I", val)[0]
        return _signed32(n) if ftype == _TYPE_SFIXED32 else n
    raise ValueError(f"scalar type {ftype} with wire type {wtype}")


def _unpack_packed(ftype: int, buf: bytes) -> list:
    vals, pos = [], 0
    if ftype in _VARINT_TYPES:
        while pos < len(buf):
            v, pos = _read_varint(buf, pos)
            vals.append(_scalar(ftype, 0, v))
    elif ftype in _FIXED64_TYPES:
        for i in range(0, len(buf), 8):
            vals.append(_scalar(ftype, 1, buf[i:i + 8]))
    elif ftype in _FIXED32_TYPES:
        for i in range(0, len(buf), 4):
            vals.append(_scalar(ftype, 5, buf[i:i + 4]))
    else:
        raise ValueError(f"type {ftype} cannot be packed")
    return vals


# ---------------------------------------------------------------------------
# descriptor set (FileDescriptorSet) → message schemas
# ---------------------------------------------------------------------------

class FieldDesc:
    __slots__ = ("name", "number", "ftype", "repeated", "type_name")

    def __init__(self, name, number, ftype, repeated, type_name):
        self.name, self.number, self.ftype = name, number, ftype
        self.repeated, self.type_name = repeated, type_name


def _parse_field_descriptor(buf: bytes) -> FieldDesc:
    name = type_name = ""
    number = ftype = label = 0
    for fnum, wtype, val in parse_wire(buf):
        if fnum == 1:
            name = val.decode("utf-8")
        elif fnum == 3:
            number = val
        elif fnum == 4:
            label = val
        elif fnum == 5:
            ftype = val
        elif fnum == 6:
            type_name = val.decode("utf-8")
    return FieldDesc(name, number, ftype, label == _LABEL_REPEATED, type_name)


def _parse_message_descriptor(buf: bytes, prefix: str, registry: dict) -> str:
    name, fields, nested = "", [], []
    for fnum, wtype, val in parse_wire(buf):
        if fnum == 1:
            name = val.decode("utf-8")
        elif fnum == 2:
            fields.append(_parse_field_descriptor(val))
        elif fnum == 3:
            nested.append(val)
    full = f"{prefix}.{name}" if prefix else name
    registry[full] = fields
    for nb in nested:
        _parse_message_descriptor(nb, full, registry)
    return full


def parse_descriptor_set(buf: bytes) -> dict[str, list[FieldDesc]]:
    """descriptor-set bytes → {fully.qualified.MessageName: [FieldDesc]}."""
    registry: dict[str, list[FieldDesc]] = {}
    for fnum, _, file_buf in parse_wire(buf):
        if fnum != 1:                                 # FileDescriptorSet.file
            continue
        package, messages = "", []
        for ffnum, _, val in parse_wire(file_buf):
            if ffnum == 2:                            # FileDescriptorProto.package
                package = val.decode("utf-8")
            elif ffnum == 4:                          # .message_type
                messages.append(val)
        for mb in messages:
            _parse_message_descriptor(mb, package, registry)
    return registry


def _resolve(registry: dict, type_name: str) -> list[FieldDesc]:
    key = type_name.lstrip(".")
    if key in registry:
        return registry[key]
    for full in registry:                             # unqualified lookup
        if full == key or full.endswith("." + key):
            return registry[full]
    raise KeyError(f"message type {type_name!r} not in descriptor set "
                   f"(have {sorted(registry)})")


# ---------------------------------------------------------------------------
# message decode + Spark schema
# ---------------------------------------------------------------------------

def decode_message(buf: bytes, fields: list[FieldDesc], registry: dict) -> dict:
    by_num = {f.number: f for f in fields}
    out: dict[str, object] = {f.name: [] if f.repeated else None for f in fields}
    for fnum, wtype, val in parse_wire(buf):
        f = by_num.get(fnum)
        if f is None:
            continue                                  # unknown field: skip
        if f.ftype == _TYPE_MESSAGE:
            sub = decode_message(val, _resolve(registry, f.type_name), registry)
            vals = [sub]
        elif wtype == 2 and f.ftype not in (_TYPE_STRING, _TYPE_BYTES):
            vals = _unpack_packed(f.ftype, val)       # packed repeated
        elif f.ftype == _TYPE_STRING:
            vals = [val.decode("utf-8")]
        elif f.ftype == _TYPE_BYTES:
            vals = [bytes(val)]
        else:
            vals = [_scalar(f.ftype, wtype, val)]
        if f.repeated:
            out[f.name].extend(vals)                  # type: ignore[union-attr]
        else:
            out[f.name] = vals[-1]
    return out


_SPARK_TYPES = {
    _TYPE_DOUBLE: T.DoubleType(), _TYPE_FLOAT: T.FloatType(),
    _TYPE_INT64: T.LongType(), _TYPE_UINT64: T.LongType(),
    _TYPE_INT32: T.LongType(), _TYPE_FIXED64: T.LongType(),
    _TYPE_FIXED32: T.LongType(), _TYPE_BOOL: T.BooleanType(),
    _TYPE_STRING: T.StringType(), _TYPE_BYTES: T.BinaryType(),
    _TYPE_UINT32: T.LongType(), _TYPE_ENUM: T.LongType(),
    _TYPE_SFIXED32: T.LongType(), _TYPE_SFIXED64: T.LongType(),
    _TYPE_SINT32: T.LongType(), _TYPE_SINT64: T.LongType(),
}


def spark_schema(fields: list[FieldDesc], registry: dict) -> T.StructType:
    out = []
    for f in fields:
        if f.ftype == _TYPE_MESSAGE:
            dt: T.DataType = spark_schema(_resolve(registry, f.type_name), registry)
        else:
            dt = _SPARK_TYPES[f.ftype]
        if f.repeated:
            dt = T.ArrayType(dt)
        out.append(T.StructField(f.name, dt))
    return T.StructType(out)


def split_delimited(buf: bytes) -> list[bytes]:
    """varint-length-delimited stream → message byte slices."""
    msgs, pos = [], 0
    while pos < len(buf):
        ln, pos = _read_varint(buf, pos)
        msgs.append(buf[pos:pos + ln])
        pos += ln
    return msgs


# ---------------------------------------------------------------------------
# Spark read path
# ---------------------------------------------------------------------------

def read_protobuf(spark: SparkSession, paths, fmt: dict) -> DataFrame:
    """binaryFile scan → mapInPandas decode against the descriptor set."""
    dec = fmt.get("protoBytesDecoder") or {}
    desc_path = dec.get("descriptor")
    if not desc_path:
        raise ValueError("protobuf inputFormat needs protoBytesDecoder.descriptor")
    with open(desc_path.removeprefix("file://"), "rb") as fh:
        registry = parse_descriptor_set(fh.read())
    fields = _resolve(registry, dec.get("protoMessageType", ""))
    schema = spark_schema(fields, registry)
    delimited = bool(fmt.get("delimited", False))

    if isinstance(paths, str):
        paths = [paths]
    raw = spark.read.format("binaryFile").load(paths).select("content")

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                blob = bytes(content)
                msgs = split_delimited(blob) if delimited else [blob]
                for m in msgs:
                    rows.append(decode_message(m, fields, registry))
            yield pd.DataFrame(rows, columns=[f.name for f in fields])

    return raw.mapInPandas(decode, schema)


def decode_column(df: DataFrame, col: str, fmt: dict) -> DataFrame:
    """Streaming helper: decode a binary column (e.g. Kafka `value`) into a
    struct column named `decoded` — per-record, matching the reference's
    KafkaInputFormat + protobuf bytes-decoder path."""
    dec = fmt.get("protoBytesDecoder") or {}
    with open(dec["descriptor"].removeprefix("file://"), "rb") as fh:
        registry = parse_descriptor_set(fh.read())
    fields = _resolve(registry, dec.get("protoMessageType", ""))
    schema = spark_schema(fields, registry)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(schema)
    def _decode(vals):
        import pandas as pd
        return pd.DataFrame(
            [decode_message(bytes(v), fields, registry) for v in vals],
            columns=[f.name for f in fields])

    return df.withColumn("decoded", _decode(df[col]))
