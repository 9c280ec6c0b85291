"""WebDataset-style tar shard parsing — the standard container for
large multimodal training corpora (LAION, img2dataset output): a
corpus is .tar shards whose members group into samples by basename
("000123.jpg" + "000123.txt" + "000123.json" = one sample).

Design for 100 TB (same contract as the WARC/MP4/MP3 surfaces):
  * :func:`tar_members` explodes each shard blob into one row per
    member WITH ITS BYTE RANGE — header offset, data offset, size — in
    an Arrow ``mapInPandas`` kernel; a scheduler can then fetch
    individual members by Range request instead of re-reading shards
  * :func:`webdataset_samples` rolls members up into per-sample rows
    (key, extension list, byte mass) — the unit a training loader
    indexes; one shuffle on (shard, sample key)
  * payload bytes ride along as a binary column (feed the multimodal
    decode kernels); pass ``with_payload=False`` for the pure-index
    pass over shards whose bytes you only want to schedule

Parse contract (POSIX ustar, deterministic, oracle-replayable):
  * 512-byte headers; size = octal field [124:136); data padded to the
    next 512 boundary; name = prefix[345:500) + '/' + name[0:100) when
    the ustar prefix field is set
  * stop at the first all-zero block (end-of-archive) or clean EOF
  * PAX extended headers (typeflag x/g) surface as their own members —
    consumers filter ``typeflag IN ('0', '')`` for plain files; this
    parser does NOT apply PAX overrides (write shards in ustar format,
    as WebDataset tooling does)
  * malformed input STOPS the parse: rows before the junk are kept and
    ``parse_error`` reports "<reason> at offset <n>" via
    :func:`tar_stats` (the WARC warc_stats analogue); a blob cut
    inside padding or between headers parses as a clean prefix (only a
    cut through a member's header or data is reported)

No counterpart in the reference engine (training-data-pipeline tier,
SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_tar",
    "tar_members",
    "tar_stats",
    "webdataset_samples",
]


def _octal(field: bytes) -> int | None:
    s = field.split(b"\x00", 1)[0].strip()
    if not s:
        return None
    try:
        return int(s, 8)
    except ValueError:
        return None


def parse_tar(data: bytes) -> tuple[list[dict], str | None]:
    """Parse a tar blob into member dicts + a parse_error (None when
    the whole archive parsed).  Offsets are absolute blob positions."""
    members: list[dict] = []
    pos = 0
    n = len(data)
    while pos + 512 <= n:
        hdr = data[pos:pos + 512]
        if hdr == b"\x00" * 512:
            return members, None            # end-of-archive marker
        name = hdr[0:100].split(b"\x00", 1)[0]
        size = _octal(hdr[124:136])
        magic = hdr[257:263]
        if size is None or not name:
            return members, f"bad header at offset {pos}"
        if magic[:5] not in (b"ustar", b"GNUta"):
            return members, f"bad magic at offset {pos}"
        prefix = hdr[345:500].split(b"\x00", 1)[0]
        full = (prefix + b"/" + name) if prefix else name
        typeflag = hdr[156:157].decode("ascii", "replace")
        data_at = pos + 512
        if data_at + size > n:
            return members, f"truncated member at offset {pos}"
        members.append({
            "name": full.decode("utf-8", "replace"),
            "typeflag": "0" if typeflag == "\x00" else typeflag,
            "size": size,
            "offset": pos,
            "data_offset": data_at,
            "payload": data[data_at:data_at + size],
        })
        pos = data_at + ((size + 511) // 512) * 512
    if pos < n and any(data[pos:]):
        return members, f"truncated header at offset {pos}"
    return members, None


_MEMBER_COLS = ["member_idx", "name", "typeflag", "size", "offset",
                "data_offset"]


def tar_members(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id",
    with_payload: bool = True,
) -> DataFrame:
    """Explode tar shards into one row per member with byte ranges
    (and the payload itself unless ``with_payload=False``)."""
    id_type = df.schema[id_col].dataType.simpleString()
    cols = _MEMBER_COLS + (["payload"] if with_payload else [])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[content_col]):
                recs, _err = parse_tar(bytes(blob) if blob is not None
                                       else b"")
                for i, m in enumerate(recs):
                    row = {id_col: rid, "member_idx": i,
                           **{k: m[k] for k in _MEMBER_COLS[1:]}}
                    if with_payload:
                        row["payload"] = m["payload"]
                    out.append(row)
            yield (pd.DataFrame(out, columns=[id_col] + cols) if out
                   else pd.DataFrame({c: pd.Series([], dtype="object")
                                      for c in [id_col] + cols}))

    schema = (f"{id_col} {id_type}, member_idx int, name string, "
              "typeflag string, size long, offset long, data_offset long")
    if with_payload:
        schema += ", payload binary"
    return df.select(id_col, content_col).mapInPandas(kernel,
                                                      schema=schema)


def tar_stats(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Per-shard parse summary: n_members, payload byte mass,
    parse_error (null for a clean shard)."""
    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [id_col, "n_members", "payload_bytes", "parse_error"]
        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[content_col]):
                recs, err = parse_tar(bytes(blob) if blob is not None
                                      else b"")
                out.append({id_col: rid, "n_members": len(recs),
                            "payload_bytes": sum(m["size"] for m in recs),
                            "parse_error": err})
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame({c: pd.Series([], dtype="object")
                                      for c in cols}))

    return df.select(id_col, content_col).mapInPandas(
        kernel,
        schema=(f"{id_col} {id_type}, n_members int, payload_bytes long, "
                "parse_error string"))


def webdataset_samples(
    members: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Roll a :func:`tar_members` frame up into per-sample rows: the
    sample key is the member basename before its FIRST dot (WebDataset
    convention — "x/000123.seg.png" keys as "x/000123"), extensions are
    everything after it.  Returns (id, sample_key, n_parts, exts sorted
    array, total_bytes).  Plain-file members only (typeflag '0')."""
    base = F.col("name")
    slash = F.substring_index(base, "/", -1)
    dir_part = F.expr(
        "substring(name, 1, length(name) - "
        "length(substring_index(name, '/', -1)))")
    key = F.concat(dir_part, F.substring_index(slash, ".", 1))
    ext = F.when(slash.contains("."),
                 F.expr("substring(substring_index(name, '/', -1), "
                        "instr(substring_index(name, '/', -1), '.') + 1)")
                 ).otherwise(F.lit(""))
    plain = members.filter(F.col("typeflag") == "0")
    return (plain
            .select(id_col, key.alias("sample_key"), ext.alias("__ext"),
                    "size")
            .groupBy(id_col, "sample_key")
            .agg(F.count(F.lit(1)).alias("n_parts"),
                 F.array_sort(F.collect_list("__ext")).alias("exts"),
                 F.sum("size").alias("total_bytes")))
