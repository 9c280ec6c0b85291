"""WARC (ISO 28500) record parsing — the Common Crawl ingestion front
door for web-scale training corpora.

A crawl corpus arrives as ``.warc`` / ``.warc.gz`` files: a stream of
records (warcinfo, request, response, resource, metadata, …), each a
``WARC/1.x`` version line + named headers + ``Content-Length`` payload
bytes.  Response payloads are themselves HTTP messages whose body is
the HTML that :mod:`incubator_druid_spark.pipeline.html` extracts.

Design for 100 TB:
  * One blob = one kernel call.  ``spark.read.format("binaryFile")``
    (or any source producing a binary column) distributes whole WARC
    files; :func:`warc_record_rows` explodes them to per-record rows in
    an Arrow ``mapInPandas`` kernel — a single linear pass per blob, no
    shuffle, parallelism = #files × maxPartitionBytes.
  * The parser is an OFFSET INDEX as much as a field extractor: every
    row carries (offset, length) of its record — for ``.warc.gz`` the
    COMPRESSED member offsets — so downstream jobs re-fetch individual
    records by byte range (HTTP Range requests against the crawl
    bucket) instead of re-reading whole files, the same zero-decode
    scheduling contract as the MP4/MP3 indexes (pipeline/probe.py).
  * Per-record gzip members (the Common Crawl layout) are decompressed
    member-at-a-time with ``zlib``; a plain stream parses in place.

Parse contract (deterministic, oracle-replayable):
  * headers: ``Name: value`` lines up to the first blank line; CRLF
    and bare-LF line endings both accepted; header names matched
    case-insensitively, first occurrence wins
  * payload: exactly ``Content-Length`` bytes; the two CRLF record
    separators after it are consumed (tolerated absent at EOF)
  * HTTP payloads (``Content-Type: application/http…``) split at the
    first blank line: status code from the status line, Content-Type
    from the message headers, body decoded UTF-8 with replacement
  * malformed input STOPS the parse: records before the junk are
    returned and ``parse_error`` reports ``"<reason> at offset <n>"``
    (truncated payload, missing/invalid magic or Content-Length, bad
    gzip member).  No resynchronization — a crawl writer that corrupts
    mid-file needs human eyes, not silent skipping.

No counterpart in the reference (Apache Druid has no WARC source) —
training-data-pipeline tier (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "build_warc_record",
    "parse_warc",
    "warc_record_rows",
    "warc_stats",
]

_CRLF = b"\r\n"


def build_warc_record(
    warc_type: str,
    payload: bytes,
    headers: dict[str, str] | None = None,
    version: str = "WARC/1.0",
) -> bytes:
    """Serialize one WARC record (testing/fixture helper; Content-Length
    is computed, WARC-Type leads)."""
    out = [version.encode(), b"WARC-Type: " + warc_type.encode()]
    for k, v in (headers or {}).items():
        out.append(k.encode() + b": " + v.encode())
    out.append(b"Content-Length: " + str(len(payload)).encode())
    return _CRLF.join(out) + _CRLF * 2 + payload + _CRLF * 2


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) of an HTTP message payload; request
    messages (no status in line 1) return status None."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        sep = payload.find(b"\n\n")
        head, body = (payload, b"") if sep < 0 else (
            payload[:sep], payload[sep + 2:])
    else:
        head, body = payload[:sep], payload[sep + 4:]
    lines = head.replace(b"\r\n", b"\n").split(b"\n")
    status = None
    if lines and lines[0].startswith(b"HTTP/"):
        parts = lines[0].split()
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("utf-8", "replace")
            break
    return status, ctype, body


def _parse_plain(data: bytes) -> tuple[list[dict], str | None]:
    """Parse an uncompressed WARC stream."""
    records: list[dict] = []
    pos = 0
    n = len(data)
    while True:
        while pos < n and data[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            return records, None
        start = pos
        if not data.startswith(b"WARC/", pos):
            return records, f"bad magic at offset {start}"
        hdr_end = data.find(b"\r\n\r\n", pos)
        hdr_sep = 4
        lf_end = data.find(b"\n\n", pos)
        if hdr_end < 0 or (0 <= lf_end < hdr_end):
            hdr_end, hdr_sep = lf_end, 2
        if hdr_end < 0:
            return records, f"unterminated header at offset {start}"
        head = data[pos:hdr_end].replace(b"\r\n", b"\n").split(b"\n")
        headers: dict[str, str] = {}
        for ln in head[1:]:
            k, colon, v = ln.partition(b":")
            if colon:
                key = k.strip().decode("utf-8", "replace").lower()
                headers.setdefault(
                    key, v.strip().decode("utf-8", "replace"))
        clen_s = headers.get("content-length", "")
        if not clen_s.isdigit():
            return records, f"missing content-length at offset {start}"
        clen = int(clen_s)
        body_at = hdr_end + hdr_sep
        if body_at + clen > n:
            return records, f"truncated payload at offset {start}"
        payload = data[body_at:body_at + clen]
        pos = body_at + clen
        rec = {
            "offset": start,
            "length": pos - start,
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": clen,
        }
        status = http_ctype = None
        body = payload
        if (rec["content_type"] or "").startswith("application/http"):
            status, http_ctype, body = _split_http(payload)
        rec["http_status"] = status
        rec["http_content_type"] = http_ctype
        rec["body_text"] = body.decode("utf-8", "replace")
        records.append(rec)


def parse_warc(data: bytes) -> tuple[list[dict], str | None]:
    """Parse a WARC blob (plain or per-record-gzip) to a list of record
    dicts + a parse_error (None when the whole blob parsed).  For
    ``.warc.gz`` input, offsets/lengths are the COMPRESSED member
    ranges — the byte ranges a scheduler fetches."""
    if not data:
        return [], None
    if data[:2] != b"\x1f\x8b":
        return _parse_plain(data)
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 2] != b"\x1f\x8b":
            return records, f"bad gzip magic at offset {pos}"
        d = zlib.decompressobj(wbits=31)
        try:
            member = d.decompress(data[pos:])
            member += d.flush()
        except zlib.error:
            return records, f"bad gzip member at offset {pos}"
        if not d.eof:
            return records, f"truncated gzip member at offset {pos}"
        consumed = n - pos - len(d.unused_data)
        recs, err = _parse_plain(member)
        for r in recs:
            r["offset"] = pos
            r["length"] = consumed
        records.extend(recs)
        if err:
            return records, err + f" (member at offset {pos})"
        pos += consumed
    return records, None


_REC_COLS = [
    "rec_index", "offset", "length", "warc_type", "record_id",
    "target_uri", "warc_date", "content_type", "content_length",
    "http_status", "http_content_type", "body_text",
]
_REC_SCHEMA = (
    "rec_index int, offset long, length long, warc_type string, "
    "record_id string, target_uri string, warc_date string, "
    "content_type string, content_length long, http_status int, "
    "http_content_type string, body_text string"
)


def warc_record_rows(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Explode WARC blobs into per-record rows: one row per record with
    headers, byte range, HTTP status/type and UTF-8 body text.  Rows of
    a blob that fails mid-parse are kept up to the junk (see
    :func:`warc_stats` for the error surface).  Arrow ``mapInPandas``,
    one linear pass per blob."""
    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[content_col]):
                recs, _err = parse_warc(bytes(blob) if blob is not None
                                        else b"")
                for i, r in enumerate(recs):
                    out.append({id_col: rid, "rec_index": i, **r})
            yield (pd.DataFrame(out, columns=[id_col] + _REC_COLS) if out
                   else pd.DataFrame({c: [] for c in [id_col] + _REC_COLS}))

    return df.select(id_col, content_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, {_REC_SCHEMA}")


def warc_stats(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Per-blob parse summary: n_records, total payload bytes, and
    parse_error (null for a clean blob) — the completeness report a
    crawl-ingest run checks BEFORE trusting the exploded rows; a blob
    with junk shows its partial record count AND the offset-stamped
    reason here instead of failing silently."""
    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [id_col, "n_records", "payload_bytes", "parse_error"]
        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[content_col]):
                recs, err = parse_warc(bytes(blob) if blob is not None
                                       else b"")
                out.append({
                    id_col: rid,
                    "n_records": len(recs),
                    "payload_bytes": sum(r["content_length"] for r in recs),
                    "parse_error": err,
                })
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame({c: [] for c in cols}))

    return df.select(id_col, content_col).mapInPandas(
        kernel,
        schema=(f"{id_col} {id_type}, n_records int, payload_bytes long, "
                "parse_error string"))
