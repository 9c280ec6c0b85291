"""WARC parsing (pipeline/warc.py) — record splitting, header/HTTP
extraction, gzip members, byte-range offsets, malformed-input stops,
and the Spark explode surfaces."""

import gzip

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.warc import (
    build_warc_record,
    parse_warc,
    warc_record_rows,
    warc_stats,
)

HTML = "<html><body><p>hello</p></body></html>"
HTTP = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8"
        "\r\n\r\n" + HTML).encode()


def _blob():
    r1 = build_warc_record(
        "warcinfo", b"software: test\r\n",
        {"WARC-Record-ID": "<urn:uuid:1>",
         "WARC-Date": "2024-01-01T00:00:00Z"})
    r2 = build_warc_record(
        "request", b"GET / HTTP/1.1\r\nHost: x\r\n\r\n",
        {"WARC-Target-URI": "http://e.com/",
         "Content-Type": "application/http;msgtype=request"})
    r3 = build_warc_record(
        "response", HTTP,
        {"WARC-Target-URI": "http://e.com/",
         "Content-Type": "application/http;msgtype=response"})
    return r1, r2, r3


class TestParsePlain:
    def test_three_records(self):
        r1, r2, r3 = _blob()
        recs, err = parse_warc(r1 + r2 + r3)
        assert err is None and len(recs) == 3
        assert [r["warc_type"] for r in recs] == [
            "warcinfo", "request", "response"]

    def test_offsets_and_lengths(self):
        r1, r2, r3 = _blob()
        recs, _ = parse_warc(r1 + r2 + r3)
        assert [r["offset"] for r in recs] == [
            0, len(r1), len(r1) + len(r2)]
        # length spans version line through payload (trailer excluded)
        assert [r["length"] for r in recs] == [
            len(r1) - 4, len(r2) - 4, len(r3) - 4]

    def test_http_split(self):
        *_, r3 = _blob()
        recs, _ = parse_warc(r3)
        r = recs[0]
        assert r["http_status"] == 200
        assert r["http_content_type"] == "text/html; charset=utf-8"
        assert r["body_text"] == HTML
        assert r["target_uri"] == "http://e.com/"

    def test_request_has_no_status(self):
        _, r2, _ = _blob()
        recs, _ = parse_warc(r2)
        assert recs[0]["http_status"] is None
        assert recs[0]["body_text"] == ""

    def test_bare_lf_headers_accepted(self):
        raw = (b"WARC/1.0\nWARC-Type: metadata\nContent-Length: 2\n\n"
               b"ok\n\n")
        recs, err = parse_warc(raw)
        assert err is None and recs[0]["body_text"] == "ok"

    def test_first_header_occurrence_wins(self):
        raw = (b"WARC/1.0\r\nWARC-Type: a\r\nWARC-Type: b\r\n"
               b"Content-Length: 0\r\n\r\n\r\n\r\n")
        recs, _ = parse_warc(raw)
        assert recs[0]["warc_type"] == "a"

    def test_empty_input(self):
        assert parse_warc(b"") == ([], None)

    def test_trailing_junk_stops_with_offset(self):
        r1, r2, r3 = _blob()
        blob = r1 + r2 + r3
        recs, err = parse_warc(blob + b"NOTAWARC")
        assert len(recs) == 3
        assert err == f"bad magic at offset {len(blob)}"

    def test_truncated_payload(self):
        r1, *_ = _blob()
        recs, err = parse_warc(r1[:-10])
        assert recs == [] and err == "truncated payload at offset 0"

    def test_missing_content_length(self):
        recs, err = parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n")
        assert recs == [] and "missing content-length" in err


class TestParseGzip:
    def test_members_with_compressed_ranges(self):
        r1, r2, r3 = _blob()
        gz = b"".join(gzip.compress(r) for r in (r1, r2, r3))
        recs, err = parse_warc(gz)
        assert err is None and len(recs) == 3
        # each reported range is a complete standalone gzip member
        for r in recs:
            m = gz[r["offset"]:r["offset"] + r["length"]]
            assert gzip.decompress(m).startswith(b"WARC/1.0")

    def test_truncated_member(self):
        gz = gzip.compress(_blob()[0])
        recs, err = parse_warc(gz[:-4])
        assert recs == [] and "truncated gzip member" in err

    def test_junk_between_members(self):
        r1, r2, _ = _blob()
        gz = gzip.compress(r1) + b"xx" + gzip.compress(r2)
        recs, err = parse_warc(gz)
        assert len(recs) == 1 and "bad gzip magic" in err


class TestSparkSurfaces:
    @pytest.fixture()
    def frame(self, spark):
        r1, r2, r3 = _blob()
        rows = [(1, bytearray(r1 + r2 + r3)),
                (2, bytearray(gzip.compress(r1) + gzip.compress(r3))),
                (3, bytearray(b"garbage")),
                (4, None)]
        return spark.createDataFrame(rows, "doc_id int, content binary")

    def test_record_rows(self, frame):
        out = warc_record_rows(frame).orderBy("doc_id", "rec_index")
        rows = out.collect()
        assert [(r.doc_id, r.rec_index, r.warc_type) for r in rows] == [
            (1, 0, "warcinfo"), (1, 1, "request"), (1, 2, "response"),
            (2, 0, "warcinfo"), (2, 1, "response")]
        assert rows[4].body_text == HTML

    def test_stats(self, frame):
        out = {r.doc_id: r for r in warc_stats(frame).collect()}
        assert out[1].n_records == 3 and out[1].parse_error is None
        assert out[2].n_records == 2
        assert out[3].n_records == 0
        assert "bad magic" in out[3].parse_error
        assert out[4].n_records == 0 and out[4].parse_error is None

    def test_arrow_kernel_not_row_udf(self, frame):
        plan = (warc_record_rows(frame)
                ._jdf.queryExecution().executedPlan().toString())
        assert "MapInPandas" in plan
        assert "BatchEvalPython" not in plan
