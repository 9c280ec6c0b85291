"""fetch_ranges (pipeline/probe.py): every byte-range index in the
package must produce ranges that, sliced back out of the blob, frame
EXACTLY the record they index — the in-cluster equivalent of the HTTP
Range request a remote scheduler would issue.  Also drives real
.warc.gz files through spark.read.format('binaryFile') end to end."""

import gzip
import io
import tarfile

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.probe import fetch_ranges


def _tar_blob():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for n, p in (("a.txt", b"hello world"), ("b.bin", b"B" * 600)):
            ti = tarfile.TarInfo(n)
            ti.size = len(p)
            tf.addfile(ti, io.BytesIO(p))
    return buf.getvalue()


class TestRangesFrameRecords:
    def test_tar_data_ranges_slice_payloads(self, spark):
        from incubator_druid_spark.pipeline.webdataset import tar_members
        df = spark.createDataFrame([(1, bytearray(_tar_blob()))],
                                   "doc_id int, content binary")
        mem = tar_members(df, with_payload=False).join(df, "doc_id")
        out = {r.name: bytes(r.chunk) for r in fetch_ranges(
            mem, offset_col="data_offset", length_col="size").collect()}
        assert out["a.txt"] == b"hello world"
        assert out["b.bin"] == b"B" * 600

    def test_warc_ranges_reparse_standalone(self, spark):
        from incubator_druid_spark.pipeline.warc import (
            build_warc_record, parse_warc, warc_record_rows)
        r1 = build_warc_record("metadata", b"k: v",
                               {"WARC-Target-URI": "http://a/"})
        r2 = build_warc_record("metadata", b"x" * 80,
                               {"WARC-Target-URI": "http://b/"})
        df = spark.createDataFrame([(1, bytearray(r1 + r2))],
                                   "doc_id int, content binary")
        recs = warc_record_rows(df).join(df, "doc_id")
        sliced = fetch_ranges(recs, offset_col="offset",
                              length_col="length").collect()
        # each sliced range is a complete, independently parseable record
        for r in sliced:
            sub, err = parse_warc(bytes(r.chunk))
            assert err is None and len(sub) == 1
            assert sub[0]["target_uri"] == r.target_uri

    def test_mp3_frame_ranges(self, spark):
        from incubator_druid_spark.pipeline.multimodal import (
            mp3_frame_rows)
        # minimal 2-frame CBR MPEG1-LIII stream (from test_mp3_index's
        # header math): 128kbps @ 44100 -> 417-byte frames, no padding
        hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
        frame = hdr + b"\x00" * (417 - 4)
        df = spark.createDataFrame([(1, bytearray(frame * 2))],
                                   "doc_id int, content binary")
        rows = mp3_frame_rows(df).join(df, "doc_id")
        out = fetch_ranges(rows).orderBy("frame").collect()
        assert [bytes(r.chunk)[:4] for r in out] == [hdr, hdr]
        assert all(len(bytes(r.chunk)) == 417 for r in out)


class TestBinaryFileSource:
    def test_warc_gz_files_end_to_end(self, spark, tmp_path):
        from incubator_druid_spark.pipeline.warc import (
            build_warc_record, warc_record_rows)
        for i in range(3):
            rec = build_warc_record(
                "response",
                (f"HTTP/1.1 200 OK\r\n\r\npayload {i}").encode(),
                {"WARC-Target-URI": f"http://x/{i}",
                 "Content-Type": "application/http;msgtype=response"})
            (tmp_path / f"shard{i}.warc.gz").write_bytes(
                gzip.compress(rec))
        files = (spark.read.format("binaryFile")
                 .load(str(tmp_path / "*.warc.gz"))
                 .select(F.col("path").alias("doc_id"), "content"))
        out = warc_record_rows(files, id_col="doc_id").collect()
        assert len(out) == 3
        assert {r.body_text for r in out} == {
            "payload 0", "payload 1", "payload 2"}
        assert all(r.http_status == 200 for r in out)
