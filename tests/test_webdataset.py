"""WebDataset tar parsing (pipeline/webdataset.py) — header
arithmetic vs the standard library's writer, malformed-input stops,
PAX/GNU surfaces, sample grouping, and the Arrow plan shape."""

import io
import tarfile

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.webdataset import (
    parse_tar,
    tar_members,
    tar_stats,
    webdataset_samples,
)


def _build(members, fmt=tarfile.USTAR_FORMAT):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
        for name, payload in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(payload)
            tf.addfile(ti, io.BytesIO(payload))
    return buf.getvalue()


SAMPLE = [("000001.txt", b"hello world"),
          ("000001.json", b'{"id": 1}'),
          ("000001.bin", b"B" * 600),
          ("sub/dir/000002.seg.png", b"P" * 100),
          ("empty.txt", b"")]


class TestParseTar:
    def test_matches_tarfile_offsets(self):
        blob = _build(SAMPLE)
        recs, err = parse_tar(blob)
        assert err is None
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            ref = tf.getmembers()
        assert [(m["name"], m["offset"], m["data_offset"], m["size"])
                for m in recs] == \
               [(t.name, t.offset, t.offset_data, t.size) for t in ref]

    def test_payload_bytes(self):
        recs, _ = parse_tar(_build(SAMPLE))
        assert recs[0]["payload"] == b"hello world"
        assert recs[4]["payload"] == b""

    def test_truncated_member_reports_offset(self):
        blob = _build(SAMPLE)
        recs, err = parse_tar(blob[:2600])  # cuts 000001.bin's data
        assert len(recs) == 2
        assert err == "truncated member at offset 2048"

    def test_garbage_header(self):
        recs, err = parse_tar(b"X" * 512)
        assert recs == [] and "bad header at offset 0" == err

    def test_empty_blob(self):
        assert parse_tar(b"") == ([], None)

    def test_pax_extended_headers_resolved_by_writer(self):
        # PAX_FORMAT writes x-headers; plain short names still resolve
        recs, err = parse_tar(_build([("a.txt", b"hi")],
                                     fmt=tarfile.PAX_FORMAT))
        assert err is None
        assert ("a.txt", "0") in [(m["name"], m["typeflag"])
                                  for m in recs]

    def test_gnu_longname_surfaces_L_member(self):
        recs, err = parse_tar(_build([("x" * 120 + ".txt", b"hi")],
                                     fmt=tarfile.GNU_FORMAT))
        assert err is None
        assert [m["typeflag"] for m in recs] == ["L", "0"]


class TestSparkSurfaces:
    @pytest.fixture()
    def shards(self, spark):
        rows = [(1, bytearray(_build(SAMPLE))),
                (2, bytearray(b"not a tar at all" + b"\x00" * 500)),
                (3, None)]
        return spark.createDataFrame(rows, "doc_id int, content binary")

    def test_member_rows(self, shards):
        out = tar_members(shards).orderBy("doc_id", "member_idx")
        rows = out.collect()
        assert [r.name for r in rows[:3]] == [
            "000001.txt", "000001.json", "000001.bin"]
        assert bytes(rows[0].payload) == b"hello world"

    def test_stats_reports_errors(self, shards):
        out = {r.doc_id: r for r in tar_stats(shards).collect()}
        assert out[1].n_members == 5 and out[1].parse_error is None
        assert out[2].n_members == 0 and "bad" in out[2].parse_error
        assert out[3].n_members == 0 and out[3].parse_error is None

    def test_sample_grouping(self, shards):
        mem = tar_members(shards, with_payload=False)
        out = {(r.doc_id, r.sample_key): r
               for r in webdataset_samples(mem).collect()}
        s1 = out[(1, "000001")]
        assert s1.n_parts == 3 and s1.exts == ["bin", "json", "txt"]
        assert s1.total_bytes == 11 + 9 + 600
        # nested dir keeps its directory in the key, first-dot split
        s2 = out[(1, "sub/dir/000002")]
        assert s2.exts == ["seg.png"]

    def test_plan_is_map_in_pandas(self, shards):
        p = (tar_members(shards)
             ._jdf.queryExecution().executedPlan().toString())
        assert "MapInPandas" in p and "BatchEvalPython" not in p
