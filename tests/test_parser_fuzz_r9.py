"""Property-based robustness for the round-9 parsers: WARC and tar
parsers must TERMINATE and return (records, error) on ARBITRARY bytes
— crawl data contains every corruption imaginable, and a kernel that
throws kills the whole task.  Also: valid archives round-trip whatever
prefix survives truncation, and parsed byte ranges always lie inside
the blob."""

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from incubator_druid_spark.pipeline.warc import (
    build_warc_record,
    parse_warc,
)
from incubator_druid_spark.pipeline.webdataset import parse_tar


@st.composite
def warc_blobs(draw):
    recs = draw(st.lists(st.tuples(
        st.sampled_from(["response", "request", "metadata"]),
        st.binary(max_size=200)), max_size=4))
    return b"".join(build_warc_record(t, p) for t, p in recs)


class TestWarcFuzz:
    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=2048))
    def test_arbitrary_bytes_never_raise(self, data):
        recs, err = parse_warc(data)
        assert isinstance(recs, list)
        assert err is None or isinstance(err, str)
        for r in recs:
            assert 0 <= r["offset"] <= len(data)
            assert r["offset"] + r["length"] <= len(data)

    @settings(max_examples=100, deadline=None)
    @given(warc_blobs(), st.integers(min_value=0, max_value=1000))
    def test_truncation_keeps_valid_prefix(self, blob, cut):
        full, _ = parse_warc(blob)
        part, _err = parse_warc(blob[:cut])
        assert len(part) <= len(full)
        for a, b in zip(part, full):
            assert a["offset"] == b["offset"]
            assert a["body_text"] == b["body_text"]

    @settings(max_examples=50, deadline=None)
    @given(warc_blobs(), st.binary(min_size=1, max_size=64))
    def test_gzip_members_with_junk_tail(self, blob, junk):
        if not blob:
            return
        gz = gzip.compress(blob)
        recs, err = parse_warc(gz + junk)
        assert isinstance(recs, list)
        # junk after the member is reported, records survive
        full, _ = parse_warc(blob)
        assert len(recs) == len(full)


class TestTarFuzz:
    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=4096))
    def test_arbitrary_bytes_never_raise(self, data):
        recs, err = parse_tar(data)
        assert isinstance(recs, list)
        assert err is None or isinstance(err, str)
        for m in recs:
            assert 0 <= m["offset"] < len(data)
            assert m["data_offset"] + m["size"] <= len(data)

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.tuples(
        st.text(alphabet="abcdefghij./", min_size=1, max_size=30)
          .filter(lambda s: not s.startswith("/") and ".." not in s
                  and not s.endswith("/")),
        st.binary(max_size=600)), min_size=1, max_size=4),
        st.integers(min_value=0, max_value=4096))
    def test_tarfile_written_truncation(self, members, cut):
        import io
        import tarfile
        # unique names; tarfile accepts duplicates but parsers index
        names = set()
        uniq = []
        for n, p in members:
            if n not in names:
                names.add(n)
                uniq.append((n, p))
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w",
                          format=tarfile.USTAR_FORMAT) as tf:
            for n, p in uniq:
                ti = tarfile.TarInfo(n)
                ti.size = len(p)
                tf.addfile(ti, io.BytesIO(p))
        blob = buf.getvalue()
        full, err = parse_tar(blob)
        assert err is None and len(full) == len(uniq)
        part, _ = parse_tar(blob[:cut])
        assert len(part) <= len(full)
        for a, b in zip(part, full):
            assert (a["name"], a["offset"], a["size"]) == \
                (b["name"], b["offset"], b["size"])
