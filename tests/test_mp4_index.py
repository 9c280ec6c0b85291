"""MP4 sample index (pipeline/probe.py mp4_sample_index + the
mp4_sample_rows Spark surface): per-sample timestamps / byte ranges /
keyframe flags straight from the ISO-BMFF sample tables, zero decode.
Fixture boxes follow ISO/IEC 14496-12 §8.5-8.7 layouts."""

import struct

from incubator_druid_spark.pipeline.probe import mp4_sample_index


def _box(name, body):
    return struct.pack(">I", 8 + len(body)) + name + body


def _full(name, body, ver=0):
    return _box(name, bytes([ver, 0, 0, 0]) + body)


def _stts(entries):
    return _full(b"stts", struct.pack(">I", len(entries)) +
                 b"".join(struct.pack(">II", c, d) for c, d in entries))


def _stsz(sizes, fixed=0):
    body = struct.pack(">II", fixed, len(sizes) if not fixed else len(sizes))
    if not fixed:
        body += b"".join(struct.pack(">I", s) for s in sizes)
    return _full(b"stsz", body)


def _stsc(entries):
    return _full(b"stsc", struct.pack(">I", len(entries)) +
                 b"".join(struct.pack(">III", f, s, 1) for f, s in entries))


def _stco(offsets):
    return _full(b"stco", struct.pack(">I", len(offsets)) +
                 b"".join(struct.pack(">I", o) for o in offsets))


def _co64(offsets):
    return _full(b"co64", struct.pack(">I", len(offsets)) +
                 b"".join(struct.pack(">Q", o) for o in offsets))


def _stss(samples):
    return _full(b"stss", struct.pack(">I", len(samples)) +
                 b"".join(struct.pack(">I", s) for s in samples))


def _stsd(fourcc):
    entry = struct.pack(">I", 16) + fourcc + bytes(8)
    return _full(b"stsd", struct.pack(">I", 1) + entry)


def _mdhd(scale):
    # v0: creation(4) + modification(4) + timescale(4) + duration(4) +
    # language/pre_defined(4)
    return _full(b"mdhd", bytes(8) + struct.pack(">II", scale, 0) +
                 bytes(4))


def _hdlr(handler):
    return _full(b"hdlr", bytes(4) + handler + bytes(12))


def _trak(scale, handler, fourcc, stbl_children):
    stbl = _box(b"stbl", b"".join(stbl_children))
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", _mdhd(scale) + _hdlr(handler) + minf)
    return _box(b"trak", mdia)


def _video_mp4(co=None):
    trak = _trak(1000, b"vide", b"avc1", [
        _stsd(b"avc1"),
        _stts([(3, 100), (2, 200)]),
        _stsz([10, 20, 30, 40, 50]),
        _stsc([(1, 2), (3, 1)]),
        co if co is not None else _stco([1000, 2000, 3000]),
        _stss([1, 4]),
    ])
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isom") + _box(b"moov", trak)


EXPECTED = [
    # (sample, dts_ms, offset, size, keyframe)
    (1, 0, 1000, 10, True),
    (2, 100, 1010, 20, False),
    (3, 200, 2000, 30, False),
    (4, 300, 2030, 40, True),
    (5, 500, 3000, 50, False),
]


class TestMp4SampleIndex:
    def test_full_index(self):
        rows = mp4_sample_index(_video_mp4())
        assert [(r["sample"], r["dts_ms"], r["offset"], r["size"],
                 r["keyframe"]) for r in rows] == EXPECTED
        assert all(r["codec"] == "avc1" and r["handler"] == "vide"
                   and r["track"] == 1 for r in rows)

    def test_co64_offsets(self):
        rows = mp4_sample_index(_video_mp4(
            co=_co64([1000, 2000, 3000])))
        assert [r["offset"] for r in rows] == [1000, 1010, 2000, 2030, 3000]

    def test_no_stss_means_all_keyframes(self):
        trak = _trak(1000, b"vide", b"avc1", [
            _stsd(b"avc1"), _stts([(2, 100)]), _stsz([5, 6]),
            _stsc([(1, 2)]), _stco([100]),
        ])
        rows = mp4_sample_index(_box(b"moov", trak))
        assert [r["keyframe"] for r in rows] == [True, True]

    def test_fixed_sample_size(self):
        stsz = _full(b"stsz", struct.pack(">II", 7, 3))
        trak = _trak(1000, b"soun", b"mp4a", [
            _stsd(b"mp4a"), _stts([(3, 10)]), stsz,
            _stsc([(1, 3)]), _stco([50]),
        ])
        rows = mp4_sample_index(_box(b"moov", trak))
        assert [(r["offset"], r["size"]) for r in rows] == \
            [(50, 7), (57, 7), (64, 7)]
        assert rows[0]["handler"] == "soun"

    def test_timescale_conversion(self):
        trak = _trak(90000, b"vide", b"avc1", [
            _stsd(b"avc1"), _stts([(2, 3003)]), _stsz([1, 1]),
            _stsc([(1, 2)]), _stco([0]),
        ])
        rows = mp4_sample_index(_box(b"moov", trak))
        assert [r["dts_ms"] for r in rows] == [0, 33]  # 3003/90000 s

    def test_malformed_and_truncated(self):
        assert mp4_sample_index(b"") == []
        assert mp4_sample_index(b"\x00\x00\x00\x08ftyp") == []
        assert mp4_sample_index(_video_mp4()[:40]) == []
        # sample tables referencing more samples than stts carries
        trak = _trak(1000, b"vide", b"avc1", [
            _stsd(b"avc1"), _stts([(1, 100)]), _stsz([1, 2, 3]),
            _stsc([(1, 3)]), _stco([0]),
        ])
        assert mp4_sample_index(_box(b"moov", trak)) == []


class TestMp4SampleRows:
    def test_spark_surface(self, spark):
        from incubator_druid_spark.pipeline.multimodal import mp4_sample_rows
        df = spark.createDataFrame(
            [(1, bytearray(_video_mp4())), (2, bytearray(b"not an mp4"))],
            "doc_id long, content binary")
        rows = sorted(
            (r["doc_id"], r["sample"], r["dts_ms"], r["offset"],
             r["keyframe"])
            for r in mp4_sample_rows(df).collect())
        assert rows == [(1, s, d, o, k) for s, d, o, _, k in EXPECTED]

    def test_keyframe_selection_shape(self, spark):
        from incubator_druid_spark.pipeline.multimodal import mp4_sample_rows
        from pyspark.sql import functions as F
        df = spark.createDataFrame(
            [(i, bytearray(_video_mp4())) for i in range(4)],
            "doc_id long, content binary")
        keys = mp4_sample_rows(df).filter(F.col("keyframe"))
        assert keys.count() == 8  # 2 keyframes x 4 docs
