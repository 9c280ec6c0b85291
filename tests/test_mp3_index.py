"""MP3 frame index (pipeline/probe.py mp3_frame_index): per-frame byte
ranges / timestamps / bitrates from MPEG1 Layer III headers, zero decode
(ISO/IEC 11172-3 frame-size arithmetic, same as the probe tier)."""

from incubator_druid_spark.pipeline.probe import mp3_frame_index
from tests.test_probe import _mp3_frame


class TestMp3FrameIndex:
    def test_cbr_stream(self):
        frames = b"".join(_mp3_frame() for _ in range(5))
        rows = mp3_frame_index(frames)
        size = 144 * 128000 // 44100
        assert [(r["frame"], r["offset"], r["size"]) for r in rows] == \
            [(i + 1, i * size, size) for i in range(5)]
        assert [r["ts_ms"] for r in rows] == \
            [int(round(i * 1152 * 1000 / 44100)) for i in range(5)]
        assert all(r["bitrate_kbps"] == 128 for r in rows)

    def test_vbr_sizes_per_frame(self):
        data = _mp3_frame(9) + _mp3_frame(13) + _mp3_frame(9, pad=1)
        rows = mp3_frame_index(data)
        assert [r["bitrate_kbps"] for r in rows] == [128, 256, 128]
        assert rows[1]["offset"] == rows[0]["size"]
        assert rows[2]["size"] == rows[0]["size"] + 1  # padding byte

    def test_id3_tag_skipped(self):
        tag = b"ID3" + b"\x04\x00\x00" + b"\x00\x00\x00\x0a" + bytes(10)
        rows = mp3_frame_index(tag + _mp3_frame())
        assert len(rows) == 1 and rows[0]["offset"] == len(tag)

    def test_truncated_final_frame_not_emitted(self):
        data = _mp3_frame() + _mp3_frame()[:100]
        rows = mp3_frame_index(data)
        assert len(rows) == 1

    def test_max_frames_cap(self):
        frames = b"".join(_mp3_frame() for _ in range(10))
        assert len(mp3_frame_index(frames, max_frames=3)) == 3

    def test_spark_surface(self, spark):
        from incubator_druid_spark.pipeline.multimodal import mp3_frame_rows
        good = b"".join(_mp3_frame() for _ in range(4))
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(b"not audio"))],
            "doc_id long, content binary")
        rows = mp3_frame_rows(df).collect()
        assert sorted(r["frame"] for r in rows) == [1, 2, 3, 4]
        assert all(r["doc_id"] == 1 and r["bitrate_kbps"] == 128
                   for r in rows)

    def test_garbage_and_empty(self):
        assert mp3_frame_index(b"") == []
        assert mp3_frame_index(b"not audio at all") == []
        # junk before the first frame resyncs; junk after a frame stops
        rows = mp3_frame_index(b"\x00junk" + _mp3_frame() + b"\x00\x00")
        assert len(rows) == 1 and rows[0]["offset"] == 5
