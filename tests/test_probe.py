"""Header-only media probing (pipeline/probe.py): dimensions/duration/
rates from container headers with ZERO decode — including the probe-only
tier (MP4 boxes, MP3 frame headers + Xing, Ogg Opus/Vorbis) whose decode
raises.  Vectors come from this repo's own encoders where they exist and
hand-built minimal containers where they don't."""

import struct

import numpy as np

from incubator_druid_spark.pipeline.probe import probe_media


def test_image_formats():
    from incubator_druid_spark.pipeline.gif import encode_gif
    from incubator_druid_spark.pipeline.jpeg import (encode_baseline_jpeg,
                                                     encode_progressive_jpeg)
    from incubator_druid_spark.pipeline.png import encode_png
    # small palette so the GIF encoder (<=256 colors) accepts it; the
    # probe reads headers only, pixel content is irrelevant
    img = (np.random.default_rng(0).integers(0, 4, (17, 29, 3))
           * 60).astype(np.uint8)
    for data, mime in (
            (encode_baseline_jpeg(img), "image/jpeg"),
            (encode_progressive_jpeg(img), "image/jpeg"),
            (encode_png(img), "image/png"),
            (encode_gif(img), "image/gif"),
            (b"P6\n29 17\n255\n" + bytes(29 * 17 * 3),
             "image/x-portable-pixmap")):
        m = probe_media(data)
        assert (m["mime"], m["width"], m["height"]) == (mime, 29, 17), mime


def test_wav_and_flac():
    import io
    import wave

    from incubator_druid_spark.pipeline.flac import encode_flac
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(b"\x00\x00" * 8000)  # 0.5 s
    m = probe_media(buf.getvalue())
    assert (m["mime"], m["sample_rate"], m["duration_ms"],
            m["n_frames"]) == ("audio/wav", 16000, 500, 8000)

    x = np.zeros((24000, 1), np.int64)
    m = probe_media(encode_flac(x, sample_rate=48000))
    assert (m["mime"], m["sample_rate"], m["duration_ms"],
            m["n_frames"]) == ("audio/flac", 48000, 500, 24000)


def test_avi():
    from incubator_druid_spark.pipeline.avi import encode_mjpeg_avi
    frames = [np.zeros((16, 24, 3), np.uint8)] * 10
    m = probe_media(encode_mjpeg_avi(frames, fps=20.0))
    assert (m["mime"], m["width"], m["height"], m["n_frames"],
            m["duration_ms"]) == ("video/x-msvideo", 24, 16, 10, 500)


def _box(fourcc, body):
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _tkhd(w, h):
    # v0: 4 ver+flags + 20 times/ids/duration + 16 reserved/layer/volume
    # + 36 matrix = 76 bytes before the 16.16 fixed-point width/height
    return bytes(76) + struct.pack(">II", w << 16, h << 16)


def _mdhd(timescale):
    return bytes(12) + struct.pack(">I", timescale) + bytes(8)


def _hdlr(handler):
    return bytes(8) + handler + bytes(12)


def test_mp4_boxes():
    mvhd = bytes(12) + struct.pack(">II", 1000, 5500) + bytes(80)
    moov = _box(b"moov", _box(b"mvhd", mvhd)
                + _box(b"trak", _box(b"tkhd", _tkhd(640, 360))
                       + _box(b"mdia", _box(b"mdhd", _mdhd(44100))
                              + _box(b"hdlr", _hdlr(b"soun")))))
    data = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov
    m = probe_media(data)
    assert m["mime"] == "video/mp4"
    assert (m["width"], m["height"]) == (640, 360)
    assert m["duration_ms"] == 5500
    assert m["sample_rate"] == 44100


def test_mp4_video_track_timescale_is_not_a_sample_rate():
    # typical mux order: video trak (timescale 90000, mdhd before hdlr)
    # first, audio trak second — the rate must come from the 'soun' trak
    video = _box(b"trak", _box(b"tkhd", _tkhd(1920, 1080))
                 + _box(b"mdia", _box(b"mdhd", _mdhd(90000))
                        + _box(b"hdlr", _hdlr(b"vide"))))
    audio = _box(b"trak", _box(b"tkhd", _tkhd(0, 0))
                 + _box(b"mdia", _box(b"mdhd", _mdhd(48000))
                        + _box(b"hdlr", _hdlr(b"soun"))))
    mvhd = bytes(12) + struct.pack(">II", 90000, 90000 * 3) + bytes(80)
    data = _box(b"ftyp", b"isom" + bytes(12)) + \
        _box(b"moov", _box(b"mvhd", mvhd) + video + audio)
    m = probe_media(data)
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["sample_rate"] == 48000
    assert m["duration_ms"] == 3000
    # video-only file: no sample_rate at all
    data = _box(b"moov", _box(b"mvhd", mvhd) + video)
    m = probe_media(_box(b"ftyp", b"isom" + bytes(12)) + data)
    assert m["sample_rate"] is None


def _mp3_frame(bitrate_idx=9, sr_idx=0, pad=0):
    # MPEG1 Layer III header: sync, version 3, layer 1, no CRC
    h = bytes([0xFF, 0xFB, (bitrate_idx << 4) | (sr_idx << 2) | (pad << 1),
               0x00])  # stereo
    length = 144 * [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                    256, 320][bitrate_idx] * 1000 // 44100 + pad
    return h + bytes(length - 4)


def test_mp3_cbr_and_xing():
    frames = b"".join(_mp3_frame() for _ in range(20))
    m = probe_media(frames)
    assert (m["mime"], m["sample_rate"]) == ("audio/mpeg", 44100)
    # CBR estimate: bytes * 8 / bitrate
    assert abs(m["duration_ms"] - len(frames) * 8000 // 128000) <= 1

    # Xing header in the first frame → exact frame count
    first = bytearray(_mp3_frame())
    off = 4 + 32  # stereo side-info offset
    first[off:off + 4] = b"Xing"
    first[off + 4:off + 8] = struct.pack(">I", 1)  # flags: FRAMES
    first[off + 8:off + 12] = struct.pack(">I", 1000)
    data = b"ID3" + b"\x04\x00\x00" + b"\x00\x00\x00\x0a" + bytes(10) + \
        bytes(first) + frames
    m = probe_media(data)
    assert m["n_frames"] == 1000
    assert m["duration_ms"] == int(round(1000 * 1152 * 1000 / 44100))


def _ogg_page(body, granule=0, header_type=2, seq=0):
    segs = [255] * (len(body) // 255) + [len(body) % 255]
    return (b"OggS\x00" + bytes([header_type])
            + struct.pack("<q", granule) + struct.pack("<I", 7)
            + struct.pack("<I", seq) + b"\x00\x00\x00\x00"
            + bytes([len(segs)]) + bytes(segs) + body)


def test_ogg_opus_and_vorbis():
    opus_head = b"OpusHead\x01\x02\x38\x01" + struct.pack("<I", 24000) + \
        b"\x00\x00\x00"
    data = _ogg_page(opus_head) + _ogg_page(b"\x00" * 10, granule=96000,
                                            header_type=4, seq=1)
    m = probe_media(data)
    assert m["mime"] == "audio/ogg"
    assert m["sample_rate"] == 24000   # original rate from OpusHead
    assert m["duration_ms"] == 2000    # granules are always 48 kHz

    vorbis_id = b"\x01vorbis" + b"\x00\x00\x00\x00" + b"\x02" + \
        struct.pack("<I", 22050) + bytes(16)
    data = _ogg_page(vorbis_id) + _ogg_page(b"\x00" * 10, granule=44100,
                                            header_type=4, seq=1)
    m = probe_media(data)
    assert (m["sample_rate"], m["duration_ms"]) == (22050, 2000)


def test_malformed_never_raises():
    for junk in (b"", b"\xFF\xD8\xFF", b"RIFF1234AVI ", b"ID3garbage",
                 b"OggSgarbage", b"\x00\x00\x00\x08ftyp"):
        m = probe_media(junk)
        assert isinstance(m, dict) and "mime" in m


def test_malformed_header_values_clamped_to_int32():
    # a WAV whose data-chunk size claims 0xFFFFFFFF bytes: n_frames would
    # be 2^32-1 and overflow the media struct's int32 field at the Arrow
    # boundary — the probe must clamp it to None, not crash the scan
    wav = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
           + b"data" + struct.pack("<I", 0xFFFFFFFF) + bytes(16))
    m = probe_media(wav)
    assert m["mime"] == "audio/wav"
    assert m["sample_rate"] == 8000
    assert m["n_frames"] is None
    # a PNG claiming 4-billion-pixel width clamps too
    png = b"\x89PNG\r\n\x1a\n" + bytes(8) + \
        struct.pack(">II", 0xFFFFFFFF, 10)
    m = probe_media(png)
    assert m["width"] is None and m["height"] == 10


def test_attach_media_metadata_probe_mode(spark):
    from pyspark.sql import functions as F

    from incubator_druid_spark.pipeline.multimodal import \
        attach_media_metadata
    from incubator_druid_spark.pipeline.png import encode_png
    img = np.zeros((5, 9, 3), np.uint8)
    df = spark.createDataFrame([(1, bytearray(encode_png(img)))],
                               "id long, content binary")
    row = attach_media_metadata(df, probe=True).select("media").collect()[0]
    media = row["media"]
    assert media["mime"] == "image/png"
    assert (media["width"], media["height"]) == (9, 5)


def test_filter_before_decode_image_gate(spark):
    from incubator_druid_spark.pipeline.multimodal import \
        decode_image_features
    from incubator_druid_spark.pipeline.png import encode_png
    ok = encode_png(np.zeros((20, 32, 3), np.uint8))
    small = encode_png(np.zeros((4, 5, 3), np.uint8))
    # valid IHDR claiming 6x6 but truncated body: decoding it would raise,
    # so surviving the query proves the probe gate runs BEFORE decode
    broken = encode_png(np.zeros((6, 6, 3), np.uint8))[:40]
    df = spark.createDataFrame(
        [(1, bytearray(ok)), (2, bytearray(small)), (3, bytearray(broken))],
        "id long, content binary")
    out = decode_image_features(df, fake=False, min_width=10).collect()
    assert [r["id"] for r in out] == [1]
    assert (out[0]["width"], out[0]["height"]) == (32, 20)
    # max_pixels drops the large one instead
    out = decode_image_features(df, fake=False, min_width=None,
                                max_pixels=30).collect()
    assert [r["id"] for r in out] == [2]


def test_filter_before_decode_audio_gate(spark):
    import io
    import wave

    from incubator_druid_spark.pipeline.multimodal import \
        extract_audio_features

    def wav(n, sr=16000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(sr)
            wf.writeframes(b"\x00\x00" * n)
        return buf.getvalue()

    # an MP3 would raise NotImplementedError in decode; the probe gate
    # (no parseable duration ≤ limit ⇒ dropped... here: 1000-frame Xing
    # MP3 = ~26 s) must drop it BEFORE decode is attempted
    mp3 = bytearray(b"\xFF\xFB\x90\x00" + bytes(413))
    mp3[36:40] = b"Xing"
    mp3[40:44] = struct.pack(">I", 1)
    mp3[44:48] = struct.pack(">I", 1000)
    df = spark.createDataFrame(
        [(1, bytearray(wav(8000))), (2, bytearray(wav(80000))),
         (3, bytes(mp3))],
        "id long, content binary")
    out = extract_audio_features(df, fake=False,
                                 max_duration_ms=1000).collect()
    assert [r["id"] for r in out] == [1]
    assert out[0]["duration_ms"] == 500
    # rate + duration gates compose: the 8 kHz wav fails the rate gate,
    # the ~26 s MP3 fails the duration gate (dropped BEFORE its decode
    # would raise NotImplementedError), both wav 16 kHz rows pass
    df2 = spark.createDataFrame(
        [(1, bytearray(wav(8000))), (2, bytearray(wav(80000))),
         (3, bytearray(wav(1000, sr=8000))), (4, bytes(mp3))],
        "id long, content binary")
    out = extract_audio_features(df2, fake=False, min_sample_rate=16000,
                                 max_duration_ms=10000).collect()
    assert sorted(r["id"] for r in out) == [1, 2]


def test_probe_webp_variants():
    """WEBP header tier (RFC 9649): VP8L lossless bit-packed dims, lossy
    'VP8 ' key-frame dims behind the 9D 01 2A start code, and VP8X
    extended canvas (24-bit minus-one) — all without decode."""
    import struct

    def riff(chunk):
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    def chunk(fourcc, body):
        return fourcc + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    # VP8L: width=17, height=9
    bits = (17 - 1) | ((9 - 1) << 14)
    m = probe_media(riff(chunk(b"VP8L", b"\x2f" + struct.pack("<I", bits))))
    assert (m["mime"], m["width"], m["height"]) == ("image/webp", 17, 9)

    # VP8 lossy: 3-byte frame tag, start code, 14-bit LE dims
    body = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", 640, 480)
    m = probe_media(riff(chunk(b"VP8 ", body)))
    assert (m["mime"], m["width"], m["height"]) == ("image/webp", 640, 480)

    # VP8X: flags + reserved, then 24-bit canvas dims minus one
    body = bytes(4) + (1919).to_bytes(3, "little") + (1079).to_bytes(3, "little")
    m = probe_media(riff(chunk(b"VP8X", body)))
    assert (m["mime"], m["width"], m["height"]) == ("image/webp", 1920, 1080)

    # truncated/garbage chunk degrades to mime-only, never raises
    m = probe_media(riff(b"VP8L" + struct.pack("<I", 99)))
    assert m["mime"] == "image/webp" and m["width"] is None


def test_probe_ogg_flac():
    """FLAC-in-Ogg mapping: the first packet is 0x7F'FLAC' wrapping the
    native fLaC STREAMINFO — rate, total samples and duration come from
    the embedded header, no Ogg demux or FLAC decode."""
    import struct
    sr, total = 22050, 44100  # exactly 2 s
    si = bytes(10) + ((sr << 44) | total).to_bytes(8, "big") + bytes(16)
    pkt = (b"\x7fFLAC\x01\x00" + struct.pack(">H", 1)
           + b"fLaC" + b"\x80" + (34).to_bytes(3, "big") + si)
    page = (b"OggS\x00\x02" + struct.pack("<q", 0)
            + struct.pack("<II", 9, 0) + bytes(4)
            + bytes([1, len(pkt)]) + pkt)
    m = probe_media(page)
    assert m["mime"] == "audio/ogg"
    assert m["sample_rate"] == sr
    assert m["n_frames"] == total
    assert m["duration_ms"] == 2000
