"""Multimodal column handling: image/audio/video as opaque binary + metadata.

Convention: a multimodal table carries
    content   binary          — the encoded media bytes
    media     struct<mime:string, width:int, height:int, duration_ms:long,
                     sample_rate:int, n_frames:int>   — typed metadata

The Spark-side plumbing (schemas, batch iteration via mapInPandas, partition
sizing) is real and tested.  Codecs come in two tiers:

- **pure-Python decoders (real, end-to-end)**: P6 PPM and 24-bit BI_RGB BMP
  images, RIFF/WAV PCM audio (stdlib ``wave``), and concatenated-PPM video
  streams — ``fake=False`` decodes these fully (header parse → pixel/PCM
  numpy arrays → resize/pool features), value-checked in tests and via the
  ``multimodal_decode`` driver oracle entry.
- **codec-library formats** (JPEG/PNG/MP4/MP3 — PIL/ffmpeg/soundfile are NOT
  in this container): ``fake=False`` raises NotImplementedError naming the
  format at the exact point the codec call would occur; swapping in a real
  codec changes only the marked kernel lines.  ``fake=True`` keeps the
  deterministic hash-derived stand-ins for shape-level plumbing tests.

Scale notes: mapInPandas streams Arrow batches — bytes never materialize as
Python lists; `spark.sql.files.maxPartitionBytes` bounds per-task memory, and
decode parallelism is the scan's partition count (no shuffle introduced).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])


def attach_media_metadata(df: DataFrame, content_col: str = "content",
                          mime: str = "application/octet-stream",
                          probe: bool = False) -> DataFrame:
    """Add a typed `media` struct.

    Default: mime sniffed from magic bytes JVM-side (codegen, no Python).
    probe=True: an Arrow-batched header probe (pipeline/probe.py) FILLS
    width/height/duration_ms/sample_rate/n_frames from container headers
    without decoding — incl. probe-only formats (MP4 boxes, MP3 frame
    headers + Xing, Ogg Opus/Vorbis) whose decode raises."""
    if probe:
        from incubator_druid_spark.pipeline.probe import probe_media
        fields = ("mime", "width", "height", "duration_ms", "sample_rate",
                  "n_frames")
        out_schema = T.StructType(list(df.schema.fields)
                                  + [T.StructField("media", MEDIA_STRUCT)])

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["media"] = [
                    {k: m[k] for k in fields}
                    for m in (probe_media(b, mime)
                              for b in pdf[content_col])]
                yield pdf

        return df.mapInPandas(kernel, schema=out_schema)
    c = F.col(content_col)
    sniffed = (F.when(F.hex(F.substring(c, 1, 3)) == "FFD8FF", "image/jpeg")
                .when(F.hex(F.substring(c, 1, 4)) == "89504E47", "image/png")
                .when((F.substring(c, 1, 4).cast("string") == "RIFF")
                      & (F.substring(c, 9, 4).cast("string") == "AVI "),
                      "video/x-msvideo")
                .when(F.substring(c, 1, 4).cast("string") == "RIFF", "audio/wav")
                .when(F.substring(c, 1, 4).cast("string") == "fLaC",
                      "audio/flac")
                .otherwise(mime))
    return df.withColumn("media", F.struct(
        sniffed.alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("n_frames"),
    ))


def mp4_sample_rows(df: DataFrame, content_col: str = "content",
                    id_col: str = "doc_id") -> DataFrame:
    """Explode MP4 binaries into per-sample rows — the zero-decode
    frame-scheduling surface (pipeline/probe.py mp4_sample_index): one
    row per sample with (track, sample, dts_ms, offset, size, keyframe,
    handler, codec).  A curation job filters this frame (keyframes only,
    every Nth sample, dts ranges) and fetches just the selected BYTE
    RANGES — no codec, no full-file decode.  Arrow mapInPandas; rows for
    malformed blobs are simply absent (probe-tier contract)."""
    from incubator_druid_spark.pipeline.probe import mp4_sample_index

    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["track", "sample", "dts_ms", "offset", "size",
                "keyframe", "handler", "codec"]
        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[content_col]):
                for s in mp4_sample_index(blob):
                    out.append({id_col: rid, **{k: s[k] for k in cols}})
            yield pd.DataFrame(
                out, columns=[id_col] + cols) if out else pd.DataFrame(
                {c: [] for c in [id_col] + cols})

    return df.select(id_col, content_col).mapInPandas(
        kernel,
        schema=(f"{id_col} {id_type}, track int, sample long, dts_ms long, "
                "offset long, size long, keyframe boolean, handler string, "
                "codec string"))


def mp3_frame_rows(df: DataFrame, content_col: str = "content",
                   id_col: str = "doc_id",
                   max_frames: int | None = None) -> DataFrame:
    """Explode MP3 binaries into per-frame rows (pipeline/probe.py
    mp3_frame_index) — the audio counterpart of mp4_sample_rows: one row
    per frame with (frame, ts_ms, offset, size, bitrate_kbps), so time
    ranges of audio cut by BYTE RANGE without a codec.  Arrow
    mapInPandas; malformed blobs yield no rows."""
    from incubator_druid_spark.pipeline.probe import mp3_frame_index

    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["frame", "ts_ms", "offset", "size", "bitrate_kbps"]
        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[content_col]):
                for s in mp3_frame_index(blob, max_frames=max_frames):
                    out.append({id_col: rid, **{k: s[k] for k in cols}})
            yield pd.DataFrame(
                out, columns=[id_col] + cols) if out else pd.DataFrame(
                {c: [] for c in [id_col] + cols})

    return df.select(id_col, content_col).mapInPandas(
        kernel,
        schema=(f"{id_col} {id_type}, frame long, ts_ms long, offset long, "
                "size long, bitrate_kbps long"))


def _fake_pixels(data: bytes, w: int, h: int) -> list[float]:
    """Deterministic stand-in for a decoded+pooled image: hash-seeded floats."""
    h0 = hashlib.sha256(data or b"").digest()
    return [h0[i % 32] / 255.0 for i in range(8)]


# ---------------------------------------------------------------------------
# Pure-Python codecs (no external libraries)
# ---------------------------------------------------------------------------

def _parse_ppm(data: bytes, offset: int = 0):
    """Binary PPM (P6): returns ((h, w, 3) uint8 array, end offset).

    Netpbm header grammar: 'P6', whitespace-separated width/height/maxval
    with '#' comments, ONE whitespace byte, then w*h*3 raw RGB bytes."""
    import numpy as np
    if data[offset:offset + 2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, fields = offset + 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    n = w * h * 3
    px = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return px.reshape(h, w, 3).copy(), pos + n


def _parse_bmp(data: bytes):
    """Uncompressed 24-bit BI_RGB BMP → (h, w, 3) uint8 RGB array.

    Rows are 4-byte aligned and stored bottom-up when height > 0; pixels
    are BGR on disk."""
    import numpy as np
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}; only "
                                  "24-bit BI_RGB supported")
    bottom_up, h = h > 0, abs(h)
    row = (w * 3 + 3) // 4 * 4
    arr = (np.frombuffer(data, np.uint8, count=row * h, offset=off)
           .reshape(h, row)[:, :w * 3].reshape(h, w, 3)[..., ::-1])
    return (arr[::-1] if bottom_up else arr).copy()


def _decode_image(data: bytes):
    """Dispatch on magic bytes → RGB array, or raise for codec formats."""
    if data[:2] == b"P6":
        arr, _ = _parse_ppm(data)
        return arr
    if data[:2] == b"BM":
        return _parse_bmp(data)
    if data[:2] == b"\xFF\xD8":
        # baseline (SOF0/1) + progressive (SOF2) JPEG — pure-Python
        # Huffman+IDCT decoder (pipeline/jpeg.py); arithmetic coding
        # raises there by name
        from incubator_druid_spark.pipeline.jpeg import decode_baseline_jpeg
        return decode_baseline_jpeg(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        # pure-Python zlib-inflate + unfilter decoder (pipeline/png.py):
        # 8-bit grey/RGB/GA/RGBA + 1/2/4/8-bit palette, Adam7 included
        from incubator_druid_spark.pipeline.png import decode_png_rgb
        return decode_png_rgb(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        # pure-Python LZW decoder (pipeline/gif.py): first frame composited
        # onto the logical screen, interlace + transparency honored
        from incubator_druid_spark.pipeline.gif import decode_gif
        return decode_gif(bytes(data))
    if data[:4] == b"RIFF" and bytes(data[8:12]) == b"WEBP":
        # pure-Python WEBP (pipeline/webp.py): VP8L lossless (prefix
        # codes, meta groups, color cache, LZ77, all four inverse
        # transforms) and lossy VP8 KEY frames (pipeline/vp8.py, RFC
        # 6386 intra — see its docstring for deblocking/table caveats)
        from incubator_druid_spark.pipeline.webp import decode_vp8l
        return decode_vp8l(bytes(data))
    head = bytes(data[:4])
    raise NotImplementedError(
        f"image codec for magic {head!r} not available in this environment "
        "(pure-Python decoders cover P6 PPM, 24-bit BMP, baseline + "
        "progressive JPEG, PNG, GIF, lossless WEBP and lossy-VP8-keyframe "
        "WEBP; AVIF needs PIL — plug it in at this line)")


def _image_feature(arr, target: tuple[int, int]) -> tuple[list[float], int, int]:
    """Nearest-neighbor resize to ``target`` (w, h), then an 8-dim pooled
    feature: [meanR, meanG, meanB, stdR, stdG, stdB, meanLuma, stdLuma],
    all in [0, 1].  Returns (feature, source_w, source_h)."""
    import numpy as np
    h, w = arr.shape[:2]
    tw, th = target
    yi = np.minimum((np.arange(th) * h) // th, h - 1)
    xi = np.minimum((np.arange(tw) * w) // tw, w - 1)
    r = arr[yi][:, xi].astype(np.float64) / 255.0
    luma = 0.299 * r[..., 0] + 0.587 * r[..., 1] + 0.114 * r[..., 2]
    feat = [float(r[..., 0].mean()), float(r[..., 1].mean()),
            float(r[..., 2].mean()), float(r[..., 0].std()),
            float(r[..., 1].std()), float(r[..., 2].std()),
            float(luma.mean()), float(luma.std())]
    return feat, w, h


def _decode_audio(data: bytes) -> tuple[int, int, float]:
    """Audio bytes → (duration_ms, sample_rate, RMS loudness in [0, 1]);
    dispatches by magic: RIFF/WAV PCM (stdlib wave) or FLAC (the
    pure-Python pipeline/flac.py codec — the dominant open speech-corpus
    container).  MP3/OGG still raise by name.

    MP3 DECODE — PERMANENT REFUSAL (decided round 9, the VP8-ledger
    treatment): MPEG-1 Layer III synthesis is bounded (~1k LoC:
    scalefactors, Huffman, requantize, stereo, alias reduction, IMDCT,
    polyphase), but its 34 Huffman code tables (ISO/IEC 11172-3 table
    B.7) are ARBITRARY spec constants — not derivable, not available in
    this offline container (no network; the reference repo is a Java
    analytics engine with no codec tables).  Unlike the VP8 key-frame
    decoder, whose two stand-in tables sit on rare adaptive paths and
    left the common path verifiable by round-trip, Huffman tables ARE
    the MP3 common path: stand-ins would decode nothing real, and a
    decoder round-tripped only against its own invented tables would be
    indistinguishable from correct while being wrong on every real
    file.  That fails the honesty bar, so the refusal is permanent
    until a driver can supply the B.7 tables verbatim.  What IS covered
    zero-decode: header probe (duration/bitrate/sample-rate) and the
    per-frame byte-range index (pipeline/probe.py mp3_frame_index,
    oracle-gated round 9) — the curation/scheduling tier that matters
    at 100 TB."""
    data = bytes(data)
    if data[:4] == b"fLaC":
        import numpy as np

        from incubator_druid_spark.pipeline.flac import decode_flac
        samples, sr, bps = decode_flac(data)
        x = samples.astype(np.float64) / float(1 << (bps - 1))
        if x.shape[1] > 1:
            x = x.mean(axis=1)
        else:
            x = x[:, 0]
        dur = int(round(len(x) * 1000 / sr)) if sr else 0
        loud = float(np.sqrt((x * x).mean())) if len(x) else 0.0
        return dur, sr, loud
    return _decode_wav(data)


def _decode_wav(data: bytes) -> tuple[int, int, float]:
    """RIFF/WAV PCM via stdlib ``wave`` → (duration_ms, sample_rate,
    RMS loudness in [0, 1])."""
    import io
    import wave

    import numpy as np
    try:
        with wave.open(io.BytesIO(bytes(data))) as wf:
            sr, n, ch, sw = (wf.getframerate(), wf.getnframes(),
                             wf.getnchannels(), wf.getsampwidth())
            raw = wf.readframes(n)
    except wave.Error as e:
        raise NotImplementedError(
            f"audio codec: not a PCM WAV or FLAC ({e}); MP3/OGG need "
            "soundfile — plug it in at this line")
    if sw == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, "u1").astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {sw} not supported")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    dur = int(round(n * 1000 / sr)) if sr else 0
    loud = float(np.sqrt((x * x).mean())) if len(x) else 0.0
    return dur, sr, loud


_IMAGE_FEATURE_SCHEMA = ("id long, mime string, feat array<double>, "
                         "width int, height int")


def decode_image_features(df: DataFrame, id_col: str = "id",
                          content_col: str = "content",
                          target: tuple[int, int] = (224, 224),
                          fake: bool = True,
                          min_width: int | None = None,
                          min_height: int | None = None,
                          max_pixels: int | None = None) -> DataFrame:
    """decode → resize(target) → 8-dim pooled feature, via mapInPandas.

    Batch shape: Arrow record batches; per-row the kernel sees raw bytes.

    min_width / min_height / max_pixels gate rows on a header-only probe
    (pipeline/probe.py) BEFORE any pixel decode — the filter-before-decode
    pattern a corpus-scale pass needs: a 100 TB sweep dropping thumbnails
    or poster-size scans must not pay a full decode to discard them.
    Non-qualifying rows (including blobs whose headers don't parse) are
    filtered out of the result.
    """
    tw, th = target
    gated = (min_width, min_height, max_pixels) != (None, None, None)

    def _probe_ok(b: bytes) -> bool:
        from incubator_druid_spark.pipeline.probe import probe_media
        m = probe_media(b)
        w, h = m["width"], m["height"]
        if w is None or h is None:
            return False
        if min_width is not None and w < min_width:
            return False
        if min_height is not None and h < min_height:
            return False
        return not (max_pixels is not None and w * h > max_pixels)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # pure-Python decode: P6 PPM / 24-bit BMP; other formats
                # raise NotImplementedError inside _decode_image
                feats, ws, hs, mimes, ids = [], [], [], [], []
                for rid, b in zip(pdf[id_col], pdf[content_col]):
                    b = bytes(b or b"")
                    if gated and not _probe_ok(b):
                        continue
                    ids.append(int(rid))
                    arr = _decode_image(b)
                    f, w, h = _image_feature(arr, (tw, th))
                    feats.append(f)
                    ws.append(w)
                    hs.append(h)
                    mimes.append(
                        "image/x-portable-pixmap" if b[:2] == b"P6"
                        else "image/jpeg" if b[:2] == b"\xFF\xD8"
                        else "image/png" if b[:4] == b"\x89PNG"
                        else "image/bmp")
                if not ids:
                    # an all-filtered batch: an empty list column comes out
                    # float64, which Arrow can't convert to list<double>
                    continue
                yield pd.DataFrame({"id": ids, "mime": mimes,
                                    "feat": feats, "width": ws, "height": hs})
                continue
            keep = pdf if not gated else pdf[
                [_probe_ok(bytes(b or b"")) for b in pdf[content_col]]]
            if gated and keep.empty:
                continue
            out = pd.DataFrame({
                "id": keep[id_col],
                "mime": "image/fake",
                "feat": [_fake_pixels(b, tw, th) for b in keep[content_col]],
                "width": tw,
                "height": th,
            })
            yield out

    return (df.select(id_col, content_col)
              .mapInPandas(kernel, schema=_IMAGE_FEATURE_SCHEMA))


_FRAME_SCHEMA = "id long, frame_idx int, frame_feat array<double>"


def sample_video_frames(df: DataFrame, id_col: str = "id",
                        content_col: str = "content", every_n: int = 10,
                        max_frames: int = 4, fake: bool = True) -> DataFrame:
    """Frame sampling: one output row per sampled frame (explode shape)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # pure-Python video: MJPEG-in-AVI (pipeline/avi.py —
                # intra-only frames, so unsampled frames are never JPEG-
                # decoded) or a concatenated-P6-PPM stream (one PPM per
                # frame); sample every ``every_n``-th frame up to
                # ``max_frames``, 8-dim feature per sampled frame.
                # MP4/H.264+ need ffmpeg/av — plug it in at this line.
                ids, idxs, feats = [], [], []
                from incubator_druid_spark.pipeline.avi import (
                    decode_avi_frames, is_avi)
                for rid, b in zip(pdf[id_col], pdf[content_col]):
                    b = bytes(b or b"")
                    if is_avi(b):
                        for i, arr in decode_avi_frames(
                                b, every_n=max(every_n, 1),
                                max_frames=max_frames):
                            f, _, _ = _image_feature(arr,
                                                     arr.shape[1::-1])
                            ids.append(rid)
                            idxs.append(i)
                            feats.append(f)
                        continue
                    if b[:2] != b"P6":
                        raise NotImplementedError(
                            "video codec: MJPEG-AVI and concatenated-PPM "
                            "streams decode pure-Python; MP4/H.264+ need "
                            "ffmpeg/av")
                    frames, pos = [], 0
                    while pos < len(b) and b[pos:pos + 2] == b"P6":
                        arr, pos = _parse_ppm(b, pos)
                        frames.append(arr)
                    taken = 0
                    for i in range(0, len(frames), max(every_n, 1)):
                        if taken >= max_frames:
                            break
                        f, _, _ = _image_feature(frames[i],
                                                 frames[i].shape[1::-1])
                        ids.append(rid)
                        idxs.append(i)
                        feats.append(f)
                        taken += 1
                yield pd.DataFrame({"id": ids, "frame_idx": idxs,
                                    "frame_feat": feats})
                continue
            ids, idxs, feats = [], [], []
            for rid, b in zip(pdf[id_col], pdf[content_col]):
                n = min(max_frames, 1 + (len(b or b"") // max(every_n, 1)) % max_frames)
                for i in range(n):
                    ids.append(rid)
                    idxs.append(i * every_n)
                    feats.append(_fake_pixels((b or b"") + bytes([i]), 0, 0))
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_feat": feats})

    return (df.select(id_col, content_col)
              .mapInPandas(kernel, schema=_FRAME_SCHEMA))


_AUDIO_SCHEMA = "id long, duration_ms long, sample_rate int, loudness double"


def extract_audio_features(df: DataFrame, id_col: str = "id",
                           content_col: str = "content",
                           fake: bool = True,
                           max_duration_ms: int | None = None,
                           min_sample_rate: int | None = None) -> DataFrame:
    """max_duration_ms / min_sample_rate gate rows on a header-only probe
    BEFORE any sample decode (filter-before-decode: dropping an hour-long
    recording from a corpus pass must not cost decoding it).  Gated rows
    whose headers don't parse are filtered out too."""
    gated = (max_duration_ms, min_sample_rate) != (None, None)

    def _probe_ok(b: bytes) -> bool:
        from incubator_druid_spark.pipeline.probe import probe_media
        m = probe_media(b)
        if max_duration_ms is not None and (
                m["duration_ms"] is None
                or m["duration_ms"] > max_duration_ms):
            return False
        return not (min_sample_rate is not None and (
            m["sample_rate"] is None
            or m["sample_rate"] < min_sample_rate))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if gated:
                pdf = pdf[[_probe_ok(bytes(b or b""))
                           for b in pdf[content_col]]]
                if pdf.empty:
                    continue
            if not fake:
                # pure-Python decode: RIFF/WAV PCM (stdlib wave) + FLAC
                # (pipeline/flac.py); MP3/OGG raise NotImplementedError
                # inside _decode_audio
                durs, srs, louds = [], [], []
                for b in pdf[content_col]:
                    d, sr, ld = _decode_audio(bytes(b or b""))
                    durs.append(d)
                    srs.append(sr)
                    louds.append(ld)
                yield pd.DataFrame({"id": pdf[id_col], "duration_ms": durs,
                                    "sample_rate": srs, "loudness": louds})
                continue
            yield pd.DataFrame({
                "id": pdf[id_col],
                "duration_ms": [len(b or b"") * 8 for b in pdf[content_col]],
                "sample_rate": 16000,
                "loudness": [(sum(b[:64]) % 1000) / 1000.0 if b else 0.0
                             for b in pdf[content_col]],
            })

    return (df.select(id_col, content_col)
              .mapInPandas(kernel, schema=_AUDIO_SCHEMA))
