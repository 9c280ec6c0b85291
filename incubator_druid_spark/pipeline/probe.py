"""Header-only media probing: width/height/duration/sample-rate/frames
from container headers WITHOUT decoding any pixels or samples.

At corpus scale the first pass over raw media is a FILTER (drop tiny
images, clips over N minutes, non-target sample rates) — paying a full
decode there is wasted work, and for MP4/H.264 or MP3 this engine has no
decoder at all.  Probing is cheap byte inspection, so formats split into
two tiers:

- decodable here (JPEG/PNG/GIF/BMP/PPM/WAV/FLAC/MJPEG-AVI): probe reads
  the same headers the codecs parse;
- probe-only (MP4/MOV boxes, MP3 frame headers + Xing, Ogg
  Opus/Vorbis): metadata extraction works even though decode raises.

Returns plain dicts; pipeline/multimodal.py maps them into the `media`
struct via mapInPandas (attach_media_metadata(probe=True)).
"""

from __future__ import annotations

import struct

_EMPTY = {"mime": None, "width": None, "height": None, "duration_ms": None,
          "sample_rate": None, "n_frames": None}


def probe_media(data: bytes, default_mime: str = "application/octet-stream"
                ) -> dict:
    """Sniff + header-parse → {mime, width, height, duration_ms,
    sample_rate, n_frames} (fields None when the format doesn't carry
    them).  Never raises on malformed input — a corpus probe must not die
    on one truncated blob; unparseable files degrade to mime-only."""
    data = bytes(data or b"")
    out = dict(_EMPTY)
    out["mime"] = default_mime
    try:
        if data[:3] == b"\xFF\xD8\xFF":
            out["mime"] = "image/jpeg"
            out.update(_probe_jpeg(data))
        elif data[:8] == b"\x89PNG\r\n\x1a\n":
            out["mime"] = "image/png"
            w, h = struct.unpack(">II", data[16:24])
            out.update(width=w, height=h)
        elif data[:6] in (b"GIF87a", b"GIF89a"):
            out["mime"] = "image/gif"
            out.update(_probe_gif(data))
        elif data[:2] == b"BM":
            out["mime"] = "image/bmp"
            w, h = struct.unpack("<ii", data[18:26])
            out.update(width=abs(w), height=abs(h))
        elif data[:2] == b"P6":
            out["mime"] = "image/x-portable-pixmap"
            parts = data[2:64].split()
            out.update(width=int(parts[0]), height=int(parts[1]))
        elif data[:4] == b"RIFF" and data[8:12] == b"AVI ":
            from incubator_druid_spark.pipeline.avi import avi_info
            info = avi_info(data)
            out["mime"] = "video/x-msvideo"
            out.update(width=info["width"], height=info["height"],
                       n_frames=info["n_frames"])
            if info["fps"]:
                out["duration_ms"] = int(round(
                    info["n_frames"] * 1000 / info["fps"]))
        elif data[:4] == b"RIFF" and data[8:12] == b"WEBP":
            out["mime"] = "image/webp"
            out.update(_probe_webp(data))
        elif data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            out["mime"] = "audio/wav"
            out.update(_probe_wav(data))
        elif data[:4] == b"fLaC":
            out["mime"] = "audio/flac"
            out.update(_probe_flac(data))
        elif len(data) > 8 and data[4:8] == b"ftyp":
            out["mime"] = "video/mp4"
            out.update(_probe_mp4(data))
        elif data[:4] == b"OggS":
            out.update(_probe_ogg(data))
        elif data[:3] == b"ID3" or data[:2] in (b"\xFF\xFB", b"\xFF\xFA",
                                                b"\xFF\xF3", b"\xFF\xF2"):
            out["mime"] = "audio/mpeg"
            out.update(_probe_mp3(data))
    except Exception:  # noqa: BLE001 — malformed input degrades to sniff
        pass
    # never-raises contract extends through the Arrow boundary: the media
    # struct's int32 fields crash mapInPandas on malformed-header garbage
    # (e.g. a WAV data-chunk size of 0xFFFFFFFF) unless clamped here
    for k in ("width", "height", "sample_rate", "n_frames"):
        v = out[k]
        if v is not None and not 0 <= v < 2**31:
            out[k] = None
    v = out["duration_ms"]
    if v is not None and not 0 <= v < 2**63:
        out["duration_ms"] = None
    return out


def _probe_jpeg(data: bytes) -> dict:
    pos = 2
    while pos + 4 < len(data):
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                      0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
            return {"width": w, "height": h}
        pos += 2 + seglen
    return {}


def _probe_gif(data: bytes) -> dict:
    w, h = struct.unpack("<HH", data[6:10])
    # count image descriptors (0x2C introducers at block boundaries)
    n, pos = 0, 13 + (3 << ((data[10] & 7) + 1) if data[10] & 0x80 else 0)
    while pos < len(data):
        b = data[pos]
        if b == 0x2C:  # image descriptor
            n += 1
            pos += 10
            if pos < len(data) and data[pos - 1] & 0x80:  # local palette
                pos += 3 << ((data[pos - 1] & 7) + 1)
            pos += 1  # LZW min code size
            while pos < len(data) and data[pos]:
                pos += data[pos] + 1
            pos += 1
        elif b == 0x21:  # extension
            pos += 2
            while pos < len(data) and data[pos]:
                pos += data[pos] + 1
            pos += 1
        elif b == 0x3B:
            break
        else:
            break
    return {"width": w, "height": h, "n_frames": n or None}


def _probe_wav(data: bytes) -> dict:
    pos, sr, bits, ch, dlen = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if cid == b"fmt ":
            _fmt, ch, sr = struct.unpack("<HHI", data[pos + 8:pos + 16])
            bits = struct.unpack("<H", data[pos + 22:pos + 24])[0]
        elif cid == b"data":
            dlen = size
        pos += 8 + size + (size & 1)
    out = {"sample_rate": sr}
    if sr and bits and ch and dlen is not None:
        n = dlen // max(1, (bits // 8) * ch)
        out["n_frames"] = n
        out["duration_ms"] = int(round(n * 1000 / sr))
    return out


def _probe_flac(data: bytes) -> dict:
    body = data[8:8 + 34]  # STREAMINFO is always the first block
    bits = int.from_bytes(body[10:18], "big")
    sr = bits >> 44
    total = bits & ((1 << 36) - 1)
    out = {"sample_rate": sr or None}
    if sr and total:
        out["n_frames"] = total if total < 2**31 else None
        out["duration_ms"] = int(round(total * 1000 / sr))
    return out


def _probe_mp4(data: bytes) -> dict:
    """Walk the ISO-BMFF box tree: mvhd → duration, tkhd → dimensions,
    and — only for a trak whose hdlr handler_type is 'soun' — the mdhd
    timescale → audio sample rate (ISO/IEC 14496-12 §8.4.2: audio tracks
    conventionally use the sample rate as the media timescale; video
    tracks use 90000/15360/etc., which must NOT be reported as a rate)."""
    out: dict = {}

    def walk(pos, end, trak=None):
        while pos + 8 <= end:
            size = struct.unpack(">I", data[pos:pos + 4])[0]
            box = data[pos + 4:pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
                body = pos + 16
            if size == 0:
                size = end - pos
            if box == b"moov":
                walk(body, pos + size)
            elif box == b"trak":
                # buffer per-trak facts: box order within mdia is not
                # fixed (mdhd usually precedes hdlr), so decide after
                # the whole subtree is walked
                t: dict = {}
                walk(body, pos + size, trak=t)
                if t.get("hdlr") == b"soun" and "sample_rate" not in out \
                        and t.get("mdhd_scale"):
                    out["sample_rate"] = t["mdhd_scale"]
            elif box == b"mdia":
                walk(body, pos + size, trak=trak)
            elif box == b"mvhd":
                ver = data[body]
                if ver == 1:
                    scale, dur = struct.unpack(">IQ",
                                               data[body + 20:body + 32])
                else:
                    scale, dur = struct.unpack(">II",
                                               data[body + 12:body + 20])
                if scale:
                    out["duration_ms"] = int(round(dur * 1000 / scale))
            elif box == b"tkhd":
                ver = data[body]
                # v0: 4 ver+flags + 20 times/ids/duration + 16 reserved/
                # layer/volume + 36 matrix = 76 (v1: 64-bit times → 88)
                off = body + (88 if ver == 1 else 76)
                w16, h16 = struct.unpack(">II", data[off:off + 8])
                if w16 and h16:
                    out["width"] = w16 >> 16
                    out["height"] = h16 >> 16
            elif box == b"mdhd" and trak is not None:
                ver = data[body]
                if ver == 1:
                    scale = struct.unpack(">I", data[body + 20:body + 24])[0]
                else:
                    scale = struct.unpack(">I", data[body + 12:body + 16])[0]
                trak["mdhd_scale"] = scale
            elif box == b"hdlr" and trak is not None:
                # ver+flags(4) + pre_defined(4) + handler_type(4)
                trak["hdlr"] = data[body + 8:body + 12]
            pos += size
    walk(0, len(data))
    return out


_MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                 256, 320, 0]  # MPEG1 Layer III, kbit/s
_MP3_RATES = [44100, 48000, 32000, 0]


def _probe_mp3(data: bytes) -> dict:
    pos = 0
    if data[:3] == b"ID3":
        sz = data[6:10]
        pos = 10 + ((sz[0] << 21) | (sz[1] << 14) | (sz[2] << 7) | sz[3])
    while pos + 4 <= len(data) and not (
            data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0):
        pos += 1
    if pos + 4 > len(data):
        return {}
    h = data[pos:pos + 4]
    version = (h[1] >> 3) & 3   # 3 = MPEG1
    layer = (h[1] >> 1) & 3     # 1 = Layer III
    if version != 3 or layer != 1:
        return {}
    bitrate = _MP3_BITRATES[h[2] >> 4] * 1000
    sr = _MP3_RATES[(h[2] >> 2) & 3]
    if not bitrate or not sr:
        return {}
    out = {"sample_rate": sr}
    # Xing/Info VBR header carries the exact frame count; offset depends
    # on channel mode (mono: 21, else 36, after the 4-byte header)
    mono = ((h[3] >> 6) & 3) == 3
    xing_off = pos + 4 + (17 if mono else 32)
    if data[xing_off:xing_off + 4] in (b"Xing", b"Info") and \
            data[xing_off + 7] & 1:
        frames = struct.unpack(">I", data[xing_off + 8:xing_off + 12])[0]
        out["n_frames"] = frames
        out["duration_ms"] = int(round(frames * 1152 * 1000 / sr))
    else:  # CBR estimate from stream length
        out["duration_ms"] = int(round((len(data) - pos) * 8000 / bitrate))
    return out


def _probe_webp(data: bytes) -> dict:
    """WEBP header tier (RFC 9649): dimensions from the first of VP8X
    (extended canvas), VP8L (lossless) or 'VP8 ' (lossy key frame) —
    no bitstream decode.  Full decode stays a named library-class format
    (pipeline/multimodal.py raises by name)."""
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if fourcc == b"VP8X" and len(body) >= 10:
            # 1 flags byte + 3 reserved, then 24-bit LE canvas dims minus 1
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return {"width": w, "height": h}
        if fourcc == b"VP8L" and len(body) >= 5 and body[0] == 0x2F:
            bits = int.from_bytes(body[1:5], "little")
            return {"width": (bits & 0x3FFF) + 1,
                    "height": ((bits >> 14) & 0x3FFF) + 1}
        if fourcc == b"VP8 " and len(body) >= 10 \
                and body[3:6] == b"\x9d\x01\x2a":
            w, h = struct.unpack("<HH", body[6:10])
            return {"width": w & 0x3FFF, "height": h & 0x3FFF}
        pos += 8 + size + (size & 1)  # chunks are even-padded
    return {}


def _probe_ogg(data: bytes) -> dict:
    """Opus/Vorbis in Ogg: id header gives the rate; the LAST page's
    granule position gives the PCM length."""
    out: dict = {}
    seg0 = 27 + data[26]  # first page: 27-byte header + segment table
    pkt = data[seg0:seg0 + 64]
    sr = None
    if pkt[:8] == b"OpusHead":
        out["mime"] = "audio/ogg"
        sr = 48000  # Opus granules are ALWAYS 48 kHz
        out["sample_rate"] = struct.unpack("<I", pkt[12:16])[0]
    elif pkt[:7] == b"\x01vorbis":
        out["mime"] = "audio/ogg"
        sr = struct.unpack("<I", pkt[12:16])[0]
        out["sample_rate"] = sr
    elif pkt[:5] == b"\x7fFLAC":
        # Ogg FLAC mapping: 0x7F 'FLAC' maj min n_headers(2), then the
        # native 'fLaC' + STREAMINFO — reuse the native header parser
        out["mime"] = "audio/ogg"
        idx = data.find(b"fLaC", seg0, seg0 + 128)
        if idx >= 0:
            info = _probe_flac(data[idx:])
            out.update(info)
            sr = info.get("sample_rate")
            if out.get("duration_ms") is not None:
                return out
    else:
        out["mime"] = "application/ogg"
        return out
    last = data.rfind(b"OggS")
    if last >= 0 and sr:
        granule = struct.unpack("<q", data[last + 6:last + 14])[0]
        if granule > 0:
            out["duration_ms"] = int(round(granule * 1000 / sr))
    return out


# ---------------------------------------------------------------------------
# MP4 sample index — zero-decode frame/sample scheduling
# ---------------------------------------------------------------------------

def mp4_sample_index(data: bytes) -> list[dict]:
    """Per-sample index from the ISO-BMFF sample tables (ISO/IEC
    14496-12 §8.5-8.7, same public spec as _probe_mp4's box walk): for
    every track, each sample's 1-based index, decode timestamp in ms
    (stts deltas over the track's mdhd timescale), byte offset and size
    in the file (stsc sample-to-chunk × stco/co64 chunk offsets + stsz
    sizes), keyframe flag (stss sync table — ABSENT means every sample
    is a sync sample, §8.6.2), handler type and the first stsd entry's
    codec fourcc.

    This is the "frame-sample" scheduling primitive for multimodal
    curation: pick keyframes or every-Nth-frame BYTE RANGES without
    touching a codec.  Returns [] on malformed/truncated input — the
    probe-tier contract (never raise on one bad blob)."""
    data = bytes(data or b"")
    traks: list[dict] = []

    def walk(pos, end, trak=None):
        while pos + 8 <= end:
            size = struct.unpack(">I", data[pos:pos + 4])[0]
            box = data[pos + 4:pos + 8]
            body = pos + 8
            if size == 1:
                size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
                body = pos + 16
            if size == 0:
                size = end - pos
            if size < 8 or pos + size > end:
                return
            if box == b"moov":
                walk(body, pos + size)
            elif box == b"trak":
                t: dict = {"id": len(traks) + 1}
                traks.append(t)
                walk(body, pos + size, trak=t)
            elif box in (b"mdia", b"minf", b"stbl"):
                walk(body, pos + size, trak=trak)
            elif trak is None:
                pass
            elif box == b"mdhd":
                ver = data[body]
                off = body + (20 if ver == 1 else 12)
                trak["scale"] = struct.unpack(">I", data[off:off + 4])[0]
            elif box == b"hdlr":
                trak["hdlr"] = data[body + 8:body + 12].decode(
                    "ascii", "replace")
            elif box == b"stsd":
                n = struct.unpack(">I", data[body + 4:body + 8])[0]
                if n >= 1:
                    trak["codec"] = data[body + 12:body + 16].decode(
                        "ascii", "replace")
            elif box == b"stts":
                n = struct.unpack(">I", data[body + 4:body + 8])[0]
                trak["stts"] = [struct.unpack(
                    ">II", data[body + 8 + 8 * i:body + 16 + 8 * i])
                    for i in range(n)]
            elif box == b"stsz":
                fixed, n = struct.unpack(">II", data[body + 4:body + 12])
                trak["n_samples"] = n
                trak["sizes"] = (None if fixed else [struct.unpack(
                    ">I", data[body + 12 + 4 * i:body + 16 + 4 * i])[0]
                    for i in range(n)])
                trak["fixed_size"] = fixed or None
            elif box == b"stsc":
                n = struct.unpack(">I", data[body + 4:body + 8])[0]
                trak["stsc"] = [struct.unpack(
                    ">III", data[body + 8 + 12 * i:body + 20 + 12 * i])[:2]
                    for i in range(n)]
            elif box in (b"stco", b"co64"):
                n = struct.unpack(">I", data[body + 4:body + 8])[0]
                wd, fmt = (8, ">Q") if box == b"co64" else (4, ">I")
                trak["chunks"] = [struct.unpack(
                    fmt, data[body + 8 + wd * i:body + 8 + wd * (i + 1)])[0]
                    for i in range(n)]
            elif box == b"stss":
                n = struct.unpack(">I", data[body + 4:body + 8])[0]
                trak["sync"] = {struct.unpack(
                    ">I", data[body + 8 + 4 * i:body + 12 + 4 * i])[0]
                    for i in range(n)}
            pos += size

    try:
        walk(0, len(data))
        rows: list[dict] = []
        for t in traks:
            n = t.get("n_samples")
            if not n or "stts" not in t or "stsc" not in t \
                    or "chunks" not in t or not t.get("scale"):
                continue
            sizes = t["sizes"] if t.get("sizes") is not None \
                else [t["fixed_size"]] * n
            if len(sizes) < n:
                continue
            # stts deltas -> cumulative decode times
            dts, acc = [], 0
            for cnt, delta in t["stts"]:
                for _ in range(cnt):
                    if len(dts) >= n:
                        break
                    dts.append(acc)
                    acc += delta
            if len(dts) < n:
                continue
            # sample-to-chunk expansion: entry (first_chunk, spc) holds
            # until the next entry's first_chunk (1-based)
            stsc = t["stsc"]
            chunk_spc = []
            for ei, (first, spc) in enumerate(stsc):
                last = (stsc[ei + 1][0] - 1 if ei + 1 < len(stsc)
                        else len(t["chunks"]))
                chunk_spc.extend((spc,) * max(0, last - first + 1))
            sync = t.get("sync")
            si = 0
            for ci, coff in enumerate(t["chunks"]):
                spc = chunk_spc[ci] if ci < len(chunk_spc) else 0
                off = coff
                for _ in range(spc):
                    if si >= n:
                        break
                    rows.append({
                        "track": t["id"], "sample": si + 1,
                        "dts_ms": int(round(dts[si] * 1000 / t["scale"])),
                        "offset": off, "size": sizes[si],
                        "keyframe": (sync is None) or (si + 1 in sync),
                        "handler": t.get("hdlr"),
                        "codec": t.get("codec"),
                    })
                    off += sizes[si]
                    si += 1
        return rows
    except (struct.error, IndexError, ValueError):
        return []


def mp3_frame_index(data: bytes, max_frames: int | None = None
                    ) -> list[dict]:
    """Per-frame index for MPEG1 Layer III streams — the audio
    counterpart of mp4_sample_index: each frame's 1-based number, byte
    offset + size in the stream, start timestamp in ms (1152 samples per
    MPEG1-LIII frame) and bitrate in kbit/s (varies per frame in VBR).
    Walks the frame headers directly (ISO/IEC 11172-3 §2.4.1.3: size =
    144 * bitrate / sample_rate + padding) — zero decode, so a curation
    job can cut time ranges of audio by byte range without a codec.
    Skips a leading ID3v2 tag; resynchronizes on junk BEFORE the first
    frame only — after sync it stops at the first garbage byte or
    non-MPEG1-LIII header (mixed-version streams and mid-stream
    corruption are out of probe scope; a tool that needs to ride past
    corruption should slice the stream and re-probe).  Returns [] on
    malformed input."""
    data = bytes(data or b"")
    rows: list[dict] = []
    try:
        pos = 0
        if data[:3] == b"ID3" and len(data) >= 10:
            sz = data[6:10]
            pos = 10 + ((sz[0] << 21) | (sz[1] << 14) | (sz[2] << 7)
                        | sz[3])
        samples = 0
        sr0 = None
        while pos + 4 <= len(data):
            if not (data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0):
                if rows:          # mid-stream garbage: stop, don't rescan
                    break
                pos += 1          # pre-first-frame junk: resync
                continue
            h = data[pos:pos + 4]
            if (h[1] >> 3) & 3 != 3 or (h[1] >> 1) & 3 != 1:
                if rows:
                    break
                pos += 1
                continue
            bitrate = _MP3_BITRATES[h[2] >> 4] * 1000
            sr = _MP3_RATES[(h[2] >> 2) & 3]
            if not bitrate or not sr or (sr0 is not None and sr != sr0):
                break
            sr0 = sr
            padding = (h[2] >> 1) & 1
            size = 144 * bitrate // sr + padding
            if size < 4 or pos + size > len(data):
                break             # truncated final frame: not emitted
            rows.append({
                "frame": len(rows) + 1, "offset": pos, "size": size,
                "ts_ms": int(round(samples * 1000 / sr)),
                "bitrate_kbps": bitrate // 1000,
            })
            samples += 1152
            pos += size
            if max_frames is not None and len(rows) >= max_frames:
                break
        return rows
    except (struct.error, IndexError, ValueError):
        return []


def fetch_ranges(df, blob_col: str = "content",
                 offset_col: str = "offset", length_col: str = "size",
                 out_col: str = "chunk"):
    """Slice (offset, length) byte ranges out of a binary column —
    the LOCAL closing step of every byte-range index in this package
    (MP4 samples, MP3 frames, WARC records, tar members): join an
    index frame back to its blobs and cut exactly the scheduled
    bytes.  Against a remote store the same (offset, length) pairs
    become HTTP Range requests; this Column form (substring on
    binary, 1-based) is the in-cluster equivalent and is how the
    tests prove each index's ranges really frame their records.  No
    UDF — binary substring runs in codegen."""
    from pyspark.sql import functions as F
    return df.withColumn(
        out_col,
        F.expr(f"substring({blob_col}, {offset_col} + 1, {length_col})"))
