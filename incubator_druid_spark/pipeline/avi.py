"""Pure-Python MJPEG-AVI container codec (stdlib + numpy only).

Motion-JPEG inside a RIFF/AVI container is the one mainstream video
format decodable without an entropy-coder beyond what pipeline/jpeg.py
already provides: every frame is an independent baseline JPEG (often
DHT-less, assuming the T.81 Annex K.3 tables — jpeg.py installs them on
demand).  Reader parses the RIFF chunk tree ('avih' main header, 'strh'
stream headers, the 'movi' LIST with '##dc'/'##db' frame chunks, optional
'idx1'); frames are intra-only, so frame sampling SKIPS the JPEG decode
of unsampled frames entirely — the scale property the multimodal
pipeline's sample_video_frames relies on.

Writer (tests / fixture generation) emits a spec-correct single-stream
MJPEG AVI with an idx1 index; any standard player/demuxer reads it.

H.264/H.265/VP9/AV1 in MP4/MKV remain NotImplementedError by name in
pipeline/multimodal.py — inter-frame codecs need a real decoder library.
"""

from __future__ import annotations

import struct

import numpy as np


def is_avi(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"AVI "


def avi_info(data: bytes) -> dict:
    """Parse headers only → {width, height, fps, n_frames, handler}."""
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI stream")
    info = {"width": 0, "height": 0, "fps": 0.0, "n_frames": 0,
            "handler": ""}
    for fourcc, body, _pos in _iter_chunks(data, 12, len(data)):
        if fourcc == b"avih":
            us_per_frame, _rate, _pad, _flags, total = struct.unpack_from(
                "<5I", body, 0)
            info["n_frames"] = total
            if us_per_frame:
                info["fps"] = round(1e6 / us_per_frame, 3)
            info["width"], info["height"] = struct.unpack_from(
                "<2I", body, 32)
        elif fourcc == b"strh" and body[:4] == b"vids":
            info["handler"] = body[4:8].decode("latin-1").strip("\x00 ")
    return info


def iter_avi_frames(data: bytes):
    """Yield (frame_index, jpeg_bytes) for every video frame chunk, in
    stream order, WITHOUT decoding — callers decode only what they keep."""
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI stream")
    idx = 0
    for fourcc, body, _pos in _iter_chunks(data, 12, len(data)):
        if fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
            yield idx, body
            idx += 1


def _iter_chunks(data: bytes, pos: int, end: int):
    """Flattened walk of the RIFF chunk tree (LIST bodies recursed)."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body_start = pos + 8
        body_end = min(body_start + size, len(data))
        if fourcc in (b"LIST", b"RIFF"):
            yield from _iter_chunks(data, body_start + 4, body_end)
        else:
            yield fourcc, data[body_start:body_end], pos
        pos = body_end + (size & 1)  # chunks are word-aligned


def decode_avi_frames(data: bytes, every_n: int = 1, max_frames: int = 0):
    """Yield (frame_index, (h, w, 3) uint8 RGB) decoding ONLY the sampled
    frames (MJPEG is intra-only)."""
    from incubator_druid_spark.pipeline.jpeg import decode_baseline_jpeg
    taken = 0
    for idx, jpg in iter_avi_frames(data):
        if every_n > 1 and idx % every_n:
            continue
        yield idx, decode_baseline_jpeg(jpg)
        taken += 1
        if max_frames and taken >= max_frames:
            return


# ---------------------------------------------------------------------------
# writer (tests / fixture generation)
# ---------------------------------------------------------------------------

def encode_mjpeg_avi(frames: list[np.ndarray], fps: float = 25.0,
                     quant: int = 1) -> bytes:
    """List of (h, w, 3) uint8 arrays → MJPEG AVI bytes (DHT-less frames
    per the MJPEG convention, so the K.3-default decode path is what reads
    them back)."""
    from incubator_druid_spark.pipeline.jpeg import encode_baseline_jpeg
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    jpgs = [encode_baseline_jpeg(f, quant=quant, tables="standard",
                                 omit_dht=True) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    us_per_frame = int(round(1e6 / fps))
    avih = struct.pack("<14I", us_per_frame, 0, 0, 0x10, len(jpgs), 0, 1,
                       0, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, int(round(fps)), 0,
                                            len(jpgs), 0, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b"movi"
    idx_entries = []
    for jpg in jpgs:
        idx_entries.append((len(movi_body), len(jpg)))
        movi_body += chunk(b"00dc", jpg)
    movi = chunk(b"LIST", movi_body)
    idx1 = b"".join(b"00dc" + struct.pack("<III", 0x10, off, ln)
                    for off, ln in idx_entries)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body
