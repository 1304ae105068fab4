"""Dependency-free AVI video decode (late r9).

Completes the multimodal triad: images (multimodal.py/jpeg.py) and
audio (wav/G.711/ADPCM/flac) already decode natively; this module
makes VIDEO real for the two AVI payload kinds that need no external
codec:

- **raw DIB frames** (``00db`` chunks, BITMAPINFOHEADER compression
  0): bottom-up BGR rows padded to 4 bytes — the BMP raster without
  the file header;
- **MJPEG frames** (``00dc`` chunks, handler/compression ``MJPG``):
  each frame is a complete JPEG, decoded through the stdlib JPEG
  tier (baseline AND progressive) from operators/jpeg.py.

Container parsing is a plain RIFF walk (stdlib struct): ``hdrl`` →
``strl`` → ``strh``/``strf`` for the video stream's geometry, then
the ``movi`` LIST's frame chunks in order. Other stream types
(audio tracks, text) are skipped; ``idx1`` is ignored (frames are
read in stream order). Anything else — compressed codecs beyond
MJPEG, other containers (MP4/MKV) — raises ValueError so the
callers' env seam owns it, the same contract as every other stdlib
codec gap.

Scale posture: frame extraction runs inside the same Arrow-batched
``mapInPandas`` pattern as the image/audio pipelines (see
multimodal.extract_video_frames) — payloads cross the JVM↔Python
boundary once per batch and each task emits its frames row-expanded.
"""

from __future__ import annotations

import struct

__all__ = ["avi_decoder"]


def _walk_riff(data: bytes, start: int, end: int):
    """Yield (fourcc, list_type_or_None, body_start, body_end) for
    each chunk in [start, end); LIST chunks report their list type."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_start = pos + 8
        body_end = body_start + clen
        if fourcc in (b"LIST", b"RIFF"):
            yield fourcc, data[body_start : body_start + 4], body_start + 4, body_end
        else:
            yield fourcc, None, body_start, body_end
        pos = body_end + (clen & 1)  # word alignment


def avi_decoder(payload: bytes, every_n: int = 1):
    """AVI → list of (frame_idx, (H, W, 3) uint8 RGB array) for every
    ``every_n``-th video frame. Raw-DIB and MJPEG payloads decode
    natively; other codecs raise ValueError."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/AVI magic)")

    width = height = None
    compression = None
    video_stream = None  # stream number of the first vids stream
    stream_no = -1

    def parse_strl(s, e):
        nonlocal width, height, compression, video_stream, stream_no
        stream_no += 1
        fcc_type = None
        for cc, _lt, bs, be in _walk_riff(payload, s, e):
            if cc == b"strh":
                fcc_type = payload[bs : bs + 4]
            elif cc == b"strf" and fcc_type == b"vids" and video_stream is None:
                # BITMAPINFOHEADER: biSize, biWidth, biHeight, planes,
                # bitcount, biCompression
                _bsz, w_, h_ = struct.unpack("<Iii", payload[bs : bs + 12])
                bitcount, comp = struct.unpack("<HI", payload[bs + 14 : bs + 20])
                if comp == 0 and bitcount != 24:
                    raise ValueError(
                        f"stdlib AVI tier supports 24-bit raw DIB only (got {bitcount})"
                    )
                if comp not in (0,) and payload[bs + 16 : bs + 20] != b"MJPG":
                    raise ValueError(
                        "stdlib AVI tier supports raw DIB and MJPG frames only"
                    )
                width, height = w_, abs(h_)
                compression = "raw" if comp == 0 else "mjpg"
                video_stream = stream_no

    movi = None
    for cc, lt, bs, be in _walk_riff(payload, 12, len(payload)):
        if cc == b"LIST" and lt == b"hdrl":
            for cc2, lt2, bs2, be2 in _walk_riff(payload, bs, be):
                if cc2 == b"LIST" and lt2 == b"strl":
                    parse_strl(bs2, be2)
        elif cc == b"LIST" and lt == b"movi":
            movi = (bs, be)
    if width is None or movi is None:
        raise ValueError("AVI missing video stream header or movi list")

    tag_db = b"%02ddb" % video_stream
    tag_dc = b"%02ddc" % video_stream
    frames = []
    idx = 0
    for cc, _lt, bs, be in _walk_riff(payload, movi[0], movi[1]):
        if cc not in (tag_db, tag_dc):
            continue
        if idx % every_n == 0:
            chunk = payload[bs:be]
            if compression == "raw":
                row_bytes = ((24 * width + 31) // 32) * 4
                if len(chunk) < row_bytes * height:
                    raise ValueError("truncated raw DIB frame")
                rows = np.frombuffer(
                    chunk, dtype=np.uint8, count=row_bytes * height
                ).reshape(height, row_bytes)
                px = rows[:, : width * 3].reshape(height, width, 3)
                # bottom-up BGR -> top-down RGB (the BMP raster rules)
                frames.append((idx, np.ascontiguousarray(px[::-1, :, ::-1])))
            else:  # mjpg: each frame is a full JPEG
                from cdc_historical_warehouse_platform_spark.operators.jpeg import (
                    jpeg_decoder,
                )

                img = jpeg_decoder(chunk)
                if img.shape[2] == 1:
                    img = np.repeat(img, 3, axis=2)
                frames.append((idx, img))
        idx += 1
    return frames
