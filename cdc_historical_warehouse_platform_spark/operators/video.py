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
read in stream order). MP4/QuickTime containers decode too (r9
continuation, ``mp4_decoder``): the ISO BMFF sample-table walk
(stsd/stsz/stsc/stco|co64) resolves jpeg samples (each a full
JPEG) and ``raw `` depth-24 top-down RGB frames. Anything else — compressed
codecs (H.264/VP9/...), other containers (MKV) — raises ValueError
so the callers' env seam owns it, the same contract as every other
stdlib codec gap.

Scale posture: frame extraction runs inside the same Arrow-batched
``mapInPandas`` pattern as the image/audio pipelines (see
multimodal.extract_video_frames) — payloads cross the JVM↔Python
boundary once per batch and each task emits its frames row-expanded.
"""

from __future__ import annotations

import struct

__all__ = ["avi_decoder", "mp4_decoder"]


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


# --- MP4 / QuickTime (ISO BMFF) container (r9 continuation) -----------------


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each ISO BMFF box in
    [start, end). Handles 32-bit sizes, largesize (size==1 + 64-bit),
    and to-end-of-file (size==0)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos:
            raise ValueError("MP4: corrupt box size")
        yield btype, body, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, path: list[bytes]):
    """Resolve a box path like [b'moov', b'trak'] — yields every match
    of the final component (trak can repeat)."""
    if not path:
        yield start, end
        return
    head, *rest = path
    for btype, bs, be in _walk_boxes(data, start, end):
        if btype == head:
            yield from _find_box(data, bs, be, rest)


def _jpeg_stream_end(blob: bytes, start: int = 0) -> int:
    """Offset just past the EOI of the JPEG stream starting at
    ``start``, found by walking marker segments by their declared
    length (r11, ADVICE fix): a bare ``FF D9`` byte pair is only
    impossible inside ENTROPY-CODED data (FF bytes are stuffed there)
    — marker segment *payloads* can contain it freely, notably
    Motion-JPEG A's own mandatory APP1 'mjpg' marker whose binary
    field-size/offset fields routinely produce FF D9, and EXIF/APPn
    thumbnails that end with a literal EOI. So: skip APPn/COM/DQT/
    DHT/SOF/DRI/SOS headers by length, scan for the next marker only
    inside entropy data (where FF00 stuffing and RSTn are the only FF
    pairs), and return at the true EOI."""
    n = len(blob)
    if blob[start : start + 2] != b"\xff\xd8":
        raise ValueError("mjpa sample: field does not start with SOI")
    pos = start + 2
    while pos + 2 <= n:
        if blob[pos] != 0xFF:
            raise ValueError("mjpa sample: expected JPEG marker in field")
        marker = blob[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        if marker == 0xD9:  # EOI — the true end of this field's stream
            return pos + 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            pos += 2  # standalone: TEM / RSTn / SOI
            continue
        if pos + 4 > n:
            break
        (seglen,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        pos += 2 + seglen
        if marker == 0xDA:  # SOS: entropy-coded data follows the header
            while pos + 2 <= n:
                if (
                    blob[pos] == 0xFF
                    and blob[pos + 1] != 0x00
                    and not 0xD0 <= blob[pos + 1] <= 0xD7
                ):
                    break  # a real marker (EOI, DNL, or the next SOS)
                pos += 1
    raise ValueError("mjpa sample: no EOI in field 1")


def _decode_mjpa_sample(blob: bytes):
    """Motion-JPEG A sample → full-height RGB frame (r10): the sample
    is two half-height field JPEGs back-to-back; decode each through
    the stdlib JPEG tier and weave rows — field 1 to the even output
    rows (the QuickTime top-field convention), field 2 to the odd.
    Field 1's end is found by the marker-segment walk above (a raw
    ``find(FFD9)`` mis-splits when an APPn payload — e.g. the APP1
    'mjpg' marker's binary offsets — happens to contain the pair)."""
    import numpy as np

    from cdc_historical_warehouse_platform_spark.operators.jpeg import jpeg_decoder

    end1 = _jpeg_stream_end(blob)
    soi2 = blob.find(b"\xff\xd8\xff", end1)
    if soi2 < 0:
        raise ValueError("mjpa sample: missing second field JPEG")
    fields = []
    for part in (blob[:end1], blob[soi2:]):
        img = jpeg_decoder(part)
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        fields.append(img)
    f1, f2 = fields
    if f1.shape != f2.shape:
        raise ValueError(
            f"mjpa sample: field geometry mismatch {f1.shape} vs {f2.shape}"
        )
    out = np.empty((f1.shape[0] * 2, f1.shape[1], f1.shape[2]), dtype=np.uint8)
    out[0::2] = f1
    out[1::2] = f2
    return out


def mp4_decoder(payload: bytes, every_n: int = 1):
    """MP4 / QuickTime → list of (frame_idx, (H, W, 3) uint8 RGB) for
    every ``every_n``-th video sample. The container walk is the ISO
    BMFF sample-table machinery (stsd/stsz/stsc/stco|co64): samples
    resolve to absolute file ranges through the chunk map. Codecs:
    ``jpeg`` (each sample a full JPEG through the stdlib tier),
    ``mjpa`` (Motion-JPEG A — two field JPEGs per sample, row-woven;
    r10), and ``raw `` depth-24 (top-down RGB). Anything else raises
    so the env seam owns it."""
    import numpy as np

    # classic QuickTime files (the era of jpeg/raw video tracks) often
    # have no ftyp box and start with moov/mdat/wide/free — accept any
    # plausible top-level box, not just ftyp
    if len(payload) < 12 or payload[4:8] not in (
        b"ftyp", b"moov", b"mdat", b"wide", b"free", b"skip",
    ):
        raise ValueError("not an MP4/QuickTime payload (no top-level box)")

    chosen = None  # (fourcc, width, height, stsz, stsc, stco)
    for ts, te in _find_box(payload, 0, len(payload), [b"moov", b"trak"]):
        stbl = None
        for ms, me in _find_box(payload, ts, te, [b"mdia", b"minf", b"stbl"]):
            stbl = (ms, me)
        if stbl is None:
            continue
        boxes = {t: (bs, be) for t, bs, be in _walk_boxes(payload, *stbl)}
        if b"stsd" not in boxes:
            continue
        bs, be = boxes[b"stsd"]
        (n_entries,) = struct.unpack(">I", payload[bs + 4 : bs + 8])
        if n_entries < 1:
            continue
        ebody = bs + 8
        fourcc = payload[ebody + 4 : ebody + 8]
        # 'mjpa' (Motion-JPEG A): each sample carries TWO interlaced
        # field JPEGs — decoded separately and row-woven (r10; field 1
        # = even output rows, the QuickTime top-field convention)
        if fourcc not in (b"jpeg", b"raw ", b"mjpa"):
            continue  # not a track this tier decodes (audio, H.264 ...)
        # VideoSampleEntry geometry: width/height at +32/+34, depth at
        # +82 from the sample-entry start (8 header + 6 reserved +
        # 2 dref + 16 pre)
        width, height = struct.unpack(">HH", payload[ebody + 32 : ebody + 36])
        if fourcc == b"raw ":
            (depth,) = struct.unpack(">H", payload[ebody + 82 : ebody + 84])
            if depth != 24:
                raise ValueError(
                    f"stdlib MP4 tier decodes 24-bit raw video only (depth {depth})"
                )

        def table(name):
            if name not in boxes:
                raise ValueError(f"MP4: missing {name.decode()} box")
            return boxes[name]

        s, e = table(b"stsz")
        sample_size, n_samples = struct.unpack(">II", payload[s + 4 : s + 12])
        if sample_size:
            sizes = [sample_size] * n_samples
        else:
            sizes = list(
                struct.unpack(f">{n_samples}I", payload[s + 12 : s + 12 + 4 * n_samples])
            )
        s, e = table(b"stsc")
        (n_stsc,) = struct.unpack(">I", payload[s + 4 : s + 8])
        stsc = [
            struct.unpack(">III", payload[s + 8 + 12 * i : s + 20 + 12 * i])
            for i in range(n_stsc)
        ]
        if b"stco" in boxes:
            s, e = boxes[b"stco"]
            (n_chunks,) = struct.unpack(">I", payload[s + 4 : s + 8])
            offsets = list(
                struct.unpack(f">{n_chunks}I", payload[s + 8 : s + 8 + 4 * n_chunks])
            )
        elif b"co64" in boxes:
            s, e = boxes[b"co64"]
            (n_chunks,) = struct.unpack(">I", payload[s + 4 : s + 8])
            offsets = list(
                struct.unpack(f">{n_chunks}Q", payload[s + 8 : s + 8 + 8 * n_chunks])
            )
        else:
            raise ValueError("MP4: missing stco/co64 box")
        chosen = (fourcc, width, height, sizes, stsc, offsets)
        break
    if chosen is None:
        raise ValueError(
            "stdlib MP4 tier found no jpeg/raw video track "
            "(compressed codecs route to the env seam)"
        )
    fourcc, width, height, sizes, stsc, offsets = chosen

    # expand the sample->chunk map: stsc rows are (first_chunk,
    # samples_per_chunk, _desc_idx), 1-based, each applying until the
    # next row's first_chunk
    spc = []
    for i, (first, per, _d) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(offsets)
        spc.extend([per] * (last - first + 1))
    frames = []
    sample = 0
    for chunk_idx, chunk_off in enumerate(offsets):
        pos = chunk_off
        for _ in range(spc[chunk_idx] if chunk_idx < len(spc) else 0):
            if sample >= len(sizes):
                break
            size = sizes[sample]
            blob = payload[pos : pos + size]
            if len(blob) != size:
                raise ValueError("MP4: sample range exceeds payload")
            if sample % every_n == 0:
                if fourcc == b"jpeg":
                    from cdc_historical_warehouse_platform_spark.operators.jpeg import (
                        jpeg_decoder,
                    )

                    img = jpeg_decoder(blob)
                    if img.shape[2] == 1:
                        img = np.repeat(img, 3, axis=2)
                elif fourcc == b"mjpa":
                    img = _decode_mjpa_sample(blob)
                else:  # raw : top-down RGB rows, no padding
                    if size < width * height * 3:
                        raise ValueError("MP4: truncated raw sample")
                    img = np.frombuffer(
                        blob, dtype=np.uint8, count=width * height * 3
                    ).reshape(height, width, 3)
                frames.append((sample, img))
            pos += size
            sample += 1
    return frames
