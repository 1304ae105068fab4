"""Dependency-free GIF decode (r9 continuation).

GIF is the last common *image* container the stdlib codec tier did
not cover (BMP/PPM/PGM, full PNG, and baseline+progressive JPEG all
decode natively already — multimodal.py / jpeg.py). The format needs
nothing beyond stdlib: the container is fixed-layout little-endian
structs and the payload is GIF-variant LZW, implemented here from
the published spec (GIF89a specification, CompuServe 1990).

Coverage — the FULL format:

- GIF87a and GIF89a signatures;
- global and local color tables (any size 2..256);
- variable-width LZW (code sizes 3..12 bits, clear/end codes, table
  growth with the deferred-clear rule);
- interlaced images (the four-pass row schedule);
- GIF89a graphic control extensions: transparency index and the
  three meaningful disposal methods (keep / restore-background /
  restore-previous), which makes multi-frame ANIMATION compositing
  correct, not just first-frame decode;
- comment / application / plain-text extensions are skipped by
  sub-block walking, as the spec requires.

Two entry points mirror the AVI tier (operators/video.py):
``gif_decoder`` returns the first composited frame as (H, W, 3)
uint8 RGB (the image-pipeline contract), and
``gif_animation_decoder`` yields every ``every_n``-th composited
canvas state (the video-pipeline contract), so an animated GIF rides
``extract_video_frames`` exactly like an AVI.

Scale posture: decoding runs inside the same Arrow-batched
``mapInPandas`` pipelines as every other codec — payloads cross the
JVM↔Python boundary once per batch; nothing here touches Spark.

Reference parity note: mrohitth/cdc-historical-warehouse-platform has
no multimodal surface at all — this module is part of the
training-data-pipeline north star, not reference parity.
"""

from __future__ import annotations

import struct

__all__ = ["gif_decoder", "gif_animation_decoder"]

# interlace pass schedule: (first row, row step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    """GIF-variant LZW: LSB-first bit packing, variable code width
    starting at min_code_size+1, clear code resets the table, code
    width grows AFTER the table fills a width (deferred clear: at 12
    bits the table stops growing until a clear code)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()

    # bit reader over the concatenated sub-block data
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return end  # truncated stream: treat as end-of-information
        byte0 = bitpos >> 3
        chunk = int.from_bytes(data[byte0 : byte0 + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return code

    def fresh_table():
        return [bytes((i,)) for i in range(clear)] + [b"", b""]

    table = fresh_table()
    width = min_code_size + 1
    prev: bytes | None = None

    while True:
        code = read_code(width)
        if code == clear:
            table = fresh_table()
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code after clear out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW: code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise ValueError(
            f"GIF LZW: decoded {len(out)} of {expected} expected pixels"
        )
    return out[:expected]


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; return (data,
    position after the 0x00 terminator)."""
    parts = []
    while True:
        if pos >= len(payload):
            raise ValueError("GIF: truncated sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        parts.append(payload[pos : pos + n])
        if len(parts[-1]) != n:
            raise ValueError("GIF: truncated sub-block")
        pos += n
    return b"".join(parts), pos


def _skip_subblocks(payload: bytes, pos: int) -> int:
    while True:
        if pos >= len(payload):
            raise ValueError("GIF: truncated extension sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def _iter_frames(payload: bytes):
    """Walk the container; yield composited (frame_idx, H×W×3 uint8
    RGB canvas copy) per image block, honoring GCE transparency and
    disposal between frames."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/GIF89a magic)")
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise ValueError("GIF: truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    # canvas starts as the background color (transparent background
    # renders as black when bg_idx has no table entry)
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]

    transparent: int | None = None
    disposal = 0
    frame_idx = 0

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("GIF: truncated extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                if size != 4:
                    raise ValueError("GIF: bad graphic control block size")
                gce_packed = payload[pos + 1]
                disposal = (gce_packed >> 2) & 0x07
                transparent = payload[pos + 4] if gce_packed & 0x01 else None
                pos += 1 + size
                if payload[pos] != 0:
                    raise ValueError("GIF: unterminated graphic control")
                pos += 1
            else:  # comment / application / plain text: skip
                pos = _skip_subblocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")

        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if left + w > sw or top + h > sh:
            raise ValueError("GIF: image rectangle exceeds logical screen")
        table = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
            if table.size != 3 * n:
                raise ValueError("GIF: truncated local color table")
            table = table.reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF: image has no color table")

        min_code_size = payload[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"GIF: bad LZW min code size {min_code_size}")
        data, pos = _read_subblocks(payload, pos)
        idx = np.frombuffer(
            _lzw_decode(min_code_size, data, w * h), dtype=np.uint8
        )
        if idx.max(initial=0) >= len(table):
            raise ValueError("GIF: pixel index out of color-table range")
        rect = idx.reshape(h, w)
        if ipacked & 0x40:  # interlaced: reorder rows into place
            deint = np.empty_like(rect)
            src = 0
            for first, step in _INTERLACE_PASSES:
                rows = range(first, h, step)
                for r in rows:
                    deint[r] = rect[src]
                    src += 1
            rect = deint

        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        rgb = table[rect]
        if transparent is not None:
            mask = rect != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        yield frame_idx, canvas.copy()
        frame_idx += 1

        # dispose AFTER the frame is rendered, before the next one
        if disposal == 2:  # restore to background
            bg = (
                gct[bg_idx]
                if gct is not None and bg_idx < len(gct)
                else np.zeros(3, dtype=np.uint8)
            )
            canvas[top : top + h, left : left + w] = bg
        elif disposal == 3 and saved is not None:  # restore to previous
            canvas = saved
        disposal = 0
        transparent = None
    raise ValueError("GIF: missing trailer")


def gif_decoder(payload: bytes):
    """First frame of a GIF payload composited onto the logical
    screen → (H, W, 3) uint8 RGB array."""
    for _idx, frame in _iter_frames(payload):
        return frame
    raise ValueError("GIF: no image blocks")


def gif_animation_decoder(payload: bytes, every_n: int = 1):
    """Animated GIF → list of (frame_idx, (H, W, 3) uint8 RGB canvas)
    for every ``every_n``-th frame, with inter-frame disposal and
    transparency composited exactly as a viewer would."""
    return [
        (idx, frame)
        for idx, frame in _iter_frames(payload)
        if idx % every_n == 0
    ]
