"""Dependency-free baseline-TIFF decode (r9 continuation).

TIFF joins BMP/PPM/PGM, full PNG, baseline+progressive JPEG, and GIF
in the stdlib image tier (multimodal.py). Coverage is Baseline TIFF
6.0 plus the two compressions real-world baseline files use, built
from the published TIFF 6.0 specification:

- both byte orders (``II`` little-endian, ``MM`` big-endian);
- strip-organized images (any RowsPerStrip split) AND tile-organized
  images (tags 322-325, edge tiles padded per TIFF 6.0 §15 — r10);
- compressions: 1 (none), 32773 (PackBits), 5 (LZW with the
  spec's MSB-first bit packing and the "early change" code-width
  rule — the decoder widens at table sizes 511/1023/2047, one entry
  before the encoder's 512/1024/2048, because its table trails the
  encoder's by one entry), and 8/32946 (Adobe/legacy Deflate —
  per-strip zlib streams, r10);
- horizontal-differencing predictor (tag 317 = 2) for LZW strips;
- photometric interpretations 0 (WhiteIsZero — inverted grayscale),
  1 (BlackIsZero), 2 (RGB, incl. a 4th extra/alpha sample), and
  3 (palette via the 16-bit ColorMap, high byte);
- 8-bit samples (the Baseline bit depth) and 16-bit samples (decoded
  full-width, returned as the high byte — Pillow's 16→8 convert
  contract, r10). New-style JPEG-in-TIFF (7 — per-segment JPEG
  streams, shared JPEGTables, r11) decodes through the stdlib JPEG
  tier; bilevel CCITT fax (2/3/4 — Modified Huffman, Group 3 with
  2-D lines, Group 4 MMR, r11) through operators/ccitt.py with the
  code tables pinned against the JDK's independent javax.imageio
  encoders. Other compressions (old-style JPEG 6), mixed bit depths,
  and 16-bit palette indices raise ValueError so the caller's Pillow
  env seam owns them — the same contract as every other stdlib codec
  gap.

Scale posture: pure per-payload decode running inside the Arrow
``mapInPandas`` image pipelines; nothing here touches Spark.

Reference parity note: mrohitth/cdc-historical-warehouse-platform has
no multimodal surface — this module is part of the
training-data-pipeline north star, not reference parity.
"""

from __future__ import annotations

import struct

__all__ = ["tiff_decoder"]

# field type -> byte width (the types baseline readers need;
# 7 = UNDEFINED carries JPEGTables' raw bytes)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1}


def _packbits_decode(data: bytes, expected: int) -> bytearray:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:  # copy n+1 literal bytes
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += data[pos : pos + 1] * (257 - n)
            pos += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("TIFF PackBits: strip decoded short")
    return out[:expected]


def _lzw_decode(data: bytes, expected: int) -> bytearray:
    """TIFF-variant LZW: MSB-first bit packing, clear=256, EOI=257,
    9-bit codes widening at table sizes 511/1023/2047 (early change)."""
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    width = 9

    def read_code() -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return 257  # truncated: treat as EOI; caller checks length
        byte0 = bitpos >> 3
        # right-pad the window: a short slice near the stream's end
        # would otherwise shift against a <32-bit value (big-endian
        # reads are alignment-sensitive, unlike the GIF tier's
        # little-endian reader)
        chunk = int.from_bytes(data[byte0 : byte0 + 4].ljust(4, b"\x00"), "big")
        code = (chunk >> (32 - width - (bitpos & 7))) & ((1 << width) - 1)
        bitpos += width
        return code

    def fresh():
        return [bytes((i,)) for i in range(256)] + [b"", b""]

    table = fresh()
    prev: bytes | None = None
    while len(out) < expected:
        code = read_code()
        if code == 257:  # EOI
            break
        if code == 256:  # clear
            table = fresh()
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW: bad first code after clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW: code out of range")
        out += entry
        prev = entry
        if len(table) in (511, 1023, 2047):
            width += 1
    if len(out) < expected:
        raise ValueError(f"TIFF LZW: decoded {len(out)} of {expected} bytes")
    return out[:expected]


def tiff_decoder(payload: bytes):
    """Baseline TIFF → (H, W, C) uint8 array (C = 1, 3, or 4)."""
    import numpy as np

    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload (missing II*/MM* magic)")
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF: truncated IFD offset")

    (n_tags,) = struct.unpack_from(e + "H", payload, ifd_off)
    tags: dict[int, tuple] = {}
    for i in range(n_tags):
        base = ifd_off + 2 + 12 * i
        tag, ftype, count = struct.unpack_from(e + "HHI", payload, base)
        size = _TYPE_SIZE.get(ftype)
        if size is None:
            continue  # unknown field type: skip, per spec
        total = size * count
        off = base + 8 if total <= 4 else struct.unpack_from(e + "I", payload, base + 8)[0]
        raw = payload[off : off + total]
        if len(raw) != total:
            raise ValueError(f"TIFF: truncated values for tag {tag}")
        if ftype == 3:
            vals = struct.unpack(e + "%dH" % count, raw)
        elif ftype == 4:
            vals = struct.unpack(e + "%dI" % count, raw)
        elif ftype == 1:
            vals = tuple(raw)
        else:  # ASCII / RATIONAL: not needed for raster geometry
            vals = (raw,)
        tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF: required tag {tag} missing")
            return default
        return v[0]

    width = one(256)
    height = one(257)
    spp = one(277, 1)
    # BitsPerSample DEFAULTS TO 1 per TIFF 6.0 — bilevel fax writers
    # (the JDK's among them) omit tag 258 entirely (r11 fix; the old
    # 8-bit default mis-routed such files)
    bits = tags.get(258, (1,) * spp)
    if len(bits) == spp and all(b == 8 for b in bits):
        sw = 1
    elif len(bits) == spp and all(b == 16 for b in bits):
        # 16-bit samples (r10): decoded at full width, returned as the
        # high byte — Pillow's 16→8 convert contract, same as PNG16
        sw = 2
    elif bits == (1,) and spp == 1:
        sw = 0  # bilevel: the CCITT fax tier below (r11)
    else:
        raise ValueError(
            f"stdlib TIFF tier supports uniform 1-, 8- or 16-bit samples (got {bits})"
        )
    compression = one(259, 1)
    photometric = one(262)
    if sw == 0:
        # bilevel CCITT fax (r11): compression 2 (Modified Huffman,
        # rows byte-aligned), 3 (Group 3 / T.4, EOL rows, optional 2-D
        # per T4Options), 4 (Group 4 / T.6 MMR) — operators/ccitt.py,
        # code tables pinned against the JDK's javax.imageio encoders.
        from cdc_historical_warehouse_platform_spark.operators.ccitt import (
            ccitt_decode,
        )

        if compression not in (2, 3, 4):
            raise ValueError(
                "stdlib TIFF tier decodes 1-bit samples with CCITT "
                f"compression 2/3/4 only (got compression {compression})"
            )
        if one(266, 1) != 1:
            raise ValueError("TIFF: CCITT with FillOrder 2 not supported")
        offsets = tags.get(273)
        counts = tags.get(279)
        if offsets is None or counts is None or len(offsets) != len(counts):
            raise ValueError("TIFF: missing or mismatched strip offsets/byte counts")
        rps = one(278, height)
        options = one(292, 0) if compression == 3 else one(293, 0)
        parts = []
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            strip_rows = min(rps, height - si * rps)
            if strip_rows <= 0:
                raise ValueError("TIFF: more strips than rows")
            chunk = payload[off : off + cnt]
            if len(chunk) != cnt:
                raise ValueError("TIFF: truncated strip data")
            parts.append(
                ccitt_decode(chunk, width, strip_rows, compression, options)
            )
        bit = np.concatenate(parts, axis=0)[:, :, None]  # 0 white, 1 black
        # with photometric 0 (WhiteIsZero, the fax standard) the coding
        # colors ARE the stored bits; the standard mapping then yields
        # white -> 255. Photometric 1 is the mechanical inverse.
        arr8 = (bit * 255).astype(np.uint8)
        if photometric == 0:
            return 255 - arr8
        if photometric == 1:
            return arr8
        raise ValueError("TIFF: CCITT requires photometric 0 or 1")
    if compression == 7:
        # new-style JPEG-in-TIFF (r11): every strip/tile is its own
        # JPEG stream (baseline or progressive — the full stdlib JPEG
        # tier decodes it), optionally ABBREVIATED with the shared
        # DQT/DHT tables carried once in JPEGTables (tag 347, itself
        # an SOI..EOI stream). Decode per segment, assemble, crop.
        from cdc_historical_warehouse_platform_spark.operators.jpeg import (
            jpeg_decoder,
        )

        tables = tags.get(347, (b"",))[0]
        if tables:
            if tables[:2] != b"\xff\xd8" or tables[-2:] != b"\xff\xd9":
                raise ValueError("TIFF: JPEGTables is not an SOI..EOI stream")
            tables = tables[2:-2]

        def jseg(off, cnt):
            seg = payload[off : off + cnt]
            if len(seg) != cnt:
                raise ValueError("TIFF: truncated JPEG segment")
            if seg[:2] != b"\xff\xd8":
                raise ValueError("TIFF: JPEG segment missing SOI")
            img = jpeg_decoder(b"\xff\xd8" + tables + seg[2:])
            if img.shape[2] == 1 and spp == 3:
                img = np.repeat(img, 3, axis=2)
            return img

        if 322 in tags or 323 in tags:
            tw, tl = one(322), one(323)
            offsets, counts = tags.get(324), tags.get(325)
            if offsets is None or counts is None or len(offsets) != len(counts):
                raise ValueError(
                    "TIFF: missing or mismatched tile offsets/byte counts"
                )
            across = (width + tw - 1) // tw
            down = (height + tl - 1) // tl
            if len(offsets) != across * down:
                raise ValueError(
                    f"TIFF: expected {across * down} tiles, got {len(offsets)}"
                )
            first = jseg(offsets[0], counts[0])
            full = np.zeros((down * tl, across * tw, first.shape[2]), dtype=np.uint8)
            for ti, (off, cnt) in enumerate(zip(offsets, counts)):
                img = jseg(off, cnt) if ti else first
                if img.shape[:2] != (tl, tw):
                    raise ValueError(
                        f"TIFF: JPEG tile is {img.shape[:2]}, expected {(tl, tw)}"
                    )
                r0, c0 = (ti // across) * tl, (ti % across) * tw
                full[r0 : r0 + tl, c0 : c0 + tw] = img
            return full[:height, :width]
        offsets, counts = tags.get(273), tags.get(279)
        if offsets is None or counts is None or len(offsets) != len(counts):
            raise ValueError("TIFF: missing or mismatched strip offsets/byte counts")
        rps = one(278, height)
        parts = []
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            strip_rows = min(rps, height - si * rps)
            if strip_rows <= 0:
                raise ValueError("TIFF: more strips than rows")
            img = jseg(off, cnt)
            if img.shape[0] < strip_rows or img.shape[1] < width:
                raise ValueError(
                    f"TIFF: JPEG strip is {img.shape[:2]}, needs "
                    f"({strip_rows}, {width})"
                )
            parts.append(img[:strip_rows, :width])
        return np.concatenate(parts, axis=0)
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise ValueError(f"TIFF: unsupported predictor {predictor}")
    if one(339, 1) != 1:
        raise ValueError("stdlib TIFF tier supports unsigned-int samples only")

    def decompress(chunk: bytes, expected: int) -> bytes:
        if compression == 1:
            if len(chunk) < expected:
                raise ValueError("TIFF: uncompressed segment shorter than raster")
            return chunk[:expected]
        if compression == 32773:
            return _packbits_decode(chunk, expected)
        if compression == 5:
            return _lzw_decode(chunk, expected)
        if compression in (8, 32946):
            # Adobe deflate (8) / legacy zlib (32946): each segment is
            # an independent zlib stream (r10 — stdlib zlib)
            import zlib

            try:
                decoded = zlib.decompress(chunk)
            except zlib.error as err:
                raise ValueError(f"TIFF: bad deflate segment ({err})") from err
            if len(decoded) < expected:
                raise ValueError("TIFF: deflate segment shorter than raster")
            return decoded[:expected]
        raise ValueError(
            "stdlib TIFF tier supports none/PackBits/LZW/Deflate "
            f"compression (got {compression})"
        )

    dtype = np.uint8 if sw == 1 else np.dtype(e + "u2")
    mask = 0xFF if sw == 1 else 0xFFFF

    def predict(a):
        # horizontal differencing resets per SEGMENT row — applied
        # before tile assembly so tile seams never chain
        if predictor == 2:
            return np.cumsum(a.astype(np.uint32), axis=1) & mask
        return a

    if 322 in tags or 323 in tags:
        # tile organization (r10): tiles laid out left-to-right,
        # top-to-bottom; edge tiles are padded to full tile size in the
        # data and cropped after assembly (TIFF 6.0 §15)
        tw, tl = one(322), one(323)
        offsets = tags.get(324)
        counts = tags.get(325)
        if offsets is None or counts is None or len(offsets) != len(counts):
            raise ValueError("TIFF: missing or mismatched tile offsets/byte counts")
        across = (width + tw - 1) // tw
        down = (height + tl - 1) // tl
        if len(offsets) != across * down:
            raise ValueError(
                f"TIFF: expected {across * down} tiles, got {len(offsets)}"
            )
        full = np.zeros((down * tl, across * tw, spp), dtype=np.uint32)
        expected = tl * tw * spp * sw
        for ti, (off, cnt) in enumerate(zip(offsets, counts)):
            chunk = payload[off : off + cnt]
            if len(chunk) != cnt:
                raise ValueError("TIFF: truncated tile data")
            data = decompress(chunk, expected)
            tile = np.frombuffer(data, dtype=dtype).reshape(tl, tw, spp)
            r0, c0 = (ti // across) * tl, (ti % across) * tw
            full[r0 : r0 + tl, c0 : c0 + tw] = predict(tile)
        arr = full[:height, :width]
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if offsets is None or counts is None or len(offsets) != len(counts):
            raise ValueError("TIFF: missing or mismatched strip offsets/byte counts")
        rps = one(278, height)
        row_bytes = width * spp * sw
        raster = bytearray()
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            strip_rows = min(rps, height - si * rps)
            if strip_rows <= 0:
                raise ValueError("TIFF: more strips than rows")
            chunk = payload[off : off + cnt]
            if len(chunk) != cnt:
                raise ValueError("TIFF: truncated strip data")
            raster += decompress(chunk, strip_rows * row_bytes)
        arr = np.frombuffer(bytes(raster), dtype=dtype).reshape(height, width, spp)
        arr = predict(arr)

    arr = (arr >> 8).astype(np.uint8) if sw == 2 else arr.astype(np.uint8)

    if photometric == 0:  # WhiteIsZero
        if spp != 1:
            raise ValueError("TIFF: WhiteIsZero requires 1 sample/pixel")
        return 255 - arr
    if photometric == 1:
        if spp != 1:
            raise ValueError("TIFF: BlackIsZero requires 1 sample/pixel")
        return arr
    if photometric == 2:
        if spp not in (3, 4):
            raise ValueError("TIFF: RGB requires 3 or 4 samples/pixel")
        return arr
    if photometric == 3:
        if spp != 1:
            raise ValueError("TIFF: palette requires 1 sample/pixel")
        if sw != 1:
            # a 16-bit palette INDEX would have been high-byte-folded
            # above — refuse rather than index with wrong values
            raise ValueError("stdlib TIFF tier supports 8-bit palette indices only")
        cmap = tags.get(320)
        if cmap is None or len(cmap) % 3:
            raise ValueError("TIFF: palette image missing ColorMap")
        n = len(cmap) // 3
        pal = (np.array(cmap, dtype=np.uint16).reshape(3, n).T >> 8).astype(np.uint8)
        idx = arr[:, :, 0]
        if idx.max(initial=0) >= n:
            raise ValueError("TIFF: palette index out of ColorMap range")
        return pal[idx]
    raise ValueError(f"stdlib TIFF tier: unsupported photometric {photometric}")
