"""Multimodal column plumbing: image/audio/video as opaque binary.

North-star requirement. The pattern for 100 TB multimodal tables:

- payloads are **opaque `binary` columns** with a typed metadata
  struct alongside (mime, byte length, checksum) — never parsed by
  Catalyst, only moved;
- decode / feature-extraction runs in **Arrow-batched Python**
  (``mapInPandas``) so bytes cross the JVM↔Python boundary once per
  batch, not per row;
- the default decoders are REAL for the stdlib-parseable formats
  (r8, extended r9): PCM WAV via the stdlib ``wave`` module, G.711
  mu-law/A-law WAV via a manual RIFF walk + the ITU expansion
  tables, BMP / PPM / PGM via pure-Python header parsing, and the COMPLETE
  PNG format (every legal depth/color combination, palette, Adam7
  interlacing) via stdlib ``zlib`` inflate + the five spec filters —
  no external codec needed, pinned against ground truth (numpy
  arrays / the CCITT scalar routines) in tests.
  JPEG — baseline AND progressive — decodes via operators/jpeg.py
  (stdlib struct + a sequential Huffman walk + vectorized numpy
  block math), GIF (full format incl. animation compositing) via
  operators/gif.py, baseline TIFF (both endians, strips,
  none/PackBits/LZW + predictor) via operators/tiff.py, FLAC
  losslessly via operators/flac.py, IMA ADPCM WAV via the
  step/index tables, and AIFF/AIFF-C + Sun AU PCM/G.711 natively
  here; AVI video with raw-DIB or MJPEG frames decodes via
  operators/video.py and animated GIFs through the same Arrow
  row-expanding frame pipeline. The remaining compressed formats
  (MP3/OGG, non-AVI/other-codec video, 32-bit/Ogg FLAC,
  lossless/12-bit/arithmetic JPEG, tiled/16-bit/deflate TIFF) still
  route to PIL / librosa, which are not in this container: for THOSE
  payloads ``decode_image``/``decode_audio``
  raise ``NotImplementedError`` unless the library import succeeds.
  The decode→resize→feature PIPELINES take an injectable ``decoder``
  callable (r4) and are exercised end-to-end both with the stdlib
  decoders on genuine WAV/BMP/PPM payloads and with deterministic raw
  decoders, so a user with Pillow/librosa installed runs exactly the
  tested path with only the first callable swapped.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "attach_binary_payload",
    "FEATURE_SCHEMA",
    "extract_binary_features",
    "RESIZE_SCHEMA",
    "resize_binary",
    "FRAME_SCHEMA",
    "sample_frames",
    "VIDEO_FRAME_SCHEMA",
    "extract_video_frames",
    "avi_decoder",
    "decode_image",
    "decode_audio",
    "wav_decoder",
    "g711_wav_decoder",
    "ima_adpcm_wav_decoder",
    "ms_adpcm_wav_decoder",
    "aiff_decoder",
    "au_decoder",
    "flac_decoder",
    "bmp_decoder",
    "ppm_decoder",
    "png_decoder",
    "jpeg_decoder",
    "gif_decoder",
    "tiff_decoder",
    "ico_decoder",
    "tga_decoder",
    "stdlib_image_decoder",
    "IMAGE_FEATURE_SCHEMA",
    "extract_image_features",
    "pil_decoder",
    "raw_image_decoder",
    "AUDIO_FEATURE_SCHEMA",
    "extract_audio_features",
    "librosa_decoder",
    "raw_audio_decoder",
    "dpcm8_decoder",
]


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text
    (deterministic fake), plus the typed metadata struct a real
    ingest would carry."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("distinct_bytes", T.IntegerType()),
    ]
)


def extract_binary_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    ``mapInPandas`` receives an iterator of pandas batches — the shape
    a real decoder (resize / frame-sample / mel-spectrogram) would
    plug into. Pure-Python byte features keep it deterministic here.
    """

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math
        from collections import Counter

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # NULL blob: drop, like the JVM twin
                    continue
                data = bytes(payload)
                counts = Counter(data)
                n = len(data) or 1
                entropy = -sum(
                    (c / n) * math.log2(c / n) for c in counts.values()
                )

                out.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(data),
                        "checksum": hashlib.md5(data).hexdigest(),
                        "byte_entropy": round(entropy, 6),
                        "distinct_bytes": len(counts),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select("doc_id", "payload").mapInPandas(_features, FEATURE_SCHEMA)


def _stub(name: str, lib: str, cause: Exception | None = None):
    detail = (
        f" (stdlib tier first failed with {type(cause).__name__}: {cause})"
        if cause is not None
        else ""
    )
    raise NotImplementedError(
        f"{name}: COMPRESSED formats require {lib}, which is not available "
        "in this environment (BMP / PPM / PGM / full PNG / baseline+progressive "
        "JPEG / GIF / baseline TIFF images and PCM+G.711+ADPCM WAV / AIFF / AU / "
        "FLAC audio decode natively via the stdlib tier — no codec needed). "
        "The Spark-side plumbing "
        "(schema, mapInPandas batching, partitioning) is fully tested on "
        "the stdlib formats; in an environment WITH the codec, the "
        "importorskip-guarded seam tests (tests/test_datapipe.py::"
        "test_image_decode_pipeline_with_pillow / "
        "test_audio_decode_pipeline_with_librosa) exercise the compressed "
        f"path end-to-end.{detail}"
    ) from cause


# --- stdlib codec tier (r8): REAL decoders, zero dependencies ---------------

# baseline JPEG lives in its own module (the Huffman/IDCT machinery is
# ~300 lines); re-exported here so the codec surface stays one import
from cdc_historical_warehouse_platform_spark.operators.flac import (  # noqa: E402
    flac_decoder,
)
from cdc_historical_warehouse_platform_spark.operators.gif import (  # noqa: E402
    gif_decoder,
)
from cdc_historical_warehouse_platform_spark.operators.jpeg import (  # noqa: E402
    jpeg_decoder,
)
from cdc_historical_warehouse_platform_spark.operators.tiff import (  # noqa: E402
    tiff_decoder,
)
from cdc_historical_warehouse_platform_spark.operators.video import (  # noqa: E402
    avi_decoder,
)


def bmp_decoder(payload: bytes):
    """BMP → (H, W, 3) uint8 RGB array: uncompressed 24-bit BI_RGB,
    1/4/8-bit paletted BI_RGB, 8-bit RLE8 (encoded/absolute runs,
    EOL/EOB markers, position deltas), and 16/32-bit direct color
    (XRGB555/BGRX defaults or BI_BITFIELDS masks) — r11. Pure parsing
    (BITMAPFILEHEADER + BITMAPINFOHEADER): rows are 4-byte padded,
    stored bottom-up (negative height = top-down), pixels/palette are
    BGR(X) on disk."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    (bi_size,) = struct.unpack_from("<I", payload, 14)
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    top_down = height < 0
    height = abs(height)
    if bpp == 24 and compression == 0:
        row_bytes = ((bpp * width + 31) // 32) * 4
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * height, offset=data_offset
        ).reshape(height, row_bytes)
        px = rows[:, : width * 3].reshape(height, width, 3)
        if not top_down:
            px = px[::-1]
        return np.ascontiguousarray(px[:, :, ::-1])  # BGR -> RGB
    if bpp in (16, 32) and compression in (0, 3):
        # 16/32-bit direct-color BMP (r11): BI_RGB defaults (16 =
        # XRGB555, 32 = BGRX) or explicit BI_BITFIELDS channel masks
        # (the masks follow the 40-byte header); each channel expands
        # to 8 bits by value scaling (x * 255 / mask_max — the
        # round-trip-exact expansion for 5/6/8-bit fields)
        if compression == 3:
            rmask, gmask, bmask = struct.unpack_from("<III", payload, 54)
        elif bpp == 16:
            rmask, gmask, bmask = 0x7C00, 0x03E0, 0x001F
        else:
            rmask, gmask, bmask = 0x00FF0000, 0x0000FF00, 0x000000FF
        row_bytes = ((bpp * width + 31) // 32) * 4
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * height, offset=data_offset
        ).reshape(height, row_bytes)
        wdt = np.dtype("<u2") if bpp == 16 else np.dtype("<u4")
        px = (
            rows[:, : width * (bpp // 8)]
            .reshape(height, width, bpp // 8)
            .view(wdt)
            .reshape(height, width)
            .astype(np.uint32)
        )

        def chan(mask):
            if not mask:
                return np.zeros_like(px, dtype=np.uint8)
            shift = (mask & -mask).bit_length() - 1
            mx = mask >> shift
            v = (px >> shift) & mx
            return ((v * 255 + mx // 2) // mx).astype(np.uint8)

        out = np.stack([chan(rmask), chan(gmask), chan(bmask)], axis=2)
        if not top_down:
            out = out[::-1]
        return np.ascontiguousarray(out)
    if bpp in (1, 4) and compression == 0:
        # sub-byte paletted BMP (r11): MSB-first bit packing, rows
        # 4-byte padded, bottom-up like every BI_RGB raster
        (n_colors,) = struct.unpack_from("<I", payload, 46)
        n_colors = n_colors or (1 << bpp)
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=4 * n_colors, offset=14 + bi_size
        ).reshape(n_colors, 4)[:, :3][:, ::-1]
        row_bytes = ((bpp * width + 31) // 32) * 4
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * height, offset=data_offset
        ).reshape(height, row_bytes)
        if bpp == 1:
            idx = np.unpackbits(rows, axis=1)[:, :width]
        else:
            nib = np.empty((height, row_bytes * 2), dtype=np.uint8)
            nib[:, 0::2] = rows >> 4
            nib[:, 1::2] = rows & 0x0F
            idx = nib[:, :width]
        if not top_down:
            idx = idx[::-1]
        return np.ascontiguousarray(pal[idx])
    if bpp == 8 and compression in (0, 1):
        (n_colors,) = struct.unpack_from("<I", payload, 46)
        n_colors = n_colors or 256
        pal_off = 14 + bi_size
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=4 * n_colors, offset=pal_off
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        if compression == 0:
            row_bytes = ((8 * width + 31) // 32) * 4
            idx = np.frombuffer(
                payload, dtype=np.uint8, count=row_bytes * height,
                offset=data_offset,
            ).reshape(height, row_bytes)[:, :width]
        else:  # RLE8 (top_down is invalid with RLE per the spec)
            if top_down:
                raise ValueError("BMP: RLE8 must be bottom-up")
            idx = np.zeros((height, width), dtype=np.uint8)
            pos, x, y = data_offset, 0, 0
            n = len(payload)
            while pos + 1 < n:
                cnt, val = payload[pos], payload[pos + 1]
                pos += 2
                if cnt:  # encoded run
                    idx[y, x : min(x + cnt, width)] = val
                    x += cnt
                elif val == 0:  # end of line
                    x, y = 0, y + 1
                elif val == 1:  # end of bitmap
                    break
                elif val == 2:  # delta
                    x += payload[pos]
                    y += payload[pos + 1]
                    pos += 2
                else:  # absolute mode: val literal bytes, word-aligned
                    lit = payload[pos : pos + val]
                    idx[y, x : min(x + val, width)] = np.frombuffer(
                        lit, dtype=np.uint8
                    )[: max(min(x + val, width) - x, 0)]
                    x += val
                    pos += val + (val & 1)
                if y >= height:
                    break
            idx = idx[::-1]  # RLE rows fill bottom-up
            return np.ascontiguousarray(pal[idx])
        if not top_down:
            idx = idx[::-1]
        return np.ascontiguousarray(pal[idx])
    if bpp == 4 and compression == 2:
        # RLE4 (r11): like RLE8 but encoded runs ALTERNATE the two
        # nibbles of val (high first) and absolute runs pack pixel
        # nibbles high-first, the byte count word-aligned
        if top_down:
            raise ValueError("BMP: RLE4 must be bottom-up")
        (n_colors,) = struct.unpack_from("<I", payload, 46)
        n_colors = n_colors or 16
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=4 * n_colors, offset=14 + bi_size
        ).reshape(n_colors, 4)[:, :3][:, ::-1]
        idx = np.zeros((height, width), dtype=np.uint8)
        pos, x, y = data_offset, 0, 0
        n = len(payload)
        while pos + 1 < n:
            cnt, val = payload[pos], payload[pos + 1]
            pos += 2
            if cnt:  # encoded run: alternate hi/lo nibbles of val
                for i in range(cnt):
                    if x < width and y < height:
                        idx[y, x] = (val >> 4) if i % 2 == 0 else (val & 0x0F)
                    x += 1
            elif val == 0:  # end of line
                x, y = 0, y + 1
            elif val == 1:  # end of bitmap
                break
            elif val == 2:  # delta
                x += payload[pos]
                y += payload[pos + 1]
                pos += 2
            else:  # absolute: val pixel nibbles, hi-first, word-aligned
                nbytes = (val + 1) // 2
                lit = payload[pos : pos + nbytes]
                for i in range(val):
                    b = lit[i // 2]
                    if x < width and y < height:
                        idx[y, x] = (b >> 4) if i % 2 == 0 else (b & 0x0F)
                    x += 1
                pos += nbytes + (nbytes & 1)
            if y >= height:
                break
        return np.ascontiguousarray(pal[idx[::-1]])
    raise ValueError(
        f"stdlib BMP tier supports 1/4/8/16/24/32-bit BI_RGB, RLE4/8, "
        f"and BI_BITFIELDS (got bpp={bpp}, compression={compression})"
    )


def ppm_decoder(payload: bytes):
    """Binary PPM (P6, RGB) / PGM (P5, grayscale) → (H, W, 3) or
    (H, W, 1) uint8 array. Handles '#' comments in the header per the
    netpbm spec. maxval 65535 (the 16-bit netpbm form, r11) decodes
    big-endian two-byte samples and returns the high byte — the same
    16→8 fold as the PNG16/TIFF16 tiers; other maxvals over 255 keep
    refusing (non-power-of-two scaling belongs to Pillow)."""
    import numpy as np

    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload (P6/P5 magic)")
    # tokenize the header: magic, width, height, maxval — whitespace
    # separated, comments run '#'..newline
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval per the spec
    width, height, maxval = tokens
    if maxval > 255 and maxval != 65535:
        raise ValueError(
            "stdlib PPM tier supports maxval <= 255 or exactly 65535"
        )
    channels = 3 if magic == b"P6" else 1
    if maxval == 65535:
        # 16-bit netpbm (r11): big-endian two-byte samples, high-byte
        # fold (the PNG16/TIFF16 convert contract)
        if len(payload) - pos != width * height * channels * 2:
            raise ValueError(
                f"PPM raster size mismatch: {len(payload) - pos} bytes "
                f"after header, expected {width * height * channels * 2}"
            )
        wide = np.frombuffer(
            payload, dtype=">u2", count=width * height * channels, offset=pos
        )
        return (
            (wide >> 8).astype(np.uint8).reshape(height, width, channels)
        )
    # exact-raster check: a header ending in '\r\n' (some Windows netpbm
    # writers) would shift the offset by one byte and silently decode
    # garbage — demand the payload is exactly header + raster and let
    # the Pillow fall-through own anything else
    if len(payload) - pos != width * height * channels:
        raise ValueError(
            f"PPM raster size mismatch: {len(payload) - pos} bytes after "
            f"header, expected {width * height * channels} "
            "(non-single-whitespace header terminator?)"
        )
    arr = np.frombuffer(
        payload, dtype=np.uint8, count=width * height * channels, offset=pos
    )
    return arr.reshape(height, width, channels)


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(scan_bytes, stride, height, bpp):
    """Invert the five scanline filters over one (sub-)image of
    ``height`` rows of ``stride`` bytes each, with ``bpp`` the byte
    distance between corresponding samples (1 for packed sub-byte
    rows); ``scan_bytes`` is the raw (filter byte + row) stream.
    Returns the (height, stride) uint8 byte matrix (the caller
    re-views it as samples). None/Up are whole-row numpy ops, Sub is
    a per-byte-lane cumulative sum; Average/Paeth (left-dependent by
    spec) walk bytes in Python."""
    import numpy as np
    if len(scan_bytes) != (stride + 1) * height:
        raise ValueError(
            f"PNG raster size mismatch: {len(scan_bytes)} bytes, "
            f"expected {(stride + 1) * height}"
        )
    scan = np.frombuffer(scan_bytes, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = scan[:, 0]
    rows = scan[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = int(ftypes[y])
        row = rows[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:  # None
            out[y] = row
        elif f == 1:  # Sub: rec[x] = raw[x] + rec[x-bpp]
            # per-byte-lane cumulative sum — uint8 wraparound == mod 256
            cols = row.reshape(stride // bpp, bpp).astype(np.uint64)
            out[y] = (np.cumsum(cols, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            out[y] = row + prev  # uint8 wraps mod 256
        elif f == 3:  # Average
            rec = out[y]
            prev16 = prev.astype(np.uint16)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(row[x]) + ((left + int(prev16[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = out[y]
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
    return out


def png_decoder(payload: bytes):
    """8/16-bit grayscale / gray+alpha / RGB / RGBA / palette PNG,
    sequential OR Adam7-interlaced → (H, W, C) uint8 array,
    dependency-free: struct chunk walking + stdlib ``zlib`` inflate +
    the five scanline filters (PNG spec §9), palette via the PLTE
    lookup, interlaced payloads assembled from the seven Adam7 passes
    (each pass its own filtered sub-image, spec §8.2). 16-bit samples
    downscale to 8 (high byte) — the same convert-to-8-bit contract
    Pillow's ``convert("RGB")`` applies. Sub-byte depths (1/2/4-bit)
    raise ValueError — the Pillow fall-through owns those."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat: list[bytes] = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # 4 len + 4 type + data + 4 crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {bit_depth}")
    if color_type not in (0, 2, 3, 4, 6):
        raise ValueError(f"stdlib PNG tier: unsupported color type {color_type}")
    if bit_depth < 8 and color_type not in (0, 3):
        raise ValueError(
            f"invalid PNG depth/color combination ({bit_depth}, {color_type})"
        )
    if color_type == 3 and bit_depth == 16:
        raise ValueError("invalid PNG: palette depth must be <= 8")
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if comp or filt:
        raise ValueError("invalid PNG compression/filter method")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(b"".join(idat))

    def row_bytes(pw: int) -> int:
        return -(-(pw * channels * bit_depth) // 8)

    # filters operate on BYTES with bpp = the byte distance between
    # corresponding samples, floored to 1 for packed sub-byte rows
    bpp = max(1, (channels * bit_depth) // 8)

    def unpack(sub_bytes, ph: int, pw: int):
        """(ph, row_bytes) filtered-byte matrix -> (ph, pw, channels)
        uint8 SAMPLE matrix (16-bit -> high byte; sub-byte -> bit
        unpack, MSB first, row padding dropped)."""
        if bit_depth == 8:
            return sub_bytes.reshape(ph, pw, channels)
        if bit_depth == 16:
            return sub_bytes.reshape(ph, pw, channels, 2)[:, :, :, 0]
        bits = np.unpackbits(sub_bytes, axis=1)  # (ph, row_bytes*8)
        spp = pw * channels  # samples per row
        vals = bits[:, : spp * bit_depth].reshape(ph, spp, bit_depth)
        weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint8)
        out = (vals * weights).sum(axis=2).astype(np.uint8)
        return out.reshape(ph, pw, channels)

    if interlace == 0:
        img = unpack(_png_unfilter(raw, row_bytes(width), height, bpp), height, width)
    else:  # Adam7: seven independently-filtered sub-images
        img = np.zeros((height, width, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(width - x0) // dx) if width > x0 else 0
            ph = -(-(height - y0) // dy) if height > y0 else 0
            if pw == 0 or ph == 0:
                continue  # empty pass at this image size
            rb = row_bytes(pw)
            nbytes = (rb + 1) * ph
            sub = _png_unfilter(raw[off : off + nbytes], rb, ph, bpp)
            off += nbytes
            img[y0::dy, x0::dx] = unpack(sub, ph, pw)
        if off != len(raw):
            raise ValueError("PNG raster size mismatch: interlaced passes")
    if color_type == 3:  # palette: index -> RGB via PLTE
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of PLTE range")
        img = plte[idx]
    elif bit_depth < 8:
        # sub-byte grayscale scales to full 8-bit range (Pillow's
        # convert contract): v * 255 / (2^depth - 1)
        img = (img.astype(np.uint16) * 255 // ((1 << bit_depth) - 1)).astype(np.uint8)
    return np.ascontiguousarray(img)


def ico_decoder(payload: bytes):
    """Windows ICO/CUR (favicons — ubiquitous in web crawls) →
    (H, W, 4) uint8 RGBA of the LARGEST stored image. Entries are
    either PNG-compressed (routed through the complete stdlib PNG
    tier) or classic DIBs: a BITMAPINFOHEADER with DOUBLED height
    covering an XOR bitmap (1/4/8/24/32-bpp, bottom-up, padded rows)
    plus a 1-bpp AND transparency mask. 32-bpp alpha is used when
    present; otherwise the AND mask becomes the alpha channel."""
    import struct

    import numpy as np

    if len(payload) < 6:
        raise ValueError("not an ICO payload (truncated header)")
    reserved, ftype, count = struct.unpack_from("<HHH", payload, 0)
    if reserved != 0 or ftype not in (1, 2) or count == 0:
        raise ValueError("not an ICO/CUR payload (bad ICONDIR magic)")
    best = None
    for i in range(count):
        w8, h8, _nc, _r, _p, _bpp, size, off = struct.unpack_from(
            "<BBBBHHII", payload, 6 + 16 * i
        )
        w, h = w8 or 256, h8 or 256
        if best is None or w * h > best[0]:
            best = (w * h, off, size)
    _, off, size = best
    data = payload[off : off + size]
    if len(data) != size:
        raise ValueError("ICO: entry range exceeds payload")
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        rgb = png_decoder(data)
        if rgb.shape[2] == 4:
            return rgb
        if rgb.shape[2] == 2:
            # gray+alpha (PNG color type 4): repeat the luma plane to
            # RGB and keep the REAL alpha — without this branch the
            # (H,W,2) array fell into the opaque-fill path below and
            # produced [luma, alpha, 255] pixel garbage
            return np.ascontiguousarray(
                np.dstack([np.repeat(rgb[:, :, :1], 3, axis=2), rgb[:, :, 1]])
            )
        if rgb.shape[2] == 1:
            rgb = np.repeat(rgb, 3, axis=2)
        return np.dstack([rgb, np.full(rgb.shape[:2], 255, np.uint8)])

    bisize, w, h2 = struct.unpack_from("<Iii", data, 0)
    bpp = struct.unpack_from("<H", data, 14)[0]
    comp = struct.unpack_from("<I", data, 16)[0]
    if comp != 0:
        raise ValueError(f"ICO: compressed DIB entries unsupported (comp {comp})")
    if bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"ICO: unsupported DIB depth {bpp}")
    h = h2 // 2  # doubled height: XOR bitmap + AND mask
    pos = bisize
    pal = None
    if bpp <= 8:
        used = struct.unpack_from("<I", data, 32)[0] or (1 << bpp)
        pal = np.frombuffer(data, np.uint8, used * 4, pos).reshape(used, 4)[
            :, :3
        ][:, ::-1]  # BGRX -> RGB
        pos += used * 4
    xor_rb = ((bpp * w + 31) // 32) * 4
    xor = np.frombuffer(data, np.uint8, xor_rb * h, pos).reshape(h, xor_rb)
    pos += xor_rb * h
    and_rb = ((w + 31) // 32) * 4
    mask = np.frombuffer(data, np.uint8, and_rb * h, pos).reshape(h, and_rb)
    # AND mask: bit SET = transparent; MSB-first within each byte
    bits = np.unpackbits(mask, axis=1)[:, :w]
    alpha_mask = np.where(bits == 0, 255, 0).astype(np.uint8)[::-1]

    if bpp == 32:
        px = xor[:, : w * 4].reshape(h, w, 4)[::-1]
        rgb = px[:, :, [2, 1, 0]]  # BGRA -> RGB
        a = px[:, :, 3]
        if not a.any():  # legacy 32-bpp with empty alpha: use AND mask
            a = alpha_mask
        return np.ascontiguousarray(np.dstack([rgb, a]))
    if bpp == 24:
        px = xor[:, : w * 3].reshape(h, w, 3)[::-1][:, :, ::-1]
        return np.ascontiguousarray(np.dstack([px, alpha_mask]))
    # paletted: unpack sub-byte indices MSB-first
    if bpp == 8:
        idx = xor[:, :w]
    else:
        per = 8 // bpp
        unpacked = np.unpackbits(xor, axis=1).reshape(h, -1, 8)
        groups = unpacked.reshape(h, -1, per, bpp)
        weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint8)
        idx = (groups * weights).sum(axis=3).reshape(h, -1)[:, :w].astype(np.uint8)
    idx = idx[::-1]
    if idx.max(initial=0) >= len(pal):
        raise ValueError("ICO: palette index out of range")
    return np.ascontiguousarray(np.dstack([pal[idx], alpha_mask]))


def tga_decoder(payload: bytes):
    """Truevision TGA → (H, W, C) uint8 (C = 1 gray, 3 RGB, 4 RGBA).
    Full baseline coverage: color-mapped / truecolor / grayscale,
    raw AND RLE-packed, 8/24/32-bpp pixels, 24/32-bit palettes,
    bottom-up or top-down origin. 15/16-bpp pixels raise to the env
    seam. TGA has no leading magic, so automatic dispatch requires
    the TGA-2.0 footer signature; headerless files decode via an
    explicit call."""
    import struct

    import numpy as np

    if len(payload) < 18:
        raise ValueError("not a TGA payload (truncated header)")
    idlen, cmtype, imtype = payload[0], payload[1], payload[2]
    _cm_first, cm_len, cm_bits = struct.unpack_from("<HHB", payload, 3)
    _x0, _y0, w, h, bpp, desc = struct.unpack_from("<HHHHBB", payload, 8)
    rle = bool(imtype & 8)
    base = imtype & 7
    if base not in (1, 2, 3) or w == 0 or h == 0:
        raise ValueError(f"TGA: unsupported image type {imtype}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"TGA: unsupported pixel depth {bpp}")
    pos = 18 + idlen
    pal = None
    if cmtype == 1:
        if cm_bits not in (24, 32):
            raise ValueError(f"TGA: unsupported palette entry size {cm_bits}")
        es = cm_bits // 8
        raw = np.frombuffer(payload, np.uint8, cm_len * es, pos).reshape(cm_len, es)
        pal = raw[:, [2, 1, 0]] if es == 3 else raw[:, [2, 1, 0, 3]]
        pos += cm_len * es
    depth = bpp // 8
    n_bytes = w * h * depth
    if rle:
        out = bytearray()
        while len(out) < n_bytes:
            if pos >= len(payload):
                raise ValueError("TGA: truncated RLE stream")
            head = payload[pos]
            pos += 1
            n = (head & 0x7F) + 1
            if head & 0x80:  # run packet: one pixel repeated
                out += payload[pos : pos + depth] * n
                pos += depth
            else:  # raw packet
                out += payload[pos : pos + n * depth]
                pos += n * depth
        pix = bytes(out[:n_bytes])
    else:
        pix = payload[pos : pos + n_bytes]
    if len(pix) < n_bytes:
        raise ValueError("TGA: truncated pixel data")
    arr = np.frombuffer(pix, np.uint8).reshape(h, w, depth)
    if not desc & 0x20:  # bit 5 clear: bottom-up origin
        arr = arr[::-1]
    if base == 3:  # grayscale
        if depth != 1:
            raise ValueError("TGA: grayscale requires 8-bpp pixels")
        return np.ascontiguousarray(arr)
    if base == 1:  # color-mapped
        if depth != 1 or pal is None:
            raise ValueError("TGA: color-mapped image missing palette")
        idx = arr[:, :, 0]
        if idx.max(initial=0) >= len(pal):
            raise ValueError("TGA: palette index out of range")
        return np.ascontiguousarray(pal[idx])
    # truecolor: BGR(A) -> RGB(A)
    if depth == 3:
        return np.ascontiguousarray(arr[:, :, ::-1])
    return np.ascontiguousarray(arr[:, :, [2, 1, 0, 3]])


_TGA_FOOTER = b"TRUEVISION-XFILE.\x00"


def wav_decoder(payload: bytes):
    """PCM WAV (8/16/32-bit int) → (float64 mono waveform in [-1, 1],
    native sample_rate) via the stdlib ``wave`` module. Multi-channel
    audio is averaged to mono (librosa's mono=True convention); unlike
    librosa there is NO resampling — the native rate is returned."""
    import io
    import wave as _wave

    import numpy as np

    with _wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        sr = w.getframerate()
        frames = w.readframes(w.getnframes())
    if sw == 1:  # unsigned 8-bit
        wavef = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif sw == 2:
        wavef = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 3:
        # 24-bit LE (r10): widen to int32 via a zero pad on the low byte
        raw = np.frombuffer(frames, dtype=np.uint8)
        raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3)
        padded = np.zeros((raw.shape[0], 4), dtype=np.uint8)
        padded[:, 1:] = raw
        wavef = padded.view("<i4")[:, 0].astype(np.float64) / 2147483648.0
    elif sw == 4:
        wavef = (
            np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
        )
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    if nch > 1:
        wavef = wavef.reshape(-1, nch).mean(axis=1)
    return wavef, sr


def _g711_table(law: str):
    """256-entry float64 expansion table for the ITU-T G.711
    companding laws ("mu" or "a") — shared by the WAV and AU tiers."""
    import numpy as np

    codes = np.arange(256, dtype=np.uint8)
    if law == "mu":  # mu-law: invert, extract exponent/mantissa
        u = ~codes
        sign = np.where(u & 0x80, -1.0, 1.0)
        exp = (u >> 4) & 0x07
        mant = u & 0x0F
        mag = ((mant.astype(np.int32) << 3) + 0x84 << exp) - 0x84
        return sign * mag / 32768.0
    # A-law: even-bit inversion, segment expansion
    # NB: A-law's sign convention is inverted vs mu-law — the sign
    # bit SET means positive (G.711 alaw2linear)
    a = codes ^ 0x55
    sign = np.where(a & 0x80, 1.0, -1.0)
    exp = (a >> 4) & 0x07
    mant = (a & 0x0F).astype(np.int32)
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    return sign * mag / 32768.0


def g711_wav_decoder(payload: bytes):
    """G.711 μ-law / A-law WAV (format tags 7 / 6 — the telephony
    codecs the stdlib ``wave`` module refuses) → (float64 mono
    waveform in [-1, 1], native sample_rate). Manual RIFF chunk walk +
    the ITU-T G.711 expansion formulas, vectorized over a 256-entry
    lookup table (one table build per call, one fancy-index per
    payload)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, nch, sr = fmt[0], fmt[1], fmt[2]
    if tag not in (6, 7):
        raise ValueError(f"g711_wav_decoder handles A-law/mu-law only (tag {tag})")
    table = _g711_table("mu" if tag == 7 else "a")
    wavef = table[np.frombuffer(data, dtype=np.uint8)]
    if nch > 1:
        wavef = wavef.reshape(-1, nch).mean(axis=1)
    return wavef, sr


def manual_wav_decoder(payload: bytes):
    """Manual RIFF walk for the WAV shapes the stdlib ``wave`` module
    refuses: IEEE-float (tag 3, 32/64-bit) and WAVE_FORMAT_EXTENSIBLE
    (tag 0xFFFE — the standard container for >2-channel and 24-bit
    audio, whose SubFormat GUID's first two LE bytes name the
    effective codec), plus plain PCM (tag 1) at any 8/16/24/32 width
    so extensible-PCM and float share one decode path. → (float64
    mono waveform, native sample_rate). (r10, seam shrink)"""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    fmt_body = b""
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, nch, sr, _, _, bits = fmt
    if tag == 0xFFFE:
        # extensible: cbSize (2) + validBits (2) + channelMask (4) +
        # SubFormat GUID (16, first two LE bytes = effective tag);
        # container ``bits`` governs the stored sample width
        if len(fmt_body) < 40:
            raise ValueError("extensible WAV: truncated SubFormat extension")
        (tag,) = struct.unpack("<H", fmt_body[24:26])
    if tag == 3:
        if bits == 32:
            data = data[: (len(data) // 4) * 4]
            wavef = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            data = data[: (len(data) // 8) * 8]
            wavef = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"float WAV must be 32- or 64-bit (got {bits})")
    elif tag == 1:
        if bits == 8:  # unsigned
            wavef = (
                np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        elif bits == 16:
            data = data[: (len(data) // 2) * 2]
            wavef = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3)
            padded = np.zeros((raw.shape[0], 4), dtype=np.uint8)
            padded[:, 1:] = raw
            wavef = padded.view("<i4")[:, 0].astype(np.float64) / 2147483648.0
        elif bits == 32:
            data = data[: (len(data) // 4) * 4]
            wavef = (
                np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
            )
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    else:
        raise ValueError(
            f"manual_wav_decoder handles PCM/IEEE-float only (tag {tag})"
        )
    if nch > 1:
        wavef = wavef[: (len(wavef) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return wavef, sr


# back-compat alias (r10 first landed the float-only tier under this name)
float_wav_decoder = manual_wav_decoder


# IMA ADPCM step-size table (IMA ADPCM reference algorithm / RFC
# "Intel DVI" tables — public spec constants)
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
)
_IMA_INDEX_ADJUST = (-1, -1, -1, -1, 2, 4, 6, 8)


def ima_adpcm_wav_decoder(payload: bytes):
    """IMA/DVI ADPCM WAV (format tag 0x11) → (float64 mono waveform in
    [-1, 1], native sample_rate) — a REAL compressed-audio codec
    decoding dependency-free: 4-bit nibbles expand through the IMA
    step/index tables per block, each block carrying its own
    (predictor, step index) header so blocks are independently
    decodable (the spec's seek property). Multi-channel blocks
    interleave 4-byte channel chunks; output averages to mono.

    The nibble walk is sequential Python per sample — the same
    correctness-tier posture as the JPEG/FLAC entropy decoders."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, nch, sr, _brate, balign, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != 0x11:
        raise ValueError(f"ima_adpcm_wav_decoder handles format tag 0x11 only (got {tag})")
    if bits != 4:
        raise ValueError(f"IMA ADPCM requires 4-bit samples (got {bits})")

    steps = _IMA_STEPS
    out_ch: list[list[float]] = [[] for _ in range(nch)]
    for boff in range(0, len(data) - balign + 1, balign):
        block = data[boff : boff + balign]
        preds = []
        idxs = []
        for c in range(nch):
            pred, idx = struct.unpack_from("<hBx", block, c * 4)
            if idx > 88:
                raise ValueError(f"IMA ADPCM step index {idx} out of range")
            preds.append(pred)
            idxs.append(idx)
            out_ch[c].append(pred / 32768.0)
        body = block[4 * nch :]
        # payload: per 4-byte chunk per channel, interleaved
        chunk_words = len(body) // (4 * nch)
        for w_i in range(chunk_words):
            for c in range(nch):
                chunk = body[(w_i * nch + c) * 4 : (w_i * nch + c) * 4 + 4]
                for byte in chunk:
                    for nib in (byte & 0x0F, byte >> 4):
                        step = steps[idxs[c]]
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        if nib & 8:
                            preds[c] -= diff
                        else:
                            preds[c] += diff
                        preds[c] = max(-32768, min(32767, preds[c]))
                        idxs[c] = max(0, min(88, idxs[c] + _IMA_INDEX_ADJUST[nib & 7]))
                        out_ch[c].append(preds[c] / 32768.0)
    arr = np.array(out_ch, dtype=np.float64)
    wavef = arr.mean(axis=0) if nch > 1 else arr[0]
    return wavef, sr


_MS_ADPCM_COEF1 = (256, 512, 0, 192, 240, 460, 392)
_MS_ADPCM_COEF2 = (0, -256, 0, 64, 0, -208, -232)
_MS_ADPCM_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)


def ms_adpcm_wav_decoder(payload: bytes):
    """Microsoft ADPCM WAV (format tag 0x02, r11) → (float64 mono
    waveform in [-1, 1], native sample_rate). The other ubiquitous
    compressed-WAV codec beside IMA: per-block header carries each
    channel's predictor-coefficient index, initial idelta, and TWO
    seed samples (emitted — sample2 is the older); then 4-bit codes,
    HIGH nibble first (opposite of IMA), channels alternating per
    nibble in stereo. Prediction is
    (sample1·c1 + sample2·c2) >> 8 + signed4(code)·idelta with the
    published coefficient/adaptation tables; all shifts are arithmetic
    (Python's >> floors like C's on negatives, so the walk is
    bit-exact against reference decoders).

    Frame-count discipline (r12, ADVICE fix): a not-fully-populated
    final block pads its tail nibbles, so each block's per-channel
    output is truncated to wSamplesPerBlock (fmt-chunk extension;
    derived from nBlockAlign when a minimal fmt omits it), a trailing
    PARTIAL block (< nBlockAlign bytes but carrying a full header) is
    decoded rather than dropped, and a fact chunk's dwSampleLength
    caps the total — mirroring the _nframes truncation the IMA4 AIFC
    path does.

    Same sequential-Python correctness-tier posture as the IMA/JPEG/
    FLAC entropy walks."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    fact_frames = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and clen >= 4:
            (fact_frames,) = struct.unpack("<I", body[:4])
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, nch, sr, _brate, balign, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != 0x02:
        raise ValueError(
            f"ms_adpcm_wav_decoder handles format tag 0x02 only (got {tag})"
        )
    if bits != 4:
        raise ValueError(f"MS ADPCM requires 4-bit samples (got {bits})")
    if nch not in (1, 2):
        raise ValueError(f"MS ADPCM supports 1-2 channels (got {nch})")
    hdr = 7 * nch  # per block: nch predictors + 3 int16 fields per ch
    # wSamplesPerBlock from the fmt extension; a minimal 16-byte fmt
    # gets the nBlockAlign-derived default (2 header samples + one per
    # payload nibble) — which is also the hard geometric ceiling
    max_spb = (balign - hdr) * 2 // nch + 2
    spb = max_spb
    if len(fmt) >= 20:
        (ext_spb,) = struct.unpack_from("<H", fmt, 18)
        if not 2 <= ext_spb <= max_spb:
            raise ValueError(
                f"MS ADPCM wSamplesPerBlock {ext_spb} outside [2, {max_spb}] "
                f"for nBlockAlign {balign}"
            )
        spb = ext_spb

    out_ch: list[list[float]] = [[] for _ in range(nch)]
    for boff in range(0, len(data), balign):
        block = data[boff : boff + balign]
        if len(block) < hdr:
            # trailing fragment too short for even a block header: no
            # decodable samples (a full block's tail is handled below)
            break
        # a trailing partial block decodes the nibbles it has
        blk_spb = min(spb, (len(block) - hdr) * 2 // nch + 2)
        preds = []
        ideltas = []
        s1 = []
        s2 = []
        for c in range(nch):
            p = block[c]
            if p >= len(_MS_ADPCM_COEF1):
                raise ValueError(f"MS ADPCM predictor index {p} out of range")
            preds.append(p)
        for c in range(nch):
            ideltas.append(struct.unpack_from("<h", block, nch + 2 * c)[0])
        for c in range(nch):
            s1.append(struct.unpack_from("<h", block, 3 * nch + 2 * c)[0])
        for c in range(nch):
            s2.append(struct.unpack_from("<h", block, 5 * nch + 2 * c)[0])
        for c in range(nch):
            # the two header samples are real output, older first
            out_ch[c].append(s2[c] / 32768.0)
            out_ch[c].append(s1[c] / 32768.0)
        ch = 0
        # nibbles beyond the block's sample count are pad, not samples
        remaining = (blk_spb - 2) * nch
        for byte in block[hdr:]:
            if remaining <= 0:
                break
            for code in (byte >> 4, byte & 0x0F):  # HIGH nibble first
                if remaining <= 0:
                    break
                c1 = _MS_ADPCM_COEF1[preds[ch]]
                c2 = _MS_ADPCM_COEF2[preds[ch]]
                signed = code - 16 if code >= 8 else code
                pred = ((s1[ch] * c1 + s2[ch] * c2) >> 8) + signed * ideltas[ch]
                pred = max(-32768, min(32767, pred))
                s2[ch] = s1[ch]
                s1[ch] = pred
                ideltas[ch] = max(16, (_MS_ADPCM_ADAPT[code] * ideltas[ch]) >> 8)
                out_ch[ch].append(pred / 32768.0)
                remaining -= 1
                ch = (ch + 1) % nch
    if fact_frames is not None:
        out_ch = [chan[:fact_frames] for chan in out_ch]
    arr = np.array(out_ch, dtype=np.float64)
    wavef = arr.mean(axis=0) if nch > 1 else arr[0]
    return wavef, sr


def _float80(b: bytes) -> float:
    """Parse the 80-bit IEEE 754 extended float AIFF stores the sample
    rate in (big-endian: 1 sign + 15 exponent + 64 mantissa bits, with
    an explicit integer bit)."""
    sign_exp = int.from_bytes(b[:2], "big")
    mant = int.from_bytes(b[2:10], "big")
    if sign_exp & 0x7FFF == 0 and mant == 0:
        return 0.0
    val = mant * 2.0 ** ((sign_exp & 0x7FFF) - 16383 - 63)
    return -val if sign_exp & 0x8000 else val


def aiff_decoder(payload: bytes):
    """AIFF / AIFF-C PCM → (float64 mono waveform in [-1, 1], native
    sample_rate). Chunk walk per the AIFF-1.3 / AIFF-C specs: COMM
    carries geometry (channels, sample size, 80-bit-extended rate, and
    for AIFC a compression fourcc — ``NONE`` big-endian and ``sowt``
    little-endian byte-swapped PCM are the uncompressed ones), SSND
    carries the frames after its offset field. AIFF samples are SIGNED
    at every width (unlike WAV's unsigned 8-bit); 8/16/24/32-bit all
    decode. Apple IMA4 ADPCM decodes natively (r11 — the WAV tier's
    IMA step walk over 34-byte packets); other compressed AIFC
    variants raise so the librosa env seam owns them."""
    import struct

    import numpy as np

    if payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF payload (missing FORM/AIFF magic)")
    is_aifc = payload[8:12] == b"AIFC"
    pos, n = 12, len(payload)
    comm = data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack(">I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            (off,) = struct.unpack(">I", body[:4])
            data = body[8 + off :]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if comm is None or data is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    nch, _nframes, bits = struct.unpack(">hIh", comm[:8])
    sr = int(round(_float80(comm[8:18])))
    little = False
    float_kind = None
    g711_kind = None
    unsigned8 = False
    ima4 = False
    if is_aifc:
        ctype = comm[18:22]
        if ctype == b"sowt":
            little = True
        elif ctype == b"twos":
            pass  # big-endian two's-complement — identical to NONE
        elif ctype == b"raw ":
            unsigned8 = True  # offset-binary 8-bit (r10)
        elif ctype in (b"fl32", b"FL32"):
            float_kind = ">f4"
        elif ctype in (b"fl64", b"FL64"):
            float_kind = ">f8"
        elif ctype in (b"ulaw", b"ULAW"):
            g711_kind = "mu"
        elif ctype in (b"alaw", b"ALAW"):
            g711_kind = "a"
        elif ctype == b"ima4":
            ima4 = True  # Apple IMA ADPCM (r11)
        elif ctype != b"NONE":
            raise ValueError(f"stdlib AIFF tier supports PCM/float only (got {ctype!r})")
    if ima4:
        # Apple IMA4 (QuickTime 'ima4', r11): 34-byte packets per
        # channel — a 2-byte big-endian state header (top 9 bits = the
        # predictor's high bits as int16, low 7 bits = step index) +
        # 32 nibble bytes = 64 samples; channel packets interleave per
        # 64-frame group. Same IMA step walk as the WAV tier
        # (ima_adpcm_wav_decoder), but the header predictor is STATE
        # ONLY — unlike WAV blocks it is not emitted as a sample.
        steps = _IMA_STEPS
        n_packets = len(data) // 34
        groups = n_packets // max(nch, 1)
        out_ch = np.empty((nch, groups * 64), dtype=np.float64)
        for g in range(groups):
            for c in range(nch):
                off = (g * nch + c) * 34
                (h,) = struct.unpack(">H", data[off : off + 2])
                pred = h & 0xFF80
                if pred >= 0x8000:
                    pred -= 0x10000
                idx = h & 0x7F
                if idx > 88:
                    raise ValueError(f"ima4: step index {idx} out of range")
                oi = g * 64
                for byte in data[off + 2 : off + 34]:
                    for nib in (byte & 0x0F, byte >> 4):
                        step = steps[idx]
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        pred = pred - diff if nib & 8 else pred + diff
                        pred = max(-32768, min(32767, pred))
                        idx = max(0, min(88, idx + _IMA_INDEX_ADJUST[nib & 7]))
                        out_ch[c, oi] = pred / 32768.0
                        oi += 1
        if _nframes:
            out_ch = out_ch[:, :_nframes]
        wavef = out_ch.mean(axis=0) if nch > 1 else out_ch[0]
        return wavef, sr
    if g711_kind is not None:
        # AIFC G.711 (r10): one code byte per sample; COMM sampleSize
        # names the DECOMPRESSED width (16), so bound by frames × nch
        if _nframes:
            data = data[: _nframes * nch]
        wavef = _g711_table(g711_kind)[np.frombuffer(data, dtype=np.uint8)]
        if nch > 1:
            wavef = wavef[: (len(wavef) // nch) * nch].reshape(-1, nch).mean(axis=1)
        return wavef, sr
    if float_kind is not None:
        # AIFC IEEE float (r10): samples are normalized floats; COMM
        # numSampleFrames still bounds the real frames past block pad
        sw = 4 if float_kind == ">f4" else 8
        if _nframes:
            data = data[: _nframes * nch * sw]
        data = data[: (len(data) // sw) * sw]
        wavef = np.frombuffer(data, dtype=float_kind).astype(np.float64)
        if nch > 1:
            wavef = wavef[: (len(wavef) // nch) * nch].reshape(-1, nch).mean(axis=1)
        return wavef, sr
    if bits % 8 or not 8 <= bits <= 32:
        raise ValueError(f"unsupported AIFF sample size {bits}")
    sw = bits // 8
    # SSND chunks may be padded to blockSize alignment past the real
    # frames — COMM's numSampleFrames bounds the audio; pad bytes must
    # not decode as spurious samples
    if _nframes:
        data = data[: _nframes * nch * sw]
    nsamp = len(data) // sw
    data = data[: nsamp * sw]
    bo = "<" if little else ">"
    if sw == 1:
        if unsigned8:
            wavef = (
                np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        else:
            wavef = np.frombuffer(data, dtype=np.int8).astype(np.float64) / 128.0
    elif sw == 2:
        wavef = np.frombuffer(data, dtype=bo + "i2").astype(np.float64) / 32768.0
    elif sw == 4:
        wavef = np.frombuffer(data, dtype=bo + "i4").astype(np.float64) / 2147483648.0
    else:  # 24-bit: widen to int32 via a zero pad on the low byte
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        padded = np.zeros((raw.shape[0], 4), dtype=np.uint8)
        padded[:, :3] = raw if not little else raw[:, ::-1]
        wavef = padded.view(">i4")[:, 0].astype(np.float64) / 2147483648.0
    if nch > 1:
        wavef = wavef[: (len(wavef) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return wavef, sr


def au_decoder(payload: bytes):
    """Sun/NeXT AU (.snd) → (float64 mono waveform in [-1, 1], native
    sample_rate). Fixed big-endian header per the public au spec;
    encodings 1 (G.711 mu-law), 2/3/4/5 (signed linear PCM
    8/16/24/32), and 27 (G.711 A-law) decode; float/ADPCM encodings
    raise so the librosa env seam owns them."""
    import struct

    import numpy as np

    if payload[:4] != b".snd":
        raise ValueError("not an AU payload (missing .snd magic)")
    off, size, enc, sr, nch = struct.unpack(">IIIII", payload[4:24])
    if off < 24:
        raise ValueError("AU header offset overlaps the header")
    data = payload[off:]
    if size != 0xFFFFFFFF:
        data = data[:size]
    if enc in (1, 27):
        table = _g711_table("mu" if enc == 1 else "a")
        wavef = table[np.frombuffer(data, dtype=np.uint8)]
    elif enc == 2:
        wavef = np.frombuffer(data, dtype=np.int8).astype(np.float64) / 128.0
    elif enc == 3:
        data = data[: (len(data) // 2) * 2]
        wavef = np.frombuffer(data, dtype=">i2").astype(np.float64) / 32768.0
    elif enc == 4:
        data = data[: (len(data) // 3) * 3]
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        padded = np.zeros((raw.shape[0], 4), dtype=np.uint8)
        padded[:, :3] = raw
        wavef = padded.view(">i4")[:, 0].astype(np.float64) / 2147483648.0
    elif enc == 5:
        data = data[: (len(data) // 4) * 4]
        wavef = np.frombuffer(data, dtype=">i4").astype(np.float64) / 2147483648.0
    elif enc == 6:  # IEEE float32 (r10)
        data = data[: (len(data) // 4) * 4]
        wavef = np.frombuffer(data, dtype=">f4").astype(np.float64)
    elif enc == 7:  # IEEE float64 (r10)
        data = data[: (len(data) // 8) * 8]
        wavef = np.frombuffer(data, dtype=">f8").astype(np.float64)
    else:
        raise ValueError(f"stdlib AU tier: unsupported encoding {enc}")
    if nch > 1:
        wavef = wavef[: (len(wavef) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return wavef, sr


def stdlib_image_decoder(payload: bytes):
    """Magic-byte dispatch over the stdlib image tier (BMP / PPM /
    PGM / PNG / JPEG / GIF); raises ValueError for formats the
    tier can't parse."""
    if payload[:2] == b"BM":
        return bmp_decoder(payload)
    if payload[:2] in (b"P6", b"P5"):
        return ppm_decoder(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return png_decoder(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from cdc_historical_warehouse_platform_spark.operators.jpeg import jpeg_decoder

        return jpeg_decoder(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from cdc_historical_warehouse_platform_spark.operators.gif import gif_decoder

        return gif_decoder(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from cdc_historical_warehouse_platform_spark.operators.tiff import tiff_decoder

        return tiff_decoder(payload)
    # TGA first: a truecolor TGA header (idlen 0, no colormap, type 2)
    # collides with the CUR magic 00 00 02 00 — the 18-byte footer
    # signature is unambiguous
    if payload[-18:] == _TGA_FOOTER:
        return tga_decoder(payload)
    if payload[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        return ico_decoder(payload)
    raise ValueError(
        "payload is not a stdlib-decodable image "
        "(BMP/PPM/PGM/PNG/JPEG/GIF/TIFF/ICO/TGA)"
    )


def decode_image(payload: bytes):
    """Decode an image payload → (H, W, C) uint8 array. BMP (24-bit +
    8-bit palette/RLE8), PPM/PGM (8- and 16-bit),
    PNG (the full format — all depths, palette, Adam7), baseline AND
    progressive JPEG, GIF (full format incl. animation compositing —
    operators/gif.py), and baseline TIFF (both endians, strips,
    none/PackBits/LZW/deflate, tiles, 16-bit, predictor, new-style
    JPEG-in-TIFF — operators/tiff.py) decode via the dependency-free
    stdlib tier; anything else — and any stdlib-magic payload whose
    SUB-format the stdlib tier can't parse (arithmetic JPEG,
    old-style-JPEG TIFF) —
    routes to Pillow (honest env stub when absent), so installing
    Pillow never decodes LESS than it did before the stdlib tier
    existed."""
    stdlib_err: Exception | None = None
    if (
        payload[:2] in (b"BM", b"P6", b"P5")
        or payload[:8] == b"\x89PNG\r\n\x1a\n"
        or payload[:3] == b"\xff\xd8\xff"
        or payload[:6] in (b"GIF87a", b"GIF89a")
        or payload[:4] in (b"II*\x00", b"MM\x00*")
        or payload[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00")
        or payload[-18:] == _TGA_FOOTER
    ):
        try:
            return stdlib_image_decoder(payload)
        except Exception as err:  # noqa: BLE001
            # unsupported sub-format OR corrupt/truncated header
            # (ValueError / struct.error / IndexError alike): the codec
            # tier gets the same chance Pillow's own plugin chain would
            stdlib_err = err
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        # chain the stdlib-tier parse error (if any) so a corrupt BMP in
        # a Pillow-less environment surfaces the REAL failure, not just
        # the misleading "compressed formats need Pillow" stub
        _stub("decode_image", "Pillow", cause=stdlib_err)
    import io

    import numpy as np
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))


def decode_audio(payload: bytes):
    """Decode an audio payload → (waveform array, sample rate). RIFF
    PCM WAV (8/16/24/32-bit), IEEE-float WAV, WAVE_FORMAT_EXTENSIBLE
    (PCM/float SubFormats), G.711 mu-law/A-law WAV, IMA + Microsoft
    ADPCM WAV,
    AIFF/AIFF-C PCM (NONE/twos/sowt/raw) + float (fl32/fl64) + G.711
    (ulaw/alaw) + Apple IMA4 ADPCM (r11), Sun AU (PCM + G.711 + IEEE
    float), and FLAC (operators/flac.py — lossless, so bit-exact
    dependency-free decode) decode via the stdlib tier; anything else
    — and any payload the stdlib tier can't parse (other compressed
    AIFC, 32-bit FLAC, MP3/OGG) — routes to librosa (honest env stub
    when absent), so installing librosa never decodes LESS than
    before.

    Both tiers return the NATIVE sample rate (``sr=None`` below keeps
    librosa from resampling to its 22050 Hz default), so the (waveform,
    sr) contract is format-independent."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            return wav_decoder(payload)
        except Exception:
            # non-PCM sub-format or a corrupt container: try the G.711
            # telephony tier (mu-law/A-law), then IMA ADPCM, then fall
            # through
            try:
                return g711_wav_decoder(payload)
            except Exception:
                pass
            try:
                return ima_adpcm_wav_decoder(payload)
            except Exception:
                pass
            try:
                return ms_adpcm_wav_decoder(payload)
            except Exception:
                pass
            try:
                return float_wav_decoder(payload)
            except Exception:
                # 24-bit/other-compressed WAV: fall to librosa
                pass
    if payload[:4] == b"FORM" and payload[8:12] in (b"AIFF", b"AIFC"):
        try:
            return aiff_decoder(payload)
        except Exception:
            # compressed AIFC or corrupt container: fall to librosa
            pass
    if payload[:4] == b".snd":
        try:
            return au_decoder(payload)
        except Exception:
            # float/ADPCM AU or corrupt container: fall to librosa
            pass
    if payload[:4] == b"fLaC":
        try:
            from cdc_historical_warehouse_platform_spark.operators.flac import flac_decoder

            return flac_decoder(payload)
        except Exception:
            # unsupported sub-format (32-bit, Ogg-FLAC) or corrupt
            # stream: the librosa tier gets the same chance
            pass
    try:
        import librosa  # noqa: F401
    except ImportError:
        _stub("decode_audio", "librosa")
    import io

    import librosa

    return librosa.load(io.BytesIO(payload), sr=None)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_md5", T.StringType()),
        T.StructField("n_bytes_in", T.IntegerType()),
    ]
)


def resize_binary(df: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Arrow-batched "resize": every payload down to width*height bytes
    by deterministic nearest-index resampling (byte i of the output is
    input byte floor(i*len/target)) — the byte-level stand-in for
    pixel resampling, applied where ``decode_image(...).resize(...)``
    would run with PIL present. One row in → one row out; the md5 of
    the resampled bytes makes the output comparable without shipping
    the bytes anywhere.
    """
    target = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # NULL blob: drop, like the JVM twin
                    continue
                data = bytes(payload)
                n = len(data)
                resized = (
                    bytes(data[(i * n) // target] for i in range(target)) if n else b""
                )
                out.append(
                    {
                        "doc_id": doc_id,
                        "width": width,
                        "height": height,
                        "resized_md5": hashlib.md5(resized).hexdigest(),
                        "n_bytes_in": n,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return df.select("doc_id", "payload").mapInPandas(_resize, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
        T.StructField("frame_len", T.IntegerType()),
    ]
)


def sample_frames(
    df: DataFrame, frame_bytes: int = 256, every_n: int = 2
) -> DataFrame:
    """Row-EXPANDING Arrow UDF: split each payload into fixed-size
    "frames" and emit every ``every_n``-th — the video frame-sampling
    shape (one input row → many output rows inside mapInPandas, no
    explode needed JVM-side). Equivalence to a pure-JVM
    substring/md5 formulation is pinned by pytest, so the Python path
    can't silently drift from the declarative one.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # NULL blob: drop, like the JVM twin
                    continue
                data = bytes(payload)
                n_frames = (len(data) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, every_n):
                    chunk = data[idx * frame_bytes : (idx + 1) * frame_bytes]
                    out.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "frame_md5": hashlib.md5(chunk).hexdigest(),
                            "frame_len": len(chunk),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select("doc_id", "payload").mapInPandas(_frames, FRAME_SCHEMA)


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def extract_video_frames(df: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video frame sampling (late r9): Arrow-batched,
    row-expanding decode of AVI payloads (raw DIB / MJPEG), MP4/
    QuickTime (jpeg/raw sample tables) — see operators/video.py —
    and animated GIFs (disposal-composited
    canvases — operators/gif.py) into per-frame rows with decoded-RGB
    statistics and the md5 of the decoded pixels. One input row →
    one output row per sampled frame, bytes crossing the JVM↔Python
    boundary once per batch — the same posture as the image/audio
    pipelines."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from cdc_historical_warehouse_platform_spark.operators.gif import (
            gif_animation_decoder,
        )
        from cdc_historical_warehouse_platform_spark.operators.video import (
            avi_decoder,
            mp4_decoder,
        )

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                if raw[:6] in (b"GIF87a", b"GIF89a"):
                    decoder = gif_animation_decoder
                elif raw[4:8] in (
                    # match mp4_decoder's own magic: classic QuickTime
                    # files are often ftyp-less and open with another
                    # top-level box — routing them to avi_decoder made
                    # the whole Arrow batch fail with "not an AVI"
                    b"ftyp", b"moov", b"mdat", b"wide", b"free", b"skip",
                ):
                    decoder = mp4_decoder
                else:
                    decoder = avi_decoder
                for idx, img in decoder(raw, every_n=every_n):
                    out.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "width": img.shape[1],
                            "height": img.shape[0],
                            "mean_intensity": round(float(img.mean()), 6),
                            "frame_md5": hashlib.md5(img.tobytes()).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(_frames, VIDEO_FRAME_SCHEMA)


def sample_frames_jvm_twin(
    df: DataFrame, frame_bytes: int = 256, every_n: int = 2
) -> DataFrame:
    """The declarative twin of ``sample_frames`` (sequence + explode +
    substring + md5, all JVM): used by tests to pin the Arrow path and
    by plans that prefer staying in codegen when no real codec is
    involved."""
    n_frames = (F.length("payload") + F.lit(frame_bytes - 1)) / F.lit(frame_bytes)
    # Empty (or null) payloads must yield ZERO frames like the Python
    # twin — sequence(0, -1, step) throws "Illegal sequence boundaries"
    idx = F.when(
        n_frames.cast("int") > 0,
        F.sequence(F.lit(0), n_frames.cast("int") - 1, F.lit(every_n)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(
            "doc_id",
            "payload",
            F.explode(idx).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.expr(
                f"substring(payload, frame_idx * {frame_bytes} + 1, {frame_bytes})"
            ).alias("__chunk"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.md5("__chunk").alias("frame_md5"),
            F.length("__chunk").alias("frame_len"),
        )
    )


# --- decode → feature paths with injectable decoders (r4) -------------------
#
# The r3 gap: decode_image/decode_audio raised unless PIL/librosa
# imported, so the decode→resize→feature pipeline itself was never
# exercised. The fix is dependency inversion: the Arrow pipeline takes
# a ``decoder`` callable (payload bytes → ndarray), the codec-backed
# decoders are thin adapters onto that seam, and deterministic raw
# decoders make the WHOLE downstream path (numpy resize, feature math,
# Arrow batching, schema) testable in this codec-less container. A
# user with Pillow installed runs the exact tested pipeline — only the
# first callable differs.


IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)


def pil_decoder(payload: bytes):
    """payload → (H, W, C) uint8 array via :func:`decode_image` —
    BMP/PPM/PGM decode dependency-free (stdlib tier, r8); compressed
    formats route to Pillow (honest env stub when absent)."""
    import numpy as np

    return np.asarray(decode_image(payload))


def raw_image_decoder(width: int, height: int, channels: int = 1):
    """Codec-free decoder for raw row-major uint8 payloads of a known
    shape — the deterministic stand-in that lets the full decode →
    resize → feature pipeline run and be tested without Pillow."""

    def _dec(payload: bytes):
        import numpy as np

        arr = np.frombuffer(payload, dtype=np.uint8)
        expected = width * height * channels
        if arr.size != expected:
            raise ValueError(
                f"raw image payload has {arr.size} bytes, expected {expected}"
            )
        return arr.reshape(height, width, channels)

    return _dec


def extract_image_features(
    df: DataFrame,
    decoder=None,
    out_w: int = 8,
    out_h: int = 8,
) -> DataFrame:
    """Arrow-batched decode → nearest-neighbor resize → features.

    ``decoder``: payload bytes → (H, W[, C]) uint8 array; defaults to
    :func:`pil_decoder`. The resize is real resampling math (numpy
    nearest-index gather), not a byte stand-in — identical for every
    decoder, so tests with :func:`raw_image_decoder` pin exactly the
    code a Pillow user runs."""
    dec = decoder or pil_decoder

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # NULL blob: drop, like the JVM twin
                    continue
                arr = np.asarray(dec(bytes(payload)))
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                h, w, c = arr.shape
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = np.ascontiguousarray(arr[ys][:, xs])
                out.append(
                    {
                        "doc_id": doc_id,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "mean_intensity": round(float(arr.mean()), 6),
                        "resized_md5": hashlib.md5(resized.tobytes()).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(_feats, IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def librosa_decoder(payload: bytes):
    """payload → (waveform float array, sample_rate) via librosa
    (raises the honest env stub when librosa is absent)."""
    return decode_audio(payload)


def raw_audio_decoder(sample_rate: int = 16000):
    """Codec-free decoder for raw little-endian int16 mono payloads —
    the deterministic stand-in that lets the waveform feature path run
    and be tested without librosa."""

    def _dec(payload: bytes):
        import numpy as np

        wave = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
        return wave, sample_rate

    return _dec


def dpcm8_decoder(sample_rate: int = 16000):
    """Codec-free decoder for 8-bit delta-PCM payloads: each byte is
    an unsigned level and the waveform is the FIRST DIFFERENCE of the
    level stream, scaled to [-1, 1) — n bytes → n-1 samples. Delta
    coding is the classic low-bit-rate trick (DPCM; the prediction
    step of every ADPCM codec above), and unlike raw offset-binary
    PCM it yields sign-varying waveforms from arbitrary byte streams,
    so downstream features (zero crossings, RMS) exercise their full
    range in tests without a codec library."""

    def _dec(payload: bytes):
        import numpy as np

        levels = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        return np.diff(levels) / 128.0, sample_rate

    return _dec


def extract_audio_features(df: DataFrame, decoder=None) -> DataFrame:
    """Arrow-batched decode → waveform features (duration, RMS, zero
    crossings). ``decoder``: payload bytes → (1-D float waveform,
    sample_rate); defaults to :func:`librosa_decoder`."""
    dec = decoder or librosa_decoder

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # NULL blob: drop, like the JVM twin
                    continue
                wave, sr = dec(bytes(payload))
                wave = np.asarray(wave, dtype=np.float64)
                n = int(wave.size)
                rms = float(np.sqrt(np.mean(wave**2))) if n else 0.0
                zc = int(np.count_nonzero(np.diff(np.signbit(wave)))) if n > 1 else 0
                out.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": n,
                        "sample_rate": int(sr),
                        "duration_sec": round(n / sr, 6) if sr else 0.0,
                        "rms": round(rms, 9),
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(_feats, AUDIO_FEATURE_SCHEMA)
