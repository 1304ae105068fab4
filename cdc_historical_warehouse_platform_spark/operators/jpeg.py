"""Dependency-free baseline JPEG decoder (r9).

Extends the stdlib codec tier (multimodal.py r8: BMP/PPM/PGM/WAV, r9:
PNG) to baseline JFIF: SOI/APPn/DQT/SOF0/DHT/DRI/SOS parsing, Huffman
entropy decode with byte-stuffing and restart markers, dequantize →
zigzag → 8×8 IDCT, YCbCr→RGB per the JFIF matrix, and nearest-
neighbor chroma upsampling for subsampled components (4:2:0 / 4:2:2 /
4:4:4 all follow from the per-component sampling factors).

Out of scope — these raise ValueError and decode_image falls through
to Pillow exactly like the other stdlib sub-format gaps: progressive
(SOF2) and every non-baseline SOF, 12-bit precision, arithmetic
coding (DAC), and CMYK/4-component scans.

Performance posture: entropy decode is a sequential bitstream walk —
per-MCU Python — so this tier is for the Pillow-less environment's
correctness path (synthetic/test payloads, small thumbnails), not a
100 TB hot loop; the Arrow pipelines that call it batch per-document
payloads, and an environment with Pillow installed takes the C path
via the same decode_image seam. The block math (dequant, IDCT, color
transform, upsampling) is vectorized numpy over all blocks at once.

Spec references are to ITU-T T.81 (public): Annex B (syntax), F.2
(decoding procedures), A.3.3 (IDCT), and the JFIF 1.02 color matrix.
"""

from __future__ import annotations

import struct

__all__ = ["jpeg_decoder"]

# zigzag order: ZIGZAG[i] = block index of the i-th coefficient in
# transmission order (T.81 Figure 5)
_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman table: {(code_length, code) -> symbol}
    (T.81 Annex C code assignment)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 byte-unstuffing; stops
    at any real marker (the caller handles RSTn resets)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:  # stuffed byte
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: caller resets
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in entropy data")
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def receive(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.receive(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy data")

    def align_and_skip_restart(self, expected: int) -> None:
        """Byte-align and consume the RSTn marker (T.81 F.2.1.3.1)."""
        self.buf = 0
        self.nbits = 0
        d = self.data
        # the reader may have stopped exactly AT the marker
        while d[self.pos] != 0xFF or not (0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        if d[self.pos + 1] != expected:
            raise ValueError(
                f"restart marker out of order: got 0xFF{d[self.pos + 1]:02X}, "
                f"expected 0xFF{expected:02X}"
            )
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, code: int):
        self.code = code


def _extend(v: int, t: int) -> int:
    """DIFF/coefficient sign extension (T.81 F.2.2.1 EXTEND)."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _idct_matrix():
    import numpy as np

    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a  # samples = A.T @ coefs @ A


def jpeg_decoder(payload: bytes):
    """Baseline JFIF → (H, W, C) uint8 (C = 1 grayscale, 3 RGB).
    Raises ValueError for anything non-baseline (progressive, 12-bit,
    arithmetic, CMYK) so the Pillow fall-through owns those."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (height, width, components)
    restart_interval = 0
    n = len(payload)

    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # optional 0xFF fill bytes before a marker are spec-legal
        # (T.81 B.1.1.2); skip to the last FF of the run
        while payload[pos + 1] == 0xFF and pos + 2 < n:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                dq = np.zeros(64, dtype=np.int32)
                dq[list(_ZIGZAG)] = tbl  # de-zigzag the table itself
                qt[tq] = dq.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"stdlib JPEG tier supports 8-bit precision only (got {precision})")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(f"stdlib JPEG tier: unsupported component count {ncomp} (CMYK?)")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (height, width, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"stdlib JPEG tier supports baseline (SOF0) only — got SOF marker 0xFF{marker:02X}"
            )
        elif marker == 0xCC:  # DAC
            raise ValueError("stdlib JPEG tier: arithmetic coding unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            if ns != len(frame[2]):
                # baseline PERMITS non-interleaved multi-scan files,
                # but they're vanishingly rare from real encoders;
                # refuse cleanly so the Pillow seam owns them
                raise ValueError(
                    f"stdlib JPEG tier supports one interleaved scan only "
                    f"(scan has {ns} of {len(frame[2])} components)"
                )
            scan_tables = {}
            for i in range(ns):
                cs, tds = seg[1 + 2 * i : 3 + 2 * i]
                scan_tables[cs] = (tds >> 4, tds & 0x0F)
            pos += seglen
            return _decode_scan(
                payload, pos, frame, qt, huff_dc, huff_ac, scan_tables,
                restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS marker found (truncated JPEG)")


def _decode_scan(
    data, pos, frame, qt, huff_dc, huff_ac, scan_tables, restart_interval
):
    import numpy as np

    height, width, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    # per-component coefficient storage (in whole-MCU units)
    store = []
    for c in comps:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        store.append(np.zeros((bh, bw, 64), dtype=np.int32))

    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    rst_next = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_and_skip_restart(0xD0 + rst_next)
                rst_next = (rst_next + 1) % 8
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan_tables[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = _decode_block(
                            reader, huff_dc[td], huff_ac[ta], pred, ci
                        )
                        store[ci][my * c["v"] + by, mx * c["h"] + bx] = coefs
            mcu_count += 1

    # vectorized dequant + de-zigzag + IDCT per component
    a = _idct_matrix()
    zig = np.asarray(_ZIGZAG)
    planes = []
    for ci, c in enumerate(comps):
        blocks = store[ci]  # (bh, bw, 64) in zigzag order
        dez = np.zeros_like(blocks)
        dez[:, :, zig] = blocks  # de-zigzag
        bh, bw, _ = dez.shape
        coef = dez.reshape(bh, bw, 8, 8).astype(np.float64) * qt[c["tq"]]
        samp = np.einsum("xu,mnuv,vy->mnxy", a.T, coef, a) + 128.0
        # assemble the component plane from its 8x8 blocks
        plane = samp.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # nearest-neighbor upsample to full resolution
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_table, ac_table, pred, ci):
    """One 8×8 block in zigzag order (T.81 F.2.2): DC DIFF + AC RLE."""
    import numpy as np

    coefs = np.zeros(64, dtype=np.int32)
    t = reader.decode_symbol(dc_table)
    diff = _extend(reader.receive(t), t) if t else 0
    pred[ci] += diff
    coefs[0] = pred[ci]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coefs[k] = _extend(reader.receive(s), s)
        k += 1
    return coefs
