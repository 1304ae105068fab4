"""Dependency-free JPEG decoder (r9): baseline AND progressive.

Extends the stdlib codec tier (multimodal.py r8: BMP/PPM/PGM/WAV, r9:
PNG) to JFIF: SOI/APPn/DQT/SOF/DHT/DRI/SOS parsing, Huffman entropy
decode with byte-stuffing and restart markers, dequantize → zigzag →
8×8 IDCT, YCbCr→RGB per the JFIF matrix, and nearest-neighbor chroma
upsampling for subsampled components (4:2:0 / 4:2:2 / 4:4:4 all
follow from the per-component sampling factors). Progressive files
(SOF2, late r9) decode through persistent per-component coefficient
stores refined scan by scan: DC first/refine (interleaved or not),
spectral selection, and successive approximation with EOB-run coding
and the G.1.2.3 correction-bit discipline.

Out of scope — these raise ValueError and decode_image falls through
to Pillow exactly like the other stdlib sub-format gaps: lossless /
hierarchical SOFs, 12-bit precision, arithmetic coding (DAC), and
CMYK/4-component scans.

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
    progressive = False
    prog_store = None
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
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
            progressive = marker == 0xC2
            if progressive:
                # persistent per-component coefficient stores: every
                # scan of a progressive file refines them in place
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-width // (8 * hmax))
                mcuy = -(-height // (8 * vmax))
                prog_store = [
                    np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
                    for c in comps
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"stdlib JPEG tier supports baseline (SOF0) and progressive "
                f"(SOF2) only — got SOF marker 0xFF{marker:02X}"
            )
        elif marker == 0xCC:  # DAC
            raise ValueError("stdlib JPEG tier: arithmetic coding unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tds = seg[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cs, tds >> 4, tds & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos += seglen
            if not progressive:
                if ns != len(frame[2]):
                    # baseline PERMITS non-interleaved multi-scan
                    # files, but they're vanishingly rare from real
                    # encoders; refuse cleanly for the Pillow seam
                    raise ValueError(
                        f"stdlib JPEG tier supports one interleaved baseline scan "
                        f"only (scan has {ns} of {len(frame[2])} components)"
                    )
                return _decode_scan(
                    payload, pos, frame,
                    qt, huff_dc, huff_ac,
                    {cs: (td, ta) for cs, td, ta in scan_comps},
                    restart_interval,
                )
            pos = _decode_progressive_scan(
                payload, pos, frame, prog_store, huff_dc, huff_ac,
                scan_comps, ss, se, ah, al, restart_interval,
            )
            continue  # pos already past the entropy data
        pos += seglen
    if progressive and prog_store is not None:
        return _reconstruct(frame, qt, prog_store)
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

    return _reconstruct(frame, qt, store)


def _reconstruct(frame, qt, store):
    """Shared tail of both code paths: vectorized dequant + de-zigzag
    + IDCT per component, plane assembly, chroma upsample, color."""
    import numpy as np

    height, width, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
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


def _decode_progressive_scan(
    data, pos, frame, store, huff_dc, huff_ac,
    scan_comps, ss, se, ah, al, restart_interval,
):
    """One progressive scan (T.81 G.2): DC first/refine (interleaved
    or single-component) and AC first/refine (single-component by
    spec), with EOB-run coding and successive-approximation
    refinement per Annex G.1.2. Updates ``store`` in place and
    returns the byte position just past the scan's entropy data."""
    height, width, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    by_id = {c["id"]: (ci, c) for ci, c in enumerate(comps)}

    reader = _BitReader(data, pos)
    state = {"eobrun": 0}
    pred = {cs: 0 for cs, _td, _ta in scan_comps}
    rst_next = 0
    unit = 0  # MCUs (interleaved) or blocks (non-interleaved)

    def maybe_restart():
        nonlocal rst_next
        if restart_interval and unit and unit % restart_interval == 0:
            reader.align_and_skip_restart(0xD0 + rst_next)
            rst_next = (rst_next + 1) % 8
            for cs in pred:
                pred[cs] = 0
            state["eobrun"] = 0

    if ss == 0:  # DC scan (first or refine); Se must be 0
        if se != 0:
            raise ValueError("invalid progressive scan: Ss=0 requires Se=0")
        if len(scan_comps) > 1:
            # interleaved DC scan: MCU order like baseline
            for _my in range(mcuy):
                for _mx in range(mcux):
                    maybe_restart()
                    for cs, td, _ta in scan_comps:
                        ci, c = by_id[cs]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                block = store[ci][
                                    _my * c["v"] + by, _mx * c["h"] + bx
                                ]
                                if ah == 0:
                                    _dc_first(reader, huff_dc[td], block, pred, cs, al)
                                else:
                                    block[0] |= reader.receive(1) << al
                    unit += 1
        else:
            cs, td, _ta = scan_comps[0]
            ci, c = by_id[cs]
            bwid, bhei = _component_blocks(width, height, c, hmax, vmax)
            for by in range(bhei):
                for bx in range(bwid):
                    maybe_restart()
                    block = store[ci][by, bx]
                    if ah == 0:
                        _dc_first(reader, huff_dc[td], block, pred, cs, al)
                    else:
                        block[0] |= reader.receive(1) << al
                    unit += 1
    else:  # AC scan: single component, non-interleaved (spec G.2)
        if len(scan_comps) != 1:
            raise ValueError("invalid progressive scan: AC scans carry one component")
        cs, _td, ta = scan_comps[0]
        ci, c = by_id[cs]
        bwid, bhei = _component_blocks(width, height, c, hmax, vmax)
        for by in range(bhei):
            for bx in range(bwid):
                maybe_restart()
                block = store[ci][by, bx]
                if ah == 0:
                    _ac_first(reader, huff_ac[ta], block, ss, se, al, state)
                else:
                    _ac_refine(reader, huff_ac[ta], block, ss, se, al, state)
                unit += 1
    # drop any padding bits, stand on the next marker boundary
    return reader.pos


def _component_blocks(width, height, c, hmax, vmax):
    """Non-interleaved block-grid dims for one component (T.81 A.2.2):
    ceil(ceil(dim * sampling / max_sampling) / 8)."""
    comp_w = -(-(width * c["h"]) // hmax)
    comp_h = -(-(height * c["v"]) // vmax)
    return -(-comp_w // 8), -(-comp_h // 8)


def _dc_first(reader, table, block, pred, cs, al):
    t = reader.decode_symbol(table)
    diff = _extend(reader.receive(t), t) if t else 0
    pred[cs] += diff
    block[0] = pred[cs] << al


def _ac_first(reader, table, block, ss, se, al, state):
    """AC first scan for one block (T.81 G.1.2.2 / libjpeg
    decode_mcu_AC_first)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode_symbol(table)
        r, s = rs >> 4, rs & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("AC run past end of band")
            block[k] = _extend(reader.receive(s), s) << al
            k += 1
        else:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.receive(r)
                state["eobrun"] = eobrun - 1
                return
            k += 16  # ZRL


def _ac_refine(reader, table, block, ss, se, al, state):
    """AC refinement scan for one block (T.81 G.1.2.3 / libjpeg
    decode_mcu_AC_refine): newly-significant coefficients arrive as
    ±1<<Al; already-nonzero ones receive one correction bit each,
    consumed in coefficient order interleaved with the zero-history
    run counting."""
    p1 = 1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.decode_symbol(table)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("invalid refinement magnitude")
                newval = p1 if reader.receive(1) else -p1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.receive(r)
                state["eobrun"] = eobrun
                break
            # advance over r zero-history coefficients, correcting
            # nonzero-history ones along the way
            while k <= se:
                coef = int(block[k])
                if coef != 0:
                    if reader.receive(1) and (coef & p1) == 0:
                        block[k] = coef + (p1 if coef >= 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                block[k] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            coef = int(block[k])
            if coef != 0:
                if reader.receive(1) and (coef & p1) == 0:
                    block[k] = coef + (p1 if coef >= 0 else -p1)
            k += 1
        state["eobrun"] -= 1
