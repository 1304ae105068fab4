"""Dependency-free FLAC decoder (r9).

Rounds out the stdlib audio tier (multimodal.py: PCM WAV, G.711):
FLAC is LOSSLESS, so unlike the lossy formats a pure-Python decode
can be pinned bit-exact against the encoder's input samples.

Scope — the full baseline decode chain per the FLAC format spec
(https://xiph.org/flac/format.html, public):

- fLaC magic + metadata blocks (STREAMINFO parsed; others skipped),
- frame headers: sync, blocking strategy, block-size / sample-rate
  codes (incl. end-of-header 8/16-bit forms), channel assignment
  (independent + left/side, right/side, mid/side stereo), sample
  size, UTF-8-coded frame/sample number, CRC-8 (verified),
- subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (any order,
  quantized coefficients + shift), wasted bits,
- residuals: RICE / RICE2 partitioned coding, including escape
  partitions (raw binary), frame CRC-16 (verified).

Out of scope (raise ValueError → the librosa env seam owns them):
sample sizes other than 8/16/24-bit, >2 channels with side coding
(spec only defines side coding for stereo anyway), and Ogg-FLAC.

Performance posture: the bitstream walk is sequential Python per
sample — the correctness path for a librosa-less environment
(thumbnails/test payloads), same contract as the baseline JPEG tier.
"""

from __future__ import annotations

import struct

__all__ = ["flac_decoder"]


class _Bits:
    """MSB-first bit reader over the frame byte stream."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0  # bits consumed of data[pos]

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            avail = 8 - self.bit
            take = min(n, avail)
            byte = self.data[self.pos]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_coded(bits: _Bits) -> int:
    """The frame header's UTF-8-style variable-length number."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("invalid UTF-8-coded number in frame header")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8-coded continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _residuals(bits: _Bits, block_size: int, order: int) -> list[int]:
    """RICE/RICE2 partitioned residual decode (spec §residual)."""
    method = bits.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 if method == 0 else 5
    esc = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise ValueError("block size not divisible by partition count")
    out: list[int] = []
    for p in range(nparts):
        n = block_size // nparts - (order if p == 0 else 0)
        param = bits.read(plen)
        if param == esc:  # escape: raw binary residuals
            raw_bits = bits.read(5)
            for _ in range(n):
                out.append(bits.read_signed(raw_bits) if raw_bits else 0)
        else:
            for _ in range(n):
                q = bits.unary()
                r = bits.read(param) if param else 0
                zz = (q << param) | r
                out.append((zz >> 1) ^ -(zz & 1))  # zigzag -> signed
    return out


def _subframe(bits: _Bits, block_size: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("invalid subframe padding bit")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):  # wasted-bits flag
        wasted = 1 + bits.unary()
    eff = bps - wasted
    if ftype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        samples = [v] * block_size
    elif ftype == 1:  # VERBATIM
        samples = [bits.read_signed(eff) for _ in range(block_size)]
    elif 8 <= ftype <= 12:  # FIXED, order = ftype - 8
        order = ftype - 8
        warm = [bits.read_signed(eff) for _ in range(order)]
        res = _residuals(bits, block_size, order)
        samples = list(warm)
        coefs = _FIXED_COEFS[order]
        for i in range(order, block_size):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            samples.append(res[i - order] + pred)
    elif ftype >= 32:  # LPC, order = (ftype & 31) + 1
        order = (ftype & 31) + 1
        warm = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise ValueError("invalid LPC precision code")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        res = _residuals(bits, block_size, order)
        samples = list(warm)
        for i in range(order, block_size):
            acc = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            samples.append(res[i - order] + (acc >> shift))
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def flac_decoder(payload: bytes):
    """FLAC → (float64 mono waveform in [-1, 1], native sample_rate) —
    the (waveform, sr) contract of the other audio tiers; multi-channel
    audio averages to mono AFTER exact integer reconstruction."""
    import numpy as np

    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            sr = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            nch = ((body[12] >> 1) & 0x07) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            streaminfo = (sr, nch, bps)
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    sr0, nch0, bps0 = streaminfo
    if bps0 not in (8, 16, 24):
        raise ValueError(f"stdlib FLAC tier supports 8/16/24-bit only (got {bps0})")

    channels: list[list[int]] = [[] for _ in range(nch0)]
    n = len(payload)
    while pos < n:
        if pos + 2 > n:
            break
        sync = (payload[pos] << 8) | payload[pos + 1]
        if sync >> 2 != 0x3FFE:
            raise ValueError(f"bad frame sync at byte {pos}")
        frame_start = pos
        bits = _Bits(payload, pos)
        bits.read(14)  # sync
        if bits.read(1):
            raise ValueError("reserved frame-header bit set")
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1):
            raise ValueError("reserved frame-header bit set")
        _utf8_coded(bits)  # frame/sample number
        if bs_code == 6:
            block_size = bits.read(8) + 1
        elif bs_code == 7:
            block_size = bits.read(16) + 1
        elif bs_code in _BLOCK_SIZES:
            block_size = _BLOCK_SIZES[bs_code]
        else:
            raise ValueError(f"reserved block-size code {bs_code}")
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        bps = _SAMPLE_SIZES.get(ss_code, bps0) if ss_code else bps0
        crc8_end = bits.pos
        if bits.bit:
            raise ValueError("frame header not byte-aligned before CRC-8")
        if _crc8(payload[frame_start:crc8_end]) != bits.read(8):
            raise ValueError("frame header CRC-8 mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            assign = "independent"
        elif ch_code == 8:
            nch, assign = 2, "left_side"
        elif ch_code == 9:
            nch, assign = 2, "right_side"
        elif ch_code == 10:
            nch, assign = 2, "mid_side"
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        if nch != nch0:
            raise ValueError("frame channel count != STREAMINFO")

        subs = []
        for c in range(nch):
            sub_bps = bps
            # the SIDE channel carries one extra bit (spec)
            if (assign == "left_side" and c == 1) or (
                assign == "right_side" and c == 0
            ) or (assign == "mid_side" and c == 1):
                sub_bps += 1
            subs.append(_subframe(bits, block_size, sub_bps))
        bits.align()
        if _crc16(payload[frame_start : bits.pos]) != bits.read(16):
            raise ValueError("frame CRC-16 mismatch")
        pos = bits.pos

        if assign == "independent":
            chans = subs
        elif assign == "left_side":  # side = left - right
            left, side = subs
            chans = [left, [l - s for l, s in zip(left, side)]]
        elif assign == "right_side":  # side = left - right
            side, right = subs
            chans = [[r + s for r, s in zip(right, side)], right]
        else:  # mid_side
            mid, side = subs
            # spec reconstruction: left = ((mid<<1 | (side&1)) + side) >> 1
            left = [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(mid, side)]
            chans = [left, [l - s for l, s in zip(left, side)]]
        for c in range(nch):
            channels[c].extend(chans[c])

    scale = float(1 << (bps0 - 1))
    arr = np.array(channels, dtype=np.float64) / scale
    wavef = arr.mean(axis=0) if nch0 > 1 else arr[0]
    return wavef, sr0
