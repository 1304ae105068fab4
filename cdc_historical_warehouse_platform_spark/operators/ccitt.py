"""Dependency-free CCITT fax decode for bilevel TIFF (r11).

Scanned-document TIFFs — the dominant bilevel corpus format — compress
with the ITU-T fax codes: TIFF compression 2 ("CCITT RLE": T.4
one-dimensional Modified Huffman, every row starting byte-aligned, no
EOLs), 3 (Group 3 / T.4: EOL-delimited rows, optionally 2-D per
T4Options), and 4 (Group 4 / T.6: pure 2-D MMR over the whole strip).
This module implements all three from the published ITU-T T.4/T.6
recommendations:

- the complete T.4 white/black terminating (0-63) and make-up
  (64-1728) run-length code tables plus the shared extended make-up
  set (1792-2560);
- the 2-D vertical/horizontal/pass mode codes and the b1/b2
  changing-element machinery (reference line starts imaginary
  all-white, per T.6);
- G3 options: 1-D and 2-D lines (the per-row tag bit after EOL),
  fill bits before EOL.

Every code table entry is pinned in tests against the JDK's
independent ``javax.imageio`` TIFF writer (``com.sun.imageio``
ships CCITT RLE/T.4/T.6 encoders) — random bilevel rasters
round-trip encoder→this-decoder bit-exact, so a mistyped codeword
cannot hide behind a self-consistent in-repo encoder.

Output is a (height, width) uint8 BIT array (0 = white, 1 = black —
the T.4 coding colors); the TIFF layer applies
PhotometricInterpretation on top.

Scale posture: pure per-payload decode inside the Arrow mapInPandas
image pipelines; nothing here touches Spark.
"""

from __future__ import annotations

__all__ = ["ccitt_decode"]

_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
}
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}
_EOL = "000000000001"

# 2-D mode codes (T.4 §4.2.1 / T.6): keyed (n_bits, value)
_MODES = {
    (1, 0b1): "V0",
    (3, 0b011): "VR1",
    (3, 0b010): "VL1",
    (3, 0b001): "H",
    (4, 0b0001): "P",
    (6, 0b000011): "VR2",
    (6, 0b000010): "VL2",
    (7, 0b0000011): "VR3",
    (7, 0b0000010): "VL3",
}
_MODE_MAXLEN = 7


def _lut(*tables):
    out = {}
    for t in tables:
        for run, bits in t.items():
            key = (len(bits), int(bits, 2))
            assert key not in out, f"duplicate CCITT code {bits}"
            out[key] = run
    return out


_WHITE = _lut(_WHITE_TERM, _WHITE_MAKEUP, _EXT_MAKEUP)
_BLACK = _lut(_BLACK_TERM, _BLACK_MAKEUP, _EXT_MAKEUP)
_MAXLEN = 14


class _Bits:
    """MSB-first bit reader."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("CCITT: bitstream exhausted")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self, slack_bits: int = 0) -> bool:
        return self.pos + slack_bits >= self.n

    def peek_eol(self) -> bool:
        """True iff an EOL (11+ zero bits then a one) starts here,
        tolerating fill zeros; consumes it when found."""
        save = self.pos
        zeros = 0
        try:
            while True:
                b = self.bit()
                if b:
                    if zeros >= 11:
                        return True
                    self.pos = save
                    return False
                zeros += 1
        except ValueError:
            self.pos = save
            return False


def _read_run(bits: _Bits, table) -> int:
    """One complete run: make-up codes (>= 64) accumulate until a
    terminating code (< 64) closes the run, per T.4 §4.1."""
    total = 0
    while True:
        ln = 0
        val = 0
        while ln < _MAXLEN:
            val = (val << 1) | bits.bit()
            ln += 1
            run = table.get((ln, val))
            if run is not None:
                break
        else:
            raise ValueError("CCITT: invalid run-length code")
        total += run
        if run < 64:
            return total


def _decode_1d_row(bits: _Bits, width: int, row) -> None:
    """One MH-coded row into ``row`` (uint8 bit values). Rows start
    with a (possibly zero-length) white run and alternate colors."""
    pos = 0
    color = 0
    while pos < width:
        run = _read_run(bits, _BLACK if color else _WHITE)
        if pos + run > width:
            raise ValueError("CCITT: run overflows the row")
        if color:
            row[pos : pos + run] = 1
        pos += run
        color ^= 1


def _decode_2d_row(bits: _Bits, width: int, row, ref_trans: list[int]):
    """One 2-D (MMR) row; ``ref_trans`` is the reference row's
    changing-element list (positions where color changes, alternating
    white->black, black->white, ...). Returns this row's list."""
    a0 = -1
    color = 0

    def b1b2():
        # b1: first changing element on the reference line right of a0
        # whose new color is opposite to a0's color; transitions
        # alternate starting white->black, so parity selects color
        i = 0
        n = len(ref_trans)
        while i < n and ref_trans[i] <= a0:
            i += 1
        # ref_trans[i] changes to black if i is even; we need the
        # change TO the opposite of current color: to-black when
        # color==white (0) -> even index
        want_parity = 0 if color == 0 else 1
        if i < n and (i & 1) != want_parity:
            i += 1
        b1 = ref_trans[i] if i < n else width
        b2 = ref_trans[i + 1] if i + 1 < n else width
        return b1, b2

    while a0 < width:
        ln = 0
        val = 0
        mode = None
        while ln < _MODE_MAXLEN:
            val = (val << 1) | bits.bit()
            ln += 1
            mode = _MODES.get((ln, val))
            if mode is not None:
                break
        if mode is None:
            raise ValueError("CCITT: invalid 2-D mode code")
        b1, b2 = b1b2()
        start = max(a0, 0)
        if mode == "P":
            if color:
                row[start:b2] = 1
            a0 = b2
        elif mode == "H":
            r1 = _read_run(bits, _BLACK if color else _WHITE)
            r2 = _read_run(bits, _WHITE if color else _BLACK)
            a1 = start + r1
            a2 = a1 + r2
            if a2 > width:
                raise ValueError("CCITT: horizontal runs overflow the row")
            if color:
                row[start:a1] = 1
            else:
                row[a1:a2] = 1
            a0 = a2
        else:  # vertical
            delta = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                     "VL1": -1, "VL2": -2, "VL3": -3}[mode]
            a1 = b1 + delta
            if not start <= a1 <= width:
                raise ValueError("CCITT: vertical mode outside the row")
            if color:
                row[start:a1] = 1
            a0 = a1
            color ^= 1
        if a0 >= width:
            break
    # reference changing elements are PIXEL transitions of the decoded
    # row (zero-length coding runs don't persist into the reference)
    return _row_transitions(row, width)


def _row_transitions(row, width: int) -> list[int]:
    """Changing-element list of a decoded row (white->black first)."""
    trans = []
    prev = 0
    for x in range(width):
        if row[x] != prev:
            trans.append(x)
            prev = row[x]
    trans.extend((width, width))
    return trans


def ccitt_decode(
    data: bytes,
    width: int,
    height: int,
    compression: int,
    options: int = 0,
):
    """CCITT strip → (height, width) uint8 BIT array (0 white,
    1 black). ``compression``: 2 = Modified Huffman (rows
    byte-aligned, no EOL), 3 = Group 3 / T.4 (EOL per row; options
    bit0 = 2-D lines, bit2 = fill bits), 4 = Group 4 / T.6 (pure
    2-D). ``options`` carries tag 292 (T4Options) / 293 (T6Options)."""
    import numpy as np

    if compression == 4 and options & 0b10:
        raise ValueError("CCITT T.6: uncompressed mode not supported")
    if compression == 3 and options & 0b10:
        # r12 ADVICE fix: mirror the T.6 guard — T4Options bit 1 means
        # uncompressed segments may appear mid-stream; without the
        # guard such a file would die later with a misleading "invalid
        # run-length code" instead of naming the unsupported feature
        raise ValueError("CCITT G3: uncompressed mode not supported")
    out = np.zeros((height, width), dtype=np.uint8)
    bits = _Bits(data)
    ref = [width, width]  # imaginary all-white reference line
    for y in range(height):
        row = out[y]
        if compression == 2:
            bits.align()
            _decode_1d_row(bits, width, row)
        elif compression == 3:
            # rows are EOL-delimited; fill bits are zeros the EOL scan
            # tolerates. 2-D files carry a 1-bit tag after each EOL:
            # 1 = next row 1-D, 0 = next row 2-D.
            if not bits.peek_eol():
                raise ValueError("CCITT G3: missing EOL")
            if options & 0b1:
                if bits.bit():
                    _decode_1d_row(bits, width, row)
                    ref = _row_transitions(row, width)
                else:
                    ref = _decode_2d_row(bits, width, row, ref)
            else:
                _decode_1d_row(bits, width, row)
        else:  # T.6
            ref = _decode_2d_row(bits, width, row, ref)
    return out
