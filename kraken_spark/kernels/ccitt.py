"""CCITT Group 3 / Group 4 fax codecs (ITU-T T.4 / T.6) — pure stdlib.

TIFF Compression values 2 (Modified Huffman RLE), 3 (T.4 / Group 3, 1D and
2D per the T4Options tag) and 4 (T.6 / Group 4, pure 2D) for bilevel strips.
This is the compression layer of essentially every institutional document
scan that is not LZW/PackBits; the reference ingests such files through
PIL/libtiff (kraken/lib/util.py is_bitonal + PIL open paths), so the
engine's native TIFF reader (kernels/tiff.py) covers it from scratch here.

Earlier rounds excluded CCITT because the T.4/T.6 Huffman tables could not
be independently validated in this container.  That blocker is gone: the
container ships the SYSTEM libtiff (/usr/lib/x86_64-linux-gnu/libtiff.so.6),
a second, independent implementation reachable via ctypes — and
tests/test_ccitt.py uses it as ground truth, exhaustively: every single
terminating/makeup/extended code-table entry is exercised by sweeping every
run length 0..2623 for both colours through libtiff-encode→our-decode and
our-encode→libtiff-decode, plus randomized page fuzz across all four modes
(MH-RLE / G3-1D / G3-2D / G4).

Bit conventions (T.4 §4.1, TIFF 6.0 §11): codes are packed MSB-first; a
"1" bit in the decoded row means a BLACK pixel (min-is-white photometric
sense — the caller maps photometric). Every line codes alternating runs
starting with an (possibly empty) white run.

Layout of a coded line:
  - Compression 2: each line is a bare MH run sequence, byte-aligned.
  - Compression 3 1D: EOL (000000000001, optionally fill-zero padded)
    before every line, then MH runs.
  - Compression 3 2D (T4Options bit 0): EOL + 1 tag bit (1 = next line 1D,
    0 = 2D), then MH or 2D-coded line.
  - Compression 4 (T.6): pure 2D lines, no EOLs; an imaginary all-white
    reference line precedes the first row; EOFB terminates.

2D (READ) coding modes (T.4 table 4 / T.6 §2.2.4): V0=1, VR1=011,
VL1=010, VR2=000011, VL2=000010, VR3=0000011, VL3=0000010, Pass=0001,
Horizontal=001 followed by two MH runs.
"""

from __future__ import annotations

# --------------------------------------------------------------------------
# T.4 Huffman tables (terminating + makeup), transcribed from the standard
# and then PROVEN entry-by-entry against the system libtiff (see module
# docstring / tests/test_ccitt.py::test_every_run_length_*).
# --------------------------------------------------------------------------

# run -> (code_value, code_bitlength)
WHITE_TERM = {
    0: (0b00110101, 8), 1: (0b000111, 6), 2: (0b0111, 4), 3: (0b1000, 4),
    4: (0b1011, 4), 5: (0b1100, 4), 6: (0b1110, 4), 7: (0b1111, 4),
    8: (0b10011, 5), 9: (0b10100, 5), 10: (0b00111, 5), 11: (0b01000, 5),
    12: (0b001000, 6), 13: (0b000011, 6), 14: (0b110100, 6), 15: (0b110101, 6),
    16: (0b101010, 6), 17: (0b101011, 6), 18: (0b0100111, 7), 19: (0b0001100, 7),
    20: (0b0001000, 7), 21: (0b0010111, 7), 22: (0b0000011, 7), 23: (0b0000100, 7),
    24: (0b0101000, 7), 25: (0b0101011, 7), 26: (0b0010011, 7), 27: (0b0100100, 7),
    28: (0b0011000, 7), 29: (0b00000010, 8), 30: (0b00000011, 8), 31: (0b00011010, 8),
    32: (0b00011011, 8), 33: (0b00010010, 8), 34: (0b00010011, 8), 35: (0b00010100, 8),
    36: (0b00010101, 8), 37: (0b00010110, 8), 38: (0b00010111, 8), 39: (0b00101000, 8),
    40: (0b00101001, 8), 41: (0b00101010, 8), 42: (0b00101011, 8), 43: (0b00101100, 8),
    44: (0b00101101, 8), 45: (0b00000100, 8), 46: (0b00000101, 8), 47: (0b00001010, 8),
    48: (0b00001011, 8), 49: (0b01010010, 8), 50: (0b01010011, 8), 51: (0b01010100, 8),
    52: (0b01010101, 8), 53: (0b00100100, 8), 54: (0b00100101, 8), 55: (0b01011000, 8),
    56: (0b01011001, 8), 57: (0b01011010, 8), 58: (0b01011011, 8), 59: (0b01001010, 8),
    60: (0b01001011, 8), 61: (0b00110010, 8), 62: (0b00110011, 8), 63: (0b00110100, 8),
}

WHITE_MAKEUP = {
    64: (0b11011, 5), 128: (0b10010, 5), 192: (0b010111, 6), 256: (0b0110111, 7),
    320: (0b00110110, 8), 384: (0b00110111, 8), 448: (0b01100100, 8),
    512: (0b01100101, 8), 576: (0b01101000, 8), 640: (0b01100111, 8),
    704: (0b011001100, 9), 768: (0b011001101, 9), 832: (0b011010010, 9),
    896: (0b011010011, 9), 960: (0b011010100, 9), 1024: (0b011010101, 9),
    1088: (0b011010110, 9), 1152: (0b011010111, 9), 1216: (0b011011000, 9),
    1280: (0b011011001, 9), 1344: (0b011011010, 9), 1408: (0b011011011, 9),
    1472: (0b010011000, 9), 1536: (0b010011001, 9), 1600: (0b010011010, 9),
    1664: (0b011000, 6), 1728: (0b010011011, 9),
}

BLACK_TERM = {
    0: (0b0000110111, 10), 1: (0b010, 3), 2: (0b11, 2), 3: (0b10, 2),
    4: (0b011, 3), 5: (0b0011, 4), 6: (0b0010, 4), 7: (0b00011, 5),
    8: (0b000101, 6), 9: (0b000100, 6), 10: (0b0000100, 7), 11: (0b0000101, 7),
    12: (0b0000111, 7), 13: (0b00000100, 8), 14: (0b00000111, 8),
    15: (0b000011000, 9), 16: (0b0000010111, 10), 17: (0b0000011000, 10),
    18: (0b0000001000, 10), 19: (0b00001100111, 11), 20: (0b00001101000, 11),
    21: (0b00001101100, 11), 22: (0b00000110111, 11), 23: (0b00000101000, 11),
    24: (0b00000010111, 11), 25: (0b00000011000, 11), 26: (0b000011001010, 12),
    27: (0b000011001011, 12), 28: (0b000011001100, 12), 29: (0b000011001101, 12),
    30: (0b000001101000, 12), 31: (0b000001101001, 12), 32: (0b000001101010, 12),
    33: (0b000001101011, 12), 34: (0b000011010010, 12), 35: (0b000011010011, 12),
    36: (0b000011010100, 12), 37: (0b000011010101, 12), 38: (0b000011010110, 12),
    39: (0b000011010111, 12), 40: (0b000001101100, 12), 41: (0b000001101101, 12),
    42: (0b000011011010, 12), 43: (0b000011011011, 12), 44: (0b000001010100, 12),
    45: (0b000001010101, 12), 46: (0b000001010110, 12), 47: (0b000001010111, 12),
    48: (0b000001100100, 12), 49: (0b000001100101, 12), 50: (0b000001010010, 12),
    51: (0b000001010011, 12), 52: (0b000000100100, 12), 53: (0b000000110111, 12),
    54: (0b000000111000, 12), 55: (0b000000100111, 12), 56: (0b000000101000, 12),
    57: (0b000001011000, 12), 58: (0b000001011001, 12), 59: (0b000000101011, 12),
    60: (0b000000101100, 12), 61: (0b000001011010, 12), 62: (0b000001100110, 12),
    63: (0b000001100111, 12),
}

BLACK_MAKEUP = {
    64: (0b0000001111, 10), 128: (0b000011001000, 12), 192: (0b000011001001, 12),
    256: (0b000001011011, 12), 320: (0b000000110011, 12), 384: (0b000000110100, 12),
    448: (0b000000110101, 12), 512: (0b0000001101100, 13), 576: (0b0000001101101, 13),
    640: (0b0000001001010, 13), 704: (0b0000001001011, 13), 768: (0b0000001001100, 13),
    832: (0b0000001001101, 13), 896: (0b0000001110010, 13), 960: (0b0000001110011, 13),
    1024: (0b0000001110100, 13), 1088: (0b0000001110101, 13),
    1152: (0b0000001110110, 13), 1216: (0b0000001110111, 13),
    1280: (0b0000001010010, 13), 1344: (0b0000001010011, 13),
    1408: (0b0000001010100, 13), 1472: (0b0000001010101, 13),
    1536: (0b0000001011010, 13), 1600: (0b0000001011011, 13),
    1664: (0b0000001100100, 13), 1728: (0b0000001100101, 13),
}

# T.4 §4.2.1.3 extended makeups (shared by both colours)
EXT_MAKEUP = {
    1792: (0b00000001000, 11), 1856: (0b00000001100, 11), 1920: (0b00000001101, 11),
    1984: (0b000000010010, 12), 2048: (0b000000010011, 12), 2112: (0b000000010100, 12),
    2176: (0b000000010101, 12), 2240: (0b000000010110, 12), 2304: (0b000000010111, 12),
    2368: (0b000000011100, 12), 2432: (0b000000011101, 12), 2496: (0b000000011110, 12),
    2560: (0b000000011111, 12),
}

_EOL_RUN = -2  # LUT sentinel for the EOL code (000000000001)
_LUT_BITS = 13


def _build_lut(*tables: dict) -> list:
    """13-bit peek LUT: index -> (run, code_len) or None. Every legal code
    of <=13 bits fills all LUT slots sharing its prefix."""
    lut: list = [None] * (1 << _LUT_BITS)
    entries = [(run, code, ln) for t in tables for run, (code, ln) in t.items()]
    entries.append((_EOL_RUN, 0b000000000001, 12))
    for run, code, ln in entries:
        base = code << (_LUT_BITS - ln)
        for i in range(1 << (_LUT_BITS - ln)):
            if lut[base + i] is not None:
                raise AssertionError(f"T.4 table prefix clash at run {run}")
            lut[base + i] = (run, ln)
    return lut


_WHITE_LUT = _build_lut(WHITE_TERM, WHITE_MAKEUP, EXT_MAKEUP)
_BLACK_LUT = _build_lut(BLACK_TERM, BLACK_MAKEUP, EXT_MAKEUP)


class _BitReader:
    """MSB-first bit reader with bounded peek past end (zero-padded)."""

    __slots__ = ("data", "pos", "nbits", "_pad")

    def __init__(self, data: bytes):
        self.data = data + b"\x00\x00\x00\x00"
        self.pos = 0
        self.nbits = 8 * len(data)

    def peek(self, n: int) -> int:
        byte = self.pos >> 3
        v = int.from_bytes(self.data[byte : byte + 4], "big")
        return (v >> (32 - (self.pos & 7) - n)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.pos += n

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.pos += n
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self) -> bool:
        return self.pos >= self.nbits


def _decode_run(br: _BitReader, white: bool) -> int:
    """One complete run length (makeup chain + terminating code).
    Returns the run length, or _EOL_RUN if an EOL code was consumed."""
    lut = _WHITE_LUT if white else _BLACK_LUT
    total = 0
    while True:
        hit = lut[br.peek(_LUT_BITS)]
        if hit is None:
            raise ValueError("ccitt: bad code")
        run, ln = hit
        br.skip(ln)
        if run == _EOL_RUN:
            return _EOL_RUN
        total += run
        if run < 64:  # terminating code ends the run
            return total
        # makeup codes (>=64) accumulate; the standard allows chains for
        # runs beyond 2560 (T.4 §4.2.1.3 note)


def _sync_eol(br: _BitReader) -> bool:
    """Consume fill zeros + one EOL. Returns False at end of data."""
    while True:
        if br.exhausted():
            return False
        if br.peek(12) == 1:
            br.skip(12)
            return True
        if br.peek(1) == 0:
            br.skip(1)  # fill bit
        else:
            raise ValueError("ccitt: expected EOL")


def _decode_1d_line(br: _BitReader, width: int) -> list:
    """MH-coded line -> transition positions (posns where colour changes,
    line starts white)."""
    trans = []
    pos = 0
    white = True
    while pos < width:
        run = _decode_run(br, white)
        if run == _EOL_RUN:
            raise ValueError("ccitt: unexpected EOL mid-line")
        pos += run
        if pos > width:
            raise ValueError("ccitt: run past line end")
        trans.append(pos)
        white = not white
    if trans and trans[-1] == width:
        trans.pop()  # trailing transition at EOL carries no pixels
    return trans


def _find_b1(ref: list, a0: int, white: bool) -> int:
    """Index into ref of b1: first changing element > a0 whose new colour
    is opposite to the current colour (ref transitions alternate, even
    index = white->black)."""
    # binary search would be O(log n); lines have few transitions, linear
    # from a cached index is what libtiff does — keep it simple here.
    want_parity = 0 if white else 1
    lo, hi = 0, len(ref)
    while lo < hi:  # first index with ref[idx] > a0
        mid = (lo + hi) // 2
        if ref[mid] > a0:
            hi = mid
        else:
            lo = mid + 1
    idx = lo
    if (idx & 1) != want_parity:
        idx += 1
    return idx


def _decode_2d_line(br: _BitReader, width: int, ref: list) -> list:
    """One T.6/T.4-2D coded line against reference transitions `ref`."""
    trans: list = []
    a0 = -1
    white = True
    while a0 < width:
        i1 = _find_b1(ref, a0, white)
        b1 = ref[i1] if i1 < len(ref) else width
        b2 = ref[i1 + 1] if i1 + 1 < len(ref) else width
        if br.peek(1) == 1:  # V0
            br.skip(1)
            d = 0
        else:
            c3 = br.peek(3)
            if c3 == 0b001:  # horizontal
                br.skip(3)
                start = max(a0, 0)
                r1 = _decode_run(br, white)
                r2 = _decode_run(br, not white)
                if r1 == _EOL_RUN or r2 == _EOL_RUN:
                    raise ValueError("ccitt: EOL inside horizontal mode")
                p1, p2 = start + r1, start + r1 + r2
                if p2 > width or p1 > width:
                    raise ValueError("ccitt: 2D horizontal run past line end")
                trans.append(p1)
                trans.append(p2)
                a0 = p2
                continue
            if c3 == 0b011:  # VR1
                br.skip(3)
                d = 1
            elif c3 == 0b010:  # VL1
                br.skip(3)
                d = -1
            else:
                c4 = br.peek(4)
                if c4 == 0b0001:  # pass
                    br.skip(4)
                    a0 = b2
                    continue
                c6 = br.peek(6)
                if c6 == 0b000011:
                    br.skip(6)
                    d = 2
                elif c6 == 0b000010:
                    br.skip(6)
                    d = -2
                else:
                    c7 = br.peek(7)
                    if c7 == 0b0000011:
                        br.skip(7)
                        d = 3
                    elif c7 == 0b0000010:
                        br.skip(7)
                        d = -3
                    elif br.peek(12) == 1:
                        raise ValueError("ccitt: unexpected EOL in 2D line")
                    else:
                        raise ValueError("ccitt: bad 2D mode code")
        a1 = b1 + d
        if a1 < 0 or a1 > width:
            raise ValueError("ccitt: vertical mode out of line")
        trans.append(a1)
        a0 = a1
        white = not white
    # normalize: drop non-advancing trailing structure, keep strictly
    # increasing transitions within [1, width)
    out = []
    for p in trans:
        if p >= width:
            break
        if out and p <= out[-1]:
            raise ValueError("ccitt: non-monotone transitions")
        if p > 0:
            out.append(p)
        elif not out and p == 0:
            out.append(0)
    return out


def _render_np(lines: list, width: int) -> bytes:
    """Transition lists -> packed rows (1 = black), MSB-first."""
    import numpy as np

    h = len(lines)
    img = np.zeros((h, width), dtype=bool)
    for r, trans in enumerate(lines):
        pts = list(trans) + [width]
        row = img[r]
        for k in range(0, len(pts) - 1, 2):
            row[pts[k] : pts[k + 1]] = True
    return np.packbits(img, axis=1).tobytes()


def decode_g4(data: bytes, width: int, height: int) -> bytes:
    """T.6 (TIFF Compression 4) strip -> packed rows, 1 = black."""
    br = _BitReader(data)
    ref: list = []  # imaginary all-white line above the first row
    lines = []
    for _ in range(height):
        if br.exhausted():
            raise ValueError("ccitt: truncated G4 strip")
        trans = _decode_2d_line(br, width, ref)
        lines.append(trans)
        ref = trans
    return _render_np(lines, width)


def decode_g3(
    data: bytes,
    width: int,
    height: int,
    two_d: bool = False,
    rle: bool = False,
) -> bytes:
    """T.4 strip -> packed rows. rle=True is TIFF Compression 2 (no EOLs,
    byte-aligned lines); otherwise Compression 3, with the 2D tag bit when
    two_d (T4Options bit 0)."""
    br = _BitReader(data)
    lines = []
    ref: list = []
    for row in range(height):
        if rle:
            if row:
                br.align()
            trans = _decode_1d_line(br, width)
        else:
            if not _sync_eol(br):
                raise ValueError("ccitt: truncated G3 strip")
            if two_d:
                tag = br.read(1)
                trans = (
                    _decode_1d_line(br, width)
                    if tag
                    else _decode_2d_line(br, width, ref)
                )
            else:
                trans = _decode_1d_line(br, width)
        lines.append(trans)
        ref = trans
    return _render_np(lines, width)


# --------------------------------------------------------------------------
# encoders
# --------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, ln: int) -> None:
        self.acc = (self.acc << ln) | code
        self.nacc += ln
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _emit_run(bw: _BitWriter, run: int, white: bool) -> None:
    term = WHITE_TERM if white else BLACK_TERM
    makeup = WHITE_MAKEUP if white else BLACK_MAKEUP
    while run >= 2624:  # chain extended makeups for arbitrary widths
        bw.write(*EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        mk = run & ~63
        if mk > 1728:
            code = EXT_MAKEUP[mk]
        else:
            code = makeup[mk]
        bw.write(*code)
        run -= mk
    bw.write(*term[run])


def _transitions(row) -> list:
    """Bool row (True = black) -> transition positions."""
    import numpy as np

    d = np.flatnonzero(np.diff(row.astype(np.int8)))
    trans = (d + 1).tolist()
    if row[0]:
        trans.insert(0, 0)
    return trans


def _encode_1d_line(bw: _BitWriter, trans: list, width: int) -> None:
    pts = [0] + list(trans) + [width]
    white = True
    for k in range(len(pts) - 1):
        _emit_run(bw, pts[k + 1] - pts[k], white)
        white = not white
    # odd transition count means the line ends black and the loop above
    # already emitted it; an even count emitted the final white run too.


_V_CODES = {0: (0b1, 1), 1: (0b011, 3), -1: (0b010, 3), 2: (0b000011, 6),
            -2: (0b000010, 6), 3: (0b0000011, 7), -3: (0b0000010, 7)}


def _encode_2d_line(bw: _BitWriter, trans: list, ref: list, width: int) -> None:
    a0 = -1
    white = True
    cur = list(trans)
    while a0 < width:
        # a1: next transition in cur strictly right of a0
        a1 = width
        for p in cur:
            if p > a0:
                a1 = p
                break
        i1 = _find_b1(ref, a0, white)
        b1 = ref[i1] if i1 < len(ref) else width
        b2 = ref[i1 + 1] if i1 + 1 < len(ref) else width
        if b2 < a1:
            bw.write(0b0001, 4)  # pass
            a0 = b2
            continue
        d = a1 - b1
        if -3 <= d <= 3:
            bw.write(*_V_CODES[d])
            a0 = a1
            white = not white
            if a0 >= width:
                break
            continue
        # horizontal: two runs from max(a0, 0)
        a2 = width
        for p in cur:
            if p > a1:
                a2 = p
                break
        start = max(a0, 0)
        bw.write(0b001, 3)
        _emit_run(bw, a1 - start, white)
        _emit_run(bw, a2 - a1, not white)
        a0 = a2
    # colour parity is tracked by the decoder identically; nothing to flush


def encode_g4(packed: bytes, width: int, height: int) -> bytes:
    """Packed rows (1 = black) -> T.6 strip with EOFB."""
    import numpy as np

    rows = np.unpackbits(
        np.frombuffer(packed, dtype=np.uint8).reshape(height, (width + 7) // 8),
        axis=1,
    )[:, :width].astype(bool)
    bw = _BitWriter()
    ref: list = []
    for r in range(height):
        trans = _transitions(rows[r])
        _encode_2d_line(bw, trans, ref, width)
        ref = trans
    bw.write(1, 12)  # EOFB = EOL + EOL
    bw.write(1, 12)
    return bw.bytes()


def encode_g3(
    packed: bytes,
    width: int,
    height: int,
    two_d: bool = False,
    rle: bool = False,
    k: int = 2,
) -> bytes:
    """Packed rows -> T.4 strip. rle: Compression 2 (byte-aligned MH
    lines, no EOL). two_d: K=`k` mixed coding (a 1D line every k rows)."""
    import numpy as np

    rows = np.unpackbits(
        np.frombuffer(packed, dtype=np.uint8).reshape(height, (width + 7) // 8),
        axis=1,
    )[:, :width].astype(bool)
    bw = _BitWriter()
    ref: list = []
    for r in range(height):
        trans = _transitions(rows[r])
        if rle:
            if r:
                bw.align()
            _encode_1d_line(bw, trans, width)
        elif two_d:
            bw.write(1, 12)
            if r % max(1, k) == 0:
                bw.write(1, 1)
                _encode_1d_line(bw, trans, width)
            else:
                bw.write(0, 1)
                _encode_2d_line(bw, trans, ref, width)
        else:
            bw.write(1, 12)
            _encode_1d_line(bw, trans, width)
        ref = trans
    if not rle:
        for _ in range(6):  # RTC: six EOLs
            bw.write(1, 12)
    return bw.bytes()
