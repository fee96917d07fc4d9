"""Baseline TIFF 6.0 codec (pure numpy + stdlib) — strip-based grayscale
and bilevel images, both byte orders, Compression 1 (none), 32773
(PackBits) and 5 (LZW, with the horizontal-differencing Predictor 2).

The reference opens page images through PIL, which reads TIFF — the
standard container of institutional document scans — so the engine's
codec layer covers it natively alongside PNG/JPEG (kernels/imgio.py
dispatches on the II*/MM* magic).

CCITT G3/G4 fax compression (Compression 2/3/4 — the dominant encoding
of institutional bilevel scans) decodes through kernels/ccitt.py, a
from-scratch ITU-T T.4/T.6 implementation whose Huffman tables are proven
entry-by-entry against the container's system libtiff via ctypes
(tests/test_ccitt.py; see the ccitt module docstring for the exhaustive
sweep protocol).

encode_tiff (the fixture writer) emits single-strip gray-8 or bilevel
files with any supported compression, so every decode path round-trips
against hand-checkable vectors.
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids
_W, _H = 256, 257
_BPS, _COMP, _PHOTO = 258, 259, 262
_STRIP_OFFS, _SPP, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_T4_OPTIONS, _T6_OPTIONS = 292, 293
_PREDICTOR = 317


# --------------------------------------------------------------------------
# PackBits (TIFF 6.0 section 9)
# --------------------------------------------------------------------------


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:  # literal run of b+1 bytes
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # repeat next byte 257-b times
            if i >= n:
                break
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # 128 = no-op
    if len(out) < expected:
        raise ValueError("tiff: truncated PackBits strip")
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal stretch until a 3-run starts
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


# --------------------------------------------------------------------------
# TIFF-flavor LZW (TIFF 6.0 section 13: early-change, MSB-first codes)
# --------------------------------------------------------------------------

_CLEAR, _EOI_CODE = 256, 257


def lzw_decode(data: bytes, expected: int) -> bytes:
    padded = data + b"\x00\x00\x00"  # 24-bit window overrun pad
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    reset()
    width = 9
    pos = 0
    prev: bytes | None = None
    nbits = 8 * len(data)
    while pos + width <= nbits and len(out) < expected:
        # windowed read: 3 bytes always cover a <=12-bit code at any phase
        byte = pos >> 3
        v = int.from_bytes(padded[byte : byte + 3], "big")
        code = (v >> (24 - (pos & 7) - width)) & ((1 << width) - 1)
        pos += width
        if code == _CLEAR:
            reset()
            width = 9
            prev = None
            continue
        if code == _EOI_CODE:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("tiff: bad LZW start code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("tiff: bad LZW code")
        out += entry
        prev = entry
        # early change: widen one code EARLIER than plain LZW
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("tiff: truncated LZW strip")
    return bytes(out[:expected])


def lzw_encode(data: bytes) -> bytes:
    codes: list[int] = [_CLEAR]
    widths: list[int] = []
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    widths.append(width)

    def emit(c):
        codes.append(c)
        widths.append(width)

    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = nxt
        nxt += 1
        if nxt + 1 > (1 << width) and width < 12:
            width += 1
        if nxt >= 4094:  # table nearly full: clear (spec-recommended)
            emit(_CLEAR)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(_EOI_CODE)
    # pack MSB-first with per-code widths (width recorded at emit time)
    total = sum(widths)
    bits = np.zeros(total, dtype=np.uint8)
    at = 0
    for c, wd in zip(codes, widths):
        for k in range(wd - 1, -1, -1):
            bits[at] = (c >> k) & 1
            at += 1
    return np.packbits(bits).tobytes()


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------


def _read_tag_values(data: bytes, endian: str, count: int, typ: int, value_field: bytes):
    sizes = {1: 1, 2: 1, 3: 2, 4: 4}
    if typ not in sizes:
        return None
    total = sizes[typ] * count
    if total <= 4:
        raw = value_field[:total]
    else:
        (off,) = struct.unpack(endian + "I", value_field)
        raw = data[off : off + total]
    fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
    try:
        return list(struct.unpack(endian + fmt * count, raw))
    except struct.error:
        return None  # value offset beyond the file: ignore the tag


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> uint8 (H, W) grayscale (bilevel expands to 0/255),
    first IFD only."""
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("tiff: bad byte order")
    try:
        magic, ifd_off = struct.unpack(endian + "HI", data[2:8])
    except struct.error:
        raise ValueError("tiff: truncated header") from None
    if magic != 42:
        raise ValueError("tiff: bad magic")
    try:
        (n_tags,) = struct.unpack(endian + "H", data[ifd_off : ifd_off + 2])
    except struct.error:
        raise ValueError("tiff: truncated IFD") from None
    tags: dict[int, list] = {}
    for t in range(n_tags):
        at = ifd_off + 2 + 12 * t
        entry = data[at : at + 12]
        if len(entry) < 12:
            raise ValueError("tiff: truncated IFD entry")
        tag, typ, count = struct.unpack(endian + "HHI", entry[:8])
        vals = _read_tag_values(data, endian, count, typ, entry[8:12])
        if vals is not None:
            tags[tag] = vals
    try:
        w = tags[_W][0]
        h = tags[_H][0]
        offsets = tags[_STRIP_OFFS]
        counts = tags[_STRIP_COUNTS]
    except KeyError:
        raise ValueError("tiff: missing required tag") from None
    bps = tags.get(_BPS, [1])[0]
    comp = tags.get(_COMP, [1])[0]
    photo = tags.get(_PHOTO, [1])[0]
    spp = tags.get(_SPP, [1])[0]
    rps = tags.get(_ROWS_PER_STRIP, [h])[0] or h
    predictor = tags.get(_PREDICTOR, [1])[0]
    if spp != 1 or bps not in (1, 8):
        raise ValueError("tiff: only 1-sample 1/8-bit images supported")
    if comp not in (1, 2, 3, 4, 5, 32773):
        raise ValueError("tiff: unsupported compression")
    if comp in (2, 3, 4):
        if bps != 1:
            raise ValueError("tiff: CCITT strips must be bilevel")
        t4opts = tags.get(_T4_OPTIONS, [0])[0]
        t6opts = tags.get(_T6_OPTIONS, [0])[0]
        if (comp == 3 and t4opts & 2) or (comp == 4 and t6opts & 2):
            raise ValueError("tiff: CCITT uncompressed mode not supported")
    row_bytes = w if bps == 8 else (w + 7) // 8
    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rps, h - si * rps)
        if nrows <= 0:
            break
        expected = row_bytes * nrows
        raw = data[off : off + cnt]
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("tiff: truncated strip")
            strip = raw[:expected]
        elif comp == 32773:
            strip = packbits_decode(raw, expected)
        elif comp == 2:
            from . import ccitt

            strip = ccitt.decode_g3(raw, w, nrows, rle=True)
        elif comp == 3:
            from . import ccitt

            strip = ccitt.decode_g3(raw, w, nrows, two_d=bool(t4opts & 1))
        elif comp == 4:
            from . import ccitt

            strip = ccitt.decode_g4(raw, w, nrows)
        else:
            strip = lzw_decode(raw, expected)
        arr = np.frombuffer(strip, dtype=np.uint8).reshape(nrows, row_bytes)
        if predictor == 2 and bps == 8:
            arr = np.cumsum(arr.astype(np.uint64), axis=1).astype(np.uint8)
        rows.append(arr)
    img = np.concatenate(rows, axis=0)
    if img.shape[0] != h:
        raise ValueError("tiff: strip rows != ImageLength")
    if bps == 1:
        bits = np.unpackbits(img, axis=1)[:, :w]
        if photo == 0:  # WhiteIsZero: 0 = white, 1 = black
            return np.where(bits.astype(bool), 0, 255).astype(np.uint8)
        return (bits * 255).astype(np.uint8)
    if photo == 0:  # inverted grayscale
        return (255 - img).astype(np.uint8)
    return img.copy()


# --------------------------------------------------------------------------
# writer (fixtures)
# --------------------------------------------------------------------------


def encode_tiff(
    img: np.ndarray,
    compression: int = 1,
    bilevel: bool = False,
    big_endian: bool = False,
    predictor: int = 1,
    t4_2d: bool = False,
) -> bytes:
    """uint8 (H, W) -> single-strip TIFF (BlackIsZero). With bilevel=True
    the image is thresholded at 128 into 1-bit rows. CCITT compressions
    (2 = MH-RLE, 3 = G3 1D — or 2D with t4_2d — and 4 = G4) imply bilevel
    and write photometric 0 (WhiteIsZero, the fax sense: coded 1 = black =
    dark pixel < 128)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_tiff expects uint8 grayscale")
    endian = ">" if big_endian else "<"
    h, w = img.shape
    photo = 1
    t4opts = None
    if compression in (2, 3, 4):
        from . import ccitt

        bilevel = True
        photo = 0  # fax sense: 1-bit = black ink
        packed = np.packbits(img < 128, axis=1).tobytes()
        if compression == 2:
            payload = ccitt.encode_g3(packed, w, h, rle=True)
        elif compression == 3:
            t4opts = 1 if t4_2d else 0
            payload = ccitt.encode_g3(packed, w, h, two_d=t4_2d)
        else:
            payload = ccitt.encode_g4(packed, w, h)
        bps = 1
    elif bilevel:
        payload = np.packbits(img >= 128, axis=1).tobytes()
        bps = 1
    else:
        pix = img
        if predictor == 2:
            pix = np.concatenate(
                [img[:, :1], np.diff(img.astype(np.int16), axis=1).astype(np.uint8)],
                axis=1,
            )
        payload = pix.tobytes()
        bps = 8
    if compression == 32773:
        payload = packbits_encode(payload)
    elif compression == 5:
        payload = lzw_encode(payload)
    elif compression not in (1, 2, 3, 4):
        raise ValueError("encode_tiff: unsupported compression")
    tags = [
        (_W, 3, 1, w),
        (_H, 3, 1, h),
        (_BPS, 3, 1, bps),
        (_COMP, 3, 1, compression),
        (_PHOTO, 3, 1, photo),
        (_STRIP_OFFS, 4, 1, 0),  # patched below: right after the IFD
        (_SPP, 3, 1, 1),
        (_STRIP_COUNTS, 4, 1, len(payload)),
        (_PREDICTOR, 3, 1, predictor),
    ]
    if t4opts is not None:
        tags.append((_T4_OPTIONS, 4, 1, t4opts))
    tags.sort()  # TIFF 6.0 requires ascending tag order
    strip_off = 8 + 2 + 12 * len(tags) + 4
    tags = [
        (t, ty, c, strip_off if t == _STRIP_OFFS else v) for t, ty, c, v in tags
    ]
    out = bytearray()
    out += (b"II" if not big_endian else b"MM") + struct.pack(endian + "HI", 42, 8)
    out += struct.pack(endian + "H", len(tags))
    for tag, typ, count, val in tags:
        out += struct.pack(endian + "HHI", tag, typ, count)
        if typ == 3:
            out += struct.pack(endian + "HH", val, 0)
        else:
            out += struct.pack(endian + "I", val)
    out += struct.pack(endian + "I", 0)  # next-IFD pointer
    out += payload
    return bytes(out)
