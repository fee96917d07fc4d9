"""Minimal PNG encode/decode in numpy + stdlib zlib.

The container image has no PIL/imageio, so the engine carries its own codec
for the ``html BINARY`` page-image payloads (the reference opens images via
PIL, /root/reference/kraken/lib/util.py:23-32; we only need 8-bit grayscale
and RGB, which covers the synthetic Common-Crawl-style corpus).

Supported: bit depth 8, color types 0 (grayscale) and 2 (RGB), all five
standard scanline filters on decode, filters 0+2 (Up) on encode. Not
supported (by design): interlacing, palettes, 16-bit.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode a HxW (grayscale) or HxWx3 (RGB) uint8 array as PNG bytes."""
    if img.dtype != np.uint8:
        raise ValueError(f"expected uint8 image, got {img.dtype}")
    if img.ndim == 2:
        color_type, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = img.reshape(h, w * channels)
    # filter 2 (Up) on every scanline but the first: vertical deltas make
    # smooth page backgrounds highly compressible, and decode stays a cheap
    # vectorized per-row add (the ftype==2 branch of _unfilter)
    scanlines = np.empty((h, 1 + w * channels), dtype=np.uint8)
    scanlines[0, 0] = 0
    scanlines[0, 1:] = raw[0]
    if h > 1:
        scanlines[1:, 0] = 2
        scanlines[1:, 1:] = raw[1:] - raw[:-1]  # uint8 wraparound == mod 256
    idat = zlib.compress(scanlines.tobytes(), 6)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(data: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filters. data is (h, 1+stride) uint8."""
    ftypes = data[:, 0]
    if h > 0 and ftypes[0] == 0 and (ftypes[1:] == 2).all():
        # our encoder's layout (None, Up, Up, ...): mod-256 column cumsum
        return np.cumsum(data[:, 1:], axis=0, dtype=np.uint8)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(data[y, 0])
        row = data[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            out[y] = row.astype(np.uint8)
        elif ftype == 2:  # Up
            out[y] = ((row + prev) & 0xFF).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-neighbor scan
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    val = row[x] + a
                elif ftype == 3:
                    val = row[x] + ((a + b) >> 1)
                else:  # Paeth
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    val = row[x] + pred
                cur[x] = val & 0xFF
            out[y] = cur.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out


def read_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR without decompressing the image —
    lets callers enforce admission caps before paying decode cost."""
    if data[:8] != _SIGNATURE or data[12:16] != b"IHDR" or len(data) < 24:
        raise ValueError("not a PNG (bad signature)")
    w, h = struct.unpack(">II", data[16:24])
    return int(w), int(h)


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to a HxW (gray) or HxWx3 (RGB) uint8 array.

    Covers the full non-interlaced web-PNG surface: gray/RGB at 8 and 16
    bit (16 truncates to the high byte), sub-byte grayscale (1/2/4 bit),
    palette images (PLTE, 1/2/4/8-bit indices) with tRNS transparency,
    and the alpha types 4/6 — alpha composites onto a white background
    (the document-scan convention: paper is white). Adam7 interlacing
    stays unsupported (ValueError -> guard row)."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    w = h = None
    color_type = bit_depth = None
    plte = trns = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            if len(payload) < 13:
                raise ValueError("png: truncated IHDR")
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload[:13]
            )
            if (
                color_type not in _CHANNELS
                or interlace != 0
                or bit_depth not in (1, 2, 4, 8, 16)
                or (bit_depth < 8 and color_type not in (0, 3))
                or (bit_depth == 16 and color_type == 3)
            ):
                raise ValueError(
                    f"unsupported PNG: depth={bit_depth} color={color_type} "
                    f"interlace={interlace}"
                )
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, dtype=np.uint8)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("no IHDR chunk")
    channels = _CHANNELS[color_type]
    stride = (w * channels * bit_depth + 7) // 8
    bpp = max(1, channels * bit_depth // 8)
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as e:
        raise ValueError(f"png: bad IDAT stream: {e}") from None
    if raw.size < h * (1 + stride):
        raise ValueError("png: truncated image data")
    rows = raw[: h * (1 + stride)].reshape(h, 1 + stride)
    out = _unfilter(rows, h, stride, bpp).reshape(h, stride)
    if bit_depth < 8:
        samples = np.unpackbits(out, axis=1)
        if bit_depth > 1:
            samples = samples.reshape(h, -1, bit_depth)
            weights = 1 << np.arange(bit_depth - 1, -1, -1)
            samples = (samples * weights).sum(axis=2)
        samples = samples[:, :w].astype(np.uint8)
        if color_type == 0:  # scale to full range (255 / (2^d - 1))
            return (samples.astype(np.uint16) * 255 // ((1 << bit_depth) - 1)).astype(
                np.uint8
            )
        idx = samples
    elif bit_depth == 16:
        px = out.reshape(h, w, channels, 2)[..., 0]  # high byte
        idx = None
    else:
        px = out.reshape(h, w, channels)
        idx = px[..., 0] if color_type == 3 else None
    if color_type == 3:
        if plte is None:
            raise ValueError("png: palette image without PLTE")
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("png: palette index out of range")
        rgb = plte[idx].astype(np.uint16)
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint16)
            alpha[: len(trns)] = trns
            a = alpha[idx]
            rgb = (rgb * a[..., None] + 255 * (255 - a[..., None])) // 255
        return rgb.astype(np.uint8)
    if color_type == 0:
        return px[..., 0].copy()
    if color_type == 2:
        return np.ascontiguousarray(px)
    # alpha types: composite onto white
    a = px[..., -1].astype(np.uint16)
    rgb = px[..., :-1].astype(np.uint16)
    comp = (rgb * a[..., None] + 255 * (255 - a[..., None])) // 255
    comp = comp.astype(np.uint8)
    return comp[..., 0].copy() if color_type == 4 else comp


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """RGB->luma (ITU-R 601), passthrough for already-gray images."""
    if img.ndim == 2:
        return img
    return (
        img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# APNG (animated PNG) — the engine's video-shaped clip container
# ---------------------------------------------------------------------------

def _compress_frame(img: np.ndarray) -> bytes:
    """Scanline-filter + deflate one frame (same None/Up layout as
    encode_png)."""
    h, w = img.shape[:2]
    channels = 1 if img.ndim == 2 else img.shape[2]
    raw = img.reshape(h, w * channels)
    scanlines = np.empty((h, 1 + w * channels), dtype=np.uint8)
    scanlines[0, 0] = 0
    scanlines[0, 1:] = raw[0]
    if h > 1:
        scanlines[1:, 0] = 2
        scanlines[1:, 1:] = raw[1:] - raw[:-1]
    return zlib.compress(scanlines.tobytes(), 6)


def encode_apng(frames: list[np.ndarray], delay_ms: int = 100) -> bytes:
    """Encode frames as an animated PNG (APNG spec: acTL/fcTL/fdAT chunks).

    All frames must share dtype uint8 and color type (all gray or all RGB).
    The canvas is the max frame extent; per spec the first frame fills the
    canvas (smaller first frames are zero-padded), later frames are placed
    as (0,0) sub-rectangles with dispose_op=1 (clear to background) so each
    composited frame shows exactly its own content.
    """
    if not frames:
        raise ValueError("empty clip")
    if any(f.dtype != np.uint8 or f.ndim != frames[0].ndim for f in frames):
        raise ValueError("frames must be uint8 with a common color type")
    channels = 1 if frames[0].ndim == 2 else frames[0].shape[2]
    color_type = 0 if channels == 1 else 2
    ch = max(f.shape[0] for f in frames)
    cw = max(f.shape[1] for f in frames)
    first = frames[0]
    if first.shape[:2] != (ch, cw):
        pad = np.zeros((ch, cw) + first.shape[2:], dtype=np.uint8)
        pad[: first.shape[0], : first.shape[1]] = first
        first = pad

    def fctl(seq, w, h):
        return struct.pack(">IIIIIHHBB", seq, w, h, 0, 0, delay_ms, 1000, 1, 0)

    seq = 0
    parts = [_SIGNATURE,
             _chunk(b"IHDR", struct.pack(">IIBBBBB", cw, ch, 8, color_type, 0, 0, 0)),
             _chunk(b"acTL", struct.pack(">II", len(frames), 0)),
             _chunk(b"fcTL", fctl(seq, cw, ch))]
    seq += 1
    parts.append(_chunk(b"IDAT", _compress_frame(first)))
    for f in frames[1:]:
        parts.append(_chunk(b"fcTL", fctl(seq, f.shape[1], f.shape[0])))
        seq += 1
        parts.append(_chunk(b"fdAT", struct.pack(">I", seq) + _compress_frame(f)))
        seq += 1
    parts.append(_chunk(b"IEND", b""))
    return b"".join(parts)


def is_apng(data: bytes) -> bool:
    """True when the blob is a PNG carrying an acTL animation control."""
    return data[:8] == _SIGNATURE and b"acTL" in data[:256]


def decode_apng(data: bytes) -> tuple[list[np.ndarray], list[float]]:
    """Decode an animated PNG into composited full-canvas frames.

    Implements the APNG compose model for the codec's color types (0/2, no
    alpha): fcTL sub-rectangle placement, dispose_op 0 (none) / 1 (clear
    region to background) / 2 (revert to previous), blend_op source (over
    degenerates to source without an alpha channel). Returns (frames,
    per-frame delays in seconds).
    """
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    cw = ch = color_type = None
    controls = []          # (fctl fields, payload bytearray)
    pending = None
    seen_idat_without_fctl = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos: pos + 4])
        tag = data[pos + 4: pos + 8]
        payload = data[pos + 8: pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            cw, ch, depth, color_type, _c, _f, inter = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color_type not in (0, 2) or inter != 0:
                raise ValueError("unsupported APNG pixel format")
        elif tag == b"fcTL":
            f = struct.unpack(">IIIIIHHBB", payload)
            pending = (f, bytearray())
            controls.append(pending)
        elif tag == b"IDAT":
            if pending is None:
                seen_idat_without_fctl = True  # static default image
            else:
                pending[1].extend(payload)
        elif tag == b"fdAT":
            if pending is None:
                raise ValueError("fdAT before any fcTL")
            pending[1].extend(payload[4:])  # strip sequence number
        elif tag == b"IEND":
            break
    if cw is None or not controls:
        raise ValueError("not an animated PNG")
    channels = 1 if color_type == 0 else 3
    canvas = np.zeros((ch, cw, channels), dtype=np.uint8)
    frames, delays = [], []
    for (seqno, w, h, x, y, dnum, dden, dispose, _blend), blob in controls:
        if x + w > cw or y + h > ch:
            raise ValueError("frame region outside canvas")
        raw = np.frombuffer(zlib.decompress(bytes(blob)), dtype=np.uint8)
        rows = raw.reshape(h, 1 + w * channels)
        region = _unfilter(rows, h, w * channels, channels).reshape(h, w, channels)
        saved = canvas[y: y + h, x: x + w].copy() if dispose == 2 else None
        canvas[y: y + h, x: x + w] = region  # blend: source (no alpha)
        frame = canvas.copy()
        frames.append(frame[:, :, 0] if channels == 1 else frame)
        delays.append((dnum / (dden or 100.0)))
        if dispose == 1:
            canvas[y: y + h, x: x + w] = 0
        elif dispose == 2:
            canvas[y: y + h, x: x + w] = saved
    return frames, delays
