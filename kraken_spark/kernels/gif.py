"""GIF 87a/89a codec, pure numpy + stdlib.

The reference opens page images through PIL, which accepts GIF
(kraken/kraken.py input handling feeds PIL Image.open); GIF is also a
persistent share of wild-web image payloads in Common-Crawl-style
corpora, so the engine's format-dispatched codec layer (kernels/imgio.py)
must cover it. From-scratch implementation:

decode_gif / gif_frames:
- logical screen descriptor + global/local color tables;
- the GIF flavor of LZW (LSB-first variable-width 3..12-bit codes, clear/
  EOI, deferred-clear tolerance, sub-block packaging);
- interlace (the 8/8/4/2 four-pass row order);
- GIF89a graphic control extensions: transparency and frame composition
  with disposal methods 0/1 (leave), 2 (restore background) and
  3 (restore previous) — `gif_frames` returns fully composed frames,
  `decode_gif` the first (transparent pixels compose onto white, the
  same convention as the PNG codec's alpha flattening);
- grayscale output when every used palette entry is achromatic, RGB
  otherwise (the imgio contract).

encode_gif (the test/fixture writer): global palette built from the
frames (<=256 distinct colors), optional interlace, per-frame placement
rectangles, disposal, delay and a transparent color — enough surface to
round-trip every decoder branch deterministically.

Both ends are total functions over bytes: malformed input raises
ValueError (callers map that to guard rows).
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_EXTENSION = 0x21
_IMAGE = 0x2C
_GCE = 0xF9


# --------------------------------------------------------------------------
# GIF-flavor LZW
# --------------------------------------------------------------------------


def lzw_decode_gif(data: bytes, mcs: int, expected: int) -> bytearray:
    """LSB-first variable-width LZW (the GIF variant: no early-change,
    widths 3..12, clear resets). Stops at EOI or `expected` bytes."""
    if not 2 <= mcs <= 11:
        raise ValueError("gif: bad LZW minimum code size")
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    roots = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(roots)
    width = mcs + 1
    out = bytearray()
    acc = nacc = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nacc
        nacc += 8
        while nacc >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nacc -= width
            if code == clear:
                table = list(roots)
                width = mcs + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("gif: bad LZW root code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError("gif: bad LZW code")
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            out += entry
            prev = entry
            if len(out) >= expected:
                return out
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def lzw_encode_gif(indices: bytes, mcs: int) -> bytes:
    """Inverse of lzw_decode_gif; resets the dictionary on overflow."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = nacc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    width = mcs + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    w = b""
    for i in range(len(indices)):
        ch = indices[i : i + 1]
        wc = w + ch
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        elif next_code == 4097:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        w = ch
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def read_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the logical screen descriptor only."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 10:
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", data[6:10])
    return int(w), int(h)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    n = len(data)
    while True:
        if pos >= n:
            raise ValueError("gif: truncated sub-blocks")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return b"".join(chunks), pos
        if pos + ln > n:
            raise ValueError("gif: truncated sub-blocks")
        chunks.append(data[pos : pos + ln])
        pos += ln


def gif_frames(data: bytes) -> list[np.ndarray]:
    """All frames, fully composed per the GIF89a disposal model, each as
    (H, W, 3) uint8 RGB over the logical screen."""
    w, h = read_dimensions(data)
    if w == 0 or h == 0:
        raise ValueError("gif: zero-sized screen")
    if len(data) < 13:
        raise ValueError("gif: truncated screen descriptor")
    packed, _bg, _aspect = data[10], data[11], data[12]
    pos = 13
    gct = None
    if packed & 0x80:
        size = 3 * (2 << (packed & 0x7))
        gct = np.frombuffer(data[pos : pos + size], dtype=np.uint8)
        if gct.size != size:
            raise ValueError("gif: truncated color table")
        gct = gct.reshape(-1, 3)
        pos += size
    canvas = np.full((h, w, 3), 255, dtype=np.uint8)  # compose onto white
    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0
    n = len(data)
    while pos < n:
        block = data[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            if pos >= n:
                raise ValueError("gif: truncated extension")
            label = data[pos]
            payload, pos = _read_subblocks(data, pos + 1)
            if label == _GCE and len(payload) >= 4:
                flags = payload[0]
                disposal = (flags >> 2) & 0x7
                transparent = payload[3] if flags & 0x1 else -1
            continue
        if block != _IMAGE:
            raise ValueError("gif: unknown block")
        if pos + 9 > n:
            raise ValueError("gif: truncated image descriptor")
        fx, fy, fw, fh = struct.unpack("<HHHH", data[pos : pos + 8])
        ipacked = data[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:
            size = 3 * (2 << (ipacked & 0x7))
            pal = np.frombuffer(data[pos : pos + size], dtype=np.uint8)
            if pal.size != size:
                raise ValueError("gif: truncated color table")
            pal = pal.reshape(-1, 3)
            pos += size
        if pal is None:
            raise ValueError("gif: image without color table")
        if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
            raise ValueError("gif: frame outside logical screen")
        if pos >= n:
            raise ValueError("gif: truncated image data")
        mcs = data[pos]
        raw, pos = _read_subblocks(data, pos + 1)
        idx = np.frombuffer(
            bytes(lzw_decode_gif(raw, mcs, fw * fh)), dtype=np.uint8
        )
        if idx.size < fw * fh:
            raise ValueError("gif: short image data")
        idx = idx[: fw * fh].reshape(fh, fw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max()) >= pal.shape[0]:
            raise ValueError("gif: palette index out of range")
        prev_region = canvas[fy : fy + fh, fx : fx + fw].copy()
        rgb = pal[idx]
        if transparent >= 0:
            mask = idx == transparent
            rgb = np.where(mask[..., None], prev_region, rgb)
        canvas[fy : fy + fh, fx : fx + fw] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background (white, our flattening)
            canvas[fy : fy + fh, fx : fx + fw] = 255
        elif disposal == 3:  # restore to previous
            canvas[fy : fy + fh, fx : fx + fw] = prev_region
        transparent = -1
        disposal = 0
    if not frames:
        raise ValueError("gif: no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> uint8 array: (H, W) grayscale when the first composed
    frame is achromatic, else (H, W, 3) RGB."""
    first = gif_frames(data)[0]
    if np.array_equal(first[..., 0], first[..., 1]) and np.array_equal(
        first[..., 1], first[..., 2]
    ):
        return first[..., 0].copy()
    return first


# --------------------------------------------------------------------------
# encoder (the test/fixture writer)
# --------------------------------------------------------------------------


def _as_rgb(img: np.ndarray) -> np.ndarray:
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_gif expects uint8 (H,W) or (H,W,3)")
    if img.ndim == 2:
        return np.stack([img] * 3, axis=-1)
    return img


def encode_gif(
    frames,
    *,
    interlace: bool = False,
    transparent_color=None,
    delays=None,
) -> bytes:
    """uint8 image or list of frame dicts -> GIF bytes.

    A frame dict: {"img": (h,w[,3]) uint8, "x": int, "y": int,
    "disposal": 0..3}. The global palette is built from all frames
    (ValueError past 256 distinct colors — this is a fixture writer, not
    a quantizer). `transparent_color` (an RGB triple) marks matching
    pixels transparent in every frame that contains them."""
    if isinstance(frames, np.ndarray):
        frames = [{"img": frames, "x": 0, "y": 0, "disposal": 0}]
    imgs = [_as_rgb(np.asarray(f["img"])) for f in frames]
    w = max(f.get("x", 0) + im.shape[1] for f, im in zip(frames, imgs))
    h = max(f.get("y", 0) + im.shape[0] for f, im in zip(frames, imgs))
    packs = [
        (im[..., 0].astype(np.uint32) << 16)
        | (im[..., 1].astype(np.uint32) << 8)
        | im[..., 2]
        for im in imgs
    ]
    uniq = np.unique(np.concatenate([p.ravel() for p in packs]))
    if transparent_color is not None:
        r, g, b = (int(c) for c in transparent_color)
        tpack = (r << 16) | (g << 8) | b
        pal_packed = np.concatenate(
            [np.array([tpack], np.uint32), uniq[uniq != tpack]]
        )
    else:
        pal_packed = uniq
    if pal_packed.size > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    depth = max(1, (int(pal_packed.size) - 1).bit_length())
    pal = np.zeros((1 << depth, 3), dtype=np.uint8)
    pal[: pal_packed.size, 0] = pal_packed >> 16
    pal[: pal_packed.size, 1] = (pal_packed >> 8) & 0xFF
    pal[: pal_packed.size, 2] = pal_packed & 0xFF
    order = np.argsort(pal_packed, kind="stable")
    sorted_pal = pal_packed[order]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])
    out += pal.tobytes()
    tidx = 0 if transparent_color is not None else -1
    for fi, (f, im) in enumerate(zip(frames, imgs)):
        disposal = int(f.get("disposal", 0))
        delay = int(f.get("delay", 4))
        out += bytes([_EXTENSION, _GCE, 4])
        out += bytes([(disposal << 2) | (1 if tidx >= 0 else 0)])
        out += struct.pack("<H", delay)
        out += bytes([max(tidx, 0), 0])
        fh, fw = im.shape[:2]
        out += bytes([_IMAGE])
        out += struct.pack("<HHHH", f.get("x", 0), f.get("y", 0), fw, fh)
        out += bytes([0x40 if interlace else 0x00])
        idx = order[np.searchsorted(sorted_pal, packs[fi])].astype(np.uint8)
        if interlace:
            rows = np.concatenate(
                [np.arange(start, fh, step) for start, step in _INTERLACE_PASSES]
            )
            idx = idx[rows]
        mcs = max(2, depth)
        out += bytes([mcs])
        payload = lzw_encode_gif(idx.tobytes(), mcs)
        for k in range(0, len(payload), 255):
            chunk = payload[k : k + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += bytes([_TRAILER])
    return bytes(out)
