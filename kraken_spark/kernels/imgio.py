"""Format-dispatched image payload IO: PNG (own codec, kernels/png.py),
JPEG (kernels/jpeg.py, baseline + progressive), TIFF (kernels/tiff.py)
or GIF (kernels/gif.py), selected by magic bytes.

The reference opens page images through PIL, which accepts both formats
transparently (kraken/kraken.py input handling); this is the engine's
equivalent seam. ValueError on anything else — callers map that to guard
rows.
"""

from __future__ import annotations

import struct

import numpy as np

from . import png

JPEG_SOI = b"\xff\xd8"


def read_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the header only — the admission-guard probe
    (no full decode of a potentially hostile payload)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return png.read_dimensions(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import read_dimensions as gif_dims

        return gif_dims(data)
    if data[:2] == JPEG_SOI:
        i, n = 2, len(data)
        while i < n - 1:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            i += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            if i + 2 > n:
                break
            seglen = struct.unpack(">H", data[i : i + 2])[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                try:
                    h, w = struct.unpack(">HH", data[i + 3 : i + 7])
                except struct.error:
                    raise ValueError("jpeg: truncated frame header") from None
                return w, h
            i += seglen
        raise ValueError("jpeg: no frame header")
    if data[:2] in (b"II", b"MM"):
        endian = "<" if data[:2] == b"II" else ">"
        try:
            magic, ifd = struct.unpack(endian + "HI", data[2:8])
            (nt,) = struct.unpack(endian + "H", data[ifd : ifd + 2])
        except struct.error:
            raise ValueError("tiff: truncated header") from None
        if magic == 42:
            w = h = 0
            try:
                for t in range(nt):
                    at = ifd + 2 + 12 * t
                    tag, typ = struct.unpack(endian + "HH", data[at : at + 4])
                    if tag in (256, 257):
                        v = struct.unpack(
                            endian + ("H" if typ == 3 else "I"),
                            data[at + 8 : at + (10 if typ == 3 else 12)],
                        )[0]
                        if tag == 256:
                            w = v
                        else:
                            h = v
            except struct.error:
                raise ValueError("tiff: truncated IFD") from None
            if w and h:
                return w, h
            raise ValueError("tiff: missing dimensions")
    raise ValueError("unsupported image payload")


def decode_image(data: bytes) -> np.ndarray:
    """Image bytes -> uint8 array ((H, W) gray or (H, W, 3) RGB)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return png.decode_png(data)
    if data[:2] == JPEG_SOI:
        from .jpeg import decode_jpeg

        return decode_jpeg(data)
    if data[:2] in (b"II", b"MM"):
        from .tiff import decode_tiff

        return decode_tiff(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(data)
    raise ValueError("unsupported image payload")
