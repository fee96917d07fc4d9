"""GIF codec (kernels/gif.py): the GIF LZW variant, interlace,
transparency, frame composition with disposal, imgio dispatch, and the
CER-0 e2e path for GIF page payloads."""

import numpy as np
import pytest

from kraken_spark.kernels import imgio, render
from kraken_spark.kernels.gif import (
    decode_gif,
    encode_gif,
    gif_frames,
    lzw_decode_gif,
    lzw_encode_gif,
    read_dimensions,
)


def _checker(h=40, w=56):
    return (
        (np.add.outer(np.arange(h) // 4, np.arange(w) // 4) % 2) * 255
    ).astype(np.uint8)


# --------------------------------------------------------------------- LZW


def test_lzw_gif_roundtrip_various_payloads():
    rng = np.random.default_rng(3)
    for mcs in (2, 4, 8):
        hi = 1 << mcs
        for payload in (
            b"",
            b"\x00" * 1000,
            bytes(rng.integers(0, hi, 5000, dtype=np.uint8)),
            bytes((np.arange(4000) % hi).astype(np.uint8)),
        ):
            enc = lzw_encode_gif(payload, mcs)
            assert bytes(lzw_decode_gif(enc, mcs, len(payload))) == payload


def test_lzw_dictionary_overflow_reset():
    """>4096 dictionary entries forces the encoder's mid-stream clear; the
    decoder must resynchronize."""
    rng = np.random.default_rng(9)
    payload = bytes(rng.integers(0, 256, 60000, dtype=np.uint8))
    enc = lzw_encode_gif(payload, 8)
    assert bytes(lzw_decode_gif(enc, 8, len(payload))) == payload


# ------------------------------------------------------------------- codec


def test_gray_roundtrip_exact():
    img = _checker()
    blob = encode_gif(img)
    assert blob[:6] == b"GIF89a"
    assert read_dimensions(blob) == (56, 40)
    dec = decode_gif(blob)
    assert dec.ndim == 2  # achromatic palette -> grayscale out
    assert np.array_equal(dec, img)


def test_color_roundtrip_exact():
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (12, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 12, (30, 44))]
    dec = decode_gif(encode_gif(img))
    assert dec.shape == (30, 44, 3)
    assert np.array_equal(dec, img)


def test_interlaced_roundtrip_exact():
    img = np.repeat(np.arange(64, dtype=np.uint8)[:, None] * 4, 20, axis=1)
    dec = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(dec, img)


def test_palette_limit_raises():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)  # ~1600 colors
    with pytest.raises(ValueError):
        encode_gif(img)


def test_transparency_composes_onto_white():
    img = np.full((10, 10), 128, np.uint8)
    img[2:5, 2:5] = 7  # the transparent color
    blob = encode_gif(img, transparent_color=(7, 7, 7))
    dec = decode_gif(blob)
    assert (dec[2:5, 2:5] == 255).all()  # white, like PNG alpha flattening
    assert (dec[0, 0] == 128).all()


def test_animation_disposal_methods():
    """Frame composition: disposal 1 leaves, 2 restores background
    (white), 3 restores previous — pinned per composed frame."""
    base = np.full((12, 16), 200, np.uint8)
    sq = np.full((4, 4), 30, np.uint8)
    frames = [
        {"img": base, "x": 0, "y": 0, "disposal": 1},
        {"img": sq, "x": 2, "y": 2, "disposal": 3},  # restore-to-previous
        {"img": sq, "x": 10, "y": 6, "disposal": 2},  # restore-to-bg
        {"img": np.full((2, 2), 90, np.uint8), "x": 0, "y": 0, "disposal": 0},
    ]
    out = gif_frames(encode_gif(frames))
    assert len(out) == 4
    assert (out[0] == 200).all()
    assert (out[1][2:6, 2:6, 0] == 30).all()
    # frame 2: the previous square was restored to the base color
    assert (out[2][2:6, 2:6, 0] == 200).all()
    assert (out[2][6:10, 10:14, 0] == 30).all()
    # frame 3: the disposal-2 rect went white before the tiny frame drew
    assert (out[3][6:10, 10:14, 0] == 255).all()
    assert (out[3][0:2, 0:2, 0] == 90).all()


def test_malformed_gifs_are_total():
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a")
    with pytest.raises(ValueError):
        decode_gif(b"not a gif at all")
    blob = encode_gif(_checker())
    for cut in range(0, len(blob), 11):
        try:
            decode_gif(blob[:cut])
        except ValueError:
            pass
    # bit-flip fuzz over the LZW payload region stays total
    rng = np.random.default_rng(5)
    for _ in range(40):
        mut = bytearray(blob)
        k = rng.integers(13, len(mut) - 1)
        mut[k] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_gif(bytes(mut))
        except ValueError:
            pass


# ------------------------------------------------------------------- imgio


def test_imgio_dispatch_gif():
    img = _checker(24, 32)
    blob = encode_gif(img)
    assert imgio.read_dimensions(blob) == (32, 24)
    assert np.array_equal(imgio.decode_image(blob), img)


def test_gif_payload_extracts_cer0():
    """A GIF page payload in the documents table extracts byte-identically
    (GIF is lossless over the rendered bilevel-ish page)."""
    from kraken_spark.stages import extract_document

    d = render.render_document(42, 4)
    blob = encode_gif(d["img"])
    out = extract_document(blob, "u", d["lang"], gt_text=d["text"])
    assert out["cer"] == 0.0 and out["text"] == d["text"]
