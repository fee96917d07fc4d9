"""Baseline JPEG codec (kernels/jpeg.py) + format-dispatched image IO
(kernels/imgio.py). The reference opens pages through PIL, which accepts
JPEG — the dominant scanned-document/web encoding — so the engine's own
codec layer must too: raw JPEG payloads in the documents table, DCTDecode
image XObjects in scanned PDFs, and DCT images placed by the vector
rasterizer all decode through this module.
"""

import numpy as np
import pytest

from kraken_spark.kernels import imgio, render
from kraken_spark.kernels.jpeg import (
    _category,
    _extend,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h=120, w=160):
    return (np.add.outer(np.linspace(0, 200, h), np.linspace(0, 255, w)) / 2).astype(
        np.uint8
    )


# ------------------------------------------------------------------- codec


def test_flat_block_roundtrip_exact():
    for v in (0, 77, 128, 255):
        img = np.full((64, 48), v, np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img, 90)), img)


def test_smooth_gradient_within_one_level():
    img = _gradient()
    dec = decode_jpeg(encode_jpeg(img, 90))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_noise_psnr_bound_and_quality_ordering():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (80, 72)).astype(np.uint8)

    def psnr(q):
        d = decode_jpeg(encode_jpeg(img, q)).astype(np.float64)
        return 10 * np.log10(255**2 / np.mean((d - img) ** 2))

    p95, p50 = psnr(95), psnr(50)
    assert p95 > 35.0
    assert p95 > p50  # more quality, less error
    assert len(encode_jpeg(img, 50)) < len(encode_jpeg(img, 95))


def test_non_multiple_of_8_dimensions():
    img = _gradient(19, 13)
    dec = decode_jpeg(encode_jpeg(img, 92))
    assert dec.shape == (19, 13)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_color_roundtrip_and_gray_passthrough():
    rgb = np.zeros((48, 56, 3), np.uint8)
    rgb[..., 0] = np.linspace(0, 255, 56)[None, :]
    rgb[..., 1] = np.linspace(255, 0, 48)[:, None]
    rgb[..., 2] = 128
    dec = decode_jpeg(encode_jpeg(rgb, 95))
    assert dec.shape == rgb.shape
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 1
    flat = np.full((16, 16, 3), (200, 30, 90), np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 95)), flat)


def test_category_extend_inverse():
    for v in (-255, -128, -1, 0, 1, 2, 127, 255, 1023):
        t = _category(v)
        raw = v if v > 0 else v + (1 << t) - 1 if v else 0
        assert _extend(raw, t) == v


def test_malformed_inputs_raise_valueerror():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    # arithmetic coding (SOF9) is explicitly unsupported, not silently wrong
    blob = bytearray(encode_jpeg(_gradient(16, 16), 90))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC9
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), np.float32))


def test_truncated_stream_keeps_decoded_area():
    img = _gradient(64, 64)
    blob = encode_jpeg(img, 90)
    cut = decode_jpeg(blob[: int(len(blob) * 0.6)])
    assert cut.shape == (64, 64)
    # the first rows decoded before the cut must match the full decode
    full = decode_jpeg(blob)
    assert np.array_equal(cut[:16], full[:16])


# ------------------------------------------------------------------- imgio


def test_imgio_dispatch_and_dimensions():
    from kraken_spark.kernels import png

    img = _gradient(30, 40)
    jb = encode_jpeg(img, 90)
    pb = png.encode_png(img)
    assert imgio.read_dimensions(jb) == (40, 30)
    assert imgio.read_dimensions(pb) == (40, 30)
    assert np.array_equal(imgio.decode_image(pb), img)
    assert np.abs(imgio.decode_image(jb).astype(int) - img.astype(int)).max() <= 1
    with pytest.raises(ValueError):
        imgio.read_dimensions(b"GIF89a...")
    with pytest.raises(ValueError):
        imgio.decode_image(b"\x00\x01")


# --------------------------------------------------------------- e2e paths


def test_jpeg_payload_extracts_cer0():
    """A raw JPEG page payload in the documents table extracts at CER 0
    (binarization absorbs the compression artifacts)."""
    from kraken_spark.stages import extract_document

    d = render.render_document(42, 1)
    out = extract_document(
        encode_jpeg(d["img"], 90), "u", d["lang"], gt_text=d["text"]
    )
    assert out["cer"] == 0.0 and out["text"] == d["text"]


def test_dctdecode_pdf_extracts_cer0():
    """A scanned PDF whose image XObjects are DCTDecode (the dominant
    real-world encoding) explodes to pages that extract at CER 0; the
    vector rasterizer places the same DCT images."""
    from kraken_spark.kernels.pdfraster import rasterize_pdf
    from kraken_spark.sources.pdf import unpack_pages, write_pdf
    from kraken_spark.stages import extract_document

    d0 = render.render_document(42, 3)
    d1 = render.render_document(42, 6)
    pdf = write_pdf([d0["img"], d1["img"]], jpeg_quality=90)
    assert b"/DCTDecode" in pdf
    pages = unpack_pages(pdf)
    assert len(pages) == 2
    for payload, d in zip(pages, (d0, d1)):
        out = extract_document(payload, "u", d["lang"], gt_text=d["text"])
        assert out["cer"] == 0.0
    imgs = rasterize_pdf(pdf, dpi=72.0)
    assert [im.shape for im in imgs] == [d0["img"].shape, d1["img"].shape]
    # rasterized placement reproduces the decoded JPEG samples 1:1
    assert np.abs(imgs[0].astype(int) - d0["img"].astype(int)).max() <= 32

# -------------------------------------------------------------- progressive


def test_progressive_matches_baseline_exactly():
    """Progressive (SOF2) streams carry the same quantized coefficients as
    baseline through a disjoint entropy path (EOB runs, spectral bands,
    successive-approximation refinement, per-scan optimized tables) —
    decode of both must agree pixel-for-pixel."""
    rng = np.random.default_rng(7)
    cases = [
        _gradient(70, 90),
        rng.integers(0, 256, (64, 64), dtype=np.uint8),
        np.full((33, 47), 130, np.uint8),
        rng.integers(0, 256, (50, 70, 3), dtype=np.uint8),
        rng.integers(0, 256, (17, 23, 3), dtype=np.uint8),
    ]
    for img in cases:
        for sub in ("4:4:4", "4:2:0"):
            if img.ndim == 2 and sub == "4:2:0":
                continue
            base = encode_jpeg(img, 85, subsampling=sub)
            prog = encode_jpeg(img, 85, progressive=True, subsampling=sub)
            assert prog[2:4] != base[2:4] or b"\xff\xc2" in prog
            assert np.array_equal(decode_jpeg(base), decode_jpeg(prog))


def test_progressive_subsampled_noninterleaved_grid():
    """4:2:0 with dims straddling the MCU boundary: the luma AC scans
    traverse ceil(w/8) x ceil(h/8) blocks (NOT the MCU-padded grid) — a
    wrong sub-grid desynchronizes the whole scan."""
    rng = np.random.default_rng(11)
    for hw in ((24, 40), (23, 39), (17, 25), (40, 24)):
        img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
        base = encode_jpeg(img, 80, subsampling="4:2:0")
        prog = encode_jpeg(img, 80, progressive=True, subsampling="4:2:0")
        assert np.array_equal(decode_jpeg(base), decode_jpeg(prog))


def test_progressive_truncation_keeps_coarse_image():
    """A progressive stream cut mid-file still yields the full-size image
    refined only by the scans received — the format's coarse-first
    contract (and this engine's total-function guarantee)."""
    img = _gradient(64, 80)
    blob = encode_jpeg(img, 90, progressive=True)
    full = decode_jpeg(blob).astype(np.float64)
    got_partial = False
    for frac in (0.35, 0.6, 0.85):
        cut = decode_jpeg(blob[: int(len(blob) * frac)])
        assert cut.shape == (64, 80)
        # coarse approximation only: bounded error vs the full decode
        err = np.abs(cut.astype(np.float64) - full).mean()
        assert err < 24.0
        got_partial = got_partial or err > 0
    assert got_partial  # at least one cut actually lost refinement scans


def test_progressive_payload_extracts_cer0():
    """A progressive-JPEG page payload routes through imgio and extracts
    byte-identically, like its baseline twin."""
    from kraken_spark.stages import extract_document

    d = render.render_document(42, 2)
    blob = encode_jpeg(d["img"], 90, progressive=True)
    assert imgio.read_dimensions(blob) == (d["img"].shape[1], d["img"].shape[0])
    out = extract_document(blob, "u", d["lang"], gt_text=d["text"])
    assert out["cer"] == 0.0 and out["text"] == d["text"]


def test_progressive_fuzz_truncations_total_function():
    """Every truncation point either decodes or raises ValueError — never
    hangs, never throws anything else."""
    blob = encode_jpeg(_gradient(32, 32), 85, progressive=True)
    for cut in range(0, len(blob), 7):
        try:
            decode_jpeg(blob[:cut])
        except ValueError:
            pass
