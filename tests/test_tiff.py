"""TIFF codec (kernels/tiff.py): strip-based gray/bilevel decode over
both byte orders with None/PackBits/LZW(+predictor) compression, plus the
imgio dispatch and the extraction e2e. CCITT G3/G4 lives in
kernels/ccitt.py and is cross-validated against the system libtiff in
tests/test_ccitt.py; here it joins the dispatch/extraction e2e.
"""

import numpy as np
import pytest

from kraken_spark.kernels import imgio, render
from kraken_spark.kernels.tiff import (
    decode_tiff,
    encode_tiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
)


@pytest.mark.parametrize("comp", [1, 32773, 5])
@pytest.mark.parametrize("big_endian", [False, True])
def test_gray_roundtrip(comp, big_endian):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 53)).astype(np.uint8)
    assert np.array_equal(
        decode_tiff(encode_tiff(img, compression=comp, big_endian=big_endian)), img
    )


def test_lzw_predictor_roundtrip_and_smaller_on_smooth():
    x = np.linspace(0, 255, 200)
    img = (np.add.outer(np.linspace(0, 200, 90), x) / 2).astype(np.uint8)
    plain = encode_tiff(img, compression=5, predictor=1)
    pred = encode_tiff(img, compression=5, predictor=2)
    assert np.array_equal(decode_tiff(plain), img)
    assert np.array_equal(decode_tiff(pred), img)
    # horizontal differencing shrinks smooth gradients (the reason it exists)
    assert len(pred) < len(plain)


def test_bilevel_and_whiteiszero():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (23, 41)).astype(np.uint8)
    blob = encode_tiff(img, compression=32773, bilevel=True)
    assert np.array_equal(
        decode_tiff(blob), np.where(img >= 128, 255, 0).astype(np.uint8)
    )
    # PhotometricInterpretation 0 inverts (WhiteIsZero scans)
    flipped = blob.replace(
        bytes.fromhex("060103000100000001000000"),
        bytes.fromhex("060103000100000000000000"),
    )
    assert flipped != blob
    assert np.array_equal(
        decode_tiff(flipped), np.where(img >= 128, 0, 255).astype(np.uint8)
    )


def test_packbits_spec_vector():
    # the worked example from TIFF 6.0 section 9
    raw = bytes(
        [0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0xAA, 0xAA, 0xAA, 0xAA, 0x80,
         0x00, 0x2A, 0x22, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA,
         0xAA, 0xAA]
    )
    enc = packbits_encode(raw)
    assert packbits_decode(enc, len(raw)) == raw
    assert len(enc) <= 16  # the spec packs this to 15 bytes
    with pytest.raises(ValueError):
        packbits_decode(b"\x05abc", 10)  # truncated


def test_lzw_early_change_and_vectors():
    data = b"TOBEORNOTTOBEORTOBEORNOT" * 40  # forces width growth past 9 bits
    assert lzw_decode(lzw_encode(data), len(data)) == data
    rng = np.random.default_rng(5)
    blob = rng.integers(0, 256, 6000).astype(np.uint8).tobytes()
    assert lzw_decode(lzw_encode(blob), len(blob)) == blob
    with pytest.raises(ValueError):
        lzw_decode(b"\x00\x00", 100)


def test_malformed_and_ccitt_rejected():
    with pytest.raises(ValueError):
        decode_tiff(b"XX\x2a\x00")
    with pytest.raises(ValueError):
        decode_tiff(b"II\x2b\x00\x08\x00\x00\x00")  # BigTIFF magic
    img = np.zeros((4, 4), np.uint8)
    blob = bytearray(encode_tiff(img))
    # flip Compression tag value to 4 (G4) on an 8-bit image: must raise
    # (CCITT strips are bilevel by definition), not garble
    comp_at = blob.find(bytes.fromhex("03010300010000000100"))
    assert comp_at > 0
    blob[comp_at + 8] = 4
    with pytest.raises(ValueError, match="CCITT"):
        decode_tiff(bytes(blob))


def test_imgio_tiff_dispatch_and_extraction_cer0():
    d = render.render_document(42, 2)
    for comp in (1, 32773, 5):
        tb = encode_tiff(d["img"], compression=comp)
        assert imgio.read_dimensions(tb) == (d["img"].shape[1], d["img"].shape[0])
        assert np.array_equal(imgio.decode_image(tb), d["img"])
    from kraken_spark.stages import extract_document

    out = extract_document(
        encode_tiff(d["img"], compression=5), "u", d["lang"], gt_text=d["text"]
    )
    assert out["cer"] == 0.0 and out["text"] == d["text"]


@pytest.mark.parametrize("comp,t4_2d", [(2, False), (3, False), (3, True), (4, False)])
def test_ccitt_extraction_cer0(comp, t4_2d):
    """Fax-compressed institutional scans (the dominant bilevel wire
    format) flow through the same dispatch to byte-identical text. The
    128-threshold at encode time is exactly the binarization the pipeline
    itself would apply to the synthetic high-contrast pages."""
    from kraken_spark.stages import extract_document

    d = render.render_document(42, 2)
    tb = encode_tiff(d["img"], compression=comp, t4_2d=t4_2d)
    assert imgio.read_dimensions(tb) == (d["img"].shape[1], d["img"].shape[0])
    out = extract_document(tb, "u", d["lang"], gt_text=d["text"])
    assert out["cer"] == 0.0 and out["text"] == d["text"]
