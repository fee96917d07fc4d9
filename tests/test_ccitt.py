"""CCITT T.4/T.6 codec validation against the SYSTEM libtiff.

The container ships /usr/lib/x86_64-linux-gnu/libtiff.so.6 — an
independent, canonical TIFF implementation. These tests drive it via
ctypes as ground truth for kernels/ccitt.py, in both directions:

  libtiff-encode -> our-decode   (proves our DECODE tables/modes)
  our-encode     -> libtiff-decode (proves our EMITTED codes are real)

The run-length sweep images make the table validation EXHAUSTIVE: one
row per run length 0..2623 covers every white/black terminating code
(0..63), every makeup (64..1728) and every shared extended makeup
(1792..2560) — each row's MH decomposition (run & ~63) + (run & 63) hits
each table entry at least once, for both colours, in both directions.

Skipped wholesale if no libtiff is present (import-try gate, the repo
rule for optional system deps).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os

import numpy as np
import pytest

from kraken_spark.kernels import ccitt, tiff

_CANDIDATES = [
    "/usr/lib/x86_64-linux-gnu/libtiff.so.6",
    ctypes.util.find_library("tiff"),
]


def _load_libtiff():
    for p in _CANDIDATES:
        if p and os.path.exists(p):
            try:
                lt = ctypes.CDLL(p)
            except OSError:
                continue
            lt.TIFFOpen.restype = ctypes.c_void_p
            lt.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            lt.TIFFWriteScanline.restype = ctypes.c_int
            lt.TIFFReadScanline.restype = ctypes.c_int
            lt.TIFFSetErrorHandler(None)  # quiet stderr for negative probes
            lt.TIFFSetWarningHandler(None)
            return lt
    return None


_LT = _load_libtiff()
pytestmark = pytest.mark.skipif(_LT is None, reason="no system libtiff")

# TIFF tag ids / compression codes used below
_TW, _TH, _TBPS, _TCOMP, _TPHOTO = 256, 257, 258, 259, 262
_TSPP, _TRPS, _TG3OPTS = 277, 278, 292


def _lt_write(path: str, bits: np.ndarray, comp: int, g3opts: int | None = None):
    """bits: bool (H, W), True = black. Writes photometric-0 bilevel."""
    h, w = bits.shape
    tif = _LT.TIFFOpen(path.encode(), b"w")
    assert tif

    def setf(tag, val, u32=False):
        arg = ctypes.c_uint32(val) if u32 else ctypes.c_int(val)
        assert _LT.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag), arg) == 1

    setf(_TW, w, u32=True)
    setf(_TH, h, u32=True)
    setf(_TBPS, 1)
    setf(_TCOMP, comp)
    setf(_TPHOTO, 0)
    setf(_TSPP, 1)
    setf(_TRPS, h, u32=True)
    if g3opts is not None:
        assert (
            _LT.TIFFSetField(
                ctypes.c_void_p(tif), ctypes.c_uint32(_TG3OPTS), ctypes.c_uint32(g3opts)
            )
            == 1
        )
    packed = np.packbits(bits, axis=1)
    for r in range(h):
        assert (
            _LT.TIFFWriteScanline(
                ctypes.c_void_p(tif),
                ctypes.c_char_p(packed[r].tobytes()),
                ctypes.c_uint32(r),
                ctypes.c_uint16(0),
            )
            == 1
        )
    _LT.TIFFClose(ctypes.c_void_p(tif))


def _lt_read(path: str) -> np.ndarray:
    """-> bool (H, W), True = black (photometric-0 files)."""
    tif = _LT.TIFFOpen(path.encode(), b"r")
    assert tif, "libtiff refused our file"
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    assert _LT.TIFFGetField(
        ctypes.c_void_p(tif), ctypes.c_uint32(_TW), ctypes.byref(w)
    )
    assert _LT.TIFFGetField(
        ctypes.c_void_p(tif), ctypes.c_uint32(_TH), ctypes.byref(h)
    )
    row_bytes = (w.value + 7) // 8
    buf = ctypes.create_string_buffer(row_bytes)
    rows = []
    for r in range(h.value):
        assert (
            _LT.TIFFReadScanline(
                ctypes.c_void_p(tif), buf, ctypes.c_uint32(r), ctypes.c_uint16(0)
            )
            == 1
        ), f"libtiff failed to decode row {r}"
        rows.append(np.frombuffer(buf.raw, dtype=np.uint8).copy())
    _LT.TIFFClose(ctypes.c_void_p(tif))
    return np.unpackbits(np.stack(rows), axis=1)[:, : w.value].astype(bool)


def _sweep_image(black_first: bool) -> np.ndarray:
    """Row r = run of length r of the leading colour, then the other."""
    w = 2624
    runs = np.arange(w)[None, :] < np.arange(w)[:, None]  # row r: first r True
    return runs if black_first else ~runs


_ALL_COMPS = [
    (2, None),  # MH RLE, byte-aligned lines
    (3, 0),  # G3 1D with EOLs
    (3, 1),  # G3 2D (T4Options bit 0)
    (4, None),  # G4 / T.6
]


@pytest.mark.parametrize("black_first", [False, True])
@pytest.mark.parametrize("comp,g3opts", _ALL_COMPS)
def test_every_run_length_libtiff_to_ours(tmp_path, black_first, comp, g3opts):
    """Exhaustive table proof, decode direction: libtiff encodes one row
    per run length 0..2623; our decoder must reproduce every row."""
    bits = _sweep_image(black_first)
    p = str(tmp_path / "sweep.tif")
    _lt_write(p, bits, comp, g3opts)
    img = tiff.decode_tiff(open(p, "rb").read())
    # photometric 0: black ink -> 0
    got_black = img == 0
    assert np.array_equal(got_black, bits)


@pytest.mark.parametrize("black_first", [False, True])
@pytest.mark.parametrize("comp,g3opts", _ALL_COMPS)
def test_every_run_length_ours_to_libtiff(tmp_path, black_first, comp, g3opts):
    """Exhaustive table proof, encode direction: our encoder's output for
    every run length must decode bit-identically in libtiff."""
    bits = _sweep_image(black_first)
    img = np.where(bits, 0, 255).astype(np.uint8)
    blob = tiff.encode_tiff(img, compression=comp, t4_2d=bool(g3opts))
    p = str(tmp_path / "ours.tif")
    open(p, "wb").write(blob)
    assert np.array_equal(_lt_read(p), bits)


@pytest.mark.parametrize("comp,g3opts", _ALL_COMPS)
def test_fuzz_cross_validation(tmp_path, comp, g3opts):
    """Randomized pages at several densities + structured patterns that
    stress pass/vertical/horizontal 2D modes, both directions."""
    rng = np.random.default_rng(4242)
    cases = []
    for h, w in [(1, 1), (7, 9), (33, 100), (64, 257), (100, 1728)]:
        for dens in (0.0, 0.02, 0.3, 0.7, 1.0):
            cases.append(rng.random((h, w)) < dens)
    # structured: stripes, checker, text-ish dilated noise
    y, x = np.mgrid[0:80, 0:300]
    cases += [
        (x // 7) % 2 == 0,
        (y // 3) % 2 == 0,
        ((x + y) // 5) % 2 == 0,
        np.repeat(np.repeat(rng.random((10, 38)) < 0.4, 8, 0), 8, 1)[:80, :300],
    ]
    for i, bits in enumerate(cases):
        p1 = str(tmp_path / f"lt{i}.tif")
        _lt_write(p1, bits, comp, g3opts)
        ours = tiff.decode_tiff(open(p1, "rb").read()) == 0
        assert np.array_equal(ours, bits), f"libtiff->ours case {i}"
        img = np.where(bits, 0, 255).astype(np.uint8)
        blob = tiff.encode_tiff(img, compression=comp, t4_2d=bool(g3opts))
        p2 = str(tmp_path / f"us{i}.tif")
        open(p2, "wb").write(blob)
        assert np.array_equal(_lt_read(p2), bits), f"ours->libtiff case {i}"


def test_g4_multistrip_libtiff(tmp_path):
    """Strips are coded independently (fresh all-white reference line):
    a libtiff multi-strip G4 file must decode through the strip loop."""
    rng = np.random.default_rng(11)
    bits = rng.random((64, 129)) < 0.25
    p = str(tmp_path / "ms.tif")
    tif = _LT.TIFFOpen(p.encode(), b"w")

    def setf(tag, val, u32=False):
        arg = ctypes.c_uint32(val) if u32 else ctypes.c_int(val)
        assert _LT.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag), arg) == 1

    setf(_TW, 129, u32=True)
    setf(_TH, 64, u32=True)
    setf(_TBPS, 1)
    setf(_TCOMP, 4)
    setf(_TPHOTO, 0)
    setf(_TSPP, 1)
    setf(_TRPS, 16, u32=True)  # 4 strips
    packed = np.packbits(bits, axis=1)
    for r in range(64):
        assert (
            _LT.TIFFWriteScanline(
                ctypes.c_void_p(tif),
                ctypes.c_char_p(packed[r].tobytes()),
                ctypes.c_uint32(r),
                ctypes.c_uint16(0),
            )
            == 1
        )
    _LT.TIFFClose(ctypes.c_void_p(tif))
    img = tiff.decode_tiff(open(p, "rb").read())
    assert np.array_equal(img == 0, bits)


def test_long_makeup_chain_roundtrip():
    """Runs past 2560 chain extended makeups (T.4 §4.2.1.3 note) — a
    6000-px all-white and all-black line survives our own round trip."""
    for val in (0, 255):
        img = np.full((3, 6000), val, dtype=np.uint8)
        for comp in (2, 3, 4):
            back = tiff.decode_tiff(tiff.encode_tiff(img, compression=comp))
            assert np.array_equal(back, img)


def test_malformed_ccitt_total():
    """Garbage CCITT payloads raise ValueError (guard-row contract), never
    crash or hang."""
    rng = np.random.default_rng(5)
    img = (rng.random((8, 64)) < 0.5).astype(np.uint8) * 255
    for comp in (2, 3, 4):
        blob = bytearray(tiff.encode_tiff(img, compression=comp))
        # truncate payload
        with pytest.raises(ValueError):
            tiff.decode_tiff(bytes(blob[: len(blob) - 12]))
        # flip bits in the coded stream
        for k in range(1, 6):
            mutated = bytearray(blob)
            mutated[-k] ^= 0xFF
            try:
                tiff.decode_tiff(bytes(mutated))
            except ValueError:
                pass  # either clean decode of a still-valid stream or ValueError


def test_uncompressed_mode_rejected():
    """T4Options/T6Options uncompressed-mode bit -> clear ValueError."""
    img = np.zeros((4, 16), dtype=np.uint8)
    blob = bytearray(tiff.encode_tiff(img, compression=3, t4_2d=False))
    # patch the T4Options value (type LONG, little-endian) from 0 -> 2
    idx = blob.find((292).to_bytes(2, "little") + (4).to_bytes(2, "little"))
    assert idx > 0
    blob[idx + 8 : idx + 12] = (2).to_bytes(4, "little")
    with pytest.raises(ValueError, match="uncompressed"):
        tiff.decode_tiff(bytes(blob))


def test_table_prefix_freedom():
    """The T.4 code tables are prefix-free per colour (build_lut would
    have raised at import) and every entry's length matches its value."""
    for tbl in (
        ccitt.WHITE_TERM,
        ccitt.WHITE_MAKEUP,
        ccitt.BLACK_TERM,
        ccitt.BLACK_MAKEUP,
        ccitt.EXT_MAKEUP,
    ):
        for run, (code, ln) in tbl.items():
            assert 0 <= code < (1 << ln), (run, code, ln)
