"""Baseline JPEG (ITU-T T.81) codec, pure numpy + stdlib.

The reference opens page images through PIL, which accepts JPEG — the
dominant encoding of scanned documents and web images — while this
engine's own codec layer was PNG-only. This module closes that gap with
a from-scratch baseline sequential DCT implementation:

decode_jpeg:
- marker parser (SOI/APPn/COM/DQT/DHT/DRI/SOF0,1/SOS/RSTn/EOI),
  8-bit and 16-bit quantization tables, multiple tables per segment;
- canonical Huffman decoding off the BITS/HUFFVAL spec lists (T.81
  Annex C) with a numpy-backed bitreader handling 0xFF00 byte stuffing
  and restart-interval DC-predictor resets;
- per-MCU dequant -> inverse zigzag -> 8x8 IDCT (separable DCT-III as a
  precomputed orthonormal basis matmul, exact to float rounding);
- 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling with nearest-neighbor
  upsample, BT.601 YCbCr->gray/RGB, grayscale passthrough.

encode_jpeg (the test/fixture writer, grayscale, 4:4:4):
- quality-scaled Annex-K quantization tables, the Annex-K standard
  luminance Huffman tables, FDCT via the same basis, DC differencing +
  AC run-length/ZRL coding, byte stuffing.

Both ends are total functions over bytes: malformed input raises
ValueError (callers map that to guard rows). No external imaging
library is involved anywhere.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# shared tables
# --------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 luminance quantization table (row-major)
QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

# Annex K.3 standard Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis: A @ x = DCT(x); A.T @ X = IDCT(X)
_k = np.arange(8.0)
_DCT_A = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16.0) * np.sqrt(0.25)
_DCT_A[0, :] *= 1.0 / np.sqrt(2.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _DCT_A.T @ block @ _DCT_A


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _DCT_A @ block @ _DCT_A.T


# --------------------------------------------------------------------------
# Huffman
# --------------------------------------------------------------------------


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, canonical assignment (T.81 C.2)."""
    if sum(bits) > len(vals):
        raise ValueError("jpeg: truncated DHT value list")
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    return {v: (ln, code) for (ln, code), v in _build_decode_table(bits, vals).items()}


def _lut_from_table(table: dict[tuple[int, int], int]) -> np.ndarray:
    """(length, code) spec -> 65536-entry LUT over left-aligned 16-bit
    windows; each entry packs (value << 8) | code_length, 0 = invalid."""
    lut = np.zeros(1 << 16, dtype=np.uint16)
    for (ln, code), val in table.items():
        base = code << (16 - ln)
        lut[base : base + (1 << (16 - ln))] = (val << 8) | ln
    return lut


class _BitReader:
    """MSB-first reader over entropy-coded bytes. FF00 stuffing is removed
    up front (one vectorized pass); reads go through a 32-bit accumulator
    refilled bytewise — O(1) amortized per symbol and O(n) total memory
    (a precomputed 16-wide per-bit window table would be a ~500x memory
    amplification on multi-MB scan JPEGs)."""

    __slots__ = ("data", "n", "byte", "acc", "nacc")

    def __init__(self, data: bytes):
        arr = np.frombuffer(data, dtype=np.uint8)
        if arr.size:
            # drop the 0x00 that follows every 0xFF (byte stuffing)
            stuffed = np.zeros(arr.size, dtype=bool)
            stuffed[1:] = (arr[:-1] == 0xFF) & (arr[1:] == 0x00)
            arr = arr[~stuffed]
        self.data = arr.tobytes()
        self.n = len(self.data)
        self.byte = 0  # next byte to load
        self.acc = 0  # right-aligned bit accumulator
        self.nacc = 0  # valid bits in acc

    def _fill(self) -> None:
        data, byte, n = self.data, self.byte, self.n
        while self.nacc <= 24 and byte < n:
            self.acc = (self.acc << 8) | data[byte]
            byte += 1
            self.nacc += 8
        self.byte = byte

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nacc < n:
            self._fill()
            if self.nacc < n:
                raise ValueError("jpeg: bitstream exhausted")
        self.nacc -= n
        v = (self.acc >> self.nacc) & ((1 << n) - 1)
        self.acc &= (1 << self.nacc) - 1
        return v

    def read_huff(self, lut) -> int:
        if self.nacc < 16:
            self._fill()
        nacc = self.nacc
        if nacc >= 16:
            window = (self.acc >> (nacc - 16)) & 0xFFFF
        elif nacc > 0:
            window = (self.acc << (16 - nacc)) & 0xFFFF
        else:
            raise ValueError("jpeg: bitstream exhausted")
        e = lut[window]
        ln = e & 0xFF
        if ln == 0 or ln > nacc:
            raise ValueError("jpeg: invalid Huffman code")
        self.nacc = nacc - ln
        self.acc &= (1 << self.nacc) - 1
        return e >> 8


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map t raw bits to the signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 array, (H, W) grayscale or (H, W, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart = 0
    i = 2
    n = len(data)
    scan_at = -1
    while i < n - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if i + 2 > n:
            raise ValueError("jpeg: truncated segment")
        seglen = struct.unpack(">H", data[i : i + 2])[0]
        if seglen < 2:
            raise ValueError("jpeg: bad segment length")
        seg = data[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                j += 1
                if pq:
                    vals = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.float64)
                    j += 128
                else:
                    vals = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.float64)
                    j += 64
                if vals.size != 64:
                    raise ValueError("jpeg: bad DQT")
                tbl = np.zeros(64)
                tbl[ZIGZAG] = vals  # stored in zigzag order
                qt[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1 : j + 17])
                cnt = sum(bits)
                vals = list(seg[j + 17 : j + 17 + cnt])
                j += 17 + cnt
                tbl = _build_decode_table(bits, vals)
                (huff_ac if tc else huff_dc)[th] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            if len(seg) < 6 or len(seg) < 6 + 3 * seg[5]:
                raise ValueError("jpeg: truncated SOF")
            _prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "hs": hv >> 4, "vs": hv & 0xF, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline sequential DCT is supported")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("jpeg: truncated DRI")
            restart = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if len(seg) < 1 or len(seg) < 1 + 2 * seg[0]:
                raise ValueError("jpeg: truncated SOS")
            ns = seg[0]
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["td"], comp["ta"] = tt >> 4, tt & 0xF
            scan_at = i + seglen
            break
        i += seglen
    if scan_at < 0 or not comps or w <= 0 or h <= 0:
        raise ValueError("jpeg: no scan")
    for c in comps:
        if "td" not in c or "ta" not in c:
            raise ValueError("jpeg: SOS component does not match SOF")
        if c["td"] not in huff_dc or c["ta"] not in huff_ac or c["tq"] not in qt:
            raise ValueError("jpeg: scan references an undefined table")
        if not (1 <= c["hs"] <= 4 and 1 <= c["vs"] <= 4):
            raise ValueError("jpeg: bad sampling factors")
    # entropy-coded data runs to EOI; restart markers handled by splitting
    end = data.rfind(b"\xff\xd9")
    ecs = data[scan_at : end if end > scan_at else n]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    dc_luts = {k: _lut_from_table(t).tolist() for k, t in huff_dc.items()}
    ac_luts = {k: _lut_from_table(t).tolist() for k, t in huff_ac.items()}
    # entropy pass: collect zigzag coefficient rows + block origins per
    # component; all numeric heavy lifting is batched afterwards
    coef_rows: list[list] = [[] for _ in comps]
    origins: list[list] = [[] for _ in comps]
    # split on restart markers (FFD0-FFD7): each interval restarts DC=0
    if restart:
        import re as _re

        intervals = _re.split(b"\xff[\xd0-\xd7]", ecs)
    else:
        intervals = [ecs]
    mcu = 0
    total_mcus = mcus_x * mcus_y
    for chunk in intervals:
        br = _BitReader(chunk)
        pred = [0] * len(comps)
        limit = mcu + restart if restart else total_mcus
        try:
            while mcu < min(limit, total_mcus):
                my, mx = divmod(mcu, mcus_x)
                for ci, c in enumerate(comps):
                    dlut, alut = dc_luts[c["td"]], ac_luts[c["ta"]]
                    for by in range(c["vs"]):
                        for bx in range(c["hs"]):
                            t = br.read_huff(dlut)
                            pred[ci] += _extend(br.read(t), t)
                            coef = [0] * 64
                            coef[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = br.read_huff(alut)
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += rs >> 4
                                s = rs & 0xF
                                if k > 63:
                                    raise ValueError("jpeg: AC overflow")
                                coef[k] = _extend(br.read(s), s)
                                k += 1
                            coef_rows[ci].append(coef)
                            origins[ci].append(
                                ((my * c["vs"] + by) * 8, (mx * c["hs"] + bx) * 8)
                            )
                mcu += 1
        except ValueError:
            if mcu == 0:
                raise
            break  # truncated tail: keep decoded area (total-function)
    planes = []
    for ci, c in enumerate(comps):
        plane = np.full(
            (mcus_y * c["vs"] * 8, mcus_x * c["hs"] * 8), 128.0, dtype=np.float64
        )
        if coef_rows[ci]:
            zz = np.asarray(coef_rows[ci], dtype=np.float64)  # (nblk, 64)
            blocks = np.zeros_like(zz)
            blocks[:, ZIGZAG] = zz  # inverse zigzag, batched
            blocks = blocks.reshape(-1, 8, 8) * qt[c["tq"]]
            px = np.einsum("ij,njk,kl->nil", _DCT_A.T, blocks, _DCT_A) + 128.0
            ys = np.asarray([o[0] for o in origins[ci]])
            xs = np.asarray([o[1] for o in origins[ci]])
            for n_, (y0, x0) in enumerate(zip(ys, xs)):
                plane[y0 : y0 + 8, x0 : x0 + 8] = px[n_]
        planes.append(plane)
    outs = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["hs"] != hmax or c["vs"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["vs"], axis=0), hmax // c["hs"], axis=1)
        outs.append(p[:h, :w])
    if len(outs) == 1:
        return np.clip(outs[0].round(), 0, 255).astype(np.uint8)
    y, cb, cr = outs[0], outs[1] - 128.0, outs[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder (grayscale, 4:4:4 — the fixture writer)
# --------------------------------------------------------------------------


def _pack_bits(codes: list[int], lens: list[int]) -> bytes:
    """Concatenate variable-length MSB-first codes into stuffed entropy
    bytes — one vectorized pass instead of per-symbol byte emission."""
    ca = np.asarray(codes, dtype=np.uint32)
    la = np.asarray(lens, dtype=np.int64)
    total = int(la.sum())
    idx = np.repeat(np.arange(la.size), la)
    offs = np.arange(total) - np.repeat(np.cumsum(la) - la, la)
    bits = (ca[idx] >> (la[idx] - 1 - offs)) & 1
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=bits.dtype)])  # 1-pad (spec)
    by = np.packbits(bits.astype(np.uint8))
    ff = np.nonzero(by == 0xFF)[0]
    if ff.size:
        by = np.insert(by, ff + 1, 0)  # byte stuffing
    return by.tobytes()


def _quality_table(quality: int) -> np.ndarray:
    q = max(1, min(100, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    t = np.floor((QTABLE_LUMA * s + 50) / 100)
    return np.clip(t, 1, 255).reshape(8, 8)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _block_rows(plane: np.ndarray, qtab: np.ndarray):
    """(H, W) float plane -> (zigzagged quantized int rows, last_nz list),
    with edge-replicate padding to 8-multiples; batched FDCT."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    coefs = np.einsum("ij,njk,kl->nil", _DCT_A, blocks, _DCT_A.T)
    zz = np.round(coefs.reshape(-1, 64) / qtab.reshape(-1)[None, :])
    zz = zz[:, ZIGZAG].astype(np.int64)
    last_nz = np.where(
        (zz[:, 1:] != 0).any(axis=1), 63 - np.argmax(zz[:, :0:-1] != 0, axis=1), 0
    ).tolist()
    return zz.tolist(), last_nz


def _entropy_block(zzc, lnz, pred, dc_enc, ac_enc, codes, lens) -> int:
    """Append one block's symbols; returns the new DC predictor."""
    zrl_ln, zrl_code = ac_enc[0xF0]
    eob_ln, eob_code = ac_enc[0x00]
    diff = zzc[0] - pred
    t = _category(diff)
    ln, code = dc_enc[t]
    codes.append(code)
    lens.append(ln)
    if t:
        codes.append(diff if diff > 0 else diff + (1 << t) - 1)
        lens.append(t)
    run = 0
    for k in range(1, lnz + 1):
        v = zzc[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            codes.append(zrl_code)
            lens.append(zrl_ln)
            run -= 16
        s = _category(v)
        ln, code = ac_enc[(run << 4) | s]
        codes.append(code)
        lens.append(ln)
        codes.append(v if v > 0 else v + (1 << s) - 1)
        lens.append(s)
        run = 0
    if lnz < 63:
        codes.append(eob_code)
        lens.append(eob_ln)
    return zzc[0]


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB -> baseline JPEG bytes
    (Annex-K tables; color as 4:4:4 YCbCr, all components on table 0)."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects uint8 (H,W) or (H,W,3)")
    color = img.ndim == 3
    h, w = img.shape[:2]
    qtab = _quality_table(quality)
    dc_enc = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_enc = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    if color:
        r, g, b = (img[..., c].astype(np.float64) for c in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        planes = [img.astype(np.float64)]
    nc = len(planes)
    out = bytearray(b"\xff\xd8")  # SOI
    zzq = qtab.reshape(-1)[ZIGZAG].astype(np.uint8)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zzq.tobytes()
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x11, 0])  # 1x1 sampling, qtable 0
    for tc, (bits, vals) in ((0, (DC_LUMA_BITS, DC_LUMA_VALS)), (1, (AC_LUMA_BITS, AC_LUMA_VALS))):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc << 4]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
    for c in range(nc):
        out += bytes([c + 1, 0x00])
    out += bytes([0, 63, 0])
    per_comp = [_block_rows(p, qtab) for p in planes]
    codes: list[int] = []
    lens: list[int] = []
    preds = [0] * nc
    nblocks = len(per_comp[0][0])
    for bi in range(nblocks):  # interleaved MCU order (1x1 sampling)
        for ci in range(nc):
            rows, last_nz = per_comp[ci]
            preds[ci] = _entropy_block(
                rows[bi], last_nz[bi], preds[ci], dc_enc, ac_enc, codes, lens
            )
    out += _pack_bits(codes, lens)
    out += b"\xff\xd9"
    return bytes(out)
