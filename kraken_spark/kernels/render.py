"""Deterministic synthetic page renderer (the FIXTURES.md §1 contract).

Produces Common-Crawl-style `documents` rows: a rendered page image (PNG in
the ``html`` column), the ground-truth extracted text (lines joined with \\n
in reading order — the byte-identical target, cf. the reference's text sink
/root/reference/kraken/kraken.py:261), plus golden line/region geometry for
segmentation tests.

Pages have a noisy gradient background so the nlbin binarizer has real work
to do (cf. /root/reference/kraken/binarization.py:44-127), 1- or 2-column
layouts to exercise column-separator detection and region reading order
(/root/reference/kraken/pageseg.py:137-199,
/root/reference/kraken/lib/segmentation.py:845-903), RTL pages to exercise
BiDi (/root/reference/kraken/lib/bidi/__init__.py), and a ~1% fraction of
oversized pages to exercise skew handling.

All randomness flows from numpy PCG64 seeded per-document, so generation is
reproducible and parallelizable (each doc is independent).
"""

from __future__ import annotations

import numpy as np

from .glyphs import (
    ARABIC_CPS,
    CELL_W,
    GLYPH_H,
    GLYPH_W,
    LINE_PITCH,
    glyph_ink,
)

MARGIN = 64
GUTTER = 96  # 2-column gutter; must exceed the 64 px separator threshold
SPECKLE_DIVISOR = 2000  # ~0.05% of pixels get dust dots (0 disables)
PAGE_SIZE = (1200, 1600)  # (W, H)
OVERSIZE = (2400, 3200)

# language-specific character pools (single shared procedural font)
_EN_POOL = [ord(c) for c in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,;:!?'-"]
_FR_POOL = [ord(c) for c in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,;:!?'-()"]
_AR_POOL = list(ARABIC_CPS)
_POOLS = {"en": _EN_POOL, "fr": _FR_POOL, "ar": _AR_POOL}
LANGS = ("en", "fr", "ar")


def doc_rng(seed: int, doc_idx: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64([seed, doc_idx]))


def _smooth_noise(
    rng: np.random.Generator, h: int, w: int, cell: int = 16, std: float = 7.0
) -> np.ndarray:
    """Low-frequency gaussian field: sampled on a coarse grid (one sample per
    ``cell`` px), bilinearly upsampled to (h, w)."""
    gh, gw = h // cell + 2, w // cell + 2
    g = rng.normal(0.0, std, size=(gh, gw)).astype(np.float32)
    yi = np.linspace(0.0, gh - 1.001, h, dtype=np.float32)
    xi = np.linspace(0.0, gw - 1.001, w, dtype=np.float32)
    y0 = yi.astype(np.int32)
    x0 = xi.astype(np.int32)
    fy = (yi - y0)[:, None]
    fx = (xi - x0)[None, :]
    g00 = g[y0][:, x0]
    g01 = g[y0][:, x0 + 1]
    g10 = g[y0 + 1][:, x0]
    g11 = g[y0 + 1][:, x0 + 1]
    return g00 * (1 - fy) * (1 - fx) + g01 * (1 - fy) * fx + g10 * fy * (1 - fx) + g11 * fy * fx


def _make_line_text(rng: np.random.Generator, pool: list[int], max_cells: int) -> str:
    """Random words (2-8 chars) joined by single spaces, <= max_cells cells."""
    words: list[str] = []
    used = 0
    while True:
        wlen = int(rng.integers(2, 9))
        need = wlen if not words else wlen + 1
        if used + need > max_cells:
            break
        words.append("".join(chr(pool[int(rng.integers(0, len(pool)))]) for _ in range(wlen)))
        used += need
        if len(words) >= 12:
            break
    if not words:  # always emit at least one word
        words.append("".join(chr(pool[int(rng.integers(0, len(pool)))]) for _ in range(2)))
    return " ".join(words)


def render_document(seed: int, doc_idx: int) -> dict:
    """Render one synthetic document; returns image + ground truth.

    Returns dict with keys: img (HxW uint8), text (GT, reading order),
    lang, base_dir ('L'|'R'), lines (list of dicts with keys text, visual,
    bbox [x0,y0,x1,y1], baseline [[x,y],[x,y]], col, rank), regions
    (list of dicts id/boundary/rank), ink (HxW uint8 golden ink mask).
    """
    rng = doc_rng(seed, doc_idx)
    lang = LANGS[doc_idx % len(LANGS)]
    base_dir = "R" if lang == "ar" else "L"
    pool = _POOLS[lang]
    oversized = rng.random() < 0.01
    w, h = OVERSIZE if oversized else PAGE_SIZE
    ncols = 2 if (not oversized and rng.random() < 0.35) else 1

    usable_w = w - 2 * MARGIN
    if ncols == 2:
        col_w = (usable_w - GUTTER) // 2
        col_x0 = [MARGIN, MARGIN + col_w + GUTTER]
    else:
        col_w = usable_w
        col_x0 = [MARGIN]
    max_cells = (col_w - GLYPH_W) // CELL_W + 1
    max_lines = (h - 2 * MARGIN) // LINE_PITCH
    lo, hi = (60, min(200, max_lines)) if oversized else (8, min(25, max_lines))

    ink = np.zeros((h, w), dtype=np.uint8)
    lines: list[dict] = []
    for col in range(ncols):
        n_lines = int(rng.integers(lo, hi + 1))
        for li in range(n_lines):
            text = _make_line_text(rng, pool, max_cells)
            # visual order: pure-RTL lines are drawn right-to-left
            visual = text[::-1] if base_dir == "R" else text
            x0 = col_x0[col]
            y0 = MARGIN + li * LINE_PITCH
            for k, ch in enumerate(visual):
                if ch == " ":
                    continue
                gx = x0 + k * CELL_W
                ink[y0 : y0 + GLYPH_H, gx : gx + GLYPH_W] |= glyph_ink(ord(ch))
            ncells = len(visual)
            bbox = [x0, y0, x0 + CELL_W * (ncells - 1) + GLYPH_W, y0 + GLYPH_H]
            yb = y0 + GLYPH_H - 1
            lines.append(
                {
                    "text": text,
                    "visual": visual,
                    "bbox": bbox,
                    "baseline": [[bbox[0], yb], [bbox[2] - 1, yb]],
                    "col": col,
                    "line_in_col": li,
                }
            )

    # reading order: columns left->right for LTR, right->left for RTL pages;
    # top-to-bottom within a column (matches polygonal_reading_order semantics,
    # /root/reference/kraken/lib/segmentation.py:845-903)
    col_order = list(range(ncols)) if base_dir == "L" else list(range(ncols))[::-1]
    ordered: list[dict] = []
    for c in col_order:
        ordered.extend(
            sorted((l for l in lines if l["col"] == c), key=lambda l: l["line_in_col"])
        )
    for rank, l in enumerate(ordered):
        l["rank"] = rank

    regions = []
    for ri, c in enumerate(col_order):
        cl = [l for l in lines if l["col"] == c]
        if not cl:
            continue
        x0 = min(l["bbox"][0] for l in cl)
        y0 = min(l["bbox"][1] for l in cl)
        x1 = max(l["bbox"][2] for l in cl)
        y1 = max(l["bbox"][3] for l in cl)
        regions.append(
            {
                "col": c,
                "rank": ri,
                "boundary": [[x0, y0], [x1, y0], [x1, y1], [x0, y1]],
            }
        )

    # background: horizontal+vertical luminance gradient + spatially
    # correlated noise (low-frequency field, bilinearly upsampled) + sparse
    # speckle. Correlated noise matches scanned-page statistics — real pages
    # compress 5-10x with PNG filters, and per-pixel iid noise would make the
    # html payload incompressible, distorting transport-dominated benchmarks.
    gy = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None]
    gx = np.linspace(0.0, 1.0, w, dtype=np.float32)[None, :]
    bg = 205.0 + 45.0 * gx - 35.0 * gy  # 170..250
    noise = _smooth_noise(rng, h, w, cell=16, std=7.0)
    page = bg + noise
    ink_val = 35.0 + 1.3 * noise
    page = np.where(ink.astype(bool), ink_val, page)
    # speckle: sparse light-grey dust dots in the background band. Kept
    # strictly above the binarization threshold so they perturb nlbin's
    # background estimate without surviving into the bitonal mask (the
    # legacy bbox segmenter has no despeckle stage, matching the
    # reference's clean-page assumption, /root/reference/kraken/pageseg.py).
    n_speck = max(1, (h * w) // SPECKLE_DIVISOR) if SPECKLE_DIVISOR else 0
    if n_speck:
        sy = rng.integers(0, h, n_speck)
        sx = rng.integers(0, w, n_speck)
        delta = rng.uniform(-35.0, 35.0, n_speck).astype(np.float32)
        keep = ~ink[sy, sx].astype(bool)  # never on glyph ink
        page[sy[keep], sx[keep]] += delta[keep]
    img = np.clip(page, 0, 255).astype(np.uint8)

    text_gt = "\n".join(l["text"] for l in ordered)
    return {
        "img": img,
        "ink": ink,
        "text": text_gt,
        "lang": lang,
        "base_dir": base_dir,
        "ncols": ncols,
        "oversized": bool(oversized),
        "lines": ordered,
        "regions": regions,
    }


def render_curved_document(seed: int, doc_idx: int) -> dict:
    """Curved-baseline page variant: every line's glyphs follow a sinusoidal
    baseline (per-CELL integer offsets), exercising the polygonal line
    machinery the straight corpus never needs — BLLA polyline baselines
    (/root/reference/kraken/lib/segmentation.py:316-419) and piecewise
    dewarping extraction (the reference's mesh warp,
    lib/segmentation.py:1424-1643). Single column; same GT contract as
    render_document plus 'amplitude'."""
    rng = doc_rng(seed ^ 0x5EED, doc_idx)
    lang = LANGS[doc_idx % len(LANGS)]
    base_dir = "R" if lang == "ar" else "L"
    pool = _POOLS[lang]
    w, h = PAGE_SIZE
    amp = int(rng.integers(4, 9))  # 4..8 px, < line lead so bands stay apart
    wavelen = float(rng.integers(300, 700))
    phase = float(rng.uniform(0, 2 * np.pi))

    usable_w = w - 2 * MARGIN
    max_cells = (usable_w - GLYPH_W) // CELL_W + 1
    pitch = LINE_PITCH + 2 * amp  # keep curved bands separated
    max_lines = (h - 2 * MARGIN) // pitch
    n_lines = int(rng.integers(8, min(20, max_lines) + 1))

    ink = np.zeros((h, w), dtype=np.uint8)
    lines: list[dict] = []
    for li in range(n_lines):
        text = _make_line_text(rng, pool, max_cells)
        visual = text[::-1] if base_dir == "R" else text
        x0 = MARGIN
        y0 = MARGIN + amp + li * pitch
        baseline_pts = []
        for k, ch in enumerate(visual):
            gx = x0 + k * CELL_W
            off = int(round(amp * np.sin(2 * np.pi * (gx - x0) / wavelen + phase)))
            if ch != " ":
                ink[y0 + off : y0 + off + GLYPH_H, gx : gx + GLYPH_W] |= glyph_ink(ord(ch))
            baseline_pts.append([gx, y0 + off + GLYPH_H - 1])
        ncells = len(visual)
        bbox = [x0, y0 - amp, x0 + CELL_W * (ncells - 1) + GLYPH_W, y0 + amp + GLYPH_H]
        lines.append(
            {
                "text": text,
                "visual": visual,
                "bbox": bbox,
                "baseline": baseline_pts,
                "col": 0,
                "line_in_col": li,
                "rank": li,
            }
        )

    gy = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None]
    gx2 = np.linspace(0.0, 1.0, w, dtype=np.float32)[None, :]
    bg = 205.0 + 45.0 * gx2 - 35.0 * gy
    noise = _smooth_noise(rng, h, w, cell=16, std=7.0)
    page = bg + noise
    ink_val = 35.0 + 1.3 * noise
    page = np.where(ink.astype(bool), ink_val, page)
    img = np.clip(page, 0, 255).astype(np.uint8)

    return {
        "img": img,
        "ink": ink,
        "text": "\n".join(l["text"] for l in lines),
        "lang": lang,
        "base_dir": base_dir,
        "ncols": 1,
        "oversized": False,
        "amplitude": amp,
        "lines": lines,
        "regions": [],
    }
