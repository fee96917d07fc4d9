"""Debug/QA overlays — the reference's contrib visualization scripts as
pure-numpy kernels (segmentation_overlay.py, heatmap_overlay.py,
forced_alignment_overlay.py in /root/reference/kraken/contrib/): draw a
page's segmentation geometry, a heatmap, or per-character alignment
polygons semi-transparently onto the page image and return an RGB array
(PNG-encodable by kernels/png.py). The reference renders with
PIL/matplotlib; same visual semantics, no image libs."""

from __future__ import annotations

import numpy as np

# fixed palette (RGB): baselines red, line boundaries blue, regions green,
# alignment cuts cycling like the reference's matplotlib tab colors
BASELINE_RGB = (220, 30, 30)
BOUNDARY_RGB = (40, 80, 220)
REGION_RGB = (40, 170, 60)
_CUT_CYCLE = [(220, 30, 30), (40, 80, 220), (40, 170, 60), (230, 160, 20),
              (150, 60, 200), (20, 180, 180)]


def _to_rgb(img: np.ndarray) -> np.ndarray:
    g = np.asarray(img)
    if g.ndim == 3:
        return g.astype(np.float64)
    return np.repeat(g.astype(np.float64)[:, :, None], 3, axis=2)


def _blend(out: np.ndarray, mask: np.ndarray, rgb, alpha: float) -> None:
    for c in range(3):
        ch = out[:, :, c]
        ch[mask] = (1 - alpha) * ch[mask] + alpha * rgb[c]


def _polyline_mask(h: int, w: int, pts, thick: int = 1) -> np.ndarray:
    m = np.zeros((h, w), dtype=bool)
    pts = [p for p in pts if len(p) == 2]
    if len(pts) == 1:
        x, y = int(pts[0][0]), int(pts[0][1])
        if 0 <= y < h and 0 <= x < w:
            m[y, x] = True
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        n = max(abs(int(x1) - int(x0)), abs(int(y1) - int(y0)), 1)
        xs = np.clip(np.linspace(x0, x1, n + 1).round().astype(int), 0, w - 1)
        ys = np.clip(np.linspace(y0, y1, n + 1).round().astype(int), 0, h - 1)
        m[ys, xs] = True
    if thick > 1:
        acc = m.copy()
        for dy in range(-(thick // 2), thick // 2 + 1):
            for dx in range(-(thick // 2), thick // 2 + 1):
                acc |= np.roll(np.roll(m, dy, axis=0), dx, axis=1)
        m = acc
    return m


def _polygon_mask(h: int, w: int, pts) -> np.ndarray:
    """Filled polygon via even-odd scanline (the reference fills boundary
    polygons with a transparent color layer)."""
    m = np.zeros((h, w), dtype=bool)
    pts = [(float(x), float(y)) for x, y in pts if True]
    if len(pts) < 3:
        return m
    ys = [p[1] for p in pts]
    y0, y1 = max(int(min(ys)), 0), min(int(max(ys)) + 1, h)
    for y in range(y0, y1):
        xs = []
        yc = y + 0.5
        for (ax, ay), (bx, by) in zip(pts, pts[1:] + pts[:1]):
            if (ay <= yc) != (by <= yc):
                xs.append(ax + (yc - ay) * (bx - ax) / (by - ay))
        xs.sort()
        for lo, hi in zip(xs[0::2], xs[1::2]):
            m[y, max(int(np.ceil(lo - 0.5)), 0): min(int(hi + 0.5), w)] = True
    return m


def overlay_segmentation(img, seg: dict, alpha: float = 0.4,
                         thick: int = 2) -> np.ndarray:
    """Segmentation overlay (contrib/segmentation_overlay.py semantics):
    region boundaries filled green, line boundaries filled blue, baselines
    stroked red on top; ``seg`` is an extraction/parse dict with
    lines[{baseline, boundary}] and regions[{boundary}]."""
    out = _to_rgb(img)
    h, w = out.shape[:2]
    for r in seg.get("regions", []) or []:
        bnd = r.get("boundary") if isinstance(r, dict) else None
        if bnd:
            _blend(out, _polygon_mask(h, w, bnd), REGION_RGB, alpha * 0.5)
    for l in seg.get("lines", []) or []:
        bnd = l.get("boundary")
        if bnd:
            _blend(out, _polygon_mask(h, w, bnd), BOUNDARY_RGB, alpha * 0.5)
    for l in seg.get("lines", []) or []:
        bl = l.get("baseline")
        if bl:
            _blend(out, _polyline_mask(h, w, bl, thick), BASELINE_RGB, 0.9)
    return np.clip(out.round(), 0, 255).astype(np.uint8)


def overlay_heatmap(img, heatmap: np.ndarray, alpha: float = 0.5
                    ) -> np.ndarray:
    """Heatmap overlay (contrib/heatmap_overlay.py: the raw class heatmap
    alpha-composited over the page): heat rendered red with per-pixel
    opacity = alpha * heat; the heatmap (e.g. the blla baseline class at
    half resolution) is nearest-upsampled to the page size."""
    out = _to_rgb(img)
    h, w = out.shape[:2]
    hm = np.asarray(heatmap, dtype=np.float64)
    ry = max(1, int(round(h / hm.shape[0])))
    rx = max(1, int(round(w / hm.shape[1])))
    up = np.repeat(np.repeat(hm, ry, axis=0), rx, axis=1)[:h, :w]
    if up.shape[0] < h or up.shape[1] < w:
        up = np.pad(up, ((0, h - up.shape[0]), (0, w - up.shape[1])))
    a = np.clip(up, 0.0, 1.0) * alpha
    out[:, :, 0] = (1 - a) * out[:, :, 0] + a * 255.0
    out[:, :, 1] = (1 - a) * out[:, :, 1]
    out[:, :, 2] = (1 - a) * out[:, :, 2]
    return np.clip(out.round(), 0, 255).astype(np.uint8)


def overlay_alignment(img, line: dict, alpha: float = 0.5) -> np.ndarray:
    """Forced-alignment overlay (contrib/forced_alignment_overlay.py:
    per-character cut polygons in cycling colors over the page)."""
    out = _to_rgb(img)
    h, w = out.shape[:2]
    for i, cut in enumerate(line.get("cuts", []) or []):
        if not cut:
            continue
        rgb = _CUT_CYCLE[i % len(_CUT_CYCLE)]
        if len(cut) >= 3 and isinstance(cut[0], (list, tuple)):
            _blend(out, _polygon_mask(h, w, cut), rgb, alpha)
        elif len(cut) == 2 and not isinstance(cut[0], (list, tuple)):
            # span form (x0, x1) over the line bbox
            x0, x1 = int(cut[0]), int(cut[1])
            y0, y1 = int(line["bbox"][1]), int(line["bbox"][3])
            m = np.zeros((h, w), dtype=bool)
            m[max(y0, 0): min(y1 + 1, h), max(x0, 0): min(x1 + 1, w)] = True
            _blend(out, m, rgb, alpha)
    return np.clip(out.round(), 0, 255).astype(np.uint8)


# the reference's recognition_boxes palette: 7 RGBA colors at alpha 127
# (contrib/recognition_boxes.py:19-25), cycled per character box
RECOGNITION_CMAP = [(230, 25, 75), (60, 180, 75), (255, 225, 25),
                    (0, 130, 200), (245, 130, 48), (145, 30, 180),
                    (70, 240, 240)]


def overlay_recognition_boxes(img, lines, alpha: float = 127 / 255) -> np.ndarray:
    """Transparent character-box overlay — contrib/recognition_boxes.py:27-42
    re-derived: for every recognized line, fill each character cut
    rectangle with the next color of the 7-color cycle at alpha 127 and
    src-over composite onto the page (the reference's
    Image.alpha_composite of an RGBA scratch layer; same visual
    semantics in numpy). The cycle runs ACROSS lines like the reference's
    global `cycle(...)` iterator, not per line. Cuts are page-x spans
    (x0, x1) over the line bbox's y extent; polygon cuts fill the
    polygon."""
    out = _to_rgb(img)
    h, w = out.shape[:2]
    ci = 0
    for line in lines:
        for cut in line.get("cuts", []) or []:
            if not cut:
                continue
            rgb = RECOGNITION_CMAP[ci % len(RECOGNITION_CMAP)]
            ci += 1
            if len(cut) >= 3 and isinstance(cut[0], (list, tuple)):
                _blend(out, _polygon_mask(h, w, cut), rgb, alpha)
            elif len(cut) == 2 and not isinstance(cut[0], (list, tuple)):
                x0, x1 = int(cut[0]), int(cut[1])
                y0, y1 = int(line["bbox"][1]), int(line["bbox"][3])
                m = np.zeros((h, w), dtype=bool)
                m[max(y0, 0): min(y1 + 1, h), max(x0, 0): min(x1 + 1, w)] = True
                _blend(out, m, rgb, alpha)
    return np.clip(out.round(), 0, 255).astype(np.uint8)
