"""Trained-model line recognition with reference-exact preprocessing.

Reproduces the reference's rpred pipeline (/root/reference/kraken/rpred.py)
for models loaded by kernels/modelio.py, byte-for-byte against the golden
predictions of tests/test_rpred.py:352-366:

- bbox lines (``_recognize_box_line``): crop -> ImageInputTransforms with
  valid_norm=True, which for a (1, H>1, 0, 1) input spec means
  CenterNormalizer dewarp (lib/dataset/utils.py:98-104 + lib/lineest.py)
  instead of plain resize. The dewarped image is FLOAT; torchvision's
  ToDtype(scale=True) does not rescale float inputs, so the network sees
  0..255-range values (a reference quirk replicated here).
- baseline lines (``_recognize_baseline_line``): legacy or new polygon
  extraction chosen by the model's ``legacy_polygons`` flag
  (rpred.py:332-341; extractor lib/segmentation.py:1471-1549) ->
  Lanczos fixed-height resize (valid_norm=False) -> uint8 path, scaled
  to 0..1.
- both: pad 16 white columns, invert (max - x), forward, softmax, greedy
  CTC decode (lib/ctc_decoder.py greedy_decoder), codec decode, and BiDi
  logical reordering via get_display (containers.py:547-605).
"""

from __future__ import annotations

import numpy as np

from .bidi import get_display
from .codec import Codec
from .ctc import greedy_decoder
from .modelio import KrakenModelBundle
from .torchvgsl import TorchVGSL, dewarp_line, fixed_resize


class LoadedRecognizer:
    """TorchSeqRecognizer analog bound to a loaded KrakenModelBundle."""

    def __init__(self, bundle: KrakenModelBundle):
        self.bundle = bundle
        self.net = TorchVGSL(bundle.vgsl, bundle.weights)
        self.codec = Codec(bundle.codec)
        self.height = self.net.height

    # -- transforms ---------------------------------------------------------
    def _finish(self, ts: np.ndarray, pad: int, bidi_reordering=True, box_w: int | None = None) -> dict:
        """pad/invert/forward/decode shared tail. ts: (H, W) float32 in its
        path's native scale (0..255 for the dewarp path, 0..1 for uint8).
        With box_w set, cuts are scaled from network frames back to crop
        pixel x-spans (rpred.py:293-311 net_scale/in_scale + _scale_val)."""
        if pad:
            fill = 255.0 if ts.max() > 1.0 else 1.0
            ts = np.pad(ts, ((0, 0), (pad, pad)), constant_values=fill)
        ts = ts.max() - ts  # tensor_invert
        if ts.max() == ts.min():
            return {"prediction": "", "cuts": [], "confidences": []}
        probs = self.net.forward(ts.astype(np.float32))  # (W', classes)
        decoded = greedy_decoder(probs)
        chars = self.codec.decode(decoded)
        pred = "".join(c[0] for c in chars)
        cuts = [(c[1], c[2]) for c in chars]
        confs = [c[3] for c in chars]
        if box_w is not None and cuts:
            net_scale = ts.shape[1] / probs.shape[0]
            in_scale = box_w / (ts.shape[1] - 2 * pad)

            def scale_val(v):
                return int(round(min(max((v * net_scale - pad) * in_scale, 0), box_w - 1)))

            cuts = [(scale_val(a), scale_val(b)) for a, b in cuts]
        if bidi_reordering:
            base = bidi_reordering if bidi_reordering in ("L", "R") else None
            pred, order = get_display(pred, base)
            cuts = [cuts[i] for i in order]
            confs = [confs[i] for i in order]
        return {"prediction": pred, "cuts": cuts, "confidences": confs}

    # -- bbox path ----------------------------------------------------------
    def recognize_bbox(
        self, img: np.ndarray, bbox, pad: int = 16, bidi_reordering=True, scale_cuts: bool = False
    ) -> dict:
        """img: full-page grayscale uint8 (H, W); bbox: [x0, y0, x1, y1]
        exclusive like PIL crop. valid_norm=True path. scale_cuts maps
        character cuts from network frames to crop-pixel x-spans."""
        x0, y0, x1, y1 = bbox
        if x0 < 0 or y0 < 0 or x1 > img.shape[1] or y1 > img.shape[0] or x1 <= x0 or y1 <= y0:
            return {"prediction": "", "cuts": [], "confidences": []}
        crop = img[y0:y1, x0:x1]
        ts = dewarp_line(crop, self.height)  # float32 0..255
        # ImageInputTransforms re-applies the mode transform after the
        # dewarp (utils.py:139-141): PIL F->L truncates to uint8; the
        # subsequent ToDtype(scale=True) then scales the uint8 to 0..1.
        ts = np.clip(ts, 0, 255).astype(np.uint8).astype(np.float32) / 255.0
        return self._finish(ts, pad, bidi_reordering, box_w=(x1 - x0) if scale_cuts else None)

    # -- baseline path ------------------------------------------------------
    def recognize_baseline(
        self,
        img: np.ndarray,
        baseline,
        boundary,
        pad: int = 16,
        bidi_reordering=True,
        legacy: bool | None = None,
        scale_cuts: bool = False,
    ) -> dict:
        """img: full-page grayscale uint8; baseline [[x,y],...]; boundary
        polygon [[x,y],...]. valid_norm=False path (Lanczos resize)."""
        if legacy is None:
            legacy = self.bundle.legacy_polygons
        pl = np.asarray(boundary)
        bl = np.asarray(baseline, dtype=np.float64)
        h, w = img.shape
        if (pl < 0).any() or pl[:, 0].max() >= w or pl[:, 1].max() >= h:
            return {"prediction": "", "cuts": [], "confidences": []}
        if (bl < 0).any() or bl[:, 0].max() >= w or bl[:, 1].max() >= h:
            return {"prediction": "", "cuts": [], "confidences": []}
        patch = extract_polygon_legacy(img, bl, pl) if legacy else extract_polygon_new(img, bl, pl)
        if patch.size == 0:
            return {"prediction": "", "cuts": [], "confidences": []}
        # extract_polygons yields i.crop(i.getbbox()) — trim all-zero borders
        nzr = np.nonzero(patch.any(axis=1))[0]
        nzc = np.nonzero(patch.any(axis=0))[0]
        if len(nzr) == 0 or len(nzc) == 0:
            return {"prediction": "", "cuts": [], "confidences": []}
        patch = patch[nzr[0] : nzr[-1] + 1, nzc[0] : nzc[-1] + 1]
        resized = fixed_resize(patch, (self.height, 0))  # uint8
        ts = resized.astype(np.float32) / 255.0  # ToDtype(scale=True) on uint8
        return self._finish(
            ts, pad, bidi_reordering, box_w=patch.shape[1] if scale_cuts else None
        )


def _polygon_mask_pil(poly: np.ndarray, h: int, w: int) -> np.ndarray:
    """ImageDraw.polygon(outline=1, fill=1) lookalike: integer-scanline
    even-odd fill with INCLUSIVE edges plus the Bresenham outline — PIL
    includes boundary pixels, unlike the engine's pixel-center rasterizer
    (lineextract.polygon_mask), and the legacy extractor's golden parity
    depends on the full-cover mask."""
    mask = np.zeros((h, w), dtype=bool)
    pts = np.asarray(poly, dtype=np.float64)
    n = len(pts)
    for y in range(h):
        xs = []
        for i in range(n):
            x1, y1 = pts[i]
            x2, y2 = pts[(i + 1) % n]
            if y1 == y2:
                continue
            ylo, yhi = (y1, y2) if y1 < y2 else (y2, y1)
            if ylo <= y < yhi:
                xs.append(x1 + (y - y1) * (x2 - x1) / (y2 - y1))
        xs.sort()
        for k in range(0, len(xs) - 1, 2):
            a = max(0, int(np.ceil(xs[k])))
            b = min(w - 1, int(np.floor(xs[k + 1])))
            if b >= a:
                mask[y, a : b + 1] = True
    # outline (Bresenham-ish via dense sampling of each edge)
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        steps = int(max(abs(x2 - x1), abs(y2 - y1))) + 1
        xs = np.rint(np.linspace(x1, x2, steps)).astype(np.int64)
        ys = np.rint(np.linspace(y1, y2, steps)).astype(np.int64)
        ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
        mask[ys[ok], xs[ok]] = True
    return mask


def extract_polygon_legacy(img: np.ndarray, baseline: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Legacy extractor, straight-baseline fast path
    (lib/segmentation.py:1471-1492): crop the polygon's bbox, zero outside
    the polygon, rotate by the baseline angle. Curved baselines fall back
    to the piecewise dewarp analog (the reference's piecewise-affine warp,
    segmentation.py:1494-1549) shared with the engine's own curved path."""
    c_min, c_max = int(poly[:, 0].min()), int(poly[:, 0].max())
    r_min, r_max = int(poly[:, 1].min()), int(poly[:, 1].max())
    patch = img[r_min : r_max + 1, c_min : c_max + 1].astype(np.uint8).copy()
    off = poly - (c_min, r_min)
    mask = _polygon_mask_pil(off, patch.shape[0], patch.shape[1])
    patch[~mask] = 0
    if len(baseline) == 2:
        d = np.diff(baseline.T)
        lengths = np.linalg.norm(d, axis=0)
        p_dir = np.mean(d * lengths / lengths.sum(), axis=1)
        p_dir = p_dir / np.sqrt(np.sum(p_dir**2))
        angle = float(np.arctan2(p_dir[1], p_dir[0]))
        if abs(angle) < 1e-9:
            return patch
        return _rotate_nearest(patch, angle)
    # curved: piecewise dewarp analog over the masked patch
    from .lineextract import extract_line_dewarped

    line = {
        "baseline": [[int(x - c_min), int(y - r_min)] for x, y in baseline],
        "boundary": [[int(x - c_min), int(y - r_min)] for x, y in poly],
        "bbox": [0, 0, patch.shape[1], patch.shape[0]],
    }
    strip, _ = extract_line_dewarped(patch, line)
    return strip


def extract_polygon_new(img: np.ndarray, baseline: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Non-legacy extractor fast path (segmentation.py:1551-1643): same
    bbox crop + rotation but masking to the dilated polygon with WHITE
    background (the new path composites onto the line's median background;
    white for the bitonal corpus)."""
    c_min, c_max = int(poly[:, 0].min()), int(poly[:, 0].max())
    r_min, r_max = int(poly[:, 1].min()), int(poly[:, 1].max())
    patch = img[r_min : r_max + 1, c_min : c_max + 1].astype(np.uint8).copy()
    off = poly - (c_min, r_min)
    mask = _polygon_mask_pil(off, patch.shape[0], patch.shape[1])
    bg = int(np.median(patch[mask])) if mask.any() else 255
    patch[~mask] = bg
    if len(baseline) == 2:
        d = np.diff(baseline.T)
        lengths = np.linalg.norm(d, axis=0)
        p_dir = np.mean(d * lengths / lengths.sum(), axis=1)
        p_dir = p_dir / np.sqrt(np.sum(p_dir**2))
        angle = float(np.arctan2(p_dir[1], p_dir[0]))
        if abs(angle) < 1e-9:
            return patch
        return _rotate_nearest(patch, angle, cval=bg)
    from .lineextract import extract_line_dewarped

    line = {
        "baseline": [[int(x - c_min), int(y - r_min)] for x, y in baseline],
        "boundary": [[int(x - c_min), int(y - r_min)] for x, y in poly],
        "bbox": [0, 0, patch.shape[1], patch.shape[0]],
    }
    strip, _ = extract_line_dewarped(patch, line)
    return strip


def _rotate_nearest(patch: np.ndarray, angle: float, cval: int = 0) -> np.ndarray:
    """segmentation.py _rotate (:452-515) geometry: output canvas fits the
    rotated corners; nearest-neighbor inverse warp (order=0, the mode the
    legacy extractor uses for bitonal input)."""
    rows, cols = patch.shape
    ca, sa = np.cos(angle), np.sin(angle)
    # inverse rotation of the corners (tform.inverse in the reference)
    inv = np.array([[ca, sa], [-sa, ca]])
    corners = np.array([[0, 0], [0, rows - 1], [cols - 1, rows - 1], [cols - 1, 0]], dtype=np.float64)
    icorners = corners @ inv.T
    minc, minr = icorners[:, 0].min(), icorners[:, 1].min()
    maxc, maxr = icorners[:, 0].max(), icorners[:, 1].max()
    out_shape = (int(np.around(maxr - minr + 1)), int(np.around(maxc - minc + 1)))
    # dst -> src mapping: src = R(angle) @ dst + t, t = R(angle) @ (minc, minr)
    fwd = np.array([[ca, -sa], [sa, ca]])
    t = fwd @ np.array([minc, minr])
    ys, xs = np.mgrid[0 : out_shape[0], 0 : out_shape[1]]
    src = np.stack([xs, ys], axis=-1) @ fwd.T + t
    sx = np.rint(src[..., 0]).astype(np.int64)
    sy = np.rint(src[..., 1]).astype(np.int64)
    valid = (sx >= 0) & (sx < cols) & (sy >= 0) & (sy < rows)
    out = np.full(out_shape, cval, dtype=patch.dtype)
    out[valid] = patch[sy[valid], sx[valid]]
    return out
