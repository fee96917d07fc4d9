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

    def __init__(self, bundle: KrakenModelBundle,
                 temperature: float = 1.0):
        self.bundle = bundle
        self.net = TorchVGSL(bundle.vgsl, bundle.weights)
        self.codec = Codec(bundle.codec)
        self.height = self.net.height
        # the kraken ocr -t/--temperature knob: softmax(z/T) equals
        # p^(1/T) renormalized, so probability-space scaling is EXACT
        # logit-temperature semantics; argmax (and thus the prediction)
        # is invariant — only confidences sharpen (T<1) or flatten (T>1)
        self.temperature = float(temperature)

    # -- transforms ---------------------------------------------------------
    def _prep_net_input(self, ts: np.ndarray, pad: int) -> np.ndarray | None:
        """pad + invert a prepared line tensor into the network input; None
        for constant (blank) lines, which emit empty records."""
        if pad:
            fill = 255.0 if ts.max() > 1.0 else 1.0
            ts = np.pad(ts, ((0, 0), (pad, pad)), constant_values=fill)
        ts = ts.max() - ts  # tensor_invert
        if ts.max() == ts.min():
            return None
        return ts.astype(np.float32)

    def _decode_probs(self, probs: np.ndarray, ts_w: int, pad: int,
                      bidi_reordering=True, box_w: int | None = None) -> dict:
        """softmax-probs -> record: temperature, greedy CTC, codec decode,
        cut scaling (rpred.py:293-311), BiDi reorder."""
        if self.temperature != 1.0:
            probs = probs ** (1.0 / self.temperature)
            probs = probs / probs.sum(axis=1, keepdims=True)
        decoded = greedy_decoder(probs)
        chars = self.codec.decode(decoded)
        pred = "".join(c[0] for c in chars)
        cuts = [(c[1], c[2]) for c in chars]
        confs = [c[3] for c in chars]
        if box_w is not None and cuts:
            net_scale = ts_w / probs.shape[0]
            in_scale = box_w / (ts_w - 2 * pad)

            def scale_val(v):
                return int(round(min(max((v * net_scale - pad) * in_scale, 0), box_w - 1)))

            cuts = [(scale_val(a), scale_val(b)) for a, b in cuts]
        if bidi_reordering:
            base = bidi_reordering if bidi_reordering in ("L", "R") else None
            pred, order = get_display(pred, base)
            cuts = [cuts[i] for i in order]
            confs = [confs[i] for i in order]
        return {"prediction": pred, "cuts": cuts, "confidences": confs}

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
        if self.temperature != 1.0:
            probs = probs ** (1.0 / self.temperature)
            probs = probs / probs.sum(axis=1, keepdims=True)
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

    # -- batched path -------------------------------------------------------
    #
    # The prep of each path is split at its CROP point: the page-local half
    # (bounds guard + rectangular crop — needs the full page image) and the
    # crop-local half (dewarp / polygon mask / Lanczos resize — touches only
    # pixels inside the crop: extract_polygon_legacy/new slice exactly the
    # polygon's bbox and every warp tap outside the patch reads cval, so
    # translating baseline/boundary into crop coordinates is EXACT). The
    # line-parallel plan (pipeline_lines.py) ships the raw crop + local
    # geometry and runs the crop-local half in the line-salted stage, so a
    # many-line page's per-line prep cost parallelizes with its forwards.
    def _prep_bbox_u8_from_crop(self, crop: np.ndarray, box_w: int):
        """Crop-local half of _prep_bbox_u8: dewarp + the PIL F->L uint8
        truncation (utils.py:139-141). crop is the already-guarded bbox
        slice; box_w its original width."""
        ts = dewarp_line(crop, self.height)
        return np.clip(ts, 0, 255).astype(np.uint8), box_w

    def _prep_bbox_u8(self, img: np.ndarray, bbox):
        """recognize_bbox's line prep up to its EXACT uint8 quantization
    point (the PIL F->L truncation after the dewarp, utils.py:139-141);
    returns (u8 line image, box_w) or None. The uint8 stage is the
    transport form for the line-parallel plan (pipeline_lines.py): u8
    -> float32/255 reproduces _prep_bbox bit-for-bit by construction."""
        x0, y0, x1, y1 = bbox
        if x0 < 0 or y0 < 0 or x1 > img.shape[1] or y1 > img.shape[0] or x1 <= x0 or y1 <= y0:
            return None
        crop = img[y0:y1, x0:x1]
        return self._prep_bbox_u8_from_crop(crop, x1 - x0)

    def _prep_bbox(self, img: np.ndarray, bbox):
        """Line-tensor prep of recognize_bbox without the forward; returns
        (ts, box_w) or None for out-of-bounds boxes."""
        r = self._prep_bbox_u8(img, bbox)
        if r is None:
            return None
        return r[0].astype(np.float32) / 255.0, r[1]

    def _baseline_crop(self, img: np.ndarray, baseline, boundary):
        """Page-local half of _prep_baseline_u8: the bounds guard (against
        the FULL page dims, like recognize_baseline) + the polygon-bbox
        crop. Returns (crop, bl_local, poly_local) or None for
        out-of-bounds lines. bl_local/poly_local are the inputs translated
        by the crop origin — extract_polygon_legacy/new over
        (crop, locals) computes the identical patch (it slices exactly the
        polygon bbox and offsets the polygon by the same origin)."""
        pl = np.asarray(boundary)
        bl = np.asarray(baseline, dtype=np.float64)
        h, w = img.shape
        if (pl < 0).any() or pl[:, 0].max() >= w or pl[:, 1].max() >= h:
            return None
        if (bl < 0).any() or bl[:, 0].max() >= w or bl[:, 1].max() >= h:
            return None
        c_min, r_min = int(pl[:, 0].min()), int(pl[:, 1].min())
        c_max, r_max = int(pl[:, 0].max()), int(pl[:, 1].max())
        crop = img[r_min : r_max + 1, c_min : c_max + 1]
        return crop, bl - (c_min, r_min), pl - (c_min, r_min)

    def _prep_baseline_u8_from_crop(self, crop: np.ndarray, bl_local,
                                    poly_local, legacy: bool | None = None):
        """Crop-local half of _prep_baseline_u8: polygon extraction over
        the crop + border trim + Lanczos fixed-height resize. Returns
        (u8, box_w) or None for blank lines."""
        if legacy is None:
            legacy = self.bundle.legacy_polygons
        patch = (
            extract_polygon_legacy(crop, bl_local, poly_local)
            if legacy
            else extract_polygon_new(crop, bl_local, poly_local)
        )
        if patch.size == 0:
            return None
        nzr = np.nonzero(patch.any(axis=1))[0]
        nzc = np.nonzero(patch.any(axis=0))[0]
        if len(nzr) == 0 or len(nzc) == 0:
            return None
        patch = patch[nzr[0] : nzr[-1] + 1, nzc[0] : nzc[-1] + 1]
        resized = fixed_resize(patch, (self.height, 0))
        return resized, patch.shape[1]

    def _prep_baseline_u8(self, img: np.ndarray, baseline, boundary,
                          legacy: bool | None = None):
        """recognize_baseline's line prep up to its uint8 stage (the
        Lanczos fixed_resize output IS uint8); returns (u8, box_w) or
        None. Same transport contract as _prep_bbox_u8. Composed of the
        page-local crop + the crop-local extraction halves above (the
        line-parallel plan runs the halves in different stages)."""
        r = self._baseline_crop(img, baseline, boundary)
        if r is None:
            return None
        return self._prep_baseline_u8_from_crop(*r, legacy=legacy)

    def _prep_baseline(self, img: np.ndarray, baseline, boundary,
                       legacy: bool | None = None):
        """Line-tensor prep of recognize_baseline without the forward;
        returns (ts, box_w) or None for invalid/blank lines."""
        r = self._prep_baseline_u8(img, baseline, boundary, legacy)
        if r is None:
            return None
        return r[0].astype(np.float32) / 255.0, r[1]

    def recognize_lines(
        self,
        img: np.ndarray,
        lines: list[dict],
        pad: int = 16,
        bidi_reordering=True,
        scale_cuts: bool = False,
        legacy: bool | None = None,
        batch_size: int = 32,
    ) -> list[dict]:
        """Cross-line batched recognition over one page — the analog of the
        reference's queue batching (lib/vgsl/rpred.py:100-124). Each line
        dict carries either 'bbox' or 'baseline'+'boundary' (bbox is used
        when the model's seg_type is bbox or no baseline is present, like
        stages.extract_document). Per-line tensor prep and decode are the
        exact recognize_bbox/recognize_baseline code paths; the network
        forward runs width-bucketed through TorchVGSL.forward_batch, which
        turns the per-timestep batch-1 GEMVs of the recurrence into GEMMs.
        Results are returned in input order and match the per-line API."""
        empty = {"prediction": "", "cuts": [], "confidences": []}
        preps: list[tuple | None] = []
        for ln in lines:
            if self.bundle.seg_type == "bbox" or not ln.get("baseline"):
                bx = [
                    max(0, ln["bbox"][0]),
                    max(0, ln["bbox"][1]),
                    min(img.shape[1], ln["bbox"][2]),
                    min(img.shape[0], ln["bbox"][3]),
                ]
                preps.append(self._prep_bbox(img, bx))
            else:
                preps.append(
                    self._prep_baseline(img, ln["baseline"], ln["boundary"], legacy)
                )
        # pad+invert per line; constant (blank) tensors emit empty records
        inputs: list[tuple[int, np.ndarray, int, int]] = []
        for i, p in enumerate(preps):
            if p is None:
                continue
            ts, box_w = p
            net_in = self._prep_net_input(ts, pad)
            if net_in is None:
                continue
            inputs.append((i, net_in, net_in.shape[1], box_w))
        results: dict[int, dict] = {}
        # width buckets: sort by padded width so each forward_batch chunk
        # pads to a near-uniform length (wasted frames bounded per chunk)
        inputs.sort(key=lambda t: t[2])
        for s in range(0, len(inputs), batch_size):
            chunk = inputs[s : s + batch_size]
            probs_list = self.net.forward_batch([c[1] for c in chunk])
            for (i, net_in, ts_w, box_w), probs in zip(chunk, probs_list):
                results[i] = self._decode_probs(
                    probs, ts_w, pad, bidi_reordering,
                    box_w=box_w if scale_cuts else None,
                )
        return [results.get(i, dict(empty)) for i in range(len(lines))]


def _polygon_mask_pil(poly: np.ndarray, h: int, w: int) -> np.ndarray:
    """ImageDraw.polygon(outline=1, fill=1) lookalike: integer-scanline
    even-odd fill with INCLUSIVE edges plus the Bresenham outline — PIL
    includes boundary pixels, unlike the engine's pixel-center rasterizer
    (lineextract.polygon_mask), and the legacy extractor's golden parity
    depends on the full-cover mask."""
    mask = np.zeros((h, w), dtype=bool)
    pts = np.asarray(poly, dtype=np.float64)
    n = len(pts)
    # vectorized exact scanline: each non-horizontal edge crosses a given
    # row at most once; the (edges x rows) crossing matrix sorted per row
    # reproduces the per-row sorted crossing list of the scalar loop
    # (same elementwise arithmetic, same multiset -> same pairs)
    x1 = pts[:, 0]
    y1 = pts[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    keep = y1 != y2
    if keep.any():
        ex1, ey1, ex2, ey2 = x1[keep], y1[keep], x2[keep], y2[keep]
        ylo = np.minimum(ey1, ey2)
        yhi = np.maximum(ey1, ey2)
        ys = np.arange(h, dtype=np.float64)
        active = (ylo[:, None] <= ys[None, :]) & (ys[None, :] < yhi[:, None])
        xc = ex1[:, None] + (ys[None, :] - ey1[:, None]) * (ex2 - ex1)[:, None] / (ey2 - ey1)[:, None]
        xc = np.where(active, xc, np.inf)  # inactive sorts last
        xs = np.sort(xc, axis=0)  # (E, h)
        cols = np.arange(w)
        for k in range(0, xs.shape[0] - 1, 2):
            hi = xs[k + 1]
            pair = np.isfinite(hi)
            if not pair.any():
                break
            a = np.maximum(0, np.where(pair, np.ceil(xs[k]), w)).astype(np.int64)
            b = np.minimum(w - 1, np.floor(np.where(pair, hi, -1.0))).astype(np.int64)
            mask |= (cols[None, :] >= a[:, None]) & (cols[None, :] <= b[:, None])
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
    # curved: bevelled-envelope quad mesh warp (the analog of the legacy
    # path's piecewise-affine Delaunay warp, segmentation.py:1494-1549)
    return curved_line_dewarp(
        patch, baseline - (c_min, r_min), poly - (c_min, r_min), order=1, cval=0.0
    )


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
    # curved: the reference's non-legacy curved branch — projected
    # destination extents + bevelled envelope + quad mesh warp
    # (segmentation.py:1573-1628), background-composited
    return curved_line_dewarp(
        patch, baseline - (c_min, r_min), poly - (c_min, r_min), order=1, cval=float(bg)
    )


def _bevelled_envelope(baseline: np.ndarray, bl_start, out_shape):
    """Source/target envelope point pairs for the curved-line quad warp —
    port of the reference's _bevelled_warping_envelope
    (lib/segmentation.py:1334-1394): per-vertex bezier bevels between
    segment normals, producing (top, bottom) point columns along the line."""
    env_dy = [-bl_start[1], out_shape[0] - bl_start[1]]
    diff = np.diff(baseline, axis=0)
    norms = np.linalg.norm(diff, axis=1)
    dn = diff / norms[:, None]
    cum = np.concatenate([[0.0], np.cumsum(norms)])
    seg_normals = np.stack([-dn[:, 1], dn[:, 0]], axis=1)

    def it(p):
        return (int(p[0]), int(p[1]))

    ini = baseline[0] - dn[0] * bl_start[0]
    src = [it(ini + env_dy[0] * seg_normals[0]), it(ini + env_dy[1] * seg_normals[0])]
    tgt = [(0, 0), (0, out_shape[0])]
    max_bevel = out_shape[0] / 3
    step = max_bevel / 2
    for k in range(len(baseline) - 2):
        pt = baseline[k + 1]
        seg_prev = baseline[k] - pt
        seg_next = baseline[k + 2] - pt
        bev_prev = seg_prev / max(2.0, np.linalg.norm(seg_prev) / max_bevel)
        bev_next = seg_next / max(2.0, np.linalg.norm(seg_next) / max_bevel)
        nsteps = max(1, int(np.round((np.linalg.norm(bev_prev) + np.linalg.norm(bev_next)) / step)))
        lp, ln = np.linalg.norm(bev_prev), np.linalg.norm(bev_next)
        for i in range(nsteps + 1):
            t = i / nsteps
            tpt = pt + (1 - t) ** 2 * bev_prev + t**2 * bev_next
            tx = bl_start[0] + cum[k + 1] - (1 - t) ** 2 * lp + t**2 * ln
            tn = (1 - t) * seg_normals[k] + t * seg_normals[k + 1]
            tn = tn / np.linalg.norm(tn)
            sp = [it(tpt + env_dy[0] * tn), it(tpt + env_dy[1] * tn)]
            tp = [(int(tx), 0), (int(tx), out_shape[0])]
            if sp[0] == src[-2] or sp[1] == src[-1] or tp[0] == tgt[-2]:
                continue
            src += sp
            tgt += tp
    end = baseline[-1] + dn[-1] * (out_shape[1] - cum[-1] - bl_start[0])
    src += [it(end + env_dy[0] * seg_normals[-1]), it(end + env_dy[1] * seg_normals[-1])]
    tgt += [(out_shape[1], 0), (out_shape[1], out_shape[0])]
    return src, tgt


def _quad_mesh_warp(patch: np.ndarray, src_env, tgt_env, out_shape, order: int = 1, cval: float = 0.0) -> np.ndarray:
    """PIL Image.MESH transform analog over (target box, source quad)
    pairs (segmentation.py:1618-1628): each vertical target slab samples a
    bilinear source quad (NW, SW, SE, NE); order 0 = nearest, 1 =
    bilinear; taps outside the patch read cval."""
    h, w = patch.shape
    out = np.full(out_shape, cval, dtype=np.float64)
    pf = patch.astype(np.float64)
    ys = np.arange(out_shape[0], dtype=np.float64)
    for i in range(0, len(src_env) - 3, 2):
        x0, _ = tgt_env[i]
        x1, y1t = tgt_env[i + 3]
        if x1 <= x0:
            continue
        nw, sw, se, ne = (
            np.asarray(src_env[i], dtype=np.float64),
            np.asarray(src_env[i + 1], dtype=np.float64),
            np.asarray(src_env[i + 3], dtype=np.float64),
            np.asarray(src_env[i + 2], dtype=np.float64),
        )
        xs = np.arange(max(x0, 0), min(x1, out_shape[1]), dtype=np.float64)
        if len(xs) == 0:
            continue
        u = ((xs - x0) / (x1 - x0))[None, :]
        v = (ys / max(y1t, 1))[:, None]
        sx = (1 - u) * (1 - v) * nw[0] + u * (1 - v) * ne[0] + (1 - u) * v * sw[0] + u * v * se[0]
        sy = (1 - u) * (1 - v) * nw[1] + u * (1 - v) * ne[1] + (1 - u) * v * sw[1] + u * v * se[1]
        if order == 0:
            ix = np.rint(sx).astype(np.int64)
            iy = np.rint(sy).astype(np.int64)
            valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            vals = np.where(valid, pf[np.clip(iy, 0, h - 1), np.clip(ix, 0, w - 1)], cval)
        else:
            fx = np.floor(sx)
            fy = np.floor(sy)
            ax = sx - fx
            ay = sy - fy
            ix = fx.astype(np.int64)
            iy = fy.astype(np.int64)

            def tap(dy, dx):
                yy = iy + dy
                xx = ix + dx
                ok = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
                return np.where(ok, pf[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)], cval)

            vals = (
                tap(0, 0) * (1 - ax) * (1 - ay)
                + tap(0, 1) * ax * (1 - ay)
                + tap(1, 0) * (1 - ax) * ay
                + tap(1, 1) * ax * ay
            )
        out[:, int(max(x0, 0)) : int(max(x0, 0)) + len(xs)] = vals
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def curved_line_dewarp(patch: np.ndarray, baseline: np.ndarray, poly: np.ndarray, order: int = 1, cval: float = 0.0) -> np.ndarray:
    """Curved-baseline line straightening — the reference's non-legacy
    curved branch (segmentation.py:1573-1628): polygon points projected
    onto their nearest baseline segment give the rectified destination
    extents; the bevelled envelope + quad mesh warp resamples the patch
    onto a straight-baseline strip. baseline/poly are patch-local."""
    bl = np.asarray(baseline, dtype=np.float64)
    fp = np.asarray(poly, dtype=np.float64)
    diff = np.diff(bl, axis=0)
    norms = np.linalg.norm(diff, axis=1)
    if (norms == 0).any():
        keep = np.concatenate([[True], norms > 0])
        bl = bl[keep]
        diff = np.diff(bl, axis=0)
        norms = np.linalg.norm(diff, axis=1)
    if len(bl) < 2:
        return patch
    dn = diff / norms[:, None]
    cum = np.concatenate([[0.0], np.cumsum(norms)])
    pb = fp[None, :, :] - bl[:-1, None, :]
    x = np.einsum("kpm,km->kp", pb, dn)
    segdist = np.maximum(-x, x - norms[:, None])
    closest = np.argmin(segdist, axis=0)
    idx = np.arange(len(fp))
    x_c = x[closest, idx]
    d_c = pb[closest, idx]
    y_c = np.cross(dn[closest], d_c)
    dst = np.stack([cum[closest] + x_c, y_c], axis=1) + bl[0]
    c0, c1 = int(dst[:, 0].min()), int(dst[:, 0].max())
    r0, r1 = int(dst[:, 1].min()), int(dst[:, 1].max())
    out_shape = (r1 - r0 + 1, c1 - c0 + 1)
    bl_dst0 = (bl[0][0] + 0.0 - c0, bl[0][1] + 0.0 - r0)
    src_env, tgt_env = _bevelled_envelope(bl, bl_dst0, out_shape)
    return _quad_mesh_warp(patch, src_env, tgt_env, out_shape, order=order, cval=cval)


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


def resolve_tag(tags: dict | None, default: str = "default") -> str:
    """Line-type tag resolution (reference rpred.py:47-54, _get_type):
    tags carry {'type': [{'type': <tag>}, ...]}; absent/None pieces fall
    back to 'default'."""
    if tags is None:
        return default
    head = tags.get("type", [{"type": default}])[0]
    return head.get("type") or default


class MultiModelDispatcher:
    """mm_rpred parity (reference rpred.py:57-341): per-line tag-keyed
    model routing over a segmentation, with tags_ignore (matching lines
    yield empty records without touching a model), defaultdict fallback
    (unknown tags resolve to the factory model), and the reference's two
    failure modes — a plain mapping missing a model for a present tag, and
    untagged input with no default mapping — both raising ValueError.

    ``nets`` maps tag -> LoadedRecognizer; pass a collections.defaultdict
    for fallback semantics, exactly like the reference API. ``seg`` is a
    dict: {'type': 'bbox'|'baselines', 'script_detection': bool,
    'lines': [...]}, each line {'id', 'tags', and 'bbox' or
    'baseline'+'boundary'}.
    """

    def __init__(self, nets, im, seg, pad: int = 16, bidi_reordering=True,
                 tags_ignore=None, no_legacy_polygons: bool = False):
        from collections import defaultdict

        self.nets = nets
        self.im = im
        self.seg = seg
        self.pad = pad
        self.bidi_reordering = bidi_reordering
        self.no_legacy_polygons = no_legacy_polygons
        self.tags_ignore = list(tags_ignore or [])
        self.have_tags = bool(seg.get("script_detection"))
        self._is_dd = isinstance(nets, defaultdict)

        active = set()
        if self.have_tags:
            tags = {resolve_tag(ln.get("tags")) for ln in seg["lines"]}
            missing = {t for t in tags
                       if not self._is_dd and not nets.get(t)
                       and t not in self.tags_ignore}
            if missing:
                raise ValueError(f"missing models for tags {missing}")
            active = tags - set(self.tags_ignore)
        if not self._is_dd and not active:
            raise ValueError(
                "no tags in input data and no default model in mapping")

    def _model_for(self, tags):
        tag = resolve_tag(tags) if tags is not None else None
        if tag in self.nets:
            return tag, self.nets[tag]
        if self._is_dd:
            return tag or "default", self.nets.default_factory()
        raise ValueError(f"no model for type {tag}")

    def __iter__(self):
        for ln in self.seg["lines"]:
            if self.have_tags and self.tags_ignore and \
                    resolve_tag(ln.get("tags")) in self.tags_ignore:
                yield {"id": ln.get("id"), "tag": resolve_tag(ln.get("tags")),
                       "model": None, "prediction": "", "cuts": [],
                       "confidences": []}
                continue
            tag, net = self._model_for(ln.get("tags"))
            if self.seg["type"] == "bbox":
                r = net.recognize_bbox(self.im, ln["bbox"], pad=self.pad,
                                       bidi_reordering=self.bidi_reordering)
            else:
                # legacy-extractor choice per model metadata, overridable
                # by no_legacy_polygons (rpred.py:343-353)
                legacy = net.bundle.legacy_polygons and                     not self.no_legacy_polygons
                r = net.recognize_baseline(
                    self.im, ln["baseline"], ln["boundary"], pad=self.pad,
                    bidi_reordering=self.bidi_reordering, legacy=legacy)
            yield dict(r, id=ln.get("id"), tag=tag, model=net)


def _aligned_record(recognizer, ts, text, pad, box_w, base_dir=None):
    """Shared tail of forced alignment: viterbi-align the display-order
    text against the prepared line tensor's activations and build a
    display-order record dict (reference align.py:85-130)."""
    from .align import ctc_viterbi_align
    from .bidi import get_display

    do_text, _ = get_display(text, base_dir if base_dir in ("L", "R") else None)
    labels = recognizer.codec.encode(do_text)
    if not labels:
        raise ValueError(f"text {text!r} encodes to an empty label sequence")
    if pad:
        fill = 255.0 if ts.max() > 1.0 else 1.0
        ts = np.pad(ts, ((0, 0), (pad, pad)), constant_values=fill)
    ts = ts.max() - ts
    if ts.max() == ts.min():
        return {"prediction": "", "cuts": [], "confidences": [],
                "display_order": True}
    probs = recognizer.net.forward(ts.astype(np.float32))
    if probs.shape[0] < 2 * len(labels):
        # reference: log a warning, emit an empty record (align.py:111-115)
        return {"prediction": "", "cuts": [], "confidences": [],
                "display_order": True}
    ali = ctc_viterbi_align(probs, list(labels))
    if ali is None:
        raise ValueError(f"could not align {text!r}")
    net_scale = ts.shape[1] / probs.shape[0]
    in_scale = box_w / (ts.shape[1] - 2 * pad)

    def scale_val(v):
        return int(round(min(max((v * net_scale - pad) * in_scale, 0),
                             box_w - 1)))

    cuts = [(scale_val(f0), scale_val(f1)) for _, f0, f1, _ in ali]
    confs = [float(p) for _, _, _, p in ali]
    n = min(len(do_text), len(cuts))
    return {"prediction": do_text[:n], "cuts": cuts[:n],
            "confidences": confs[:n], "display_order": True}


def align_baseline(recognizer, img, baseline, boundary, text, pad: int = 16,
                   base_dir=None, legacy: bool | None = None) -> dict:
    """Forced alignment of ground-truth text to a baseline line through a
    LOADED trained model (reference align.py forced_align): same line
    preparation as recognition, but the decode step is a CTC viterbi
    alignment of the encoded display-order text. Raises ValueError for
    unencodable text; emits an empty record when the activation sequence
    is too short to carry the labels."""
    if legacy is None:
        legacy = recognizer.bundle.legacy_polygons
    pl = np.asarray(boundary)
    bl = np.asarray(baseline, dtype=np.float64)
    h, w = img.shape
    if (pl < 0).any() or pl[:, 0].max() >= w or pl[:, 1].max() >= h or \
            (bl < 0).any() or bl[:, 0].max() >= w or bl[:, 1].max() >= h:
        return {"prediction": "", "cuts": [], "confidences": [],
                "display_order": True}
    patch = extract_polygon_legacy(img, bl, pl) if legacy \
        else extract_polygon_new(img, bl, pl)
    nzr = np.nonzero(patch.any(axis=1))[0] if patch.size else []
    nzc = np.nonzero(patch.any(axis=0))[0] if patch.size else []
    if len(nzr) == 0 or len(nzc) == 0:
        return {"prediction": "", "cuts": [], "confidences": [],
                "display_order": True}
    patch = patch[nzr[0]: nzr[-1] + 1, nzc[0]: nzc[-1] + 1]
    resized = fixed_resize(patch, (recognizer.height, 0))
    ts = resized.astype(np.float32) / 255.0
    return _aligned_record(recognizer, ts, text, pad, patch.shape[1],
                           base_dir)


def forced_align_segmentation(recognizer, img, seg: dict, pad: int = 16,
                              base_dir=None) -> list[dict]:
    """Reference forced_align over a segmentation dict: one aligned record
    per line, in order; empty input yields an empty list."""
    out = []
    for ln in seg.get("lines", []):
        rec = align_baseline(recognizer, img, ln["baseline"], ln["boundary"],
                             ln.get("text") or "", pad=pad, base_dir=base_dir)
        out.append(dict(rec, id=ln.get("id")))
    return out
