"""Training-time line augmentation — the ketos --augment analog, numpy.

Mirrors the reference's DefaultAugmenter pipeline
(/root/reference/kraken/lib/dataset/recognition.py:55-87, torchvision v2):
with probability 0.5 apply a compose of

* p=0.2  random erasing  (one rectangle of 20% image area, fill 0)
* p=0.2  gaussian blur   (kernel 3 sigma U[0.1,1.0] | kernel 5 U[0.1,2.0])
* p=0.2  deformation     (choice of perspective(distortion 0.2) |
                          rotation(U[-3,3] deg) |
                          affine(translate 4%, scale U[0.9,1.1],
                                 shear U[-3,3] deg)), bilinear, fill 0

on the line tensor (float32 (H, W), ink bright on 0 background — the same
convention as the training patches, so fill 0 extends background exactly
like the reference's fill=0.0). The torch version draws from the global
generator; this twin keys every draw on (AUG_SEED, step, line_key) so the
distributed gradient is partitioning-independent and bit-reproducible
(the same pattern as rec_pretrain's mask RNG). All warps share one
inverse-homography bilinear sampler; the blur is the torchvision
fixed-window formula (truncated gaussian normalized over the window),
not scipy's truncate-4 tail.
"""

from __future__ import annotations

import numpy as np

AUG_SEED = 886001  # disjoint from all train/eval corpus seeds (88xxxx map)

P_ANY = 0.5
P_EACH = 0.2


def rng_for(step: int, line_key: int) -> np.random.Generator:
    """Per-(step, line) generator — identity-keyed, partition-independent."""
    return np.random.Generator(np.random.PCG64([AUG_SEED, step, line_key]))


# ------------------------------------------------------------- components
def random_erase(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """torchvision RandomErasing(scale=(0.2, 0.2), ratio=(0.3, 3.3),
    value=0): one rectangle of exactly 20% image area, log-uniform aspect,
    up to 10 placement attempts."""
    h, w = img.shape
    area = 0.2 * h * w
    out = img
    for _ in range(10):
        log_ratio = rng.uniform(np.log(0.3), np.log(3.3))
        eh = int(round(np.sqrt(area * np.exp(log_ratio))))
        ew = int(round(np.sqrt(area / np.exp(log_ratio))))
        if eh < 1 or ew < 1 or eh > h or ew > w:
            continue
        y = int(rng.integers(0, h - eh + 1))
        x = int(rng.integers(0, w - ew + 1))
        out = img.copy()
        out[y: y + eh, x: x + ew] = 0.0
        break
    return out


def _blur_kernel(k: int, sigma: float) -> np.ndarray:
    """torchvision GaussianBlur kernel: exp(-x^2/2s^2) over the fixed
    window, normalized (no tail truncation beyond the window)."""
    x = np.arange(k, dtype=np.float64) - (k - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float64)


def gaussian_blur(img: np.ndarray, k: int, sigma: float) -> np.ndarray:
    """Separable window-k blur with reflect padding (torchvision pads
    reflect before conv2d)."""
    g = _blur_kernel(k, sigma)
    r = k // 2
    p = np.pad(img.astype(np.float64), r, mode="reflect")
    # horizontal then vertical taps
    out = np.zeros_like(p)
    for i, gi in enumerate(g):
        out[:, r:-r or None] += gi * p[:, i: i + img.shape[1]]
    out2 = np.zeros((img.shape[0], img.shape[1]), dtype=np.float64)
    for i, gi in enumerate(g):
        out2 += gi * out[i: i + img.shape[0], r:-r or None]
    return out2.astype(np.float32)


def warp_homography(img: np.ndarray, Hm: np.ndarray) -> np.ndarray:
    """Inverse-map bilinear warp: output (y, x) samples input at
    Hm^-1 @ (x, y, 1); out-of-bounds fills 0 (background)."""
    h, w = img.shape
    inv = np.linalg.inv(Hm)
    ys, xs = np.mgrid[0:h, 0:w]
    ones = np.ones_like(xs)
    pts = np.stack([xs.ravel(), ys.ravel(), ones.ravel()]).astype(np.float64)
    src = inv @ pts
    sx = src[0] / src[2]
    sy = src[1] / src[2]
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0
    out = np.zeros(h * w, dtype=np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            out[valid] += wgt[valid] * img[yi[valid], xi[valid]]
    return out.reshape(h, w).astype(np.float32)


def _homography_from_points(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3x3 homography mapping 4 src points onto 4 dst points (DLT, the
    standard 8x8 linear solve)."""
    A = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros(8, dtype=np.float64)
    for i, ((x, y), (u, v)) in enumerate(zip(src, dst)):
        A[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        A[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    hv = np.linalg.solve(A, b)
    return np.array([[hv[0], hv[1], hv[2]],
                     [hv[3], hv[4], hv[5]],
                     [hv[6], hv[7], 1.0]])


def _rotation_h(h: int, w: int, deg: float) -> np.ndarray:
    t = np.deg2rad(deg)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    c, s = np.cos(t), np.sin(t)
    T0 = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1.0]])
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    T1 = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1.0]])
    return T1 @ R @ T0


def _affine_h(h: int, w: int, tx: float, ty: float, scale: float,
              shear_deg: float) -> np.ndarray:
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    sh = np.tan(np.deg2rad(shear_deg))
    T0 = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1.0]])
    M = np.array([[scale, scale * sh, 0], [0, scale, 0], [0, 0, 1.0]])
    T1 = np.array([[1, 0, cx + tx], [0, 1, cy + ty], [0, 0, 1.0]])
    return T1 @ M @ T0


def _perspective_h(h: int, w: int, rng: np.random.Generator,
                   distortion: float = 0.2) -> np.ndarray:
    """torchvision RandomPerspective: each corner moves inward by an
    independent U[0, distortion * half-extent] displacement."""
    dx = distortion * w / 2.0
    dy = distortion * h / 2.0
    src = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                   dtype=np.float64)
    sign = np.array([[1, 1], [-1, 1], [-1, -1], [1, -1]], dtype=np.float64)
    disp = np.stack([rng.uniform(0, dx, 4), rng.uniform(0, dy, 4)], axis=1)
    return _homography_from_points(src, src + sign * disp)


# --------------------------------------------------------------- pipeline
def augment_line(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """One draw of the DefaultAugmenter pipeline. Draw order is fixed
    (gate, erase-gate, blur-gate, deform-gate, then the taken branches'
    parameters) so a key reproduces the exact same tensor anywhere."""
    if rng.random() >= P_ANY:
        return img
    do_erase = rng.random() < P_EACH
    do_blur = rng.random() < P_EACH
    do_deform = rng.random() < P_EACH
    out = img
    if do_erase:
        out = random_erase(out, rng)
    if do_blur:
        if rng.integers(0, 2) == 0:
            out = gaussian_blur(out, 3, float(rng.uniform(0.1, 1.0)))
        else:
            out = gaussian_blur(out, 5, float(rng.uniform(0.1, 2.0)))
    if do_deform:
        h, w = out.shape
        kind = int(rng.integers(0, 3))
        if kind == 0:
            Hm = _perspective_h(h, w, rng)
        elif kind == 1:
            Hm = _rotation_h(h, w, float(rng.uniform(-3.0, 3.0)))
        else:
            Hm = _affine_h(h, w,
                           float(rng.uniform(-0.04, 0.04)) * w,
                           float(rng.uniform(-0.04, 0.04)) * h,
                           float(rng.uniform(0.9, 1.1)),
                           float(rng.uniform(-3.0, 3.0)))
        out = warp_homography(out, Hm)
    return np.clip(out, 0.0, 1.0).astype(np.float32)


# ------------------------------------------------------- seg augmentation
def _warp_joint(x: np.ndarray, tb: np.ndarray, tr: np.ndarray,
                Hm: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One homography applied to input (bilinear) and both target maps
    (bilinear then 0.5-threshold — the nearest-ish mask semantics of
    torchvision's tv_tensors.Mask path)."""
    return (warp_homography(x, Hm),
            (warp_homography(tb, Hm) >= 0.5).astype(tb.dtype),
            (warp_homography(tr, Hm) >= 0.5).astype(tr.dtype))


def augment_seg(x: np.ndarray, tb: np.ndarray, tr: np.ndarray,
                rng: np.random.Generator
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """SegmentationAugmenter analog (reference lib/dataset/
    segmentation.py:50-82): with p=0.5 apply [blur p=0.2 (input only),
    affine p=0.2 (degrees U[-45,45], translate 6.25%, scale U[0.8,1.2],
    shear U[-5,5] — input and targets under ONE shared homography),
    perspective p=0.2 (distortion 0.2, shared)]. The reference's color
    jitter (p=0.3) acts on grayscale photos; this engine's seg input is
    the pooled bitonal ink mask, so that branch's gate is drawn (keeping
    the stream aligned with the reference's transform order) but is a
    no-op. Draws keyed like augment_line -> partitioning-independent."""
    if rng.random() >= P_ANY:
        return x, tb, tr
    do_blur = rng.random() < P_EACH
    do_affine = rng.random() < P_EACH
    do_persp = rng.random() < P_EACH
    rng.random()  # the color-jitter gate: drawn, no-op on bitonal input
    h, w = x.shape
    if do_blur:
        if rng.integers(0, 2) == 0:
            x = gaussian_blur(x, 3, float(rng.uniform(0.1, 1.0)))
        else:
            x = gaussian_blur(x, 5, float(rng.uniform(0.1, 2.0)))
    if do_affine:
        Hm = (_affine_h(h, w,
                        float(rng.uniform(-0.0625, 0.0625)) * w,
                        float(rng.uniform(-0.0625, 0.0625)) * h,
                        float(rng.uniform(0.8, 1.2)),
                        float(rng.uniform(-5.0, 5.0)))
              @ _rotation_h(h, w, float(rng.uniform(-45.0, 45.0))))
        x, tb, tr = _warp_joint(x, tb, tr, Hm)
    if do_persp:
        x, tb, tr = _warp_joint(x, tb, tr, _perspective_h(h, w, rng))
    return np.clip(x, 0.0, 1.0), tb, tr
