"""Neural reading order: pairwise order MLP + greedy order decoding.

Reimplements the machinery of the reference's neural RO
(/root/reference/kraken/lib/segmentation.py:925-1049, lib/ro/layers.py:21-96)
in pure numpy: per-element features (one-hot class + normalized center/
start/end coordinates, _extract_element_features :925-960), a 2-layer MLP
scoring P(u precedes v) for every ordered pair (ROMLP), and the greedy
order-relation decoder (_greedy_order_decoder :1019-1049).

Since no torch checkpoints exist in this sandbox, `build_order_mlp`
CONSTRUCTS weights that realize the canonical top-to-bottom / left-to-right
comparator exactly (P(u<v) = sigmoid(k·(dy + eps·dx))) — the engine's
deterministic stand-in for a trained RO model, same forward machinery.
"""

from __future__ import annotations

import numpy as np

Box = tuple[int, int, int, int]  # x0, y0, x1, y1

HIDDEN = 16  # hidden width of the trained pairwise MLP (ro_train.py)

_LEARNED_CACHE: list = [None]


def learned_mlp():
    """The in-repo TRAINED reading-order MLP (kernels/ro_train.py, asset
    written by tools/train_ro.py) — the trained replacement for the
    constructed comparator, standing in for the reference's RO checkpoints
    (LFS stubs in this snapshot). None when the asset is absent or
    KRAKEN_SPARK_RO_NET=constructed forces the constructed comparator; any
    other KRAKEN_SPARK_RO_NET value is a PATH to a plain RO weights file
    or a combined segmentation+RO container (the roadd analog,
    ro_train.attach_ro_model) to load instead of the shipped asset."""
    import os

    env = os.environ.get("KRAKEN_SPARK_RO_NET")
    if env == "constructed":
        return None
    if _LEARNED_CACHE[0] is None:
        from .ro_train import load_mlp

        _LEARNED_CACHE[0] = load_mlp(env or None) or False
    return _LEARNED_CACHE[0] or None


def extract_element_features(
    boxes: list[Box], classes: list[int] | None = None, n_classes: int = 2,
    w: int = 1, h: int = 1,
) -> np.ndarray:
    """Per-element feature rows: [one-hot class | cx cy | x0 y0 | x1 y1],
    coordinates normalized by page size (segmentation.py:925-960)."""
    n = len(boxes)
    classes = classes or [0] * n
    feats = np.zeros((n, n_classes + 6), dtype=np.float32)
    for i, ((x0, y0, x1, y1), c) in enumerate(zip(boxes, classes)):
        feats[i, c] = 1.0
        feats[i, n_classes : n_classes + 6] = [
            (x0 + x1) / 2.0 / w,
            (y0 + y1) / 2.0 / h,
            x0 / w,
            y0 / h,
            x1 / w,
            y1 / h,
        ]
    return feats


class OrderMLP:
    """2-layer pairwise MLP: sigmoid(W2·relu(W1·[fu|fv] + b1) + b2)
    (lib/ro/layers.py:21-96, class_mapping-sized input)."""

    def __init__(self, w1: np.ndarray, b1: np.ndarray, w2: np.ndarray, b2: float):
        self.w1, self.b1, self.w2, self.b2 = w1, b1, w2, b2

    def pair_probs(self, feats: np.ndarray) -> np.ndarray:
        """(n, d) features -> (n, n) matrix P[u, v] = P(u precedes v)."""
        n = feats.shape[0]
        fu = np.repeat(feats, n, axis=0)
        fv = np.tile(feats, (n, 1))
        x = np.concatenate([fu, fv], axis=1)
        hdn = np.maximum(x @ self.w1.T + self.b1, 0.0)
        logit = np.clip(hdn @ self.w2 + self.b2, -40.0, 40.0)
        return (1.0 / (1.0 + np.exp(-logit))).reshape(n, n).astype(np.float64)


def build_order_mlp(n_classes: int = 2, k: float = 60.0, eps: float = 0.05) -> OrderMLP:
    """Construct weights realizing sigmoid(k·((cy_v - cy_u) + eps·(cx_v - cx_u)))
    via relu(t) - relu(-t) = t: exact top-to-bottom with left-to-right
    tie-break, through the same MLP forward as a trained model."""
    d = n_classes + 6
    w1 = np.zeros((2, 2 * d), dtype=np.float32)
    cx, cy = n_classes + 0, n_classes + 1
    # t = (cy_v + eps*cx_v) - (cy_u + eps*cx_u)
    w1[0, d + cy] = 1.0
    w1[0, d + cx] = eps
    w1[0, cy] = -1.0
    w1[0, cx] = -eps
    w1[1] = -w1[0]
    b1 = np.zeros(2, dtype=np.float32)
    w2 = np.array([k, -k], dtype=np.float32)
    return OrderMLP(w1, b1, w2, 0.0)


def greedy_order_decode(P: np.ndarray) -> list[int]:
    """Greedy decode of the pairwise order-relation matrix: repeatedly emit
    the element maximizing the sum of 'precedes' probabilities over the
    remaining set (segmentation.py:1019-1049)."""
    n = P.shape[0]
    # vectorized with the scalar loop's exact arithmetic: the diagonal is
    # zeroed (adding 0.0 mid-sequence never changes a sequential sum over
    # the non-negative sigmoid outputs) and cumsum accumulates left-to-
    # right exactly like the per-element python sum; np.argmax returns the
    # first maximum, which over the ascending remaining list is the
    # smallest u — the (sum, -u) tie-break
    Pz = np.array(P, dtype=np.float64, copy=True)
    np.fill_diagonal(Pz, 0.0)
    remaining = np.arange(n)
    order: list[int] = []
    while remaining.size:
        if remaining.size == 1:
            order.append(int(remaining[0]))
            break
        sub = Pz[np.ix_(remaining, remaining)]
        s = np.cumsum(sub, axis=1)[:, -1]
        best = int(np.argmax(s))
        order.append(int(remaining[best]))
        remaining = np.delete(remaining, best)
    return order


def neural_reading_order(
    boxes: list[Box], classes: list[int] | None = None,
    w: int = 1, h: int = 1, mlp: OrderMLP | None = None,
) -> list[int]:
    """Full chain: features -> pairwise MLP -> greedy decode
    (segmentation.py:963-1016). Returns a permutation of element indices."""
    if not boxes:
        return []
    mlp = mlp or learned_mlp() or build_order_mlp()
    feats = extract_element_features(boxes, classes, w=max(w, 1), h=max(h, 1))
    return greedy_order_decode(mlp.pair_probs(feats))


def spearman_footrule(order_a: list[int], order_b: list[int]) -> float:
    """Mean |rank_a - rank_b| (lib/ro/model.py:63-64)."""
    if not order_a:
        return 0.0
    ra = {e: i for i, e in enumerate(order_a)}
    rb = {e: i for i, e in enumerate(order_b)}
    return float(np.mean([abs(ra[e] - rb[e]) for e in ra]))
