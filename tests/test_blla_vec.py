"""Reference-faithful BLLA vectorization chain (kernels/blla_vec.py — the
port of /root/reference/kraken/lib/segmentation.py:316-449) — kernel unit
tests, numerical-equivalence pins, end-to-end CER, and the documented
divergence between the port and the engine's own 'analog' chain."""

import numpy as np
import pytest

from kraken_spark.kernels import blla, blla_vec, png, render
from kraken_spark.kernels.morph import label
from kraken_spark.stages import extract_document


# ------------------------------------------------------------- sato ridge


def test_sato_ridge_peaks_on_line_center():
    """A horizontal bright bar yields a ridge response that peaks on the
    bar's center row and decays off it; background stays near zero."""
    img = np.zeros((40, 120))
    img[18:22, 10:110] = 1.0
    r = blla_vec.sato_ridge(img)
    mid_cols = r[:, 30:90]
    peak_rows = np.argmax(mid_cols, axis=0)
    assert np.all(np.abs(peak_rows - 19.5) <= 1.5)
    assert r[19, 60] > 10 * r[5, 60] + 1e-12


def test_sato_ridge_no_response_on_flat_interior():
    """Flat image: zero response away from the zero-padded border (the
    reference calls sato with mode='constant', which DOES respond near
    borders — interior is the meaningful region)."""
    r = blla_vec.sato_ridge(np.full((120, 120), 0.7))
    # discrete 2nd-derivative kernels don't sum to exactly zero (same as
    # scipy); response must sit far below the binarization threshold
    assert r[50:70, 50:70].max() < 1e-3


# ------------------------------------------------------------ skeletonize


def test_skeletonize_thick_bar_to_centerline():
    """A 7-px-thick horizontal bar thins to a 1-px-wide connected path
    spanning the bar's full x-extent, inside the original bar."""
    m = np.zeros((30, 100), dtype=bool)
    m[10:17, 5:95] = True
    sk = blla_vec.skeletonize(m)
    assert sk.sum() > 0 and not sk[~m].any()
    # 1-px thick: every column in the interior has exactly one skel pixel
    interior = sk[:, 10:90]
    assert np.all(interior.sum(axis=0) == 1)
    _, n = label(sk, connectivity=2)
    assert n == 1


def test_skeletonize_idempotent():
    m = np.zeros((25, 60), dtype=bool)
    m[8:15, 5:55] = True
    once = blla_vec.skeletonize(m)
    assert np.array_equal(blla_vec.skeletonize(once), once)


# -------------------------------------------------------------- label conn


def test_label_8_vs_4_connectivity():
    """Diagonal touch: one component at connectivity=2, two at 1."""
    m = np.zeros((4, 4), dtype=bool)
    m[0, 0] = m[1, 1] = m[2, 2] = True
    _, n4 = label(m, connectivity=1)
    _, n8 = label(m, connectivity=2)
    assert (n4, n8) == (3, 1)


# ------------------------------------------------------------ MCP connect


def test_mcp_connect_joins_across_one_px_gap():
    """Two colinear skeleton segments separated by a 1-px gap: one front
    claims the gap pixel (frozen, goal_reached==2 semantics), the other
    front's skeleton pixel examines it, and the connection spans both
    segments."""
    sk = np.zeros((9, 40), dtype=bool)
    sk[4, 2:19] = True
    sk[4, 20:38] = True  # gap column 19
    seeds = np.array([[4, 2], [4, 18], [4, 20], [4, 37]])
    paths = blla_vec._mcp_connect(sk, seeds)
    spans = [(p[:, 1].min(), p[:, 1].max()) for p in paths]
    assert any(lo <= 18 and hi >= 20 for lo, hi in spans), spans


def test_mcp_connect_does_not_bridge_wide_gap():
    """A 3-px gap cannot be crossed: each front freezes after ONE
    off-skeleton pixel, frozen pixels never expand, so the fronts never
    examine each other across the gap."""
    sk = np.zeros((9, 40), dtype=bool)
    sk[4, 2:17] = True
    sk[4, 20:38] = True  # gap columns 17..19
    seeds = np.array([[4, 2], [4, 16], [4, 20], [4, 37]])
    paths = blla_vec._mcp_connect(sk, seeds)
    for p in paths:
        lo, hi = p[:, 1].min(), p[:, 1].max()
        assert not (lo < 17 and hi >= 20), (lo, hi)


# -------------------------------------------------------- boundary tracing


def test_boundary_tracing_rectangle():
    """Moore tracing of a filled rectangle visits exactly the perimeter
    pixels, in full-map coordinates."""
    m = np.zeros((20, 30), dtype=bool)
    m[5:12, 8:22] = True
    b = blla_vec.boundary_tracing(m[5:12, 8:22], (5, 8))
    bset = {tuple(map(int, p)) for p in b}
    perim = {
        (r, c)
        for r in range(5, 12)
        for c in range(8, 22)
        if r in (5, 11) or c in (8, 21)
    }
    assert bset == perim


def test_extend_boundaries_pushes_endpoints_to_blob_edge():
    """A baseline strictly inside a blob gets its endpoints extended
    outward along the end tangents to the blob boundary."""
    blob = np.zeros((20, 60), dtype=bool)
    blob[8:13, 5:55] = True
    bl = [[10.0, 15.0], [10.0, 30.0], [10.0, 45.0]]  # (row, col) pairs
    out = blla_vec._extend_boundaries_np([bl], blob)[0]
    assert out[0][1] < 15 and out[-1][1] > 45
    assert out[0][1] >= 4 and out[-1][1] <= 55


# ------------------------------------- integral-image conv1 equivalence


def test_integral_box_conv_matches_direct_conv():
    """compute_segmentation_map_ref evaluates the box-uniform conv1 via
    integral-image sums; must equal the generic im2col _conv2d path."""
    from kraken_spark.kernels.vgsl import _ACT, _conv2d

    rng = np.random.default_rng(42)
    mask = rng.random((128, 256)) > 0.85
    model = blla.build_segmenter_ref()
    got = blla.compute_segmentation_map_ref(mask, model)

    small = blla._pool_or(mask, blla.DOWNSCALE)
    x = small.astype(np.float32)[None]
    a = _ACT["s"](_conv2d(x, model.weights["conv0.w"], model.weights["conv0.b"], (1, 1), "same"))
    want = _ACT["s"](
        _conv2d(a, model.weights["conv1.w"], model.weights["conv1.b"], (1, 1), "same")
    )
    assert np.allclose(got, want, atol=2e-5), float(np.abs(got - want).max())


# ------------------------------------------------------------- end-to-end


def test_blla_ref_extraction_cer_zero_sample():
    """Reference-vectorizer path end-to-end on a seed-diverse page sample:
    byte-identical text (CER 0.0). Full 5-seed x 48-page sweep was run
    offline; the hard cases live in test_cross_seed_hard_cases_exact."""
    for seed, i in ((1234, 0), (1234, 32), (7, 15), (555, 49 % 48), (42, 9)):
        d = render.render_document(seed, i)
        out = extract_document(
            png.encode_png(d["img"]), f"u{seed}_{i}", d["lang"],
            gt_text=d["text"], segmenter="blla_ref",
        )
        assert out["cer"] == 0.0, (seed, i, out["cer"])


# ------------------------------------------------------------- divergence


def test_divergence_analog_bridges_wider_gaps_than_reference():
    """Documented divergence between the two chains on a constructed hard
    heatmap: a baseline ridge interrupted by a 4-px gap (at heatmap
    scale). The REFERENCE chain's MCP join freezes wavefronts after one
    off-skeleton pixel (lib/segmentation.py:293-313 goal_reached==2), so
    a >2-px gap yields TWO baselines. The ANALOG chain's fragment join
    (blla.join_baseline_fragments) bridges gaps up to ~a character width
    using ink evidence, yielding ONE baseline. Neither is wrong — trained
    models emit continuous ridges so the gap regime rarely occurs — but
    the behaviors differ and this pins the difference."""
    h, w = 40, 200
    heat = np.zeros((h, w), dtype=np.float32)
    heat[20:23, 10:90] = 0.9
    heat[20:23, 94:190] = 0.9  # 4-px gap at columns 90..93

    # reference chain on the raw ridge map
    ref_lines = blla_vec.vectorize_lines_ref(
        np.stack([np.zeros_like(heat), np.zeros_like(heat), heat])
    )
    assert len(ref_lines) == 2, [l[:1] for l in ref_lines]

    # analog chain: vectorize + ink-guided fragment join (give it ink
    # everywhere under the ridge so the join is allowed)
    ink = np.zeros((h, w), dtype=bool)
    ink[16:23, 10:190] = True
    frags = blla.vectorize_lines(heat, min_len=8, simplify=False)
    joined = blla.join_baseline_fragments(frags, ink_small=ink)
    assert len(joined) == 1, len(joined)
    xs = [p[0] for p in joined[0]]
    assert min(xs) <= 12 and max(xs) >= 185
