"""In-repo CTC training of the VGSL CNN+BiLSTM recognizer — pure numpy.

The reference's training subsystem (ketos: /root/reference/kraken/ketos/
recognition.py + /root/reference/kraken/lib/train.py) fits a VGSL-defined
CNN+BiLSTM CTC recognizer with torch SGD. This module is its from-scratch
numpy analog — hand-written forward/backward for every layer of the
recognition topology (conv+ReLU, 2x2 maxpool, the VGSL `S` height-collapse,
bidirectional LSTM over width, linear head) plus the CTC loss
forward-backward (Graves et al. 2006) and Adam — so the LAST constructed
stand-in (the matched-filter recognizer, kernels/recognizer.py) gains a
trained twin: weights learned from RANDOM init on the synthetic corpus,
shipped as `assets/rec_learned.safetensors` in kraken's own safetensors
model-map layout (written by tools/train_recognizer.py, loadable by
kernels/modelio.load_kraken_model AND by the reference's loader).

Faithfulness contract (what makes the trained model production-real):

* the architecture is a genuine kraken topology expressed in VGSL —
  ``[1,16,0,1 Cr{c0}3,3,16 Mp2,2 Cr{c1}3,3,32 Mp2,2 S1(1x0)1,3
  Lbx{rnn}64 O{out}1c132]`` — and the layer semantics here are the
  torch-exact ones of kernels/torchvgsl.py (same padding, same gate order
  i,f,g,o, same S-reshape dim mapping), pinned by a forward-parity test;
* training examples are produced by the PRODUCTION inference chain
  (render -> nlbin -> blla segmentation -> extract_polygon_new -> trim ->
  Lanczos fixed_resize -> /255 -> pad 16 -> invert), i.e. exactly the
  tensors LoadedRecognizer.recognize_baseline feeds the net
  (kernels/rpred_parity.py), so there is zero train/serve skew;
* batched training uses per-sample valid-width masking after every conv
  and pool so the logits at valid frames are the same function of the
  input as the per-line inference forward (padding columns can never leak
  into valid frames);
* everything is seeded (PCG64; training seeds 883xxx are disjoint from
  every evaluation seed) — retraining reproduces the shipped asset
  bit-for-bit.

Like the other in-repo trainers (seg_train, ro_train, quality_train,
lm_train) this file has zero Spark imports; the distributed data-parallel
face lives in kraken_spark/training.py.
"""

from __future__ import annotations

import os

import numpy as np

from .glyphs import ALPHABET, GLYPH_H

# --------------------------------------------------------------- topology
HEIGHT = 16  # network input height (VGSL fixed-height line images)
PAD = 16  # rpred pad columns either side (rpred.py pad=16 default)
C1 = 16  # conv0 output channels
C2 = 32  # conv1 output channels
HID = 64  # LSTM hidden size per direction
CHARSET = [" "] + [chr(cp) for cp in ALPHABET]  # label i+1 <-> CHARSET[i]
N_CLASSES = 1 + len(CHARSET)  # +1: CTC blank = label 0
CODEC = {ch: [i + 1] for i, ch in enumerate(CHARSET)}
SPEC = (
    f"[1,{HEIGHT},0,1 Cr{{c0}}3,3,{C1} Mp2,2 Cr{{c1}}3,3,{C2} Mp2,2 "
    f"S1(1x0)1,3 Lbx{{rnn}}{HID} O{{out}}1c{N_CLASSES}]"
)
METADATA = {
    # baseline-path recognition with the non-legacy polygon extractor —
    # the modern kraken model flavor (rpred.py:332-341)
    "seg_type": "baseline",
    "legacy_polygons": False,
    "one_channel_mode": "L",
    "trained_by": "kraken_spark/kernels/rec_train.py",
}

ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "rec_learned.safetensors",
)

TRAIN_SEED = 883001  # rendering seed for training pages (disjoint from eval)
VAL_SEED = 883501  # rendering seed for the in-loop validation pages


# --------------------------------------------------------------- init
def init_weights(rng: np.random.Generator, c1: int = C1, c2: int = C2,
                 hid: int = HID, n_classes: int = N_CLASSES,
                 height: int = HEIGHT) -> dict[str, np.ndarray]:
    """torch-style uniform(-1/sqrt(fan_in), +) init, keyed with the exact
    names kernels/torchvgsl.py expects for the SPEC above."""
    feat = (height // 4) * c2  # S1(1x0)1,3 collapse: f = h*C + c

    def u(*shape, fan):
        k = 1.0 / np.sqrt(fan)
        return rng.uniform(-k, k, size=shape).astype(np.float32)

    W = {
        "c0.co.weight": u(c1, 1, 3, 3, fan=9),
        "c0.co.bias": u(c1, fan=9),
        "c1.co.weight": u(c2, c1, 3, 3, fan=9 * c1),
        "c1.co.bias": u(c2, fan=9 * c1),
        "out.lin.weight": u(n_classes, 2 * hid, fan=2 * hid),
        "out.lin.bias": u(n_classes, fan=2 * hid),
    }
    for sfx in ("", "_reverse"):
        W[f"rnn.layer.weight_ih_l0{sfx}"] = u(4 * hid, feat, fan=hid)
        W[f"rnn.layer.weight_hh_l0{sfx}"] = u(4 * hid, hid, fan=hid)
        W[f"rnn.layer.bias_ih_l0{sfx}"] = u(4 * hid, fan=hid)
        W[f"rnn.layer.bias_hh_l0{sfx}"] = u(4 * hid, fan=hid)
    return W


# --------------------------------------------------------------- layers
def _conv3x3_fwd(x: np.ndarray, w: np.ndarray, b: np.ndarray) -> np.ndarray:
    """x: (B,Cin,H,W) -> (B,Cout,H,W); 3x3, stride 1, zero pad 1 — the
    torch Conv2d semantics of torchvgsl._conv2d_torch, batched as nine
    shifted GEMMs (no im2col materialization)."""
    bsz, cin, h, wd = x.shape
    cout = w.shape[0]
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    acc = np.zeros((bsz, cout, h * wd), dtype=x.dtype)
    for ki in range(3):
        for kj in range(3):
            win = np.ascontiguousarray(xp[:, :, ki : ki + h, kj : kj + wd])
            # (O,C) @ (B,C,H*W) -> (B,O,H*W): BLAS batched GEMM
            acc += np.matmul(w[:, :, ki, kj].astype(x.dtype), win.reshape(bsz, cin, -1))
    return acc.reshape(bsz, cout, h, wd) + b.astype(x.dtype)[None, :, None, None]


def _conv3x3_bwd(x: np.ndarray, w: np.ndarray, dy: np.ndarray):
    """Gradients of _conv3x3_fwd: returns (dx, dw, db)."""
    bsz, cin, h, wd = x.shape
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    dxp = np.zeros_like(xp)
    dw = np.zeros_like(w)
    dyf = np.ascontiguousarray(dy).reshape(bsz, dy.shape[1], -1)
    for ki in range(3):
        for kj in range(3):
            win = np.ascontiguousarray(xp[:, :, ki : ki + h, kj : kj + wd])
            dw[:, :, ki, kj] = np.tensordot(dyf, win.reshape(bsz, cin, -1),
                                            axes=([0, 2], [0, 2]))
            # (C,O) @ (B,O,H*W) -> (B,C,H*W)
            dxw = np.matmul(w[:, :, ki, kj].T.astype(dy.dtype), dyf)
            dxp[:, :, ki : ki + h, kj : kj + wd] += dxw.reshape(bsz, cin, h, wd)
    db = dy.sum(axis=(0, 2, 3))
    return dxp[:, :, 1:-1, 1:-1], dw, db


def _pool2x2_fwd(x: np.ndarray):
    """2x2 stride-2 maxpool with floor semantics (odd trailing row/col
    dropped, matching torchvgsl's sliding-window [::2]); returns
    (out, argmax) where argmax indexes the flattened 2x2 window."""
    bsz, c, h, wd = x.shape
    h2, w2 = h // 2, wd // 2
    xr = (
        x[:, :, : 2 * h2, : 2 * w2]
        .reshape(bsz, c, h2, 2, w2, 2)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(bsz, c, h2, w2, 4)
    )
    am = xr.argmax(axis=-1)
    out = np.take_along_axis(xr, am[..., None], axis=-1)[..., 0]
    return out, am


def _pool2x2_bwd(x_shape, am: np.ndarray, dy: np.ndarray) -> np.ndarray:
    bsz, c, h, wd = x_shape
    h2, w2 = h // 2, wd // 2
    dxr = np.zeros((bsz, c, h2, w2, 4), dtype=dy.dtype)
    np.put_along_axis(dxr, am[..., None], dy[..., None], axis=-1)
    dx = np.zeros((bsz, c, h, wd), dtype=dy.dtype)
    dx[:, :, : 2 * h2, : 2 * w2] = (
        dxr.reshape(bsz, c, h2, w2, 2, 2)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(bsz, c, 2 * h2, 2 * w2)
    )
    return dx


def _mask_cols(x: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Zero every column >= the sample's valid width. Applied after every
    conv/pool so a batch-padded column can never leak into a valid frame —
    the valid-frame outputs equal the per-line (unpadded) forward exactly."""
    wd = x.shape[-1]
    mask = (np.arange(wd)[None, :] < widths[:, None]).astype(x.dtype)
    return x * mask[:, None, None, :]


def _sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    e = np.exp(x[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def _lstm_fwd(seq: np.ndarray, wih, whh, bih, bhh):
    """Batched single-direction LSTM over left-aligned sequences.

    seq: (B, T, F) -> hs (B, T, H); torch gate order i,f,g,o (the exact
    recurrence of torchvgsl._lstm_torch). Returns (hs, cache) for BPTT.
    Padded steps run too — they sit AFTER every valid step in this
    direction, so they never influence a valid output."""
    bsz, t, _ = seq.shape
    hid = whh.shape[1]
    dt = seq.dtype
    bias = bih + bhh
    pre_in = seq @ wih.T + bias  # (B, T, 4H)
    hs = np.zeros((bsz, t, hid), dtype=dt)
    ii = np.zeros((bsz, t, hid), dtype=dt)
    ff = np.zeros((bsz, t, hid), dtype=dt)
    gg = np.zeros((bsz, t, hid), dtype=dt)
    oo = np.zeros((bsz, t, hid), dtype=dt)
    cc = np.zeros((bsz, t, hid), dtype=dt)
    h = np.zeros((bsz, hid), dtype=dt)
    c = np.zeros((bsz, hid), dtype=dt)
    for k in range(t):
        pre = pre_in[:, k] + h @ whh.T
        i = _sigmoid(pre[:, :hid])
        f = _sigmoid(pre[:, hid : 2 * hid])
        g = np.tanh(pre[:, 2 * hid : 3 * hid])
        o = _sigmoid(pre[:, 3 * hid :])
        c = f * c + i * g
        h = o * np.tanh(c)
        ii[:, k], ff[:, k], gg[:, k], oo[:, k], cc[:, k] = i, f, g, o, c
        hs[:, k] = h
    return hs, (seq, pre_in, ii, ff, gg, oo, cc, hs)


def _lstm_bwd(cache, wih, whh, dhs: np.ndarray):
    """BPTT through _lstm_fwd. dhs: (B, T, H) upstream gradient on the
    hidden outputs. Returns (dseq, dwih, dwhh, dbih, dbhh)."""
    seq, _pre, ii, ff, gg, oo, cc, hs = cache
    bsz, t, hid = dhs.shape
    dt = dhs.dtype
    dseq = np.zeros_like(seq)
    dwih = np.zeros_like(wih)
    dwhh = np.zeros_like(whh)
    db = np.zeros(4 * hid, dtype=dt)
    dh_next = np.zeros((bsz, hid), dtype=dt)
    dc_next = np.zeros((bsz, hid), dtype=dt)
    for k in range(t - 1, -1, -1):
        dh = dhs[:, k] + dh_next
        i, f, g, o, c = ii[:, k], ff[:, k], gg[:, k], oo[:, k], cc[:, k]
        tc = np.tanh(c)
        do = dh * tc
        dc = dh * o * (1.0 - tc * tc) + dc_next
        c_prev = cc[:, k - 1] if k > 0 else np.zeros_like(c)
        df = dc * c_prev
        di = dc * g
        dg = dc * i
        dc_next = dc * f
        dpre = np.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=1,
        )  # (B, 4H)
        h_prev = hs[:, k - 1] if k > 0 else np.zeros((bsz, hid), dtype=dt)
        dwih += dpre.T @ seq[:, k]
        dwhh += dpre.T @ h_prev
        db += dpre.sum(axis=0)
        dseq[:, k] = dpre @ wih
        dh_next = dpre @ whh
    return dseq, dwih, dwhh, db, db.copy()


def _reverse_seqs(seq: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Per-sample time reversal within each valid length (left-aligned in,
    left-aligned out). The reverse-direction LSTM runs FORWARD over these,
    which is exactly per-line torch reverse=True on the unpadded line."""
    bsz, t, _ = seq.shape
    idx = np.arange(t)[None, :]  # (1, T)
    src = lengths[:, None] - 1 - idx  # (B, T)
    valid = src >= 0
    src = np.where(valid, src, 0)
    out = np.take_along_axis(seq, src[:, :, None], axis=1)
    return out * valid[:, :, None].astype(seq.dtype)


# --------------------------------------------------------------- forward
def forward(x: np.ndarray, widths: np.ndarray, W: dict[str, np.ndarray],
            want_cache: bool = False):
    """Batched training forward.

    x: (B, 1, HEIGHT, Wmax) line tensors (already /255'd, padded, inverted —
    see line_tensor); widths: (B,) valid pixel widths. Returns
    (logits (B, T, K), t_lengths (B,)) and, with want_cache, the backward
    cache. Valid-frame logits are bit-consistent with the per-line
    torchvgsl forward (pinned in tests)."""
    widths = np.asarray(widths, dtype=np.int64)
    a0 = _conv3x3_fwd(x, W["c0.co.weight"], W["c0.co.bias"])
    r0 = np.maximum(a0, 0.0)
    r0 = _mask_cols(r0, widths)
    p0, am0 = _pool2x2_fwd(r0)
    w1 = widths // 2
    p0 = _mask_cols(p0, w1)
    a1 = _conv3x3_fwd(p0, W["c1.co.weight"], W["c1.co.bias"])
    r1 = np.maximum(a1, 0.0)
    r1 = _mask_cols(r1, w1)
    p1, am1 = _pool2x2_fwd(r1)
    w2 = w1 // 2
    p1 = _mask_cols(p1, w2)
    bsz, c2, hh, t = p1.shape
    feat = np.ascontiguousarray(np.transpose(p1, (0, 3, 2, 1))).reshape(
        bsz, t, hh * c2
    )  # f = h*C + c — the S1(1x0)1,3 layout (torchvgsl._reshape_torch)
    hf, cache_f = _lstm_fwd(
        feat,
        W["rnn.layer.weight_ih_l0"], W["rnn.layer.weight_hh_l0"],
        W["rnn.layer.bias_ih_l0"], W["rnn.layer.bias_hh_l0"],
    )
    feat_r = _reverse_seqs(feat, w2)
    hb_rev, cache_b = _lstm_fwd(
        feat_r,
        W["rnn.layer.weight_ih_l0_reverse"], W["rnn.layer.weight_hh_l0_reverse"],
        W["rnn.layer.bias_ih_l0_reverse"], W["rnn.layer.bias_hh_l0_reverse"],
    )
    hb = _reverse_seqs(hb_rev, w2)
    hcat = np.concatenate([hf, hb], axis=2)  # (B, T, 2H)
    logits = hcat @ W["out.lin.weight"].T + W["out.lin.bias"]
    if not want_cache:
        return logits, w2
    cache = (x, widths, a0, r0, am0, p0, a1, r1, am1, p1, feat, w1, w2,
             cache_f, cache_b, hb_rev, hcat)
    return logits, w2, cache


def backward(dlogits: np.ndarray, cache, W: dict[str, np.ndarray]):
    """Gradients for every weight given d(loss)/d(logits) (already zero at
    invalid frames)."""
    (x, widths, a0, r0, am0, p0, a1, r1, am1, p1, feat, w1, w2,
     cache_f, cache_b, hb_rev, hcat) = cache
    hid = W["rnn.layer.weight_hh_l0"].shape[1]
    grads: dict[str, np.ndarray] = {}
    bsz, t, _k = dlogits.shape
    grads["out.lin.weight"] = np.tensordot(dlogits, hcat, axes=([0, 1], [0, 1]))
    grads["out.lin.bias"] = dlogits.sum(axis=(0, 1))
    dhcat = dlogits @ W["out.lin.weight"]
    dhf = dhcat[:, :, :hid]
    dhb = dhcat[:, :, hid:]
    dseq_f, dwih_f, dwhh_f, dbih_f, dbhh_f = _lstm_bwd(
        cache_f, W["rnn.layer.weight_ih_l0"], W["rnn.layer.weight_hh_l0"], dhf
    )
    # un-reverse the upstream grad into the reverse LSTM's own time order
    dhb_rev = _reverse_seqs(dhb, w2)
    dseq_br, dwih_b, dwhh_b, dbih_b, dbhh_b = _lstm_bwd(
        cache_b,
        W["rnn.layer.weight_ih_l0_reverse"], W["rnn.layer.weight_hh_l0_reverse"],
        dhb_rev,
    )
    dseq = dseq_f + _reverse_seqs(dseq_br, w2)
    grads["rnn.layer.weight_ih_l0"] = dwih_f
    grads["rnn.layer.weight_hh_l0"] = dwhh_f
    grads["rnn.layer.bias_ih_l0"] = dbih_f
    grads["rnn.layer.bias_hh_l0"] = dbhh_f
    grads["rnn.layer.weight_ih_l0_reverse"] = dwih_b
    grads["rnn.layer.weight_hh_l0_reverse"] = dwhh_b
    grads["rnn.layer.bias_ih_l0_reverse"] = dbih_b
    grads["rnn.layer.bias_hh_l0_reverse"] = dbhh_b
    bsz, c2, hh, tt = p1.shape
    dp1 = np.ascontiguousarray(
        np.transpose(dseq.reshape(bsz, tt, hh, c2), (0, 3, 2, 1))
    )
    dp1 = _mask_cols(dp1, w2)
    dr1 = _pool2x2_bwd(r1.shape, am1, dp1)
    dr1 = _mask_cols(dr1, w1)
    da1 = dr1 * (a1 > 0)
    dp0, dw1c, db1c = _conv3x3_bwd(p0, W["c1.co.weight"], da1)
    grads["c1.co.weight"] = dw1c
    grads["c1.co.bias"] = db1c
    dp0 = _mask_cols(dp0, w1)
    dr0 = _pool2x2_bwd(r0.shape, am0, dp0)
    dr0 = _mask_cols(dr0, widths)
    da0 = dr0 * (a0 > 0)
    _dx, dw0c, db0c = _conv3x3_bwd(x, W["c0.co.weight"], da0)
    grads["c0.co.weight"] = dw0c
    grads["c0.co.bias"] = db0c
    return grads


# --------------------------------------------------------------- CTC loss
def _log_softmax(logits: np.ndarray) -> np.ndarray:
    m = logits.max(axis=-1, keepdims=True)
    s = logits - m
    return s - np.log(np.exp(s).sum(axis=-1, keepdims=True))


def ctc_loss_grad(logits: np.ndarray, labels: np.ndarray):
    """CTC negative log-likelihood + gradient w.r.t. the (pre-softmax)
    logits for ONE sample. logits: (T, K) float64, labels: (L,) in 1..K-1.
    Log-space forward-backward over the blank-interleaved expansion
    (Graves et al. 2006 §4.1); d(loss)/d(logits) = softmax - posteriors."""
    t_len, k = logits.shape
    lab = np.asarray(labels, dtype=np.int64)
    l_len = len(lab)
    ext = np.zeros(2 * l_len + 1, dtype=np.int64)  # blank, l1, blank, l2, ...
    ext[1::2] = lab
    s = len(ext)
    if t_len < l_len or t_len == 0:
        # unalignable: infinite loss; gradient pushes everything to blank
        return np.inf, np.zeros_like(logits)
    logp = _log_softmax(logits.astype(np.float64))
    lp_ext = logp[:, ext]  # (T, S)
    # allowed skip transitions: s-2 -> s when ext[s] != blank and != ext[s-2]
    skip = np.zeros(s, dtype=bool)
    if s > 2:
        skip[2:] = (ext[2:] != 0) & (ext[2:] != ext[:-2])
    ninf = -np.inf
    alpha = np.full((t_len, s), ninf)
    alpha[0, 0] = lp_ext[0, 0]
    if s > 1:
        alpha[0, 1] = lp_ext[0, 1]
    shift1 = np.empty(s)
    shift2 = np.empty(s)
    for tt in range(1, t_len):
        prev = alpha[tt - 1]
        shift1[0] = ninf
        shift1[1:] = prev[:-1]
        shift2[:2] = ninf
        shift2[2:] = np.where(skip[2:], prev[:-2], ninf)
        alpha[tt] = np.logaddexp(np.logaddexp(prev, shift1), shift2) + lp_ext[tt]
    ll = np.logaddexp(alpha[t_len - 1, s - 1],
                      alpha[t_len - 1, s - 2] if s > 1 else ninf)
    if not np.isfinite(ll):
        return np.inf, np.zeros_like(logits)
    beta = np.full((t_len, s), ninf)
    beta[t_len - 1, s - 1] = lp_ext[t_len - 1, s - 1]
    if s > 1:
        beta[t_len - 1, s - 2] = lp_ext[t_len - 1, s - 2]
    skip_fwd = np.zeros(s, dtype=bool)
    skip_fwd[:-2] = skip[2:]
    for tt in range(t_len - 2, -1, -1):
        nxt = beta[tt + 1]
        shift1[-1] = ninf
        shift1[:-1] = nxt[1:]
        shift2[-2:] = ninf
        shift2[:-2] = np.where(skip_fwd[:-2], nxt[2:], ninf)
        beta[tt] = np.logaddexp(np.logaddexp(nxt, shift1), shift2) + lp_ext[tt]
    # posterior over ext states: gamma = alpha * beta / p(ext_s at t)
    gamma = alpha + beta - lp_ext - ll  # log posteriors; -inf underflows to 0
    post = np.zeros((t_len, k))
    g = np.exp(gamma)
    for si in range(s):
        post[:, ext[si]] += g[:, si]
    dlogits = np.exp(logp) - post
    return float(-ll), dlogits


# --------------------------------------------------------------- data
def encode_text(text: str) -> list[int]:
    return [CODEC[ch][0] for ch in text]


def line_tensor(img: np.ndarray, baseline, boundary,
                height: int = HEIGHT, pad: int = PAD) -> np.ndarray | None:
    """The exact input-tensor prep of LoadedRecognizer.recognize_baseline
    (kernels/rpred_parity.py:95-129, minus the forward): polygon extract ->
    zero-border trim -> Lanczos fixed-height resize -> /255 -> pad 16 ->
    invert. Returns (height, w_full) float32 or None for degenerate lines."""
    from .rpred_parity import extract_polygon_new
    from .torchvgsl import fixed_resize

    pl = np.asarray(boundary)
    bl = np.asarray(baseline, dtype=np.float64)
    h, w = img.shape
    if (pl < 0).any() or pl[:, 0].max() >= w or pl[:, 1].max() >= h:
        return None
    if (bl < 0).any() or bl[:, 0].max() >= w or bl[:, 1].max() >= h:
        return None
    patch = extract_polygon_new(img, bl, pl)
    if patch.size == 0:
        return None
    nzr = np.nonzero(patch.any(axis=1))[0]
    nzc = np.nonzero(patch.any(axis=0))[0]
    if len(nzr) == 0 or len(nzc) == 0:
        return None
    patch = patch[nzr[0] : nzr[-1] + 1, nzc[0] : nzc[-1] + 1]
    resized = fixed_resize(patch, (height, 0))
    ts = resized.astype(np.float32) / 255.0
    if pad:
        ts = np.pad(ts, ((0, 0), (pad, pad)), constant_values=1.0)
    ts = ts.max() - ts
    if ts.max() == ts.min():
        return None
    return ts.astype(np.float32)


def _match_gt_line(seg_line: dict, gt_lines: list[dict]) -> dict | None:
    """Pair a segmented line with its ground-truth line by baseline
    geometry (midpoint x inside the GT bbox, baseline y within the glyph
    band) — segmentation order is NOT assumed."""
    bl = np.asarray(seg_line["baseline"], dtype=np.float64)
    mx = float(bl[:, 0].mean())
    my = float(bl[:, 1].mean())
    best, best_dy = None, 7.0
    for g in gt_lines:
        x0, y0, x1, y1 = g["bbox"]
        if not (x0 - 2 <= mx <= x1 + 2):
            continue
        dy = abs((y0 + GLYPH_H - 1) - my)
        if dy < best_dy:
            best, best_dy = g, dy
    return best


def page_training_lines(seed: int, doc_idx: int,
                        vectorizer: str = "analog") -> list[tuple[np.ndarray, list[int], str]]:
    """Run ONE rendered page through the production chain and return
    (line_tensor, ctc_labels, gt_logical_text) triples. Labels are the
    VISUAL (drawn) order — what the frames actually contain; BiDi
    reordering to logical happens downstream at inference like production."""
    from . import binarize, blla
    from .render import render_document

    d = render_document(seed, doc_idx)
    if d["oversized"]:
        return []
    mask = binarize.nlbin(d["img"])
    td = "horizontal-rl" if d["base_dir"] == "R" else "horizontal-lr"
    seg = blla.segment_blla(
        mask, url=f"train-{seed}-{doc_idx}", text_direction=td,
        vectorizer=vectorizer,
    )
    out = []
    for l in seg["lines"]:
        g = _match_gt_line(l, d["lines"])
        if g is None:
            continue
        ts = line_tensor(d["img"], l["baseline"], l["boundary"])
        if ts is None:
            continue
        out.append((ts, encode_text(g["visual"]), g["text"]))
    return out


def synth_frame_targets(visual: str, t_len: int) -> np.ndarray:
    """Per-frame class targets for a synth_line_samples line — the known
    cell geometry gives an exact CTC alignment for free: frame t's input
    center maps back through (pad, x4 downsample, 16/15 resize) to a source
    column; columns inside a glyph's ink box get the glyph label, the
    middle of a space cell gets the space label, gaps get blank. Used for
    the alignment-pretraining phase that skips the CTC blank plateau (the
    synthetic-GT analog of forced-alignment bootstrapping)."""
    from .glyphs import CELL_W, GLYPH_W

    s = HEIGHT / (GLYPH_H + 1.0)  # patch trims to GLYPH_H+1 rows (boundary row)
    out = np.zeros(t_len, dtype=np.int64)
    for t in range(t_len):
        src = (4.0 * t + 1.5 - PAD) / s
        cell = int(np.floor(src / CELL_W))
        if not (0 <= cell < len(visual)):
            continue
        r = src - CELL_W * cell
        ch = visual[cell]
        if ch == " ":
            if 6.0 <= r < CELL_W - 6.0:
                out[t] = CODEC[" "][0]
        elif r < GLYPH_W:
            out[t] = CODEC[ch][0]
    return out


def synth_line_samples(seed: int, n: int,
                       max_words: int = 4) -> list[tuple[np.ndarray, list[int], str]]:
    """Short single-line pages for the curriculum phase: 1..max_words
    random words per line, drawn/lit exactly like render_document pages
    (same glyph compositor, background gradient + correlated noise + ink
    shading) and prepped through the SAME line_tensor chain. Short label
    sequences break the CTC blank plateau orders of magnitude faster than
    full-width page lines; phase 2 of training then continues on real
    production-chain lines (the standard curriculum trick —
    cf. the reference's progressive schedules in lib/train.py)."""
    from .glyphs import CELL_W, GLYPH_H as GH, GLYPH_W, glyph_ink
    from .render import LANGS, _POOLS, _smooth_noise

    rng = np.random.Generator(np.random.PCG64([seed, 0x51]))
    out: list[tuple[np.ndarray, list[int], str]] = []
    while len(out) < n:
        lang = LANGS[int(rng.integers(0, len(LANGS)))]
        pool = _POOLS[lang]
        words = []
        for _ in range(int(rng.integers(1, max_words + 1))):
            wlen = int(rng.integers(2, 9))
            words.append("".join(chr(pool[int(rng.integers(0, len(pool)))]) for _ in range(wlen)))
        text = " ".join(words)
        visual = text[::-1] if lang == "ar" else text
        ncells = len(visual)
        mx, my = 12, 9  # margins
        w = 2 * mx + CELL_W * (ncells - 1) + GLYPH_W
        h = 2 * my + GH
        ink = np.zeros((h, w), dtype=np.uint8)
        for k, ch in enumerate(visual):
            if ch == " ":
                continue
            gx = mx + k * CELL_W
            ink[my : my + GH, gx : gx + GLYPH_W] |= glyph_ink(ord(ch))
        gy = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None]
        gx2 = np.linspace(0.0, 1.0, w, dtype=np.float32)[None, :]
        bg = 205.0 + 45.0 * gx2 - 35.0 * gy
        noise = _smooth_noise(rng, h, w, cell=16, std=7.0)
        page = np.where(ink.astype(bool), 35.0 + 1.3 * noise, bg + noise)
        img = np.clip(page, 0, 255).astype(np.uint8)
        x1 = mx + CELL_W * (ncells - 1) + GLYPH_W
        baseline = [[mx, my + GH - 1], [x1 - 1, my + GH - 1]]
        boundary = [[mx, my], [x1, my], [x1, my + GH], [mx, my + GH]]
        ts = line_tensor(img, baseline, boundary)
        if ts is None:
            continue
        out.append((ts, encode_text(visual), text))
    return out


def build_dataset(seed: int, n_docs: int) -> list[tuple[np.ndarray, list[int], str]]:
    """Training lines from n_docs pages, alternating the two production
    vectorizer chains so the model is robust to either's geometry."""
    lines: list[tuple[np.ndarray, list[int], str]] = []
    for di in range(n_docs):
        vec = "analog" if di % 2 == 0 else "reference"
        lines.extend(page_training_lines(seed, di, vectorizer=vec))
    return lines


# --------------------------------------------------------------- batching
def make_batch(samples: list[tuple[np.ndarray, list[int], str]]):
    """Pad a list of line tensors to a common width. Returns
    (x (B,1,HEIGHT,Wmax) f32, widths (B,), labels list)."""
    widths = np.array([s[0].shape[1] for s in samples], dtype=np.int64)
    wmax = int(widths.max())
    hgt = samples[0][0].shape[0]
    x = np.zeros((len(samples), 1, hgt, wmax), dtype=np.float32)
    for i, (ts, _lab, _txt) in enumerate(samples):
        x[i, 0, :, : ts.shape[1]] = ts
    return x, widths, [s[1] for s in samples]


def batch_grad_sums(x: np.ndarray, widths: np.ndarray, labels: list[list[int]],
                    W: dict[str, np.ndarray]):
    """Per-sample-SUM CTC loss + gradients for one padded batch (skipping
    unalignable samples). Sum form makes the full-dataset gradient
    independent of batching/partitioning up to float reassociation — the
    property the distributed face (kraken_spark/training.py) relies on.
    Returns (loss_sum, grad_sums, n_used)."""
    logits, t_lens, cache = forward(x, widths, W, want_cache=True)
    dlogits = np.zeros_like(logits)
    total = 0.0
    used = 0
    for i, lab in enumerate(labels):
        tl = int(t_lens[i])
        loss_i, dl = ctc_loss_grad(logits[i, :tl].astype(np.float64), lab)
        if not np.isfinite(loss_i):
            continue
        dlogits[i, :tl] = dl.astype(np.float32)
        total += loss_i
        used += 1
    if used == 0:
        return 0.0, {k: np.zeros_like(v) for k, v in W.items()}, 0
    grads = backward(dlogits, cache, W)
    return total, grads, used


def batch_loss_grads(x: np.ndarray, widths: np.ndarray, labels: list[list[int]],
                     W: dict[str, np.ndarray]):
    """Mean-per-sample CTC loss + gradients for one padded batch. Returns
    (loss, grads, n_used)."""
    total, grads, used = batch_grad_sums(x, widths, labels, W)
    if used == 0:
        return np.inf, grads, 0
    return total / used, {k: g / used for k, g in grads.items()}, used


def dataset_gradient(samples: list[tuple[np.ndarray, list[int], str]],
                     W: dict[str, np.ndarray], batch: int = 16):
    """SUM loss + gradients over a sample list, chunked in the GIVEN order
    (float64 cross-chunk accumulation) — the local twin of the distributed
    spark_gradient: a single-partition Spark run reproduces this
    bit-for-bit. Returns (loss_sum, grad_sums_f64, n_used)."""
    gsum = {k: np.zeros(v.shape, dtype=np.float64) for k, v in W.items()}
    loss_sum = 0.0
    n = 0
    for s0 in range(0, len(samples), batch):
        chunk = samples[s0 : s0 + batch]
        x, widths, labels = make_batch(chunk)
        total, grads, used = batch_grad_sums(x, widths, labels, W)
        if used:
            loss_sum += total
            n += used
            for k, g in grads.items():
                gsum[k] += g.astype(np.float64)
    return loss_sum, gsum, n


def framewise_loss_grads(x: np.ndarray, widths: np.ndarray,
                         frame_targets: list[np.ndarray],
                         W: dict[str, np.ndarray]):
    """Mean cross-entropy over valid frames against known alignments (the
    pretraining objective; CTC takes over once the glyph classifier
    exists). Returns (loss, grads, n_frames)."""
    logits, t_lens, cache = forward(x, widths, W, want_cache=True)
    dlogits = np.zeros_like(logits)
    loss = 0.0
    n = 0
    for i, tgt in enumerate(frame_targets):
        tl = int(t_lens[i])
        tgt = np.asarray(tgt[:tl], dtype=np.int64)
        lp = _log_softmax(logits[i, :tl].astype(np.float64))
        loss += -lp[np.arange(tl), tgt].sum()
        d = np.exp(lp)
        d[np.arange(tl), tgt] -= 1.0
        dlogits[i, :tl] = d.astype(np.float32)
        n += tl
    if n == 0:
        return np.inf, {k: np.zeros_like(v) for k, v in W.items()}, 0
    dlogits /= n
    grads = backward(dlogits, cache, W)
    return loss / n, grads, n


# --------------------------------------------------------------- optimizer
def clip_grads(grads: dict[str, np.ndarray], max_norm: float = 5.0) -> dict[str, np.ndarray]:
    """Global-norm gradient clipping — CTC produces occasional huge spikes
    when a sample's alignment flips (the torch loop clips too)."""
    tot = 0.0
    for g in grads.values():
        tot += float(np.sum(g.astype(np.float64) ** 2))
    norm = np.sqrt(tot)
    if norm <= max_norm or norm == 0.0:
        return grads
    scale = np.float32(max_norm / norm)
    return {k: g * scale for k, g in grads.items()}


class Adam:
    def __init__(self, W: dict[str, np.ndarray], lr: float = 2e-3,
                 b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.m = {k: np.zeros_like(v) for k, v in W.items()}
        self.v = {k: np.zeros_like(v) for k, v in W.items()}
        self.t = 0

    def step(self, W: dict[str, np.ndarray], grads: dict[str, np.ndarray],
             lr: float | None = None) -> None:
        self.t += 1
        lr = self.lr if lr is None else lr
        bc1 = 1.0 - self.b1**self.t
        bc2 = 1.0 - self.b2**self.t
        for k, g in grads.items():
            self.m[k] = self.b1 * self.m[k] + (1 - self.b1) * g
            self.v[k] = self.b2 * self.v[k] + (1 - self.b2) * g * g
            W[k] = (
                W[k]
                - lr * (self.m[k] / bc1) / (np.sqrt(self.v[k] / bc2) + self.eps)
            ).astype(np.float32)


# --------------------------------------------------------------- decode/eval
def greedy_text(logits: np.ndarray) -> str:
    """argmax-collapse decode of one sample's valid-frame logits to the
    VISUAL string (training-side monitor; production decoding goes through
    kernels/ctc.greedy_decoder + Codec)."""
    lab = logits.argmax(axis=1)
    out = []
    prev = 0
    for v in lab:
        if v != 0 and v != prev:
            out.append(CHARSET[v - 1])
        prev = v
    return "".join(out)


def eval_visual_accuracy(W: dict[str, np.ndarray],
                         samples: list[tuple[np.ndarray, list[int], str]],
                         batch: int = 32) -> tuple[int, int]:
    """(n_exact, n_total) greedy visual-string matches on a sample list."""
    order = sorted(range(len(samples)), key=lambda i: samples[i][0].shape[1])
    good = 0
    for s0 in range(0, len(order), batch):
        chunk = [samples[i] for i in order[s0 : s0 + batch]]
        x, widths, labels = make_batch(chunk)
        logits, t_lens = forward(x, widths, W)
        for i, lab in enumerate(labels):
            pred = greedy_text(logits[i, : int(t_lens[i])])
            want = "".join(CHARSET[v - 1] for v in lab)
            good += int(pred == want)
    return good, len(samples)


# --------------------------------------------------------------- training
def train(steps: int = 3000, batch: int = 16, seed: int = 883101,
          n_docs: int = 120, lr: float = 2e-3, log_every: int = 0,
          dataset: list | None = None,
          val: list | None = None) -> dict[str, np.ndarray]:
    """Single-phase CTC training from random init (the building block;
    the shipped asset uses train_full's three-phase curriculum).
    Deterministic: dataset rendering is per-(seed, doc) PCG64, batch
    selection is PCG64(seed), every float op is numpy on a fixed thread
    count."""
    rng = np.random.Generator(np.random.PCG64(seed))
    W = init_weights(rng)
    if dataset is None:
        dataset = build_dataset(TRAIN_SEED, n_docs)
    if not dataset:
        raise ValueError("empty training dataset")
    _ctc_phase(W, Adam(W, lr=lr), dataset, rng, steps, batch, lr,
               decay=True, log_every=log_every, val=val)
    return W


def _ctc_phase(W, opt: Adam, dataset, rng, steps: int, batch: int, lr: float,
               decay: bool, log_every: int = 0, val=None, tag: str = "ctc",
               clip: float = 5.0) -> None:
    order = sorted(range(len(dataset)), key=lambda i: dataset[i][0].shape[1])
    n = len(order)
    for step in range(steps):
        start = int(rng.integers(0, max(1, n - batch + 1)))
        chunk = [dataset[i] for i in order[start : start + batch]]
        x, widths, labels = make_batch(chunk)
        cur_lr = lr
        if decay:  # cosine to 10% stabilizes the endgame
            frac = step / max(1, steps - 1)
            cur_lr = lr * (0.1 + 0.9 * 0.5 * (1.0 + np.cos(np.pi * frac)))
        loss, grads, used = batch_loss_grads(x, widths, labels, W)
        if used:
            opt.step(W, clip_grads(grads, clip), lr=cur_lr)
        if log_every and (step % log_every == 0 or step == steps - 1):
            msg = f"[{tag}] step {step:5d} loss {loss:9.4f} lr {cur_lr:.5f}"
            if val:
                g, tot = eval_visual_accuracy(W, val)
                msg += f" val {g}/{tot}"
            print(msg, flush=True)


def _framewise_phase(W, opt: Adam, dataset, rng, steps: int, batch: int,
                     lr: float, log_every: int = 0, tag: str = "warm",
                     clip: float = 5.0) -> None:
    """Alignment pretraining on synth lines whose exact frame targets are
    known from the cell geometry (synth_frame_targets) — skips the CTC
    blank plateau that otherwise costs ~10x the steps."""
    order = sorted(range(len(dataset)), key=lambda i: dataset[i][0].shape[1])
    n = len(order)
    for step in range(steps):
        start = int(rng.integers(0, max(1, n - batch + 1)))
        chunk = [dataset[i] for i in order[start : start + batch]]
        x, widths, labels = make_batch(chunk)
        fts = []
        for ts, lab, _txt in chunk:
            t_len = (ts.shape[1] // 2) // 2
            visual = "".join(CHARSET[v - 1] for v in lab)
            fts.append(synth_frame_targets(visual, t_len))
        warm = min(1.0, (step + 1) / 100.0)
        loss, grads, n_fr = framewise_loss_grads(x, widths, fts, W)
        if n_fr:
            opt.step(W, clip_grads(grads, clip), lr=lr * warm)
        if log_every and (step % log_every == 0 or step == steps - 1):
            print(f"[{tag}] step {step:5d} ce {loss:8.4f}", flush=True)


def mine_misses(W: dict[str, np.ndarray], samples, batch: int = 32):
    """Deterministic hard-example mining: run the batched training forward
    over the pool (width-sorted with stable ties — pool order matters for
    bit-reproducibility) and return the samples whose greedy decode differs
    from the label."""
    order = sorted(range(len(samples)), key=lambda i: samples[i][0].shape[1])
    bad = []
    for s0 in range(0, len(order), batch):
        chunk = [samples[i] for i in order[s0 : s0 + batch]]
        x, widths, labels = make_batch(chunk)
        logits, tl = forward(x, widths, W)
        for i, lab in enumerate(labels):
            pred = greedy_text(logits[i, : int(tl[i])])
            want = "".join(CHARSET[v - 1] for v in lab)
            if pred != want:
                bad.append(chunk[i])
    return bad


def train_full(seed: int = 883101,
               n_synth: int = 2400, max_words: int = 3,
               n_docs: int = 160,
               steps_warm: int = 1600, steps_synth: int = 900,
               steps_real: int = 3200, batch: int = 16,
               mine_docs: int = 320, mine_synth: int = 3200,
               steps_hard: int = 1600, steps_hard2: int = 1200,
               log_every: int = 0) -> dict[str, np.ndarray]:
    """The recipe that produced the committed asset — a five-phase
    curriculum, all phases seeded and deterministic:

    1. framewise alignment pretraining on short synthetic lines (exact
       frame targets from the known cell geometry),
    2. CTC fine-tuning on the same synthetic lines (the net learns its own
       emission timing),
    3. CTC fine-tuning on PRODUCTION-chain lines (render -> nlbin -> blla
       segment -> polygon extract, both vectorizer geometries, rotations
       and resize phases included) mixed with the synthetic pool,
    4. hard-example mining over an ENLARGED pool (320 production docs +
       3200 synth lines): misses oversampled 4x, cosine-decayed CTC,
    5. a second mining round (remaining misses oversampled 6x).

    Phases 4-5 cut held-out error roughly in half (133/150 -> 136/150
    byte-exact lines, corpus CER 0.021 -> 0.010); byte-EXACT held-out
    recognition is not reachable at the pinned kraken topology (Lbx64 on a
    132-way charset incl. connected Arabic forms) — the acceptance band
    lives in tests/test_rec_train.py, and the provably-exact matched-filter
    recognizer remains the production default.
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    W = init_weights(rng)
    synth = synth_line_samples(883201, n_synth, max_words=max_words)
    opt = Adam(W)
    _framewise_phase(W, opt, synth, rng, steps_warm, batch, lr=3e-3,
                     log_every=log_every)
    # fresh Adam state between objectives (CE and CTC curvatures differ)
    opt = Adam(W)
    _ctc_phase(W, opt, synth, rng, steps_synth, batch, lr=1e-3, decay=False,
               log_every=log_every, tag="ctc-synth")
    real = build_dataset(TRAIN_SEED, n_docs)
    mixed = real + synth
    opt = Adam(W)
    _ctc_phase(W, opt, mixed, rng, steps_real, batch, lr=1e-3, decay=True,
               log_every=log_every, tag="ctc-real")
    if not steps_hard:
        return W
    # phases 4-5: hard-example mining on the enlarged pool. The pool is
    # REBUILT with its own calls (synth first, then real+synth order) so
    # the committed asset's bits are reproducible either by one full run
    # or by continuing from the phase-3 float32 checkpoint.
    synth_big = synth_line_samples(883201, mine_synth, max_words=max_words)
    real_big = build_dataset(TRAIN_SEED, mine_docs)
    pool = real_big + synth_big
    rng2 = np.random.Generator(np.random.PCG64(883901))
    bad = mine_misses(W, pool)
    if log_every:
        print(f"[mine] misses {len(bad)} / {len(pool)}", flush=True)
    opt = Adam(W)
    _ctc_phase(W, opt, bad * 4 + pool, rng2, steps_hard, batch, lr=3e-4,
               decay=True, log_every=log_every, tag="hard")
    bad2 = mine_misses(W, pool)
    if log_every:
        print(f"[mine] misses after {len(bad2)}", flush=True)
    if bad2 and steps_hard2:
        opt = Adam(W)
        _ctc_phase(W, opt, bad2 * 6 + pool, rng2, steps_hard2, batch,
                   lr=2e-4, decay=True, log_every=log_every, tag="hard2")
    return W


# --------------------------------------------------------------- asset I/O
def bundle_of(W: dict[str, np.ndarray]):
    from .modelio import KrakenModelBundle

    return KrakenModelBundle(
        vgsl=SPEC, codec=dict(CODEC),
        weights={k: np.asarray(v, dtype=np.float32) for k, v in W.items()},
        metadata=dict(METADATA),
    )


def save_asset(W: dict[str, np.ndarray], path: str = ASSET) -> None:
    from .modelio import save_kraken_model

    save_kraken_model(path, bundle_of(W), prefix="rec_learned", dtype="F32")


def load_asset(path: str = ASSET):
    """Load the committed trained recognizer as a KrakenModelBundle (zip-
    safe via assets_io when imported through the package loader)."""
    from ..assets_io import asset_bytes
    from .modelio import parse_safetensors

    blob = asset_bytes(os.path.basename(path)) if path == ASSET else open(path, "rb").read()
    import json

    tensors, meta = parse_safetensors(blob, path)
    model_map = json.loads(meta["kraken_meta"])
    prefix, model_data = next(iter(model_map.items()))
    from .modelio import KrakenModelBundle

    weights = {
        name[len(prefix) + 4 :]: arr
        for name, arr in tensors.items()
        if name.startswith(prefix + ".nn.")
    }
    codec = model_data.pop("codec")
    vgsl = model_data.pop("vgsl")
    return KrakenModelBundle(vgsl=vgsl, codec=codec, weights=weights,
                             metadata=model_data)
