"""Deterministic VGSL matched-filter recognizer (CER 0 on the corpus font).

The production-shaped analog of the reference's recognition stage
(/root/reference/kraken/lib/vgsl/rpred.py:126-229): line strip -> input
transform -> VGSL forward -> CTC greedy decode -> codec decode -> char
geometry scaling -> BiDi logical reorder. The model weights are constructed,
not trained: the conv layer is a bank of +/-1 glyph templates over the
procedural corpus font (see kernels/glyphs.py), strided by half a character
cell, so the argmax class is provably exact (integer margin >= 2) — the
engine's replacement for the reference's LFS-stubbed `overfit` fixture models
(FIXTURES.md §4). Word spacing is reconstructed from per-character cut
geometry (cell-index gaps), the geometric analog of the codec's space label.

Everything is pure numpy; models serialize via VGSLModel.to_bytes and are
loaded once per executor by the Spark stage wrapper.
"""

from __future__ import annotations

import numpy as np

from .bidi import display_to_logical
from .codec import Codec
from .ctc import greedy_decoder
from .glyphs import ALPHABET, CELL_W, GLYPH_H, GLYPH_W, templates
from .vgsl import VGSLModel

FRAME_STRIDE = CELL_W // 2  # conv x-stride: one frame per half cell

RECOGNIZER_SPEC = f"[1,{GLYPH_H},0,1 Cl{GLYPH_H},{GLYPH_W},{1 + len(ALPHABET)},1,{FRAME_STRIDE} O1c{1 + len(ALPHABET)}]"


def build_recognizer() -> VGSLModel:
    """Construct the deterministic template model + codec."""
    model = VGSLModel(RECOGNIZER_SPEC)
    bank = templates()  # (classes, GLYPH_H, GLYPH_W)
    ncls = bank.shape[0]
    model.weights["conv0.w"] = bank[:, None, :, :].astype(np.float32)
    model.weights["conv0.b"] = np.zeros(ncls, np.float32)
    model.weights["out1.w"] = np.eye(ncls, dtype=np.float32)
    model.weights["out1.b"] = np.zeros(ncls, np.float32)
    model.codec = {chr(cp): [i + 1] for i, cp in enumerate(ALPHABET)}
    return model


def input_transform(strip: np.ndarray) -> np.ndarray:
    """Ink-mask strip (h,w) 0/1 -> (1, GLYPH_H, w) +/-1 float32.

    The analog of the reference's ImageInputTransforms
    (/root/reference/kraken/lib/dataset/utils.py:54-281): height-normalize
    (pad with background to GLYPH_H; taller strips are top-cropped — the
    corpus contract makes every line exactly GLYPH_H tall) and center-code
    to +/-1 so conv logits are exact Hamming scores.
    """
    h, w = strip.shape
    if h < GLYPH_H:
        strip = np.pad(strip, ((0, GLYPH_H - h), (0, 0)))
    elif h > GLYPH_H:
        strip = strip[:GLYPH_H]
    return (strip.astype(np.float32) * 2.0 - 1.0)[None]


_EMPTY_RECORD = {"prediction": "", "cuts": [], "confidences": [], "display_order": False}


def recognize_page(
    model: VGSLModel,
    codec: Codec,
    strips: list[np.ndarray],
    base_dir: str = "L",
    bidi_reordering: bool = True,
    decoder=None,
) -> list[dict]:
    """Batched recognition: all line strips of a page are concatenated (with
    cell-aligned offsets and a one-cell background gap) into a single wide
    image so the VGSL forward pass is one matmul instead of per-line calls —
    the Spark-friendly analog of the reference's pad-and-stack batching
    (/root/reference/kraken/lib/vgsl/rpred.py:171-208).

    decoder: optional CTC decoder ``acts -> [(label, start, end, conf)]``,
    defaulting to the greedy decoder — the reference's pluggable-decoder
    config knob (/root/reference/kraken/configs/base.py:219-235)."""
    usable = [
        (i, s) for i, s in enumerate(strips) if s.size > 0 and s.shape[1] >= GLYPH_W
    ]
    records: list[dict] = [dict(_EMPTY_RECORD) for _ in strips]
    if not usable:
        return records
    spans = []
    offset = 0
    for i, s in usable:
        w = s.shape[1]
        wpad = -(-w // CELL_W) * CELL_W
        spans.append((i, offset, w))
        offset += wpad + CELL_W
    canvas = np.zeros((GLYPH_H, offset), dtype=np.uint8)
    for (i, off, w), (_, s) in zip(spans, usable):
        h = min(s.shape[0], GLYPH_H)
        canvas[:h, off : off + w] = s[:h]
    acts = model.forward(input_transform(canvas))
    for i, off, w in spans:
        f0 = off // FRAME_STRIDE
        nframes = (w - GLYPH_W) // FRAME_STRIDE + 1
        records[i] = _decode_frames(
            acts[f0 : f0 + nframes], codec, base_dir, bidi_reordering, decoder
        )
    return records


def recognize_line(
    model: VGSLModel, codec: Codec, strip: np.ndarray, base_dir: str = "L",
    bidi_reordering: bool = True,
) -> dict:
    """Run the full recognition chain on one extracted line strip.

    Returns a BaselineOCRRecord-like dict: prediction (logical order), cuts
    (per-char [x0,x1] strip px), confidences, display_order flag.
    """
    if strip.size == 0 or strip.shape[1] < GLYPH_W:
        return dict(_EMPTY_RECORD)
    acts = model.forward(input_transform(strip))
    return _decode_frames(acts, codec, base_dir, bidi_reordering)


def _decode_frames(
    acts: np.ndarray, codec: Codec, base_dir: str, bidi_reordering: bool,
    decoder=None,
) -> dict:
    decoded = codec.decode((decoder or greedy_decoder)(acts))
    if not decoded:
        return dict(_EMPTY_RECORD)
    # frame -> cell geometry: frame f starts at x = f*FRAME_STRIDE; character
    # frames land on even f (cell starts) by the cell-aligned bbox contract
    chars: list[str] = []
    cuts: list[list[int]] = []
    confs: list[float] = []
    prev_cell = None
    for ch, start, _end, conf in decoded:
        cell = round(start * FRAME_STRIDE / CELL_W)
        if prev_cell is not None:
            for g in range(prev_cell + 1, cell):  # space cells between chars
                chars.append(" ")
                cuts.append([g * CELL_W, g * CELL_W + GLYPH_W])
                confs.append(1.0)
        chars.append(ch)
        cuts.append([cell * CELL_W, cell * CELL_W + GLYPH_W])
        confs.append(conf)
        prev_cell = cell
    visual = "".join(chars)
    if bidi_reordering and base_dir == "R":
        logical, perm = display_to_logical(visual, base_dir)
        cuts = [cuts[i] for i in perm]
        confs = [confs[i] for i in perm]
        return {
            "prediction": logical,
            "cuts": cuts,
            "confidences": confs,
            "display_order": False,
        }
    return {
        "prediction": visual,
        "cuts": cuts,
        "confidences": confs,
        "display_order": True,
    }
