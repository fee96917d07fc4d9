"""CTC greedy decoder — mirrors /root/reference/kraken/lib/ctc_decoder.py:35-72.

Input: (T, C) softmax activations, class 0 = blank. Output: list of
(label, start_frame, end_frame, max_confidence) for non-blank runs after
collapsing repeats (exactly the reference's semantics: argmax per frame,
group consecutive identical labels, drop blanks, keep run extent + max prob).
"""

from __future__ import annotations

import numpy as np


def greedy_decoder(outputs: np.ndarray) -> list[tuple[int, int, int, float]]:
    if outputs.size == 0:
        return []
    labels = outputs.argmax(axis=1)
    conf = outputs.max(axis=1)
    # vectorized run detection: boundaries where the argmax label changes;
    # per-run max via reduceat — identical to the frame-by-frame scan
    change = np.flatnonzero(labels[1:] != labels[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(labels)]])
    runmax = np.maximum.reduceat(conf, starts)
    lab = labels[starts]
    out: list[tuple[int, int, int, float]] = []
    for li, s, e, c in zip(lab.tolist(), starts.tolist(), ends.tolist(), runmax.tolist()):
        if li != 0:
            out.append((li, s, e - 1, float(c)))
    return out
