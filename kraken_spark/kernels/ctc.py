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
    out: list[tuple[int, int, int, float]] = []
    t = len(labels)
    i = 0
    while i < t:
        j = i
        while j < t and labels[j] == labels[i]:
            j += 1
        if labels[i] != 0:
            out.append((int(labels[i]), i, j - 1, float(conf[i:j].max())))
        i = j
    return out
