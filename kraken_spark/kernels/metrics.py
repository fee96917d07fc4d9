"""Accuracy metrics — CER/WER via Levenshtein (numpy DP).

The reference tracks CER/WER through torchmetrics during validation
(/root/reference/kraken/train/vgsl.py:378-457) and a global alignment for
confusion reporting (/root/reference/kraken/lib/dataset/utils.py:284-330).
Here: a vectorized edit-distance used by the extraction stage to emit
per-document CER against the corpus ground-truth `text` column into the
metrics table.
"""

from __future__ import annotations

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Edit distance, O(len(a)*len(b)) with numpy row updates."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len(bv) + 1, dtype=np.int32)
    for i, ch in enumerate(a):
        cp = np.uint32(ord(ch))
        # candidates that don't depend on the left neighbor:
        #   substitution/match: prev[j] + (b[j] != a[i]);  deletion: prev[j+1]+1
        m = np.minimum(prev[:-1] + (bv != cp), prev[1:] + 1)
        # insertion chain cur[j] = min(cur[j-1]+1, m[j-1]) resolved by a
        # prefix-min scan over (value - index)
        prev = _scan_min(np.concatenate(([np.int32(i + 1)], m)))
    return int(prev[-1])


def _scan_min(m: np.ndarray) -> np.ndarray:
    """out[j] = min_{k<=j} (m[k] + j - k): prefix-min of (m[k]-k) plus j."""
    j = np.arange(len(m), dtype=np.int32)
    return np.minimum.accumulate(m - j) + j


def cer(reference: str, hypothesis: str) -> float:
    """Character error rate = edits / len(reference); 0.0 for two empties."""
    if not reference:
        return 0.0 if not hypothesis else 1.0
    return levenshtein(reference, hypothesis) / len(reference)


def wer(reference: str, hypothesis: str) -> float:
    rw, hw = reference.split(), hypothesis.split()
    if not rw:
        return 0.0 if not hw else 1.0
    # word-level distance on joined sentinel strings
    vocab: dict[str, str] = {}
    for wd in rw + hw:
        if wd not in vocab:
            vocab[wd] = chr(0xE000 + len(vocab))  # private-use code points
    return levenshtein("".join(vocab[w] for w in rw), "".join(vocab[w] for w in hw)) / len(rw)


def cer_case_insensitive(reference: str, hypothesis: str) -> float:
    """Case-insensitive CER (the reference tracks it alongside CER,
    /root/reference/kraken/train/vgsl.py:378-457)."""
    return cer(reference.casefold(), hypothesis.casefold())
