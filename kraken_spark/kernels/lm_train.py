"""Character-trigram language model for CCNet-style perplexity bucketing
(Wenzek et al. 2020: score web text with a small LM trained on clean text,
split the corpus into head/middle/tail quality buckets).

CCNet uses a 5-gram KenLM over Wikipedia; the in-repo stand-in is a hashed
character-trigram LM trained on the seeded synthetic prose generator
(kernels/quality_train.gen_good — no external data), with add-one
smoothing and integer-quantized log-probabilities so the per-document
score is an exact BIGINT sum reproduced bit-for-bit by Spark codegen AND
the DuckDB oracle (the quality_train.py pattern).

Training seed 773001 is disjoint from every evaluation seed (77xxxx
training family, eval uses small integers / 88xxxx).

Pure numpy/stdlib — no Spark imports (kernel rule). tools/train_lm.py
regenerates kraken_spark/assets/lm_char3.json bit-for-bit.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

D = 2048  # hashed trigram buckets
SCALE = 1_000_000  # log-prob quantization

ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "lm_char3.json",
)


def tri_bucket(tri: str) -> int:
    # Spark: pmod(cast(conv(substr(md5(t),1,8),16,10) as bigint), 2048)
    # DuckDB: ('0x'||substr(md5(t),1,8))::BIGINT % 2048
    return int(hashlib.md5(tri.encode("utf-8")).hexdigest()[:8], 16) % D


def trigrams(text: str) -> list[str]:
    """All char trigrams of lower(text); short/empty docs contribute ONE
    (possibly short) gram so the scorer is total — mirrored exactly by
    sequence(1, greatest(length-2, 1)) in Spark and generate_series in the
    oracle."""
    t = text.lower()
    n = max(len(t) - 2, 1)
    return [t[i : i + 3] for i in range(n)]


def doc_sum_q(text: str, logp_q: np.ndarray) -> tuple[int, int]:
    """(sum of quantized log-probs, n_trigrams) — the exact values the SQL
    inference emits."""
    tris = trigrams(text)
    return int(sum(int(logp_q[tri_bucket(g)]) for g in tris)), len(tris)


def train_lm(seed: int = 773001, n_docs: int = 800) -> dict:
    from .quality_train import gen_good

    rng = np.random.default_rng(seed)
    counts = np.zeros(D, dtype=np.int64)
    texts = [gen_good(rng) for _ in range(n_docs)]
    for t in texts:
        for g in trigrams(t):
            counts[tri_bucket(g)] += 1
    total = int(counts.sum())
    logp = np.log((counts + 1.0) / (total + D))
    logp_q = np.round(logp * SCALE).astype(np.int64)
    # CCNet buckets from the TRAINING score distribution: head = best third,
    # tail = worst third (thresholds on the rounded per-char mean, the same
    # statistic inference emits)
    means = []
    for t in texts:
        s, n = doc_sum_q(t, logp_q)
        means.append(round(s / n, 6))
    head_thr = float(np.quantile(means, 2 / 3))
    tail_thr = float(np.quantile(means, 1 / 3))
    return {
        "d": D,
        "scale": SCALE,
        "seed": seed,
        "n_docs": n_docs,
        "logp_q": [int(v) for v in logp_q],
        "head_thr": round(head_thr, 6),
        "tail_thr": round(tail_thr, 6),
    }


def save_lm(model: dict, path: str = ASSET) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(model, f, separators=(",", ":"))


def load_lm(path: str | None = None) -> dict:
    if path is not None:
        with open(path) as f:
            m = json.load(f)
    else:  # the shipped asset: plain file OR --py-files zip entry
        from ..assets_io import asset_bytes

        m = json.loads(asset_bytes(os.path.basename(ASSET)).decode("utf-8"))
    m["logp_q"] = np.asarray(m["logp_q"], dtype=np.int64)
    return m
