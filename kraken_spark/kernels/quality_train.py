"""In-repo-trained model-based quality classifier for web text.

The published LLM web pipelines all end their heuristic filter chain with a
*model-based* quality pass — a linear classifier over hashed bag-of-words
features scoring "does this look like well-formed prose" (DCLM-Baseline's
fastText filter, FineWeb-Edu's quality scorer, GPT-3/PaLM's LR-vs-Wikipedia
filters).  This module trains that classifier from scratch, seeded and
reproducible, on a synthetic corpus generated here (no external data):

* positives: sentence-shaped English prose (stopword-rich, punctuated,
  mixed vocabulary) — the shape every published "high quality" proxy keys on;
* negatives: the canonical junk classes those pipelines remove — keyword
  stuffing, anchor/link-farm spam, navigation boilerplate, gibberish
  strings, lorem-ipsum filler, symbol/digit noise.

Model: logistic regression over D=512 hashed unigram-count buckets.  The
hash is the repo's cross-engine primitive (first 8 hex chars of md5 →
BIGINT — see functions/dedup.py), so the *inference* runs as pure
whole-stage-codegen Spark SQL (zero shuffle, map-only) AND has an exact
DuckDB twin for the driver's value-hash oracle.  Weights are quantized to
integers (round(w * 1e6)) so the per-document score is an exact BIGINT sum
— bit-identical in any engine and insensitive to summation order, the same
trick the ANN/kNN paths use (functions/similarity.py).

Training is hand-written numpy full-batch gradient descent (sigmoid + L2),
seeded; `tools/train_quality.py` regenerates the shipped asset
(kraken_spark/assets/quality_clf.json) bit-for-bit.  Training seeds
(771xxx) are disjoint from every evaluation seed used in tests.

The reference engine (an OCR stack) has no corpus-quality stage; this
implements the brief's LLM-training-data-pipeline quality scoring over
extracted web text.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

D = 512  # hashed feature buckets
SCALE = 1_000_000  # weight quantization
TOKEN_RE = "[a-z0-9]+"  # tokenizer shared with the Spark/DuckDB inference

ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "quality_clf.json",
)

# ---------------------------------------------------------------------------
# tokenizer + hashing (must mirror the SQL inference exactly)
# ---------------------------------------------------------------------------

import re

_TOKEN_PAT = re.compile(TOKEN_RE)


def tokenize(text: str) -> list[str]:
    return _TOKEN_PAT.findall(text.lower())


def bucket(token: str) -> int:
    # Spark: pmod(cast(conv(substr(md5(t),1,8),16,10) as bigint), 512)
    # DuckDB: ('0x'||substr(md5(t),1,8))::BIGINT % 512   (always >= 0)
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:8], 16) % D


def featurize(text: str) -> np.ndarray:
    """Binary bucket-presence features over DISTINCT tokens.

    Presence (not counts) is the deliberate choice: it makes the score
    invariant to token repetition, so keyword-stuffing junk cannot buy a
    high score by repeating a handful of prose words — the exact failure
    mode count features have.  Inference mirrors this with
    array_distinct(tokens) (Spark) / SELECT DISTINCT (DuckDB)."""
    x = np.zeros(D, dtype=np.float64)
    for t in set(tokenize(text)):
        x[bucket(t)] = 1.0
    return x


def logit_q(text: str, weights_q: np.ndarray, bias_q: int) -> int:
    """Integer-quantized logit — the exact value the SQL inference emits."""
    s = int(bias_q)
    for t in {bucket(tok) for tok in tokenize(text)}:
        s += int(weights_q[t])
    return s


# ---------------------------------------------------------------------------
# synthetic training corpus (seeded; no external data)
# ---------------------------------------------------------------------------

_STOP = (
    "the of and to in a is that it was for on are with as be at by this "
    "have from or had not but what all were when we there can an your which "
    "their if will each about how up out them she many some so these would "
    "other into has more her two like him see time could no make than been "
    "its now my made over did down only way find use may water long little "
    "very after words called just where most know"
).split()

_CONTENT = (
    "river mountain library science history garden window morning journey "
    "teacher student market village city bridge winter summer music letter "
    "doctor animal forest flower machine engine road story picture light "
    "house family friend school paper money world country question answer "
    "weather ocean island farmer soldier captain officer minister castle "
    "church street corner market theatre novel chapter poem author reader "
    "painter museum concert journal report meeting project system design "
    "model method result number measure experiment theory practice energy "
    "matter motion force field signal current circuit metal stone glass"
).split()

_SPAM = (
    "click here buy cheap free download casino poker bonus winner prize "
    "viagra pills discount offer limited deal sale cash loan credit insurance "
    "mortgage refinance earn money fast guaranteed weight loss miracle cure "
    "hot singles meet now subscribe unsubscribe ringtones jackpot lottery"
).split()

_NAV = (
    "home about contact login register search menu next previous page "
    "sitemap privacy policy terms conditions copyright rights reserved "
    "share tweet like follow comments rss feed archive categories tags"
).split()

_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua"
).split()


def _sentence(rng: np.random.Generator) -> str:
    n = int(rng.integers(6, 15))
    words = []
    for i in range(n):
        pool = _STOP if rng.random() < 0.55 else _CONTENT
        words.append(pool[int(rng.integers(len(pool)))])
    words[0] = words[0].capitalize()
    end = "." if rng.random() < 0.85 else ("?" if rng.random() < 0.5 else "!")
    return " ".join(words) + end


def gen_good(rng: np.random.Generator) -> str:
    n_sent = int(rng.integers(3, 9))
    return " ".join(_sentence(rng) for _ in range(n_sent))


def _gibberish_word(rng: np.random.Generator) -> str:
    letters = "abcdefghijklmnopqrstuvwxyz"
    return "".join(letters[int(rng.integers(26))] for _ in range(int(rng.integers(4, 12))))


def gen_junk(rng: np.random.Generator) -> str:
    flavor = int(rng.integers(6))
    if flavor == 0:  # keyword stuffing
        kws = [_CONTENT[int(rng.integers(len(_CONTENT)))] for _ in range(int(rng.integers(2, 5)))]
        out = [kws[int(rng.integers(len(kws)))] for _ in range(int(rng.integers(30, 90)))]
        return " ".join(out)
    if flavor == 1:  # anchor / link-farm spam
        return " ".join(
            _SPAM[int(rng.integers(len(_SPAM)))] for _ in range(int(rng.integers(25, 70)))
        )
    if flavor == 2:  # navigation boilerplate
        return " ".join(
            _NAV[int(rng.integers(len(_NAV)))] for _ in range(int(rng.integers(15, 50)))
        )
    if flavor == 3:  # gibberish strings
        return " ".join(_gibberish_word(rng) for _ in range(int(rng.integers(20, 60))))
    if flavor == 4:  # lorem ipsum filler
        return " ".join(
            _LOREM[int(rng.integers(len(_LOREM)))] for _ in range(int(rng.integers(25, 80)))
        )
    # symbol / digit noise
    toks = []
    for _ in range(int(rng.integers(20, 60))):
        if rng.random() < 0.5:
            toks.append(str(int(rng.integers(0, 99999))))
        else:
            toks.append("$#@%&*" [int(rng.integers(6))] * int(rng.integers(1, 4)))
    return " ".join(toks)


def gen_corpus(seed: int, n_per_class: int = 400) -> tuple[list[str], np.ndarray]:
    rng = np.random.default_rng(seed)
    texts, labels = [], []
    for _ in range(n_per_class):
        texts.append(gen_good(rng))
        labels.append(1.0)
        texts.append(gen_junk(rng))
        labels.append(0.0)
    return texts, np.asarray(labels)


# ---------------------------------------------------------------------------
# training (full-batch GD, seeded)
# ---------------------------------------------------------------------------


def train(
    seed: int = 771001,
    n_per_class: int = 400,
    epochs: int = 300,
    lr: float = 0.05,
    l2: float = 1e-4,
) -> dict:
    texts, y = gen_corpus(seed, n_per_class)
    X = np.stack([featurize(t) for t in texts])
    w = np.zeros(D)
    b = 0.0
    n = len(y)
    for _ in range(epochs):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        gw = X.T @ g / n + l2 * w
        gb = float(np.mean(g))
        w -= lr * gw
        b -= lr * gb
    wq = np.round(w * SCALE).astype(np.int64)
    bq = int(round(b * SCALE))
    return {
        "d": D,
        "scale": SCALE,
        "token_re": TOKEN_RE,
        "seed": seed,
        "bias_q": bq,
        "weights_q": [int(v) for v in wq],
    }


def save_model(model: dict, path: str = ASSET) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(model, f, separators=(",", ":"))


def load_model(path: str | None = None) -> dict:
    if path is not None:
        with open(path) as f:
            m = json.load(f)
    else:  # the shipped asset: plain file OR --py-files zip entry
        from ..assets_io import asset_bytes

        m = json.loads(asset_bytes(os.path.basename(ASSET)).decode("utf-8"))
    m["weights_q"] = np.asarray(m["weights_q"], dtype=np.int64)
    return m
