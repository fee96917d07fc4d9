"""Byte-pair-encoding tokenizer, trained in-repo (Sennrich, Haddow, Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016 —
the published algorithm every LLM-corpus token count is denominated in).

Pure stdlib — no Spark imports (kernel rule). Spark consumes `encode_batch`
through an Arrow-batched pandas UDF (`functions/text.bpe_token_count`);
training happens once, offline, via tools/train_bpe.py, and the learned
merge table ships as kraken_spark/assets/bpe_merges.json so inference is
reproducible bit-for-bit.

Determinism: merge selection breaks frequency ties lexicographically on the
pair, so the same corpus always yields the same merge table regardless of
dict iteration order.

Pre-tokenization: lowercased whitespace words; each word gets the
end-of-word sentinel `</w>` as its final symbol (the paper's scheme), so
merges never cross word boundaries and token counts are additive per word —
which is what makes the per-word LRU cache exact.
"""

from __future__ import annotations

import json
from collections import Counter
from functools import lru_cache

EOW = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,) if word else ()


def pre_tokenize(text: str) -> list[str]:
    return text.lower().split()


def train_bpe(texts, n_merges: int = 512) -> list[tuple[str, str]]:
    """Learn `n_merges` merge rules from an iterable of documents.

    O(n_merges * distinct_words) per the reference algorithm — fine for the
    offline training pass; inference never touches this path."""
    vocab = Counter()
    for t in texts:
        vocab.update(pre_tokenize(t))
    words = {w: _word_symbols(w) for w in vocab}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_freq: Counter = Counter()
        for w, syms in words.items():
            f = vocab[w]
            for i in range(len(syms) - 1):
                pair_freq[(syms[i], syms[i + 1])] += f
        if not pair_freq:
            break
        # deterministic: max frequency, lexicographically smallest pair on ties
        (a, b), freq = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break  # nothing left that generalizes
        merges.append((a, b))
        merged = a + b
        new_words = {}
        for w, syms in words.items():
            if a in syms:
                out = []
                i = 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new_words[w] = tuple(out)
            else:
                new_words[w] = syms
        words = new_words
    return merges


class BPE:
    """Inference-side tokenizer over a fixed merge table."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {tuple(m): i for i, m in enumerate(self.merges)}
        # per-word memo: corpus word distributions are Zipfian, so the hot
        # words hit the cache and the per-doc cost is ~distinct new words
        self._encode_word = lru_cache(maxsize=65536)(self._encode_word_uncached)

    def _encode_word_uncached(self, word: str) -> tuple[str, ...]:
        syms = list(_word_symbols(word))
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return tuple(syms)

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for w in pre_tokenize(text):
            out.extend(self._encode_word(w))
        return out

    def decode(self, tokens: list[str]) -> str:
        return "".join(tokens).replace(EOW, " ").rstrip()

    def count(self, text: str) -> int:
        return sum(len(self._encode_word(w)) for w in pre_tokenize(text))

    def count_batch(self, texts) -> list[int]:
        return [self.count(t or "") for t in texts]


def save_merges(path: str, merges: list[tuple[str, str]]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump([list(m) for m in merges], f, ensure_ascii=False, indent=0)


def load_merges(path: str) -> list[tuple[str, str]]:
    with open(path, encoding="utf-8") as f:
        return [tuple(m) for m in json.load(f)]
