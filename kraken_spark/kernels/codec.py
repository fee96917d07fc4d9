"""Label <-> grapheme codec — reimplements the semantics of the reference's
PytorchCodec (/root/reference/kraken/lib/codec.py:36-270): a many-to-many
mapping between integer label sequences and unicode strings, with prefix-free
validation, greedy longest-match encoding, and a decoder that merges
multi-label codes while aggregating per-character geometry and confidence
(min start / max end / mean confidence, codec.py:148-195). ``merge`` /
``add_labels`` support fine-tuning-style vocabulary surgery (codec.py:197-264).
"""

from __future__ import annotations


class CodecError(ValueError):
    pass


class Codec:
    def __init__(self, charset: dict[str, list[int]] | list[str] | str, strict: bool = False):
        """charset: mapping grapheme(s) -> label list, or an iterable of
        graphemes (auto-numbered from 1; 0 is reserved for the CTC blank)."""
        if isinstance(charset, (list, str)):
            charset = {c: [i + 1] for i, c in enumerate(sorted(set(charset)))}
        self.c2l: dict[str, list[int]] = dict(charset)
        self.strict = strict
        self.l2c: dict[tuple[int, ...], str] = {}
        for ch, labels in self.c2l.items():
            key = tuple(labels)
            if key in self.l2c:
                raise CodecError(f"duplicate label sequence {key} for {ch!r}")
            self.l2c[key] = ch
        self._validate_prefix_free()

    def _validate_prefix_free(self) -> None:
        keys = sorted(self.l2c.keys())
        for a, b in zip(keys, keys[1:]):
            if len(a) < len(b) and b[: len(a)] == a:
                raise CodecError(f"label sequence {a} is a prefix of {b}")

    def __len__(self) -> int:
        return max((l for ls in self.c2l.values() for l in ls), default=0) + 1

    def max_label(self) -> int:
        return len(self) - 1

    def encode(self, s: str) -> list[int]:
        """Greedy longest-match encode (codec.py:106-146)."""
        out: list[int] = []
        i = 0
        maxlen = max((len(k) for k in self.c2l), default=1)
        while i < len(s):
            for j in range(min(maxlen, len(s) - i), 0, -1):
                sub = s[i : i + j]
                if sub in self.c2l:
                    out.extend(self.c2l[sub])
                    i += j
                    break
            else:
                if self.strict:
                    raise CodecError(f"unencodable character {s[i]!r}")
                i += 1
        return out

    def decode(
        self, labels: list[tuple[int, int, int, float]]
    ) -> list[tuple[str, int, int, float]]:
        """Decode (label, start, end, conf) runs to (char, start, end, conf),
        longest-match over label tuples, merging geometry/confidence
        (codec.py:148-195)."""
        out: list[tuple[str, int, int, float]] = []
        seq = [l[0] for l in labels]
        i = 0
        maxlen = max((len(k) for k in self.l2c), default=1)
        while i < len(seq):
            for j in range(min(maxlen, len(seq) - i), 0, -1):
                key = tuple(seq[i : i + j])
                if key in self.l2c:
                    chunk = labels[i : i + j]
                    out.append(
                        (
                            self.l2c[key],
                            min(c[1] for c in chunk),
                            max(c[2] for c in chunk),
                            float(sum(c[3] for c in chunk) / len(chunk)),
                        )
                    )
                    i += j
                    break
            else:
                i += 1  # undecodable label dropped (non-strict)
        return out

    def merge(self, other: "Codec") -> tuple["Codec", set[str]]:
        """Union of self and other's graphemes; returns (new codec, graphemes
        dropped from self)."""
        merged = dict(self.c2l)
        dropped = set()
        next_label = max(self.max_label(), 0)
        for ch in other.c2l:
            if ch not in merged:
                next_label += 1
                merged[ch] = [next_label]
        for ch in list(merged):
            if ch not in other.c2l and ch not in self.c2l:
                dropped.add(ch)
        return Codec(merged, strict=self.strict), dropped

    def add_labels(self, chars: list[str]) -> "Codec":
        merged = dict(self.c2l)
        next_label = self.max_label()
        for ch in chars:
            if ch not in merged:
                next_label += 1
                merged[ch] = [next_label]
        return Codec(merged, strict=self.strict)
