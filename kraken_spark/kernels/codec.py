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
        """Decode (label, start, end, conf) runs to per-CODE-POINT tuples
        (codec.py:148-195): a matched grapheme string of n characters emits
        n tuples, each carrying the whole match's extent (first label's
        start, last label's end) and mean confidence. Single-label graphemes
        take a fast path; multi-label sequences match in codec insertion
        order. Undecodable labels are skipped (or raise in strict mode)."""
        out: list[tuple[str, int, int, float]] = []
        seq = [l[0] for l in labels]
        single = {k[0]: v for k, v in self.l2c.items() if len(k) == 1}
        i = 0
        while i < len(seq):
            if seq[i] in single:
                code = single[seq[i]]
                _, s, e, c = labels[i]
                out.extend((ch, s, e, c) for ch in code)
                i += 1
                continue
            for key, code in self.l2c.items():
                if len(key) > 1 and tuple(seq[i: i + len(key)]) == key:
                    s = labels[i][1]
                    e = labels[i + len(key) - 1][2]
                    c = float(sum(x[3] for x in labels[i: i + len(key)])
                              / len(key))
                    out.extend((ch, s, e, c) for ch in code)
                    i += len(key)
                    break
            else:
                if self.strict:
                    raise CodecError(
                        f"non-decodable label sequence at {seq[i:i + 5]}")
                i += 1  # undecodable label dropped (non-strict)
        return out

    def merge(self, other: "Codec") -> tuple["Codec", set[int]]:
        """Transform this codec towards ``other``, reusing labels
        (codec.py:197-240): graphemes absent from ``other`` are dropped
        (their labels returned, unless still used by a kept mapping), the
        label space is compacted to close the holes, and ``other``-only
        graphemes are appended with fresh sequential labels ordered by
        their labels in ``other``."""
        kept = {ch: list(v) for ch, v in self.c2l.items() if ch in other.c2l}
        removed = [lab for ch, v in self.c2l.items()
                   if ch not in other.c2l for lab in v]
        # reference codec.py:222-228 prunes in-use labels by MUTATING the
        # list mid-iteration, which skips the element following each
        # removal — reproduced verbatim, quirk and all, so merge results
        # match when several removal candidates share one kept mapping
        for v in kept.values():
            for lab in removed:
                if lab in v:
                    removed.remove(lab)
        # close holes left by the removed labels
        for shifted in (v - i for i, v in enumerate(sorted(set(removed)))):
            kept = {ch: [lab - 1 if lab > shifted else lab for lab in v]
                    for ch, v in kept.items()}
        added = {ch: v for ch, v in other.c2l.items() if ch not in self.c2l}
        start = max((lab for v in kept.values() for lab in v), default=0) + 1
        renumber = {old: new for new, old in enumerate(
            sorted({lab for v in added.values() for lab in v}), start)}
        for ch, v in added.items():
            kept[ch] = [renumber[lab] for lab in v]
        return Codec(kept, strict=self.strict), set(removed)

    def add_labels(self, charset: dict | list[str] | str) -> "Codec":
        """Extend with new graphemes (codec.py:242-264): dicts merge as
        given; strings/lists get sequential labels after the current max,
        in sorted order."""
        merged = dict(self.c2l)
        if isinstance(charset, dict):
            merged.update(charset)
        else:
            merged.update({ch: [lab] for lab, ch in
                           enumerate(sorted(charset),
                                     start=self.max_label() + 1)})
        return Codec(merged, strict=self.strict)
