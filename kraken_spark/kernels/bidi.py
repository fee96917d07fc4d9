"""BiDi reordering (display <-> logical) — a compact UAX#9 subset.

The reference vendors a full UAX#9 implementation
(/root/reference/kraken/lib/bidi/__init__.py:48-505) and applies its
``get_display_map`` permutation to each OCR record's prediction, cuts and
confidences (containers.py:579-605). This engine implements the subset that
matters for recognition output reordering: strong L/R/AL types, EN digits,
whitespace and neutrals, explicit base direction, level assignment, and the
UAX#9 L2 run-reversal rule producing a display<->logical permutation.
(Isolates/embeddings/brackets are out of scope: OCR output contains no
explicit directional controls.)
"""

from __future__ import annotations


def char_class(ch: str) -> str:
    cp = ord(ch)
    if 0x0590 <= cp <= 0x08FF or 0xFB1D <= cp <= 0xFDFF or 0xFE70 <= cp <= 0xFEFF:
        return "AL"  # Arabic/Hebrew-block strong right-to-left
    if ch.isdigit():
        return "EN"
    if ch.isspace():
        return "WS"
    if ch.isalpha():
        return "L"
    return "ON"


def resolve_levels(text: str, base_dir: str = "L") -> list[int]:
    """Embedding level per character (simplified W/N rules)."""
    base = 1 if base_dir == "R" else 0
    types = [char_class(c) for c in text]
    levels = []
    for t in types:
        if t == "AL":
            levels.append(1)
        elif t == "L":
            levels.append(2 if base == 1 else 0)
        elif t == "EN":
            levels.append(2)
        else:  # WS / ON: neutral, resolved below
            levels.append(-1)
    # neutrals take surrounding level if equal on both sides, else base (N1/N2)
    n = len(levels)
    i = 0
    while i < n:
        if levels[i] == -1:
            j = i
            while j < n and levels[j] == -1:
                j += 1
            left = levels[i - 1] if i > 0 else base
            right = levels[j] if j < n else base
            fill = left if left == right else base
            for k in range(i, j):
                levels[k] = fill
            i = j
        else:
            i += 1
    return levels


def display_map(levels: list[int]) -> list[int]:
    """UAX#9 rule L2: from the highest level down to 1, reverse any
    contiguous run of characters at that level or higher. Returns perm such
    that display[i] = logical[perm[i]] (an involution-composable map; apply
    to a display-order sequence to obtain logical order and vice versa)."""
    n = len(levels)
    perm = list(range(n))
    if n == 0:
        return perm
    for lvl in range(max(levels), 0, -1):
        i = 0
        while i < n:
            if levels[i] >= lvl:
                j = i
                while j < n and levels[j] >= lvl:
                    j += 1
                perm[i:j] = perm[i:j][::-1]
                i = j
            else:
                i += 1
    return perm


def auto_base_dir(text: str) -> str:
    """UAX#9 P2/P3: paragraph level from the first strong character
    (reference lib/bidi/__init__.py get_base_level)."""
    for c in text:
        t = char_class(c)
        if t == "AL":
            return "R"
        if t == "L":
            return "L"
    return "L"


def get_display(text: str, base_dir: str | None = None) -> tuple[str, list[int]]:
    """Forward display transform + permutation — the reference's
    ``get_display_map(text, base_dir)`` (lib/bidi/__init__.py:465-505) as
    used by ocr_record._reorder (containers.py:579-605): treat ``text`` as
    logical order, resolve levels, apply L2. Returns (display_text, order)
    with display[i] = text[order[i]]. rpred's logical_order applies this to
    the network's display-order prediction."""
    if base_dir not in ("L", "R"):
        base_dir = auto_base_dir(text)
    levels = resolve_levels(text, base_dir)
    perm = display_map(levels)
    return "".join(text[i] for i in perm), perm


def display_to_logical(
    visual: str, base_dir: str = "L"
) -> tuple[str, list[int]]:
    """Reorder a display-order (visual) string to logical order.

    The recognizer reads glyphs left-to-right (display order); for an RTL
    paragraph the logical string is the L2 permutation applied in reverse.
    Returns (logical_text, perm) where logical[k] = visual[perm[k]].
    """
    # levels are a property of the *logical* string; for the pure-RTL and
    # pure-LTR runs we care about, computing them on the visual string and
    # inverting the L2 permutation is equivalent.
    levels = resolve_levels(visual, base_dir)
    perm = display_map(levels)
    # perm maps logical->display positions under L2; invert to go back
    inv = [0] * len(perm)
    for logical_pos, display_pos in enumerate(perm):
        inv[display_pos] = logical_pos
    logical = "".join(visual[i] for i in perm)
    return logical, perm
