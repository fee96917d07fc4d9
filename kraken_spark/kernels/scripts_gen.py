"""Unicode Scripts.txt -> scripts.json generator — the reference's
contrib/generate_scripts.py re-derived WITHOUT the network fetch (the
script downloads http://www.unicode.org/Public/UNIDATA/Scripts.txt;
/root/reference/kraken/contrib/generate_scripts.py:10-14 — this analog
takes the file contents from a caller-supplied path or string, so it
works in offline deployments and is deterministic under test).

Parsing semantics mirror the reference exactly
(generate_scripts.py:12-32):

* one regex per line: ``^START(..END)? ; Name`` with 4-6 hex digits
  (the ``..`` in the pattern is the reference's two-any-chars match of
  the literal range dots — kept verbatim);
* comment / blank lines skipped;
* single code points store ``end=None``;
* an entry merges into the previous one when the name matches AND
  ``start-1`` equals the previous entry's end *or its start* — including
  the reference's quirk that a previous single-point entry has
  ``end=None`` (the ``start-1 == d[-1][1]`` comparison against None is
  simply False) and that a merged entry becomes a full (start, end,
  name) triple.
"""

from __future__ import annotations

import json
import re

_LINE = re.compile(
    r"^(?P<start>[0-9A-F]{4,6})(..(?P<end>[0-9A-F]{4,6}))?\s+; (?P<name>[A-Za-z]+)"
)


def parse_scripts_txt(text: str) -> list[tuple]:
    """Scripts.txt contents -> the reference's list of
    (start, end-or-None, name) tuples with adjacent-range merging
    (generate_scripts.py:15-32)."""
    d: list[tuple] = []
    for line in text.splitlines():
        if line.startswith("#") or line.strip() == "":
            continue
        m = _LINE.match(line)
        if not m:
            continue
        start = int(m.group("start"), base=16)
        end = start
        if m.group("end"):
            end = int(m.group("end"), base=16)
        name = m.group("name")
        if len(d) > 0 and d[-1][2] == name and (
            start - 1 == d[-1][1] or start - 1 == d[-1][0]
        ):
            d[-1] = (d[-1][0], end, name)
        else:
            d.append((start, end if end != start else None, name))
    return d


def scripts_json(text: str) -> str:
    """The reference's scripts.json payload (generate_scripts.py:33):
    json.dump of the tuple list (tuples serialize as JSON arrays)."""
    return json.dumps([list(t) for t in parse_scripts_txt(text)])


def generate_scripts(src_path: str, out_path: str) -> int:
    """File-to-file driver: parse a local Scripts.txt and write
    scripts.json; returns the number of entries. The offline stand-in
    for the reference's urlopen loop (generate_scripts.py:14-33)."""
    with open(src_path, "r", encoding="utf-8") as f:
        entries = parse_scripts_txt(f.read())
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(entries, f)
    return len(entries)


def script_of(codepoint: int, table: list[tuple]) -> str | None:
    """Lookup helper over the generated table (not in the reference's
    generator, which only dumps; provided for tests/consumers): linear
    scan of (start, end-or-None, name) entries."""
    for start, end, name in table:
        hi = start if end is None else end
        if start <= codepoint <= hi:
            return name
    return None
