"""robots.txt (RFC 9309 Robots Exclusion Protocol) parsing + matching.

A web-corpus pipeline needs crawl-policy signals next to its pages: which
captures were disallowed for a given agent, which sitemaps a host
advertises. This is the from-scratch REP engine: group parsing with
user-agent stacking, longest-match rule precedence, `*` wildcards and `$`
end anchors, percent-encoding normalization, and the standard extensions
(Sitemap, Crawl-delay).

Pure stdlib (zero Spark imports, like every kernel); the Spark face lives
in functions/web.py. The reference engine has no web leg — this implements
the brief's Common-Crawl-style corpus semantics (fetch pipelines carry a
per-(host, agent) verdict column computed exactly this way).

Matching rules (RFC 9309 §2.2):
- groups are runs of user-agent lines followed by rules; a group applies
  to the most specific matching agent token (longest token match,
  case-insensitive substring of the product token; `*` is the fallback)
- within the applicable group, the rule with the LONGEST matched pattern
  wins; ties prefer Allow
- empty pattern lines are ignored; no applicable group -> allowed
"""

from __future__ import annotations

import re
from urllib.parse import quote


def _norm_path(path: str) -> str:
    """Percent-normalize a path for REP comparison: encode raw non-ASCII /
    unsafe octets, but do NOT decode existing %XX escapes (a %2F is not a
    path separator — Google's reference matcher makes the same choice)."""
    return quote(path, safe="/?&=+%~*$,;:@!'()-_.")


class RobotsRules:
    """Parsed robots.txt: groups of (agent tokens, rules), sitemaps,
    crawl delays. Rules are (is_allow, pattern, compiled_regex, length)."""

    def __init__(self) -> None:
        self.groups: list[tuple[list[str], list[tuple[bool, str, re.Pattern, int]]]] = []
        self.sitemaps: list[str] = []
        self.crawl_delay: dict[str, float] = {}

    # -- group selection ---------------------------------------------------

    def _group_for(self, agent: str) -> list | None:
        """Most specific matching group: the longest agent token that is a
        case-insensitive prefix of the agent product token; '*' fallback.
        RFC 9309 §2.2.1 (longest-prefix choice per Google's matcher)."""
        agent = agent.lower()
        best_len = -1
        best_rules = None
        star_rules = None
        for tokens, rules in self.groups:
            for tok in tokens:
                if tok == "*":
                    if star_rules is None:
                        star_rules = rules
                elif agent.startswith(tok):
                    if len(tok) > best_len:
                        best_len = len(tok)
                        best_rules = rules
        return best_rules if best_rules is not None else star_rules

    def allowed(self, agent: str, path: str) -> bool:
        rules = self._group_for(agent)
        if not rules:
            return True
        target = _norm_path(path or "/")
        best: tuple[int, bool] | None = None  # (match length, is_allow)
        for is_allow, _pat, rx, ln in rules:
            if rx.match(target):
                if best is None or ln > best[0] or (ln == best[0] and is_allow and not best[1]):
                    best = (ln, is_allow)
        return True if best is None else best[1]

    def delay_for(self, agent: str) -> float | None:
        agent = agent.lower()
        for tok, d in sorted(self.crawl_delay.items(), key=lambda kv: -len(kv[0])):
            if tok == "*" or agent.startswith(tok):
                return d
        return None


def _compile_pattern(pat: str) -> re.Pattern:
    """REP pattern -> anchored regex: `*` = any run, trailing `$` = end
    anchor, everything else literal (on the percent-normalized path)."""
    anchored = pat.endswith("$")
    if anchored:
        pat = pat[:-1]
    parts = [re.escape(_norm_path(p)) for p in pat.split("*")]
    rx = ".*".join(parts) + ("$" if anchored else "")
    return re.compile(rx)


def parse_robots(data: bytes) -> RobotsRules:
    """robots.txt bytes -> RobotsRules. Total: undecodable bytes are
    latin-1-decoded, unknown directives skipped, BOM and comments stripped;
    a user-agent line after rules starts a NEW group (RFC 9309 §2.2)."""
    try:
        text = data.decode("utf-8")
    except UnicodeDecodeError:
        text = data.decode("latin-1")
    if text[:1] == "\ufeff":
        text = text[1:]
    out = RobotsRules()
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str, re.Pattern, int]] = []
    in_rules = False

    def flush():
        nonlocal cur_agents, cur_rules, in_rules
        if cur_agents:
            out.groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules, in_rules = [], [], False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules:
                flush()
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_rules = True
            if not cur_agents:
                continue  # rules before any user-agent line: no group
            if value == "":
                if field == "disallow":
                    continue  # empty Disallow = allow everything: no rule
                continue
            rx = _compile_pattern(value)
            cur_rules.append((field == "allow", value, rx, len(value)))
        elif field == "crawl-delay" and cur_agents:
            in_rules = True
            try:
                d = float(value)
            except ValueError:
                continue
            for a in cur_agents:
                out.crawl_delay[a] = d
        elif field == "sitemap":
            if value:
                out.sitemaps.append(value)
        else:
            if cur_agents:
                in_rules = True  # unknown directive still ends the UA run
    flush()
    return out


def robots_verdict(robots: bytes, agent: str, url: str) -> bool:
    """One-shot convenience: parse + path-extract + match. The Spark face
    parses once per (host) and reuses the RobotsRules across that host's
    pages — this entry point is for single lookups and tests."""
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", url)
    path = m.group(1) if m and m.group(1) else "/"
    return parse_robots(robots).allowed(agent, path)


# --------------------------------------------------------------------------
# XML sitemaps (sitemaps.org protocol) — what robots' Sitemap lines point at
# --------------------------------------------------------------------------

_SM_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def parse_sitemap(data: bytes) -> dict:
    """Sitemap XML bytes -> {"kind": "urlset"|"index", "entries": [...]}.

    urlset entries: {loc, lastmod, changefreq, priority}; index entries:
    {loc, lastmod} (children are further sitemap files). Total: malformed
    XML or an unexpected root yields {"kind": "invalid", "entries": []}.
    Namespaced and namespace-less documents both parse (wild sitemaps
    frequently omit the xmlns)."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return {"kind": "invalid", "entries": []}

    def tagname(el) -> str:
        return el.tag.rsplit("}", 1)[-1]

    def child_text(el, name: str) -> str | None:
        for ch in el:
            if tagname(ch) == name and ch.text and ch.text.strip():
                return ch.text.strip()
        return None

    kind = tagname(root)
    if kind == "urlset":
        entries = []
        for u in root:
            if tagname(u) != "url":
                continue
            loc = child_text(u, "loc")
            if not loc:
                continue
            prio = child_text(u, "priority")
            try:
                prio_f = float(prio) if prio is not None else None
            except ValueError:
                prio_f = None
            entries.append(
                {
                    "loc": loc,
                    "lastmod": child_text(u, "lastmod"),
                    "changefreq": child_text(u, "changefreq"),
                    "priority": prio_f,
                }
            )
        return {"kind": "urlset", "entries": entries}
    if kind == "sitemapindex":
        entries = [
            {"loc": child_text(s, "loc"), "lastmod": child_text(s, "lastmod")}
            for s in root
            if tagname(s) == "sitemap" and child_text(s, "loc")
        ]
        return {"kind": "index", "entries": entries}
    return {"kind": "invalid", "entries": []}
