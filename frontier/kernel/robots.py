"""robots.txt parsing + matching (RFC 9309) → the gate relation.

The crawl's robots gate (schedule.apply_robots) consumes a
``(host, rules, crawl_delay_ms)`` relation where ``rules`` is an array
of ``(pattern, regex, specificity, allow)`` structs; this module
produces it from raw robots.txt bytes, completing the
fetch-robots.txt → parse → broadcast-gate story end to end.

RFC 9309 semantics implemented (round-2 VERDICT gap — the previous
subset over-blocked hosts that rely on ``Allow`` under a broad
``Disallow``):

* grouped ``User-agent`` stanzas; the most specific matching agent
  token wins (longest product-token prefix > ``*``), and the rules of
  ALL groups matching at that specificity are merged (§2.2.1 —
  multiple ``User-agent: *`` stanzas combine);
* rules match against the URL's path **plus query** (§2.2.2 — so
  ``Disallow: /*?*`` blocks querystring URLs) in both the Spark gate
  (schedule.apply_robots) and the simulator;
* BOTH ``Allow`` and ``Disallow`` rules (§2.2.2), empty value = no
  rule;
* ``*`` wildcards (match any char sequence) and ``$`` end-of-path
  anchor in rule paths (§2.2.3);
* longest-match-wins precedence: the matching rule with the most
  characters in its pattern decides; on an exact tie, Allow wins
  (§2.2.2 "most specific match", measured here in characters — equal
  to the RFC's octets for ASCII patterns, which is what robots.txt
  files are in practice);
* no matching rule → allowed; ``Crawl-delay`` (non-standard but
  ubiquitous) seconds → ms, capped.

Patterns compile to regexes valid under BOTH Python ``re`` and Java
``java.util.regex`` (the Spark gate evaluates them JVM-side via
``rlike`` — frontier/spark/schedule.py), so the pure-Python matcher
below (:func:`is_allowed`, used by the crawl simulator and tests) is
the differential oracle for the Spark gate.
"""

from __future__ import annotations

MAX_DELAY_MS = 3_600_000  # cap pathological Crawl-delay at 1 h

_SAFE_CHARS = set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789/-")


def compile_pattern(pattern: str) -> str:
    """robots.txt rule path → anchored regex string.

    ``*`` → ``[\\s\\S]*`` (any chars, incl. newline — Java has no
    re.DOTALL flag inline that Python also takes, so the class form is
    used); trailing ``$`` → end anchor; everything else literal
    (backslash-escaped unless alphanumeric — the escape form shared by
    Python and Java regex). The result is ``^``-anchored: matching is
    prefix-match unless the pattern ended with ``$``.
    """
    out = ["^"]
    chars = list(pattern)
    anchored = bool(chars) and chars[-1] == "$"
    if anchored:
        chars.pop()
    for ch in chars:
        if ch == "*":
            out.append("[\\s\\S]*")
        elif ch in _SAFE_CHARS:
            out.append(ch)
        elif ch.isalnum():  # non-ASCII letters/digits: literal as-is
            out.append(ch)
        else:
            out.append("\\" + ch)
    if anchored:
        out.append("$")
    return "".join(out)


def parse_robots_txt(text: bytes | str) -> list[dict]:
    """→ list of groups:
    {agents: [..], rules: [(pattern, allow)], delay_ms: int|None}.

    Tolerant of crawled junk: undecodable bytes are replaced, unknown
    directives ignored, comments (#) stripped, BOM stripped, rules
    before any User-agent line ignored (RFC 9309 §2.2.1).
    """
    if isinstance(text, bytes):
        text = text.decode("utf-8", errors="replace")
    text = text.lstrip("﻿")
    groups: list[dict] = []
    current: dict | None = None
    agents_open = False  # consecutive User-agent lines share one group
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not agents_open:
                current = {"agents": [], "rules": [], "delay_ms": None}
                groups.append(current)
                agents_open = True
            current["agents"].append(value.lower())
            continue
        agents_open = False
        if current is None:
            continue  # directive before any User-agent: ignored
        if key in ("disallow", "allow"):
            if value:  # empty value = no rule (allow-all for Disallow)
                current["rules"].append((value, key == "allow"))
        elif key == "crawl-delay":
            try:
                ms = int(float(value) * 1000)
            except ValueError:
                continue
            current["delay_ms"] = max(0, min(ms, MAX_DELAY_MS))
    return groups


def sitemap_urls(text: bytes | str) -> list[str]:
    """``Sitemap:`` record values, in file order, deduplicated.

    The Sitemap record (sitemaps.org) is GROUP-INDEPENDENT — RFC 9309
    §2.2.4 "other records" — so it is collected from anywhere in the
    file, including before any User-agent line, regardless of which
    agent group wins. Values are absolute URLs; anything without a
    scheme is dropped (the spec requires full URLs).
    """
    if isinstance(text, bytes):
        text = text.decode("utf-8", errors="replace")
    out: list[str] = []
    seen: set[str] = set()
    for raw_line in text.lstrip("﻿").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        key, sep, value = line.partition(":")
        if not sep or key.strip().lower() != "sitemap":
            continue
        value = value.strip()
        if "://" in value and value not in seen:
            seen.add(value)
            out.append(value)
    return out


def rules_for_agent(text: bytes | str, agent: str = "frontier"
                    ) -> tuple[list[tuple[str, bool]], int]:
    """([(pattern, allow)], crawl_delay_ms) for ``agent``.

    Group choice (RFC 9309 §2.2.1): the longest agent token that is a
    prefix of (or equal to) ours picks the winning specificity; ``*``
    is the fallback; no match → everything allowed (empty rule list).
    Rules of ALL groups matching at the winning specificity are
    MERGED, in file order — §2.2.1 "combine the rules" covers the
    common real-world case of two separate ``User-agent: *`` stanzas
    (previously the later stanza was silently dropped). Crawl-delay
    (non-standard) takes the max across the merged groups.
    """
    agent = agent.lower()

    def _score(group: dict) -> int:
        best = -1
        for token in group["agents"]:
            if token == "*":
                best = max(best, 0)
            elif agent.startswith(token):
                best = max(best, len(token))
        return best

    groups = parse_robots_txt(text)
    scores = [_score(g) for g in groups]
    best_len = max(scores, default=-1)
    if best_len < 0:
        return [], 0
    rules: list[tuple[str, bool]] = []
    delay = 0
    for group, score in zip(groups, scores):
        if score == best_len:
            rules.extend(group["rules"])
            delay = max(delay, int(group["delay_ms"] or 0))
    return rules, delay


def is_allowed(rules: list[tuple[str, bool]], path: str) -> bool:
    """RFC 9309 §2.2.2 precedence over compiled rules — the pure-
    Python mirror of the Spark gate expression
    (schedule.robots_allowed_expr): most-specific (longest pattern)
    matching rule decides; tie → Allow; no match → allowed."""
    import re

    best: tuple[int, int] | None = None  # (specificity, allow)
    for pattern, allow in rules:
        if re.search(compile_pattern(pattern), path) is None:
            continue
        key = (len(pattern), 1 if allow else 0)
        if best is None or key > best:
            best = key
    return True if best is None else bool(best[1])
