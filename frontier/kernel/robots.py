"""robots.txt parsing (RFC 9309 subset) → the gate relation.

The crawl's robots gate (schedule.apply_robots) consumes a
``(host, disallow_prefixes, crawl_delay_ms)`` relation; this module
produces it from raw robots.txt bytes, completing the
fetch-robots.txt → parse → broadcast-gate story end to end.

Subset implemented (deliberate, documented): grouped ``User-agent``
stanzas with literal-prefix ``Disallow`` rules and ``Crawl-delay``
(seconds, fractional allowed); the most specific matching agent group
wins (exact product token > substring > ``*``); an EMPTY Disallow
value means allow-all (RFC 9309 §2.2.2); ``Allow`` overrides and
wildcard patterns are out of scope for the gate's prefix semantics
(schedule.apply_robots matches literal prefixes JVM-side).
"""

from __future__ import annotations

MAX_DELAY_MS = 3_600_000  # cap pathological Crawl-delay at 1 h


def parse_robots_txt(text: bytes | str) -> list[dict]:
    """→ list of groups: {agents: [..], disallow: [..], delay_ms: int|None}.

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
                current = {"agents": [], "disallow": [], "delay_ms": None}
                groups.append(current)
                agents_open = True
            current["agents"].append(value.lower())
            continue
        agents_open = False
        if current is None:
            continue  # directive before any User-agent: ignored
        if key == "disallow":
            if value:  # empty value = allow all (no rule)
                current["disallow"].append(value)
        elif key == "crawl-delay":
            try:
                ms = int(float(value) * 1000)
            except ValueError:
                continue
            current["delay_ms"] = max(0, min(ms, MAX_DELAY_MS))
    return groups


def rules_for_agent(text: bytes | str, agent: str = "frontier"
                    ) -> tuple[list[str], int]:
    """(disallow_prefixes, crawl_delay_ms) for ``agent``.

    Group choice (RFC 9309 §2.2.1): longest agent token that is a
    prefix of (or equal to) ours wins; ``*`` is the fallback; no
    match → everything allowed.
    """
    agent = agent.lower()
    best: dict | None = None
    best_len = -1
    for group in parse_robots_txt(text):
        for token in group["agents"]:
            if token == "*":
                score = 0
            elif agent.startswith(token):
                score = len(token)
            else:
                continue
            if score > best_len:
                best, best_len = group, score
    if best is None:
        return [], 0
    return list(best["disallow"]), int(best["delay_ms"] or 0)
