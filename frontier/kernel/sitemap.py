"""sitemaps.org protocol parsing — the crawl's third seed source.

A production frontier discovers URLs three ways: operator seed lists,
links extracted from fetched pages, and **sitemaps** advertised by
``Sitemap:`` lines in robots.txt (sitemaps.org; the line is
group-independent — RFC 9309 treats it as an "other record" passed
through). The reference has no crawl loop at all; this is mandate
depth on the north-rule scheduler, the same class as
schedule.recrawl_schedule (which consumes the ``lastmod`` /
``changefreq`` priors surfaced here).

Wire formats handled, all deterministic and **never raising** (one
malformed crawled sitemap must not kill a Spark task):

* ``<urlset>`` XML — entries ``(loc, lastmod, changefreq, priority)``;
* ``<sitemapindex>`` XML — child sitemap locs (recursion is the
  CALLER's loop: on Spark it is a per-round fetch of the child locs,
  never an in-kernel network walk);
* plain-text sitemaps — one URL per line;
* any of the above gzipped (``.xml.gz``, sniffed by magic, inflated
  with a hard output cap so a zip bomb degrades to a truncated parse
  instead of an OOM).

XML is extracted with tolerant regexes rather than an XML parser:
crawled sitemaps are full of undeclared namespaces, stray entities,
and unclosed tags that make strict parsers raise, while the
sitemaps.org payload grammar (``<url><loc>…``) is regular. Only the
five XML built-in entities are unescaped in ``<loc>`` (the spec
requires locs be entity-escaped).

Per-file entry cap: 50,000 (the sitemaps.org limit) — beyond it the
file is truncated, mirroring what consumers do.
"""

from __future__ import annotations

import re
import zlib

MAX_ENTRIES = 50_000          # sitemaps.org per-file limit
MAX_INFLATE = 64 * 1024 * 1024  # gzip output cap (spec: 50 MiB raw)

CHANGEFREQS = ("always", "hourly", "daily", "weekly", "monthly",
               "yearly", "never")

# optional namespace prefix on every tag — crawled sitemaps mix them
_URL_BLOCK_RE = re.compile(
    r"<(?:\w+:)?url[\s>].*?</(?:\w+:)?url\s*>", re.S | re.I)
_SITEMAP_BLOCK_RE = re.compile(
    r"<(?:\w+:)?sitemap[\s>].*?</(?:\w+:)?sitemap\s*>", re.S | re.I)
_LOC_RE = re.compile(
    r"<(?:\w+:)?loc\s*>\s*(.*?)\s*</(?:\w+:)?loc\s*>", re.S | re.I)
_LASTMOD_RE = re.compile(
    r"<(?:\w+:)?lastmod\s*>\s*(.*?)\s*</(?:\w+:)?lastmod\s*>",
    re.S | re.I)
_CHANGEFREQ_RE = re.compile(
    r"<(?:\w+:)?changefreq\s*>\s*(.*?)\s*</(?:\w+:)?changefreq\s*>",
    re.S | re.I)
_PRIORITY_RE = re.compile(
    r"<(?:\w+:)?priority\s*>\s*(.*?)\s*</(?:\w+:)?priority\s*>",
    re.S | re.I)
_URLSET_RE = re.compile(r"<(?:\w+:)?urlset[\s>]", re.I)
_INDEX_RE = re.compile(r"<(?:\w+:)?sitemapindex[\s>]", re.I)

_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&apos;", "'"), ("&amp;", "&"))  # &amp; LAST


def _unescape(loc: str) -> str:
    for ent, ch in _ENTITIES:
        loc = loc.replace(ent, ch)
    return loc


_W3C_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})"
    r"(?:[Tt ](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{1,6})\d*)?)?"
    r"(Z|z|[+-]\d{2}:?\d{2})?)?$")

_DAYS_BEFORE_MONTH = (0, 0, 31, 59, 90, 120, 151, 181, 212, 243, 273,
                      304, 334)


def w3c_datetime_us(s: str | None) -> int | None:
    """W3C datetime (the ``lastmod`` format) → UTC epoch microseconds,
    or None if unparseable. Date-only values mean 00:00:00 UTC; a
    missing timezone means UTC (the spec requires one, crawled files
    omit it). Pure integer arithmetic — no locale, no platform
    timestamp range limits."""
    if not s:
        return None
    m = _W3C_RE.match(s.strip())
    if not m:
        return None
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if not (1 <= mo <= 12 and 1 <= d <= 31):
        return None
    hh = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    ss = int(m.group(6) or 0)
    us = int((m.group(7) or "0").ljust(6, "0"))
    if hh > 23 or mi > 59 or ss > 60:
        return None
    # days since 1970-01-01 (proleptic Gregorian)
    yy = y - 1
    days = yy * 365 + yy // 4 - yy // 100 + yy // 400 - 719162
    days += _DAYS_BEFORE_MONTH[mo] + (d - 1)
    if mo > 2 and (y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)):
        days += 1
    total = ((days * 86_400 + hh * 3_600 + mi * 60 + ss) * 1_000_000
             + us)
    tz = m.group(8)
    if tz and tz not in ("Z", "z"):
        sign = 1 if tz[0] == "+" else -1
        tzh, tzm = int(tz[1:3]), int(tz[-2:])
        total -= sign * (tzh * 3_600 + tzm * 60) * 1_000_000
    return total


def _maybe_gunzip(body: bytes) -> bytes:
    if len(body) < 2 or body[:2] != b"\x1f\x8b":
        return body
    try:
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(body, MAX_INFLATE)
        return out  # truncated at the cap — degrade, don't OOM
    except zlib.error:
        return b""


_PLAIN_URL_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://\S+$")


def parse_sitemap(body: bytes | str) -> dict:
    """→ ``{"kind": "urlset" | "index" | "plain" | "empty",
    "entries": [(loc, lastmod_us, changefreq, priority)],
    "children": [child sitemap locs]}``.

    ``entries`` is populated for urlset/plain kinds (plain rows carry
    None priors), ``children`` for index kind. Unknown/garbage input
    → ``empty`` with both lists empty. Never raises.
    """
    if isinstance(body, str):
        body = body.encode("utf-8", errors="replace")
    body = _maybe_gunzip(body)
    text = body.decode("utf-8", errors="replace").lstrip("﻿")

    if _INDEX_RE.search(text):
        children = []
        for block in _SITEMAP_BLOCK_RE.findall(text):
            loc = _LOC_RE.search(block)
            if loc and loc.group(1):
                children.append(_unescape(loc.group(1)))
            if len(children) >= MAX_ENTRIES:
                break
        return {"kind": "index", "entries": [], "children": children}

    if _URLSET_RE.search(text):
        entries = []
        for block in _URL_BLOCK_RE.findall(text):
            loc = _LOC_RE.search(block)
            if not loc or not loc.group(1):
                continue
            lastmod = _LASTMOD_RE.search(block)
            freq = _CHANGEFREQ_RE.search(block)
            prio = _PRIORITY_RE.search(block)
            freq_v = (freq.group(1).strip().lower() if freq else None)
            if freq_v not in CHANGEFREQS:
                freq_v = None
            prio_v = None
            if prio:
                try:
                    p = float(prio.group(1))
                except ValueError:
                    p = None
                if p is not None and 0.0 <= p <= 1.0:
                    prio_v = p
            entries.append((_unescape(loc.group(1)),
                            w3c_datetime_us(
                                lastmod.group(1) if lastmod else None),
                            freq_v, prio_v))
            if len(entries) >= MAX_ENTRIES:
                break
        return {"kind": "urlset", "entries": entries, "children": []}

    # plain-text sitemap: one absolute URL per line
    entries = []
    for line in text.splitlines():
        line = line.strip()
        if _PLAIN_URL_RE.match(line):
            entries.append((line, None, None, None))
            if len(entries) >= MAX_ENTRIES:
                break
    kind = "plain" if entries else "empty"
    return {"kind": kind, "entries": entries, "children": []}
