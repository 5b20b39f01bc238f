"""Deterministic URL canonicalization for the crawl frontier.

The reference keys its URL-seen set on raw ``resource.location``
strings (``/root/reference/mhtml_scripts/merge.py:30-44``). At 10^10
URLs we canonicalize first so that trivially-equivalent URLs share one
seen-set slot. Rules (documented, deterministic, order-independent):

1. scheme and host lowercased
2. default ports stripped (``:80`` http, ``:443`` https)
3. fragment removed
4. query keys sorted (stable sort; duplicate keys keep their relative
   order), empty query dropped
5. path ``.``/``..`` segments resolved; empty path → ``/``

Pure string ops — vectorizes cleanly under pandas ``Series.map`` inside
Arrow batches (no per-row Spark-level Python UDF; see
frontier/spark/schedule.py).
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit, parse_qsl, urlencode

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize(url: str | None) -> str | None:
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    if not host:
        return None
    # urlsplit defers port validation to the .port accessor: a crawled
    # link like http://h:notaport/ or :99999 raises ValueError HERE,
    # not at urlsplit time. One malformed link must never kill a Spark
    # task (SURVEY.md §2.8), so treat an invalid port as un-canonical.
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"

    path = _normalize_path(parts.path)

    query = ""
    if parts.query:
        pairs = parse_qsl(parts.query, keep_blank_values=True)
        pairs.sort(key=lambda kv: kv[0])  # stable: dup keys keep order
        query = urlencode(pairs)

    return urlunsplit((scheme, netloc, path, query, ""))


def _normalize_path(path: str) -> str:
    if not path:
        return "/"
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1]:
                out.pop()
            continue
        out.append(seg)
    norm = "/".join(out)
    if not norm.startswith("/"):
        norm = "/" + norm
    return norm


def host_of(url: str | None) -> str | None:
    """Lowercased hostname, or None — the politeness partition key."""
    if not url:
        return None
    try:
        return (urlsplit(url).hostname or "").lower() or None
    except ValueError:
        return None
