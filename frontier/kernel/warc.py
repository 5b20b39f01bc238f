"""Minimal WARC (ISO 28500) record codec — the Common-Crawl container.

The north_star input is "Common-Crawl-style web pages"; real Common
Crawl ships WARC files, so the engine reads/writes them natively:
one ``response`` record per page, the page's MHTML bytes as the
record block. Both plain records and the member-gzip framing Common
Crawl actually ships (``.warc.gz``: each record its own gzip member,
members concatenated — ISO 28500 annex D) are supported; see
:func:`gzip_member` / :func:`gunzip_members`.

Record grammar (WARC/1.1 §4): version line ``WARC/1.0`` CRLF, header
block (same ``Name: value`` + CRLF folding as MIME — the mime-kernel
header parser is reused verbatim), empty line, ``Content-Length``
bytes of block, CRLF CRLF. Offsets are returned, never copies — the
Spark source slices blocks zero-copy from the file bytes, exactly
like the MHTML parse kernel (parse.py provenance offsets).
"""

from __future__ import annotations

from datetime import datetime, timezone

from . import mime

CRLF = b"\r\n"
VERSION = b"WARC/1.0"


def parse_warc_records(buf: bytes):
    """→ list of (headers, block_start, block_end).

    Malformed input raises (callers in Spark kernels catch per-file,
    SURVEY.md §2.8); records with a bad Content-Length are clamped to
    the buffer so one truncated tail record can't read out of range.
    """
    records = []
    pos = 0
    n = len(buf)
    while pos < n:
        while buf[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        line, nxt = mime.next_line(buf, pos)
        if not line.startswith(VERSION.split(b"/")[0] + b"/"):
            raise ValueError(f"bad WARC version line at {pos}: {line[:20]!r}")
        if nxt == -1:
            raise ValueError("record header truncated")
        headers, body = mime.parse_header(buf, nxt)
        try:
            clen = int(headers.get("Content-Length") or 0)
        except ValueError as exc:
            raise ValueError("bad Content-Length") from exc
        end = min(body + clen, n)
        records.append((headers, body, end))
        pos = end
    return records


def encode_record(headers: list[tuple[str, str]], block: bytes) -> bytes:
    """One WARC record; Content-Length computed, never trusted."""
    out = bytearray(VERSION + CRLF)
    for name, value in headers:
        if name.lower() == "content-length":
            continue
        out += f"{name}: {value}".encode() + CRLF
    out += f"Content-Length: {len(block)}".encode() + CRLF
    out += CRLF
    out += block
    out += CRLF + CRLF
    return bytes(out)


GZIP_MAGIC = b"\x1f\x8b"


def gzip_member(record: bytes) -> bytes:
    """One record → one gzip member (mtime pinned to 0 so output is
    deterministic — byte round-trips are testable)."""
    import gzip

    return gzip.compress(record, mtime=0)


def gunzip_members(buf: bytes) -> bytes:
    """Concatenated gzip members → concatenated decompressed bytes.

    Streams member-by-member via ``decompressobj(wbits=31)`` +
    ``unused_data`` (the stdlib idiom for multi-member gzip); raises
    ValueError on trailing non-gzip bytes or a truncated member so
    callers can skip the FILE per §2.8.
    """
    import zlib

    out = bytearray()
    data = bytes(buf)
    while data:
        if data[:2] != GZIP_MAGIC:
            raise ValueError("trailing non-gzip bytes in .warc.gz")
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(data)
            out += d.flush()
        except zlib.error as exc:
            raise ValueError("corrupt gzip member") from exc
        if not d.eof:
            raise ValueError("truncated gzip member")
        data = d.unused_data
    return bytes(out)


def format_warc_date(ts_us: int) -> str:
    """Microsecond-precision WARC-Date (WARC/1.1 allows sub-second)."""
    dt = datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def parse_warc_date(value: str) -> int:
    """WARC-Date → epoch micros (accepts with/without sub-second)."""
    v = value.strip()
    if v.endswith("Z"):
        v = v[:-1] + "+00:00"
    dt = datetime.fromisoformat(v)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def record_id(*parts: str) -> str:
    """Deterministic WARC-Record-ID (``<urn:uuid:...>``): an RFC
    4122 v4-shaped uuid derived from md5 of the parts, so sinks are
    byte-reproducible (the same determinism rule as gzip mtime=0)
    and request/metadata records can point at their response via
    WARC-Concurrent-To without any driver coordination."""
    import hashlib

    h = bytearray(hashlib.md5(":".join(parts).encode()).digest())
    h[6] = (h[6] & 0x0F) | 0x40  # version 4
    h[8] = (h[8] & 0x3F) | 0x80  # RFC 4122 variant
    x = h.hex()
    return (f"<urn:uuid:{x[:8]}-{x[8:12]}-{x[12:16]}-"
            f"{x[16:20]}-{x[20:]}>")


def page_record(url: str, ts_us: int, html: bytes) -> bytes:
    """pages-relation row → WARC response record (WARC-Record-ID
    deterministic so sibling request/metadata records can reference
    it)."""
    return encode_record([
        ("WARC-Type", "response"),
        ("WARC-Record-ID", record_id("response", url, str(ts_us))),
        ("WARC-Target-URI", url),
        ("WARC-Date", format_warc_date(ts_us)),
        ("Content-Type", "multipart/related"),
    ], html)


def warcinfo_record(filename: str, ts_us: int,
                    fields: list[tuple[str, str]] | None = None
                    ) -> bytes:
    """File-level ``warcinfo`` record (WARC/1.1 §6.2) — Common Crawl
    opens every WARC file with one; block is application/warc-fields
    describing the writer. WARC-Filename carries the member name."""
    fields = fields if fields is not None else [
        ("software", "frontier"),
        ("format", "WARC File Format 1.1")]
    block = "".join(f"{k}: {v}\r\n" for k, v in fields).encode()
    return encode_record([
        ("WARC-Type", "warcinfo"),
        ("WARC-Record-ID", record_id("warcinfo", filename, str(ts_us))),
        ("WARC-Filename", filename),
        ("WARC-Date", format_warc_date(ts_us)),
        ("Content-Type", "application/warc-fields"),
    ], block)


def request_record(url: str, ts_us: int) -> bytes:
    """pages-relation row → the WARC ``request`` record Common Crawl
    stores alongside each response (WARC/1.1 §6.4): a minimal HTTP/1.1
    GET reconstructed from the URL, linked to the response via
    WARC-Concurrent-To."""
    rest = url.split("://", 1)[-1]
    host, _, path = rest.partition("/")
    http = (f"GET /{path} HTTP/1.1\r\n"
            f"Host: {host}\r\n"
            f"User-Agent: frontier\r\n\r\n").encode()
    return encode_record([
        ("WARC-Type", "request"),
        ("WARC-Record-ID", record_id("request", url, str(ts_us))),
        ("WARC-Concurrent-To", record_id("response", url, str(ts_us))),
        ("WARC-Target-URI", url),
        ("WARC-Date", format_warc_date(ts_us)),
        ("Content-Type", "application/http; msgtype=request"),
    ], http)


def metadata_record(url: str, ts_us: int,
                    fields: list[tuple[str, str]]) -> bytes:
    """pages-relation row → the WARC ``metadata`` record (WARC/1.1
    §6.6): ``application/warc-fields`` name:value lines (Common
    Crawl uses these for fetch diagnostics), linked to the response
    via WARC-Concurrent-To."""
    block = "".join(f"{k}: {v}\r\n" for k, v in fields).encode()
    return encode_record([
        ("WARC-Type", "metadata"),
        ("WARC-Record-ID", record_id("metadata", url, str(ts_us))),
        ("WARC-Concurrent-To", record_id("response", url, str(ts_us))),
        ("WARC-Target-URI", url),
        ("WARC-Date", format_warc_date(ts_us)),
        ("Content-Type", "application/warc-fields"),
    ], block)


def conversion_record(url: str, ts_us: int, text: str) -> bytes:
    """results-relation row → WARC ``conversion`` record — the WET
    shape (Common Crawl's extracted-text sidecars are WARC files of
    conversion records, one per page, UTF-8 plain-text block)."""
    return encode_record([
        ("WARC-Type", "conversion"),
        ("WARC-Target-URI", url),
        ("WARC-Date", format_warc_date(ts_us)),
        ("Content-Type", "text/plain"),
    ], text.encode("utf-8"))
