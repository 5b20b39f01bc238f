"""MIME Content-Transfer-Encoding decode kernel.

The reference left base64 / quoted-printable decoding unimplemented
(``/root/reference/mhtml.py:477-482`` returns None; ``TODO.rst:3-5``)
— the north_star requires us to implement it for real. Decoders follow
RFC 2045 semantics; stdlib ``quopri`` / ``base64`` are the behavioral
oracles (see tests/test_decode.py) but the hot path is bytes-level and
Arrow-batch friendly (no per-row Python object churn beyond bytes).
"""

from __future__ import annotations

import binascii
import quopri

from .mime import ContentEncoding

_PASSTHROUGH = frozenset((
    ContentEncoding.BINARY,
    ContentEncoding.SEVENBIT,
    ContentEncoding.EIGHTBIT,
))


def decode_quoted_printable(raw: bytes) -> bytes:
    """RFC 2045 §6.7 quoted-printable decode (soft line breaks,
    ``=XX`` escapes; tolerant of bare LF)."""
    return quopri.decodestring(raw)


def decode_base64(raw: bytes) -> bytes:
    """MIME base64 decode: line-wrapped, whitespace-tolerant.

    ``binascii.a2b_base64`` already ignores embedded newlines; we also
    tolerate missing padding (pad to a multiple of 4) because crawled
    content is frequently truncated mid-transfer.
    """
    compact = b"".join(raw.split())
    pad = (-len(compact)) % 4
    if pad:
        compact += b"=" * pad
    try:
        return binascii.a2b_base64(compact)
    except (binascii.Error, ValueError):
        # salvage whole 4-byte groups; one malformed page must never
        # kill a task (SURVEY.md §2.8 error contract)
        usable = len(compact) - (len(compact) % 4)
        try:
            return binascii.a2b_base64(compact[:usable])
        except (binascii.Error, ValueError):
            return b""


def decode_payload(raw: bytes, encoding: str | None,
                   strict: bool = False,
                   default_7bit: bool = False) -> bytes | None:
    """Decode one part payload according to its transfer encoding.

    ``strict=True`` reproduces the reference's behavior exactly
    (base64/qp → None, mhtml.py:477-482); the default actually decodes.
    Unknown encodings → None in both modes (mhtml.py:484-487).

    ``default_7bit=True``: a part with NO Content-Transfer-Encoding
    header at all decodes as 7bit (RFC 2045 §6.1 default) instead of
    None — real crawled MHTML frequently omits the header, and parity
    mode would silently drop that text. An unrecognized non-empty
    encoding value still decodes to None in every mode.
    """
    if encoding is None and default_7bit:
        return raw
    enc = ContentEncoding.parse(encoding)
    if enc in _PASSTHROUGH:
        return raw
    if enc is ContentEncoding.BASE64:
        return None if strict else decode_base64(raw)
    if enc is ContentEncoding.QUOTEDPRINTABLE:
        return None if strict else decode_quoted_printable(raw)
    return None


def encode_quoted_printable(raw: bytes) -> bytes:
    """Inverse transform used by the synthetic page generator."""
    return quopri.encodestring(raw)


def encode_base64(raw: bytes, wrap: int = 76) -> bytes:
    """MIME base64 with CRLF line wrapping at ``wrap`` columns."""
    flat = binascii.b2a_base64(raw, newline=False)
    lines = [flat[i:i + wrap] for i in range(0, len(flat), wrap)] or [b""]
    return b"\r\n".join(lines)
