"""Decode kernel tests: stdlib quopri/base64 are the oracles
(the behavior the reference's own legacy extractor relied on via
email.get_payload(decode=True), /root/reference/mhtml_scripts/extract_old.py).
"""

import base64
import quopri

from hypothesis import given, strategies as st

from frontier.kernel import decode
from frontier.kernel.mime import ContentEncoding


def test_passthrough_encodings():
    for enc in ("binary", "7bit", "8bit", " BiNaRy "):
        assert decode.decode_payload(b"\x00\xffraw", enc) == b"\x00\xffraw"


def test_unknown_encoding_is_none():
    assert decode.decode_payload(b"x", "base64binary") is None
    assert decode.decode_payload(b"x", None) is None
    assert decode.decode_payload(b"x", "") is None


def test_strict_mode_reproduces_reference_nones():
    # the reference returns None for base64/qp (mhtml.py:477-482)
    assert decode.decode_payload(b"aGk=", "base64", strict=True) is None
    assert decode.decode_payload(b"hi", "quoted-printable", strict=True) is None
    assert decode.decode_payload(b"raw", "binary", strict=True) == b"raw"


def test_quoted_printable_roundtrip():
    payload = "héllo wörld = 100%\r\nsecond line\r\n".encode("utf-8")
    encoded = decode.encode_quoted_printable(payload)
    assert decode.decode_quoted_printable(encoded) == payload
    assert decode.decode_payload(encoded, "quoted-printable") == payload


def test_base64_linewrapped_roundtrip():
    payload = bytes(range(256)) * 10
    encoded = decode.encode_base64(payload)
    # MIME wrapping inserts CRLFs that plain b64decode would choke on
    # without validate=False; our decoder must handle them
    assert b"\r\n" in encoded
    assert decode.decode_base64(encoded) == payload
    assert decode.decode_payload(encoded, "base64") == payload


def test_base64_missing_padding():
    unpadded = base64.b64encode(b"abcde").rstrip(b"=")
    assert decode.decode_base64(unpadded) == b"abcde"


@given(st.binary(max_size=2048))
def test_qp_matches_stdlib(payload):
    encoded = quopri.encodestring(payload)
    assert decode.decode_quoted_printable(encoded) == \
        quopri.decodestring(encoded) == payload


@given(st.binary(max_size=2048))
def test_b64_matches_stdlib(payload):
    encoded = decode.encode_base64(payload)
    assert decode.decode_base64(encoded) == payload


def test_content_encoding_dispatch_table():
    assert ContentEncoding.parse("quoted-printable") is \
        ContentEncoding.QUOTEDPRINTABLE
    assert ContentEncoding.parse("BASE64") is ContentEncoding.BASE64


def test_default_7bit_flag():
    """RFC 2045 §6.1: no Content-Transfer-Encoding header → 7bit.
    Flag off (parity): missing header decodes to None, matching the
    reference (mhtml.py:484-487). Flag on: passthrough. An explicit
    UNKNOWN encoding value stays None in both modes."""
    from frontier.kernel.decode import decode_payload
    raw = b"plain bytes"
    assert decode_payload(raw, None) is None                 # parity
    assert decode_payload(raw, None, default_7bit=True) == raw
    assert decode_payload(raw, "x-weird") is None
    assert decode_payload(raw, "x-weird", default_7bit=True) is None
    assert decode_payload(raw, "7bit", default_7bit=True) == raw
