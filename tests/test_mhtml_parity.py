"""Behavioral parity suite: the 17 mock-free tests of the reference
(Querela/MHTML) restated byte-for-byte against our kernel.

Fixture bytes and expected values come from
/root/reference/tests/test_mhtml_parse.py and test_mhtml_objects.py
(the remaining 20 reference tests need pytest-mock, unavailable here —
see SURVEY.md §5.2). Every assertion below uses the same inputs and
expects the same outputs as the reference test of the same name.
"""

import pytest

from frontier.kernel import mime


# --------------------------------------------------------------------------
# test_mhtml_parse.py parity
# --------------------------------------------------------------------------


def test_get_content_type():
    headers = mime.ResourceHeader()
    headers["Content-Type"] = "text/html"
    assert mime.get_content_type(headers) == "text/html"

    # case insensitive
    assert mime.get_content_type(
        mime.ResourceHeader([("conTent-TyPe", "text/html")])) == "text/html"

    # parameter strip
    assert mime.get_content_type(
        mime.ResourceHeader([("conTent-TyPe", "multipart/related;\r\n\t...")])
    ) == "multipart/related"

    assert mime.get_content_type(mime.ResourceHeader()) is None

    with pytest.raises(AttributeError):
        mime.get_content_type(None)

    # plain dicts work too, but case-sensitively
    assert mime.get_content_type({"Content-Type": "text/abc"}) == "text/abc"
    assert mime.get_content_type({"conTent-TyPe": "text/abc"}) is None


def test_get_boundary():
    with pytest.raises(AttributeError):
        mime.get_boundary(None)

    assert mime.get_boundary(mime.ResourceHeader()) is None
    assert mime.get_boundary(
        mime.ResourceHeader([("conTent-TyPe", "text/html")])) is None

    # boundary present but not multipart/related
    assert mime.get_boundary(
        mime.ResourceHeader([("conTent-TyPe",
                              'text/html;\r\n\tabc\r\n\tboundary="'
                              '---test-boundary---"')])) is None

    # multipart but no boundary declaration
    assert mime.get_boundary(
        mime.ResourceHeader([("Content-Type",
                              "multipart/related;\r\n\tabc\r\n"
                              "\tnothing-here")])) is None

    assert mime.get_boundary(
        mime.ResourceHeader([("Content-Type",
                              'multipart/related;\r\n\tabc\r\n\tboundary="'
                              '---test-boundary---"')])) == \
        "---test-boundary---"


def test_make_filename():
    assert mime.make_filename(None, default="abc") == "abc"
    assert mime.make_filename(mime.ResourceHeader(), default="abd") == "abd"
    assert mime.make_filename(mime.ResourceHeader([("CH", "CV")]),
                              default="abd") == "abd"

    headers = mime.ResourceHeader()
    headers["Content-Location"] = "proto://path/to/file.ext"
    assert mime.make_filename(headers, guess_extension=False) == "file.ext"
    assert mime.make_filename(headers, folder="abc",
                              guess_extension=False) == "abc/file.ext"
    assert mime.make_filename(headers, guess_extension=True) == "file.ext"
    assert mime.make_filename(headers) == "file.ext"

    del headers["Content-Location"]
    headers["Content-Location"] = "proto://path/to/file"

    assert mime.make_filename(headers, default="abc.hhh") == "file.hhh"
    assert mime.make_filename(headers, default=None) == "file.bin"
    assert mime.make_filename(headers, default="ooo") == "file.bin"
    assert mime.make_filename(headers, default="lolo.olo",
                              ext_from_default=True) == "file.olo"

    headers["Content-Type"] = "myster/lexi"
    assert mime.make_filename(headers, default="ooo.hhh") == "file.lexi"
    assert mime.make_filename(headers, folder="ddd/bbb/",
                              default="ooo.hhh") == "ddd/bbb/file.lexi"
    del headers["Content-Type"]
    headers["Content-Type"] = "mystery"
    assert mime.make_filename(headers) == "file.mystery"

    del headers["Content-Location"]
    headers["Content-Location"] = "proto://path/to/file"
    assert mime.make_filename(headers, default="lolo.olo",
                              ext_from_default=True) == "file.olo"


def test_make_uniq_filename(monkeypatch):
    import os.path

    name = "abc"
    monkeypatch.setattr(os.path, "exists", lambda fn: fn == name)
    assert mime.make_uniq_filename("abc", pre_dup_str="dpp_") == "abc.dpp_1"
    assert mime.make_uniq_filename("abc", pre_dup_str="") == "abc.1"
    assert mime.make_uniq_filename("abc", pre_dup_str=None) == "abc.1"

    name2 = "/kljklk/jkllj/abcd.bi"
    monkeypatch.setattr(os.path, "exists", lambda fn: fn == name2)
    assert mime.make_uniq_filename(name2, pre_dup_str=None) == \
        name2[:-2] + "1.bi"

    monkeypatch.setattr(os.path, "exists",
                        lambda fn: fn in (name, name + ".dpd_1"))
    assert mime.make_uniq_filename("abc", pre_dup_str="dpd_") == "abc.dpd_2"

    monkeypatch.setattr(os.path, "exists", lambda _: False)
    assert mime.make_uniq_filename("abc", pre_dup_str="dpd_") == "abc"
    assert mime.make_uniq_filename("abcd", pre_dup_str="dpd_") == "abcd"


def test_find_next_linebreak():
    assert mime.find_next_linebreak(b"", 0) == -1
    assert mime.find_next_linebreak(b"abc\r\ndef", 0) == 5
    assert mime.find_next_linebreak(b"abc\r\ndef", 6) == -1

    # strict CRLF: \r or \n alone are not line breaks
    assert mime.find_next_linebreak(b"abc\rdef", 0) == -1
    assert mime.find_next_linebreak(b"abc\ndef", 0) == -1

    assert mime.find_next_linebreak(b"abc\r\ndef", -1) == -1

    with pytest.raises(TypeError):
        mime.find_next_linebreak("abc\r\ndef", 0)


def test_next_line():
    assert mime.next_line(b"", 0) == (b"", -1)
    assert mime.next_line(b"abc\r\ndef", 0) == (b"abc\r\n", 5)
    assert mime.next_line(b"abc\r\ndef", 1) == (b"bc\r\n", 5)

    # TAB continuation folds into one logical line
    assert mime.next_line(b"abc;\r\n\tcba\r\ndef", 1) == \
        (b"bc;\r\n\tcba\r\n", 12)

    # from_pos=-1: unspecified, mirrors reference best-effort
    assert mime.next_line(b"abc\r\ndef", -1) == (b"f", -1)

    with pytest.raises(AttributeError):
        mime.next_line(None, -1)


def test_parse_header():
    assert mime.parse_header(b"", 0) == (mime.ResourceHeader(), -1)

    # missing terminating empty line → assertion
    with pytest.raises(AssertionError):
        mime.parse_header(b"CH: CV\r\n", 0)

    assert mime.parse_header(b"CH: CV\r\n\r\n", 0) == \
        (mime.ResourceHeader([("CH", "CV")]), -1)
    assert mime.parse_header(b"CH: CV\r\nCH2: CV2\r\nCH3: CV3\r\n\r\n", 0) == \
        (mime.ResourceHeader([("CH", "CV"), ("CH2", "CV2"),
                              ("CH3", "CV3")]), -1)

    # extra spaces after ': ' stay in the value
    assert mime.parse_header(b"CH:     CV\r\n\r\n", 0) == \
        (mime.ResourceHeader([("CH", "    CV")]), -1)
    # no space after colon → line skipped
    assert mime.parse_header(b"CH:CV\r\n\r\n", 0) == \
        (mime.ResourceHeader([]), -1)

    assert mime.parse_header(b"CH: CV\r\n\r\n\r\n-----boundary---", 0) == \
        (mime.ResourceHeader([("CH", "CV")]), 10)

    # folded values keep embedded CRLF+TAB
    assert mime.parse_header(b"CH: CV;\r\n\tCV2\r\n\r\n", 0) == \
        (mime.ResourceHeader([("CH", "CV;\r\n\tCV2")]), -1)
    assert mime.parse_header(b"CH: CV;\r\n\tCV2\r\nCH2: CV3\r\n\r\n", 0) == \
        (mime.ResourceHeader([("CH", "CV;\r\n\tCV2"), ("CH2", "CV3")]), -1)


def test_find_next_boundary():
    assert mime.find_next_boundary(b"", "---boundary---", 0) == (-1, -1)

    # boundary at position 0 (no preceding CRLF) is not a boundary
    assert mime.find_next_boundary(
        b"-----boundary---\r\n", "---boundary---", 0) == (-1, -1)

    assert mime.find_next_boundary(
        b"\r\n-----boundary---\r\n", "---boundary---", 0) == (2, 20)

    # terminator flush at EOF → next_pos -1
    assert mime.find_next_boundary(
        b"\r\n-----boundary-----\r\n", "---boundary---", 0) == (2, -1)


def test_parse_part():
    with pytest.raises(TypeError):
        mime.parse_part(b"", b"", 0)

    bndry = "---boundary---"
    part_bndry = bytes("--" + bndry + "\r\n", "ascii")
    file_bndry = bytes("--" + bndry + "--\r\n", "ascii")

    assert mime.parse_part(b"", bndry, 0) == \
        ((mime.ResourceHeader(), 0, -1, 0), -1)
    # last part before the file terminator
    assert mime.parse_part(b"CH: CV\r\n\r\ncontent\r\n" + file_bndry,
                           bndry, 0) == \
        ((mime.ResourceHeader([("CH", "CV")]), 0, 10, 19), -1)
    # part followed by another part boundary
    assert mime.parse_part(b"CH: CV\r\n\r\ncontent\r\n" + part_bndry,
                           bndry, 0) == \
        ((mime.ResourceHeader([("CH", "CV")]), 0, 10, 19), 37)


def test_parse_parts_missing_head_boundary():
    bndry = "---boundary---"
    file_bndry = bytes("--" + bndry + "--\r\n", "ascii")
    assert mime.parse_parts(b"", bndry, 0) == ([], -1)

    assert mime.parse_parts(b"CH: CV\r\n\r\n", bndry, 0) == ([], -1)
    assert mime.parse_parts(b"CH: CV\r\n\r\n" + file_bndry, bndry, 0) == \
        ([], -1)
    assert mime.parse_parts(b"CH: CV\r\n\r\ncontent\r\n" + file_bndry,
                            bndry, 0) == ([], -1)


def test_parse_parts_with_head_boundary():
    bndry = "---boundary---"
    part_bndry = bytes("--" + bndry + "\r\n", "ascii")
    file_bndry = bytes("--" + bndry + "--\r\n", "ascii")

    assert mime.parse_parts(b"\r\n" + part_bndry +
                            b"CH: CV\r\n\r\ncontent\r\n", bndry, 2) == \
        ([(mime.ResourceHeader([("CH", "CV")]), 20, 30, 39)], -1)

    # trailing empty part between boundaries
    assert mime.parse_parts(b"\r\n" + part_bndry +
                            b"CH: CV\r\n\r\ncontent\r\n" + part_bndry,
                            bndry, 2) == \
        ([(mime.ResourceHeader([("CH", "CV")]), 20, 30, 39),
          (mime.ResourceHeader(), 57, -1, 57)], -1)

    assert mime.parse_parts(b"\r\n" + part_bndry +
                            b"CH: CV\r\n\r\ncontent\r\n" + file_bndry,
                            bndry, 0) == \
        ([(mime.ResourceHeader([("CH", "CV")]), 20, 30, 39)], -1)


# --------------------------------------------------------------------------
# test_mhtml_objects.py parity
# --------------------------------------------------------------------------


def test_parse_mhtml_struct():
    # the reference test body is empty (tests/test_mhtml_objects.py:12-13)
    pass


def test_ContentEncoding():  # noqa: N802
    CE = mime.ContentEncoding
    assert CE.parse("") is CE.UNKNOWN
    assert CE.parse(" ") is CE.UNKNOWN
    assert CE.parse("binary") is CE.BINARY
    assert CE.parse(" bInAry") is CE.BINARY
    assert CE.parse("B In Ary") is CE.UNKNOWN


def test_ResourceHeader_headers():  # noqa: N802
    rh = mime.ResourceHeader([("a", "b")])
    assert rh._headers == [("a", "b")]
    rh = mime.ResourceHeader({"aA": "BbC"})
    assert rh._headers == [("aA", "BbC")]

    rh = mime.ResourceHeader()
    assert rh._headers == []
    assert len(rh) == 0
    rh["C"] = "BbBb"
    rh["AAaA"] = "BbBb"
    rh["AAaA"] = "BbBb"
    rh["aaaa"] = "bbbb"
    assert rh._headers == [("C", "BbBb"), ("AAaA", "BbBb"), ("AAaA", "BbBb"),
                           ("aaaa", "bbbb")]
    assert rh.items() == [("C", "BbBb"), ("AAaA", "BbBb"), ("AAaA", "BbBb"),
                          ("aaaa", "bbbb")]
    assert len(rh) == 4

    # None key ignored, '' key allowed
    rh[None] = 1
    assert len(rh) == 4
    rh[""] = 1
    assert len(rh) == 5

    # non-str names are stringified
    rh[1] = 2
    assert len(rh) == 6
    assert rh._headers[5] == ("1", 2)

    assert "1" in rh
    assert "c" in rh
    assert "aaaa" in rh
    assert "AAAA" in rh
    assert "xxxxx" not in rh

    rh[None] = 1
    assert None not in rh


def test_ResourceHeader_magic():  # noqa: N802
    rh1 = mime.ResourceHeader([("a", "b")])
    rh2 = mime.ResourceHeader([("A", "b")])
    rh3 = mime.ResourceHeader([("A", "b")])
    rh4 = mime.ResourceHeader([("c", "b")])
    assert not rh1 == rh2
    assert rh2 == rh3
    assert rh1 != rh2
    assert not rh2 != rh3
    assert rh2 != rh4
    assert not rh1 == rh4
    assert (not rh1.__eq__(rh2)) == rh1.__ne__(rh2)
    assert rh3.__eq__(rh2) == (not rh3.__ne__(rh2))

    # equality checks type, not just contents
    assert rh1 != rh1._headers

    assert str(rh2) == str(rh2._headers)
    assert repr(rh2) == "ResourceHeader: " + repr(rh2._headers)

    rh = mime.ResourceHeader([("a", "b"), ("A", "c"), ("D", "e")])
    assert rh.as_list() == [("a", "b"), ("A", "c"), ("D", "e")]
    hl = rh.as_list()
    hl.append(("t", "t"))
    assert rh.as_list() != hl

    rh = mime.ResourceHeader([("a", "b"), ("A", "c"), ("D", "e")])
    assert rh.as_dict() == {"a": "b", "A": "c", "D": "e"}

    rh = mime.ResourceHeader([("a", "b"), ("A", "c"), ("D", "e")])
    assert iter(rh)
    assert list(rh) == ["a", "A", "D"]

    # del removes ALL case-insensitive matches; del None is a no-op
    rh = mime.ResourceHeader([("a", "b"), ("A", "c"), ("D", "e")])
    del rh["a"]
    assert rh.items() == [("D", "e")]
    del rh[None]
    assert len(rh) == 1

    rh = mime.ResourceHeader()
    rh[""] = "h"
    assert len(rh) == 1
    assert rh[""] == "h"
    del rh[""]
    assert len(rh) == 0


def test_ResourceHeader_methods_get():  # noqa: N802
    rh = mime.ResourceHeader()
    rh["a"] = "b"

    assert rh.get(None, None) is None
    assert rh.get(None, "y") == "y"

    assert rh.get("A") == "b"
    assert rh.get("a") == "b"
    assert rh.get("a", None) == "b"
    assert rh.get("c", "x") == "x"

    assert rh.get_all("a") == ["b"]
    assert rh.get_all("c") == []
    assert rh.get_all(None) == []
    assert rh.get_all(None, default=1) == 1

    rh["A"] = "F"
    assert rh.get_all("a") == ["b", "F"]

    assert rh["a"] == "b"
    rh["C"] = 1
    rh["c"] = 2
    assert rh["c"] == 1  # get returns the FIRST case-insensitive match


def test_Resource_content():  # noqa: N802
    bndry = "---boundary1---"
    arc = mime.MHTMLArchive(b"-", None, 0, bndry)

    res = mime.Resource(arc, None, 0, 0, 0)
    res._mhtml_file._content = None
    assert res.get_content() is None
    assert res.content is None
    assert res.content_with_headers is None
    res._mhtml_file = None
    assert res.get_content() is None
    assert res.content is None
    assert res.content_with_headers is None

    bndry_part = bytes("--" + bndry + "\r\n", "ascii")
    bndry_end = bytes("--" + bndry + "--\r\n", "ascii")
    content_header = b"H1: V1\r\n\r\n"
    content_content = b"Content\r\n"
    content = bndry_part + content_header + content_content + bndry_end
    offset = len(bndry_part)
    offset_content = offset + len(content_header)
    offset_end = offset_content + len(content_content)

    arc = mime.MHTMLArchive(content, None, 0, bndry)
    res = mime.Resource(arc, None, offset, offset_content, offset_end)
    assert res.get_content() == content_content
    assert res.content_with_headers == content_header + content_content
    assert res.get_resource_range(-1) == (0, offset_end)
    assert res.get_resource_range(offset) == (0, offset_end)

    with pytest.raises(AssertionError):
        res._update_offsets("a")
    with pytest.raises(AssertionError):
        res._update_offsets(-3.4)
    with pytest.raises(AssertionError):
        res._update_offsets(None)

    res._update_offsets(-1)
    assert res._offset_start == offset - 1
    assert res._offset_content == offset_content - 1
    assert res._offset_end == offset_end - 1
    res._update_offsets(3)
    assert res._offset_start == offset - 1 + 3
    assert res._offset_content == offset_content - 1 + 3
    assert res._offset_end == offset_end - 1 + 3
