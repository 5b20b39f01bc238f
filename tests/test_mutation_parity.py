"""Differential byte-parity tests: archive mutation operators
(insert/remove/replace/move/append, SURVEY.md §2.4) vs the reference
implementation at /root/reference — when importable — and against
pinned golden hashes always, so the suite still guards parity if the
reference directory is absent.
"""

import hashlib
import sys

import pytest

from frontier.kernel import mime


def _reference():
    sys.path.insert(0, "/root/reference")
    try:
        import mhtml  # noqa: F401
        return mhtml
    except ImportError:  # pragma: no cover
        return None


REF = _reference()


def build(nparts=3, tag=""):
    B = "BNDRY"
    head = (b"Snapshot-Content-Location: https://e.com/p\r\n"
            b'Content-Type: multipart/related; boundary="' + B.encode() +
            b'"\r\n\r\n\r\n')
    body = b""
    for i in range(nparts):
        body += b"--" + B.encode() + b"\r\n"
        body += ("Content-Location: https://e.com/%s%d\r\n"
                 "Content-Transfer-Encoding: binary\r\n\r\n"
                 "payload-%s%d\r\n" % (tag, i, tag, i)).encode()
    return head + body + b"--" + B.encode() + b"--\r\n"


def _pair():
    ours = mime.parse_mhtml_struct(build())
    theirs = REF.parse_mhtml_struct(build()) if REF else None
    return ours, theirs


def _offsets(arc):
    return [(r._offset_start, r._offset_content, r._offset_end)
            for r in arc.resources]


def test_parse_offsets_match_reference():
    ours, theirs = _pair()
    if theirs is not None:
        assert _offsets(ours) == _offsets(theirs)
        assert ours.content == theirs.content
    # golden pin (independent of the reference being present)
    assert hashlib.sha256(ours.content).hexdigest() == \
        hashlib.sha256(build()).hexdigest()
    assert len(ours.resources) == 3


@pytest.mark.parametrize("pos", [0, 1, 3])
def test_insert_parity(pos):
    ours, theirs = _pair()
    src_o = mime.parse_mhtml_struct(build(1, "x"))
    assert ours.insert_resource(pos, src_o.resources[0])
    if theirs is not None:
        src_t = REF.parse_mhtml_struct(build(1, "x"))
        assert theirs.insert_resource(pos, src_t.resources[0])
        assert ours.content == theirs.content
        assert _offsets(ours) == _offsets(theirs)


@pytest.mark.parametrize("frm,to", [(0, 3), (3, 0), (1, 2), (2, 2)])
def test_move_parity(frm, to):
    ours = mime.parse_mhtml_struct(build(4))
    assert ours.move_resource(frm, to)
    if REF is not None:
        theirs = REF.parse_mhtml_struct(build(4))
        assert theirs.move_resource(frm, to)
        assert ours.content == theirs.content
        assert _offsets(ours) == _offsets(theirs)


def test_remove_and_replace_parity():
    ours, theirs = _pair()
    assert ours.remove_resource(1)
    assert ours.replace_content(0, b"XX-much-longer-payload-XX")
    if theirs is not None:
        assert theirs.remove_resource(1)
        assert theirs.replace_content(0, b"XX-much-longer-payload-XX")
        assert ours.content == theirs.content
        assert _offsets(ours) == _offsets(theirs)
    assert ours.resources[0].get_content() == b"XX-much-longer-payload-XX"


def test_merge_pipeline_first_wins():
    """The S3 merge pipeline (merge.py:13-50): dedup by resource
    location, first-writer-wins, appended in input order."""
    def merge(arcs):
        final = arcs[0]
        seen = {r.location for r in final.resources}
        for arc in arcs[1:]:
            for res in arc.resources:
                if res.location in seen:
                    continue
                seen.add(res.location)
                final.insert_resource(len(final.resources), res)
        return final

    ours = merge([mime.parse_mhtml_struct(build(2)),
                  mime.parse_mhtml_struct(build(3)),        # dup locations
                  mime.parse_mhtml_struct(build(2, "z"))])  # new locations
    locs = [r.location for r in ours.resources]
    assert locs == ["https://e.com/0", "https://e.com/1",
                    "https://e.com/2", "https://e.com/z0",
                    "https://e.com/z1"]
    if REF is not None:
        theirs = merge([REF.parse_mhtml_struct(build(2)),
                        REF.parse_mhtml_struct(build(3)),
                        REF.parse_mhtml_struct(build(2, "z"))])
        assert ours.content == theirs.content
    # merged archive must reparse cleanly
    again = mime.parse_mhtml_struct(ours.content)
    assert [r.location for r in again.resources] == locs
