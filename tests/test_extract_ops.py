"""S1/S4/S5 extraction pipeline operators."""

import hashlib
import os

import pyspark.sql.functions as F
import pytest

from frontier import synth
from frontier.spark import extract, parse


@pytest.fixture(scope="module")
def resources(spark, sf_dir):
    pages = synth.pages_from_documents(spark, sf_dir)
    res = parse.parse_pages(pages, with_content=False).cache()
    res.count()
    return res


def test_glob_to_like():
    assert extract.glob_to_like("image/*") == "image/%"
    assert extract.glob_to_like("text/h?ml") == "text/h_ml"
    assert extract.glob_to_like("a_b%c") == "a\\_b\\%c"


def test_filter_content_type_glob(resources):
    images = extract.filter_content_type(resources, "image/*")
    assert images.count() > 0
    assert images.where(~F.col("content_type").startswith("image/")) \
        .count() == 0
    # char-class fallback path
    tx = extract.filter_content_type(resources, "text/[hc]*")
    kinds = {r.content_type for r in tx.select("content_type")
             .distinct().collect()}
    assert kinds <= {"text/html", "text/css"}


def test_unique_filenames_no_collisions_per_page(resources):
    named = extract.with_unique_filenames(resources)
    dups = (named.groupBy("url", "out_filename").count()
            .where(F.col("count") > 1))
    assert dups.count() == 0
    # renamed files follow base.dup_N.ext
    renamed = named.where(F.col("out_filename") != F.col("filename"))
    if renamed.count():
        assert renamed.where(
            ~F.col("out_filename").rlike(r"\.dup_\d+")).count() == 0


def test_list_parts_marks_single_main(resources):
    listing = extract.list_parts(resources)
    mains = listing.where("is_main").groupBy("url").count()
    assert mains.where(F.col("count") > 1).count() == 0
    # displaced pages (doc_id % 19 == 0) have no main at index 0
    n_pages = resources.select("url").distinct().count()
    assert mains.count() < n_pages
    assert mains.count() >= int(n_pages * 0.9)


def test_write_part_files_byte_identical(spark, tmp_path):
    """S1 literal file-per-part sink: every written file's bytes must
    equal the kernel's raw content slice html[cstart:end] (reference
    extract.py:52-64 writes exactly that)."""
    from frontier.kernel import mime
    from frontier.spark import sources

    pages = synth.pages_from_documents(
        spark, "/root/testdata/sf0.001").limit(20).cache()
    res = parse.parse_pages(pages)  # with content, undecoded
    out = tmp_path / "parts"
    sources.write_part_files(res, str(out))

    named = {(r.url, r.out_filename): r.part_index
             for r in extract.with_unique_filenames(res).collect()}
    raw_pages = {r.url: bytes(r.html) for r in pages.collect()}
    n_checked = 0
    for row in parse.parse_pages(pages).collect():
        html = raw_pages[row.url]
        want = html[row.offset_content:row.offset_end] \
            if row.offset_content != -1 else b""
        page_dir = hashlib.sha256(row.url.encode()).hexdigest()[:16]
        # find this part's written name via the rename relation
        fname = [f for (u, f), idx in named.items()
                 if u == row.url and idx == row.part_index]
        assert len(fname) == 1
        path = out / page_dir / fname[0]
        assert path.exists(), path
        assert path.read_bytes() == want, (row.url, row.part_index)
        n_checked += 1
    assert n_checked > 20  # pages x parts
