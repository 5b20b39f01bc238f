"""Byte-exact reassembly + raw-file source/sink round-trips —
the DataFrame forms of the reference's mutation/IO surface
(SURVEY.md §2.4, §2.6)."""

import pyspark.sql.functions as F
import pytest

from frontier import synth
from frontier.spark import parse, sources


@pytest.fixture(scope="module")
def pages(spark, sf_dir):
    df = synth.pages_from_documents(spark, sf_dir).cache()
    df.count()
    return df


def test_reassemble_is_byte_exact(spark, pages):
    """parse → reassemble reproduces the original archive bytes for
    every synthetic page (headers, folded values, boundaries,
    trailing CRLFs — the whole grammar)."""
    res = parse.parse_pages(pages)
    arc = parse.archive_headers(pages)
    rebuilt = parse.reassemble(res, arc)
    joined = rebuilt.alias("r").join(
        pages.select("url", F.col("html").alias("orig")), "url")
    diffs = joined.where(F.col("html") != F.col("orig")).count()
    assert diffs == 0
    assert rebuilt.count() == pages.count()


def test_edit_then_reassemble_reparses(spark, pages):
    """Relational archive edit: drop all image parts (remove_resource
    analog) → reassemble → reparse cleanly with only non-image parts."""
    res = parse.parse_pages(pages)
    arc = parse.archive_headers(pages)
    edited = res.where(F.col("content_type") != "image/png")
    rebuilt = parse.reassemble(edited, arc)
    reparsed = parse.parse_pages(
        rebuilt.join(pages.select("url", "warc_ts", "lang"), "url")
        .select("url", "warc_ts", "lang", "html"))
    assert reparsed.where(F.col("content_type") == "image/png").count() == 0
    # main text still extractable from non-displaced pages
    texts = parse.extract_main_text(
        rebuilt.join(pages.select("url", "warc_ts", "lang"), "url")
        .select("url", "warc_ts", "lang", "html"))
    assert texts.where(F.col("text").isNotNull()).count() > 0


def test_mhtml_file_roundtrip(spark, pages, tmp_path_factory):
    """pages → .mhtml files on disk → binaryFile ingest → same bytes,
    urls recovered from Snapshot-Content-Location headers."""
    out_dir = str(tmp_path_factory.mktemp("mhtml_files"))
    subset = pages.limit(40).cache()
    subset.count()
    sources.write_mhtml_files(subset, out_dir)

    ingested = sources.ingest_mhtml_files(spark, out_dir)
    assert ingested.count() == 40
    joined = ingested.alias("i").join(
        subset.select("url", F.col("html").alias("orig")), "url")
    assert joined.count() == 40
    assert joined.where(F.col("html") != F.col("orig")).count() == 0
