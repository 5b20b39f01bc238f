"""WARC source/sink: kernel codec round trip + Spark ingest parity."""

import pyspark.sql.functions as F
import pytest

from frontier.kernel import warc


def test_record_roundtrip_kernel():
    block = b"\xff\x00binary block with\r\nCRLFs and WARC/1.0 inside"
    rec = warc.page_record("https://h.example/p", 1735689600_123456,
                           block)
    records = warc.parse_warc_records(rec * 3)  # concatenated records
    assert len(records) == 3
    for headers, start, end in records:
        assert headers.get("WARC-Target-URI") == "https://h.example/p"
        assert (rec * 3)[start:end] == block
        assert warc.parse_warc_date(headers.get("WARC-Date")) \
            == 1735689600_123456


def test_warc_date_roundtrip_micros():
    for us in (0, 1735689600_000001, 1735689600_999999):
        assert warc.parse_warc_date(warc.format_warc_date(us)) == us
    assert warc.parse_warc_date("2025-01-01T00:00:00Z") \
        == 1735689600_000000


def test_truncated_tail_record_clamped():
    rec = warc.page_record("https://h.example/p", 0, b"0123456789")
    cut = rec[:-8]  # chop into the block
    records = warc.parse_warc_records(cut)
    assert len(records) == 1
    headers, start, end = records[0]
    assert end == len(cut)  # clamped, no out-of-range read


def test_malformed_raises():
    with pytest.raises(ValueError):
        warc.parse_warc_records(b"NOT A WARC\r\n\r\n")


def test_spark_warc_roundtrip(spark, sf_dir, tmp_path):
    """pages → .warc files → ingest: byte-identical html, url,
    microsecond warc_ts for every page."""
    import pyspark.sql.functions as F

    from frontier import synth
    from frontier.spark import sources

    pages = synth.pages_from_documents(spark, sf_dir).limit(120).cache()
    out = str(tmp_path / "warcs")
    sources.write_warc_files(pages, out)

    back = sources.ingest_warc_files(spark, out)
    a = {r.url: (int(r.warc_ts.timestamp() * 1_000_000), bytes(r.html))
         for r in pages.select("url", "warc_ts", "html").collect()}
    b = {r.url: (int(r.warc_ts.timestamp() * 1_000_000), bytes(r.html))
         for r in back.collect()}
    assert a == b
    # and the ingested pages parse like the originals
    from frontier.spark import parse
    n = parse.extract_main_text(back) \
        .where(F.col("text").isNotNull()).count()
    assert n > 100


def test_spark_warc_skips_corrupt_file(spark, sf_dir, tmp_path):
    from frontier import synth
    from frontier.spark import sources

    pages = synth.pages_from_documents(spark, sf_dir).limit(10).cache()
    out = tmp_path / "warcs"
    sources.write_warc_files(pages, str(out))
    (out / "junk.warc").write_bytes(b"\x00\x01 not warc at all")
    back = sources.ingest_warc_files(spark, str(out))
    assert back.count() == 10  # junk file skipped, no task failure


def test_warc_parser_fuzz_no_hang_no_crash():
    """Arbitrary bytes either parse or raise ValueError/AssertionError
    — never hang, never index out of range (§2.8 robustness class)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=400))
    def run(blob):
        try:
            records = warc.parse_warc_records(blob)
        except (ValueError, AssertionError, UnicodeDecodeError):
            return
        for headers, start, end in records:
            assert 0 <= start <= end <= len(blob)

    run()


def test_warc_parser_fuzz_valid_prefix():
    """A valid record followed by arbitrary junk: the record always
    parses identically; the junk tail parses or raises — the crawl
    ingests what it can."""
    from hypothesis import given, settings, strategies as st

    rec = warc.page_record("https://h.example/p", 123_000_000, b"BLOCK")

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=100))
    def run(junk):
        try:
            records = warc.parse_warc_records(rec + junk)
        except (ValueError, AssertionError, UnicodeDecodeError):
            return
        assert records, "leading valid record must survive"
        headers, start, end = records[0]
        assert (rec + junk)[start:end] == b"BLOCK"

    run()


def test_gzip_member_roundtrip_kernel():
    recs = [warc.page_record(f"https://h/p{i}", i * 1000, b"B" * i)
            for i in range(1, 5)]
    buf = b"".join(warc.gzip_member(r) for r in recs)
    assert warc.gunzip_members(buf) == b"".join(recs)
    # deterministic bytes (mtime pinned)
    assert warc.gzip_member(recs[0]) == warc.gzip_member(recs[0])
    with pytest.raises(ValueError):
        warc.gunzip_members(buf + b"trailing junk")
    with pytest.raises(ValueError):
        warc.gunzip_members(buf[:-3])  # truncated member


def test_spark_warc_gz_roundtrip_and_mixed_dir(spark, sf_dir, tmp_path):
    """pages → .warc.gz member-gzip files → ingest byte-identical;
    plain .warc and .warc.gz files mix in one directory."""
    from frontier import synth
    from frontier.spark import sources

    pages = synth.pages_from_documents(spark, sf_dir).limit(80).cache()
    out = str(tmp_path / "warcs")
    sources.write_warc_files(pages.limit(40), out, compress=True)
    import pyspark.sql.functions as F
    rest = pages.join(pages.limit(40).select("url"), "url", "left_anti")
    sources.write_warc_files(rest, out, compress=False)

    back = sources.ingest_warc_files(spark, out)
    a = {r.url: (int(r.warc_ts.timestamp() * 1_000_000), bytes(r.html))
         for r in pages.select("url", "warc_ts", "html").collect()}
    b = {r.url: (int(r.warc_ts.timestamp() * 1_000_000), bytes(r.html))
         for r in back.collect()}
    assert a == b
    # at least one file of each framing actually exists
    import os
    names = os.listdir(out)
    assert any(n.endswith(".warc.gz") for n in names)
    assert any(n.endswith(".warc") and not n.endswith(".warc.gz")
               for n in names)


def test_spark_warc_gz_skips_corrupt_member_file(spark, sf_dir, tmp_path):
    from frontier import synth
    from frontier.spark import sources

    pages = synth.pages_from_documents(spark, sf_dir).limit(10).cache()
    out = tmp_path / "warcs"
    sources.write_warc_files(pages, str(out), compress=True)
    (out / "bad.warc.gz").write_bytes(b"\x1f\x8bnot really gzip")
    back = sources.ingest_warc_files(spark, str(out))
    assert back.count() == 10


def test_wet_conversion_record_kernel():
    rec = warc.conversion_record("https://h.example/p",
                                 1735689600_123456, "héllo\nwörld")
    ((headers, start, end),) = warc.parse_warc_records(rec)
    assert headers.get("WARC-Type") == "conversion"
    assert headers.get("Content-Type") == "text/plain"
    assert rec[start:end].decode("utf-8") == "héllo\nwörld"
    assert warc.parse_warc_date(headers.get("WARC-Date")) \
        == 1735689600_123456


def test_spark_wet_roundtrip(spark, tmp_path):
    """results → WET (plain + member-gzip, mixed in one dir) → ingest
    recovers every (url, text) pair; response records in the same dir
    are filtered out by WARC-Type; default epoch-0 stamp and ts_col
    stamping both round-trip."""
    from frontier.spark import sources

    rows = [(f"https://h{i}.example/p", f"text {i} é\n", 1_000_000 * i)
            for i in range(20)]
    results = spark.createDataFrame(
        rows, "url_canon string, text string, us long") \
        .withColumn("warc_ts", F.timestamp_micros("us"))

    out = str(tmp_path / "wet")
    sources.write_wet_files(results.where("us < 10000000"), out,
                            compress=False, ts_col="warc_ts")
    sources.write_wet_files(results.where("us >= 10000000"), out,
                            compress=True, ts_col="warc_ts")
    # a conversion-typed impostor dir-mate plus a response record in
    # a .wet-named file: ingest must keep only conversion records
    impostor = warc.page_record("https://resp.example/", 0, b"<html>")
    (tmp_path / "wet" / "mixed.warc.wet").write_bytes(
        impostor + warc.conversion_record("https://extra.example/",
                                          7, "extra"))

    got = {(r.url, r.text, int(r.warc_ts.timestamp() * 1_000_000))
           for r in sources.ingest_wet_files(spark, out).collect()}
    want = {(u, t, us) for u, t, us in rows}
    want.add(("https://extra.example/", "extra", 7))
    assert got == want
    assert not any(u.startswith("https://resp") for u, _, _ in got)


def test_spark_wet_null_text_skipped(spark, tmp_path):
    from frontier.spark import sources

    results = spark.createDataFrame(
        [("https://a.example/", "kept"), ("https://b.example/", None)],
        "url_canon string, text string")
    out = str(tmp_path / "wet2")
    sources.write_wet_files(results, out)
    rows = sources.ingest_wet_files(spark, out).collect()
    assert [(r.url, r.text, int(r.warc_ts.timestamp() * 1_000_000))
            for r in rows] == [("https://a.example/", "kept", 0)]


def test_mixed_record_types_roundtrip(spark, sf_dir, tmp_path):
    """r6 Common-Crawl record fidelity: the sink can emit
    request→response→metadata triples per page (plain AND gzip);
    ingest_warc_files still recovers exactly the pages (non-response
    records skipped, bytes identical), and ingest_warc_records
    exposes every record typed, with deterministic
    WARC-Concurrent-To links from request/metadata back to their
    response's WARC-Record-ID."""
    from frontier import synth
    from frontier.spark import sources

    pages = synth.pages_from_documents(spark, sf_dir).limit(60).cache()
    n_pages = pages.count()
    for compress in (False, True):
        out = str(tmp_path / f"mixed_{compress}")
        sources.write_warc_files(pages, out, compress=compress,
                                 with_request=True, with_metadata=True)

        back = sources.ingest_warc_files(spark, out)
        a = {r.url: (int(r.warc_ts.timestamp() * 1_000_000),
                     bytes(r.html))
             for r in pages.select("url", "warc_ts", "html").collect()}
        b = {r.url: (int(r.warc_ts.timestamp() * 1_000_000),
                     bytes(r.html))
             for r in back.collect()}
        assert a == b, "mixed types must not disturb the pages source"

        recs = sources.ingest_warc_records(spark, out).collect()
        by_type = {}
        for r in recs:
            by_type.setdefault(r.warc_type, []).append(r)
        assert {t: len(v) for t, v in by_type.items()} == {
            "request": n_pages, "response": n_pages,
            "metadata": n_pages}
        resp_id = {r.url: r.record_id for r in by_type["response"]}
        assert all(r.record_id for r in recs)
        for t in ("request", "metadata"):
            for r in by_type[t]:
                assert r.concurrent_to == resp_id[r.url], (t, r.url)
        for r in by_type["response"]:
            assert r.concurrent_to is None
        # block contents carry the documented media types
        req = by_type["request"][0]
        assert bytes(req.block).startswith(b"GET /")
        assert b"Host: " in bytes(req.block)
        meta = bytes(by_type["metadata"][0].block).decode()
        assert "payload-length: " in meta and meta.endswith("\r\n")


def test_warc_type_filter_pushes_down(spark, sf_dir, tmp_path):
    """The typed record source composes with a declarative WARC-Type
    filter: selecting one type returns exactly that slice (the
    filter is a Catalyst filter over the mapInArrow output — no
    bespoke per-type readers)."""
    from frontier import synth
    from frontier.spark import sources

    pages = synth.pages_from_documents(spark, sf_dir).limit(40)
    out = str(tmp_path / "typed")
    sources.write_warc_files(pages, out, with_request=True)
    recs = sources.ingest_warc_records(spark, out)
    assert recs.where(F.col("warc_type") == "request").count() == 40
    assert recs.where(F.col("warc_type") == "metadata").count() == 0
    assert recs.count() == 80


def test_warcinfo_record_opens_file(spark, sf_dir, tmp_path):
    """with_warcinfo: each emitted file OPENS with one warcinfo
    record (application/warc-fields block naming the writer, its
    WARC-Filename matching the file), pages still round-trip, and
    the typed reader exposes it."""
    import os as _os

    from frontier import synth
    from frontier.spark import sources

    pages = synth.pages_from_documents(spark, sf_dir) \
        .limit(30).coalesce(1)
    out = str(tmp_path / "winfo")
    sources.write_warc_files(pages, out, with_warcinfo=True)

    fnames = [f for f in _os.listdir(out) if f.endswith(".warc")]
    assert len(fnames) == 1
    blob = open(_os.path.join(out, fnames[0]), "rb").read()
    headers, start, end = warc.parse_warc_records(blob)[0]
    assert headers.get("WARC-Type") == "warcinfo"
    assert headers.get("WARC-Filename") == fnames[0]
    assert b"software: frontier" in blob[start:end]

    back = sources.ingest_warc_files(spark, out)
    assert back.count() == 30  # warcinfo never becomes a page
    recs = sources.ingest_warc_records(spark, out)
    assert recs.where(F.col("warc_type") == "warcinfo").count() == 1
