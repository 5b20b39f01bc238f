"""Sources / sinks beyond parquet (SURVEY.md §2.7 'Scans / sources').

* :func:`ingest_mhtml_files` — raw ``.mhtml`` files on disk → the
  canonical ``pages`` relation, via Spark's ``binaryFile`` source
  (P11, mhtml.py:804-808 scaled out: one file per row, header-only
  kernel parse for url/meta, full bytes kept as ``html``).
* :func:`write_pages` / :func:`write_mhtml_files` — pages → parquet,
  or back to one ``.mhtml`` file per page (P12, mhtml.py:811-813;
  file fan-out via foreachPartition so no driver collect).
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from frontier.synth import PAGES_DDL


def ingest_mhtml_files(spark: SparkSession, path: str,
                       glob: str = "*.mhtml") -> DataFrame:
    """Directory of MHTML files → pages(url, warc_ts, html, text, lang).

    url comes from the archive's Snapshot-Content-Location (falling
    back to the file path), warc_ts from the file's modification time.
    text/lang stay NULL — they are downstream extraction products.
    """
    import pyarrow as pa

    from frontier.kernel import mime

    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", glob)
           .load(path)
           .select("path", "modificationTime", "content"))

    def to_pages(batches: Iterator[pa.RecordBatch]
                 ) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            paths = batch.column("path").to_pylist()
            mtimes = batch.column("modificationTime").to_pylist()
            blobs = batch.column("content").to_pylist()
            urls, tss, htmls, texts, langs = [], [], [], [], []
            for fpath, mtime, blob in zip(paths, mtimes, blobs):
                try:
                    arc = mime.parse_mhtml_struct(blob, only_header=True)
                    url = arc.location or fpath
                except (AssertionError, UnicodeDecodeError):
                    url = fpath
                urls.append(url)
                tss.append(mtime)
                htmls.append(blob)
                texts.append(None)
                langs.append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()),
                 pa.array(tss, pa.timestamp("us")),
                 pa.array(htmls, pa.binary()),
                 pa.array(texts, pa.string()),
                 pa.array(langs, pa.string())],
                names=["url", "warc_ts", "html", "text", "lang"])

    return raw.mapInArrow(to_pages, PAGES_DDL)


def write_pages(pages: DataFrame, path: str, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    writer = pages.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_part_files(resources: DataFrame, out_dir: str) -> None:
    """S1 literal file-per-part sink (reference extract.py:52-64):
    every resource row becomes ONE file of its RAW content bytes
    (undecoded, trailing CRLF kept — ``content[cstart:end]`` exactly
    like the reference), named by the U2 collision-renamed filename
    under a per-page directory (url-hash prefixed, since many pages'
    parts share names across pages).

    Executor-side fan-out via foreachPartition — no driver collect;
    the U2 rename is the relational row_number form, so names are
    deterministic at any parallelism (no filesystem probing races).
    """
    from .extract import with_unique_filenames

    os.makedirs(out_dir, exist_ok=True)
    named = with_unique_filenames(resources)
    slim = named.select(
        F.substring(F.sha2(F.col("url"), 256), 1, 16).alias("page_dir"),
        "out_filename", "content")

    def dump(rows):
        for row in rows:
            page_dir = os.path.join(out_dir, row["page_dir"])
            os.makedirs(page_dir, exist_ok=True)
            blob = bytes(row["content"]) if row["content"] is not None \
                else b""
            with open(os.path.join(page_dir, row["out_filename"]),
                      "wb") as fh:
                fh.write(blob)

    slim.foreachPartition(dump)


def write_warc_files(pages: DataFrame, out_dir: str,
                     compress: bool = False,
                     with_request: bool = False,
                     with_metadata: bool = False,
                     with_warcinfo: bool = False) -> None:
    """pages → WARC files (ISO 28500, the Common-Crawl container):
    one ``response`` record per page (MHTML bytes as the block), one
    ``.warc`` file per partition — executor-side fan-out, no driver
    collect. ``compress=True`` writes the ``.warc.gz`` member-gzip
    framing Common Crawl ships (each record its own gzip member).
    Round-trips byte-exactly through ingest_warc_files
    (tests/test_warc.py).

    ``with_request`` / ``with_metadata`` (r6, Common-Crawl record
    fidelity): also emit the ``request`` record (reconstructed
    HTTP/1.1 GET) before and/or the ``metadata`` record
    (application/warc-fields fetch diagnostics) after each response,
    in Common Crawl's request→response→metadata order, linked via
    deterministic WARC-Record-ID / WARC-Concurrent-To;
    ``with_warcinfo`` opens each file with the file-level
    ``warcinfo`` record Common Crawl ships (stamped with the first
    page's ts so output stays deterministic).
    :func:`ingest_warc_files` still reads pages from mixed-type
    files unchanged (non-response records skipped);
    :func:`ingest_warc_records` reads every record with its type."""
    import uuid

    from frontier.kernel import warc as kwarc

    os.makedirs(out_dir, exist_ok=True)
    slim = pages.select(
        "url",
        (F.unix_micros(F.col("warc_ts"))).alias("ts_us"),
        "html")
    ext = ".warc.gz" if compress else ".warc"

    def dump(rows):
        fname = os.path.join(out_dir, f"part-{uuid.uuid4().hex}{ext}")
        wrote = False

        def emit(fh, record):
            fh.write(kwarc.gzip_member(record) if compress
                     else record)

        with open(fname, "wb") as fh:
            for row in rows:
                url, ts = row["url"], int(row["ts_us"])
                html = bytes(row["html"])
                if with_warcinfo and not wrote:
                    emit(fh, kwarc.warcinfo_record(
                        os.path.basename(fname), ts))
                if with_request:
                    emit(fh, kwarc.request_record(url, ts))
                emit(fh, kwarc.page_record(url, ts, html))
                if with_metadata:
                    emit(fh, kwarc.metadata_record(url, ts, [
                        ("fetchTimeMs", "0"),
                        ("payload-length", str(len(html)))]))
                wrote = True
        if not wrote:
            os.remove(fname)  # empty partition: no empty file

    slim.foreachPartition(dump)


def ingest_warc_records(spark: SparkSession, path: str,
                        glob: str = "*.warc*") -> DataFrame:
    """Directory of WARC files → ONE ROW PER RECORD, typed:
    (url, warc_ts, warc_type, record_id, concurrent_to, block).

    The generic face of :func:`ingest_warc_files` for mixed-record
    archives (warcinfo/request/response/metadata/conversion...):
    filter on ``warc_type`` declaratively and let Catalyst do the
    rest — e.g. ``.where(F.col("warc_type") == 'request')``. Same
    per-file sniff/skip contract (§2.8): gzip members inflated,
    malformed FILES skipped, truncated tails clamped."""
    import pyarrow as pa

    from frontier.kernel import warc as kwarc

    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", glob)
           .load(path)
           .select("content"))

    def split(batches):
        for batch in batches:
            blobs = batch.column("content").to_pylist()
            cols: dict[str, list] = {k: [] for k in (
                "url", "ts", "wtype", "rid", "cto", "block")}
            for blob in blobs:
                try:
                    if bytes(blob[:2]) == kwarc.GZIP_MAGIC:
                        blob = kwarc.gunzip_members(blob)
                    records = kwarc.parse_warc_records(blob)
                except Exception:
                    continue  # malformed file: skip, never fail task
                for headers, start, end in records:
                    date = headers.get("WARC-Date")
                    try:
                        ts = kwarc.parse_warc_date(date) if date else 0
                    except ValueError:
                        ts = 0
                    cols["url"].append(headers.get("WARC-Target-URI"))
                    cols["ts"].append(ts)
                    cols["wtype"].append(headers.get("WARC-Type"))
                    cols["rid"].append(headers.get("WARC-Record-ID"))
                    cols["cto"].append(
                        headers.get("WARC-Concurrent-To"))
                    cols["block"].append(blob[start:end])
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols["url"], pa.string()),
                 pa.array(cols["ts"], pa.timestamp("us")),
                 pa.array(cols["wtype"], pa.string()),
                 pa.array(cols["rid"], pa.string()),
                 pa.array(cols["cto"], pa.string()),
                 pa.array(cols["block"], pa.binary())],
                names=["url", "warc_ts", "warc_type", "record_id",
                       "concurrent_to", "block"])

    return raw.mapInArrow(
        split, "url string, warc_ts timestamp, warc_type string, "
               "record_id string, concurrent_to string, block binary")


def write_wet_files(results: DataFrame, out_dir: str,
                    compress: bool = False,
                    url_col: str = "url_canon",
                    ts_col: str | None = None,
                    text_col: str = "text") -> None:
    """Extracted-text relation → WET files (Common Crawl's
    extracted-text sidecar: a WARC of ``conversion`` records, one per
    page, UTF-8 plain-text block). One ``.warc.wet[.gz]`` file per
    partition, executor-side, no driver collect; ``compress`` writes
    the member-gzip framing. The natural export of the crawl's
    ``results`` table (url_canon, text) — ``ts_col=None`` stamps
    epoch 0 (results carry no fetch timestamp; pass the page ts
    column when exporting a joined relation). Round-trips through
    :func:`ingest_wet_files` (tests/test_warc.py)."""
    import uuid

    from frontier.kernel import warc as kwarc

    os.makedirs(out_dir, exist_ok=True)
    ts = (F.unix_micros(F.col(ts_col)) if ts_col is not None
          else F.lit(0).cast("long"))
    slim = results.select(F.col(url_col).alias("url"),
                          ts.alias("ts_us"),
                          F.col(text_col).alias("text")) \
        .where(F.col("text").isNotNull())
    ext = ".warc.wet.gz" if compress else ".warc.wet"

    def dump(rows):
        fname = os.path.join(out_dir, f"part-{uuid.uuid4().hex}{ext}")
        wrote = False
        with open(fname, "wb") as fh:
            for row in rows:
                record = kwarc.conversion_record(
                    row["url"], int(row["ts_us"]), row["text"])
                fh.write(kwarc.gzip_member(record) if compress
                         else record)
                wrote = True
        if not wrote:
            os.remove(fname)  # empty partition: no empty file

    slim.foreachPartition(dump)


def ingest_wet_files(spark: SparkSession, path: str,
                     glob: str = "*.wet*") -> DataFrame:
    """Directory of WET files → (url, warc_ts, text).

    Same per-file sniff/skip contract as :func:`ingest_warc_files`
    (§2.8: a malformed FILE is skipped, never fails the task); only
    ``conversion`` records are kept and their blocks decode as UTF-8
    text (errors replaced — crawled WET is not always clean)."""
    import pyarrow as pa

    from frontier.kernel import warc as kwarc

    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", glob)
           .load(path)
           .select("content"))

    def split(batches):
        for batch in batches:
            blobs = batch.column("content").to_pylist()
            urls, tss, texts = [], [], []
            for blob in blobs:
                try:
                    if bytes(blob[:2]) == kwarc.GZIP_MAGIC:
                        blob = kwarc.gunzip_members(blob)
                    records = kwarc.parse_warc_records(blob)
                except Exception:
                    continue  # malformed file: skip, never fail task
                for headers, start, end in records:
                    if headers.get("WARC-Type") != "conversion":
                        continue
                    date = headers.get("WARC-Date")
                    try:
                        ts = kwarc.parse_warc_date(date) if date else 0
                    except ValueError:
                        ts = 0
                    urls.append(headers.get("WARC-Target-URI"))
                    tss.append(ts)
                    texts.append(blob[start:end].decode(
                        "utf-8", errors="replace"))
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()),
                 pa.array(tss, pa.timestamp("us")),
                 pa.array(texts, pa.string())],
                names=["url", "warc_ts", "text"])

    return raw.mapInArrow(split, "url string, warc_ts timestamp, "
                                 "text string")


def ingest_warc_files(spark: SparkSession, path: str,
                      glob: str = "*.warc*") -> DataFrame:
    """Directory of WARC files → pages(url, warc_ts, html, text, lang).

    binaryFile source (one file per row, whole-file bytes), then an
    Arrow kernel splits records by Content-Length offsets and slices
    blocks zero-copy. Files are sniffed per-file: a gzip magic means
    member-gzip ``.warc.gz`` (members inflated then parsed), so plain
    and gzip files can mix in one directory. url ← WARC-Target-URI,
    warc_ts ← WARC-Date (microsecond precision). A malformed FILE is
    skipped, never fails the task (§2.8); a clamped tail record
    yields a short block.
    """
    import pyarrow as pa

    from frontier.kernel import warc as kwarc

    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", glob)
           .load(path)
           .select("content"))

    def split(batches):
        for batch in batches:
            blobs = batch.column("content").to_pylist()
            urls, tss, htmls, texts, langs = [], [], [], [], []
            for blob in blobs:
                try:
                    if bytes(blob[:2]) == kwarc.GZIP_MAGIC:
                        blob = kwarc.gunzip_members(blob)
                    records = kwarc.parse_warc_records(blob)
                except Exception:
                    continue  # malformed file: skip, never fail task
                for headers, start, end in records:
                    if headers.get("WARC-Type") != "response":
                        continue
                    date = headers.get("WARC-Date")
                    try:
                        ts = kwarc.parse_warc_date(date) if date else 0
                    except ValueError:
                        ts = 0
                    urls.append(headers.get("WARC-Target-URI"))
                    tss.append(ts)
                    htmls.append(blob[start:end])
                    texts.append(None)
                    langs.append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()),
                 pa.array(tss, pa.timestamp("us")),
                 pa.array(htmls, pa.binary()),
                 pa.array(texts, pa.string()),
                 pa.array(langs, pa.string())],
                names=["url", "warc_ts", "html", "text", "lang"])

    return raw.mapInArrow(split, PAGES_DDL)


def write_bucketed_page_index(page_index: DataFrame, table: str,
                              path: str, n_buckets: int = 64) -> None:
    """Persist the fetch-lookup index as a BUCKETED parquet table
    (hash-bucketed + sorted on url_canon).

    This is the 10^8+-row fetch path: joining the scheduled batch on
    url_canon against a bucketed index lets Spark elide the exchange
    AND the sort on the big side (bucket pruning keeps it a per-bucket
    merge), so page text/links never shuffle even when the batch is
    too large to broadcast. See crawl.fetch_pages(mode=...).
    """
    (page_index.write.mode("overwrite")
     .bucketBy(n_buckets, "url_canon")
     .sortBy("url_canon")
     .option("path", path)
     .format("parquet")
     .saveAsTable(table))


def read_bucketed_page_index(spark: SparkSession, table: str) -> DataFrame:
    """Read back the bucketed index — MUST go through the table (not
    the parquet path) or Spark forgets the bucket spec and re-shuffles."""
    return spark.table(table)


def write_mhtml_files(pages: DataFrame, out_dir: str) -> None:
    """One ``.mhtml`` file per page, named by a filesystem-safe hash of
    the url — executor-side fan-out, the distributed analog of
    MHTMLArchive_to_file."""
    os.makedirs(out_dir, exist_ok=True)
    slim = pages.select(
        F.sha2(F.col("url"), 256).alias("name"), "html")

    def dump(rows):
        for row in rows:
            with open(os.path.join(out_dir, row["name"][:32] + ".mhtml"),
                      "wb") as fh:
                fh.write(bytes(row["html"]))

    slim.foreachPartition(dump)
