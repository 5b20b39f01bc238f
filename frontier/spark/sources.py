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
