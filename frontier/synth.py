"""Deterministic Common-Crawl-style page generator.

Builds the canonical ``pages(url, warc_ts, html, text, lang)`` table
(BASELINE.json ``input_hint``) from the driver's ``documents`` parquet
so tests and benchmarks never need external data. Everything is a pure
function of ``doc_id`` (blake2b-seeded) — same input → byte-identical
pages at any parallelism.

Layout of one page (FIXTURES.md §4 byte grammar):

* archive header: ``From``, ``Snapshot-Content-Location: <url>``,
  ``Content-Type: multipart/related; boundary="..."`` + blank lines
* part 0: the main document — ``Content-Location`` == the archive's
  ``Snapshot-Content-Location`` — encoded quoted-printable / base64 /
  binary (cycled by doc_id)
* parts 1..k: subresources whose ``Content-Location`` values are links
  to OTHER pages' urls — these are what the crawl loop discovers
* every ~19th page hides the main part at index 1 instead of 0, so per
  reference semantics (extract_main.py:27-33 ``i > 0`` break) its
  extracted text is NULL — exercised by the correctness oracle too

Distribution intent at 100 TB: one page row is self-contained; the
generator runs inside ``mapInArrow`` so page synthesis scales linearly
with executors and never touches the driver.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd  # module-level: applyInPandas type-hint target

from frontier.kernel import decode

EPOCH_2025_US = 1735689600 * 1_000_000  # 2025-01-01T00:00:00Z in micros
NUM_HOSTS = 1000
HOST_SKEW_EXP = 3.0  # u**3 → top host owns ~10% of urls (Zipf-ish)
MAIN_DISPLACED_EVERY = 19  # doc_id % 19 == 0 → main part not first
BOUNDARY = "----frontier-page-boundary----"


def _h(doc_id: int, salt: str) -> int:
    digest = hashlib.blake2b(f"{salt}:{doc_id}".encode(), digest_size=8)
    return int.from_bytes(digest.digest(), "big")


def host_index(doc_id: int) -> int:
    u = (_h(doc_id, "host") % 1_000_000) / 1_000_000.0
    return int(NUM_HOSTS * (u ** HOST_SKEW_EXP)) % NUM_HOSTS


def url_for(doc_id: int) -> str:
    host = f"host{host_index(doc_id):04d}.example"
    depth = 1 + _h(doc_id, "depth") % 3
    segs = "/".join(f"d{(_h(doc_id, 'seg%d' % i) % 97):02d}"
                    for i in range(depth - 1))
    path = f"/{segs}/page{doc_id}.html" if segs else f"/page{doc_id}.html"
    # query-string condition is doc_id-arithmetic (not hashed) so the
    # DuckDB oracle can restate it as ``doc_id % 10 = 7``
    if doc_id % 10 == 7:
        return f"https://{host}{path}?b=2&a=1"
    return f"https://{host}{path}"


def warc_ts_us(doc_id: int) -> int:
    return EPOCH_2025_US + doc_id * 1_000_000 + (_h(doc_id, "jit") % 1000)


def encoding_for(doc_id: int) -> str:
    return ("quoted-printable", "base64", "binary")[doc_id % 3]


def links_for(doc_id: int, n_docs: int) -> list[int]:
    """Outbound links: deterministic fan-out of 0-3 other doc ids.

    Pure integer arithmetic (no hashing) so the DuckDB oracle can
    restate it: ``i in [0, doc_id % 4)``, target
    ``(doc_id*131 + 7*i + 1) % n_docs``.
    """
    if n_docs <= 0:
        return []
    return [(doc_id * 131 + 7 * i + 1) % n_docs
            for i in range(doc_id % 4)]


def _encode_payload(payload: bytes, encoding: str) -> bytes:
    if encoding == "quoted-printable":
        return decode.encode_quoted_printable(payload)
    if encoding == "base64":
        return decode.encode_base64(payload)
    return payload


def _media_blob(target: int, kind: str) -> tuple[bytes, str]:
    """REAL media bytes for subresource parts (round-3: the fake
    byte-arithmetic codec is gone). From the 16 md5 bytes
    ``h = md5('blob:target')``:

    * png: a real PNG — width ``4 + 4*(h[0]%4)``, height 4, RGB
      pixels = the md5 digest tiled over ``w*4*3`` bytes (always a
      multiple of 16, so the decoder's 8-phase feature means reduce
      to ``(h[k]+h[k+8])/2`` — exactly restatable in the DuckDB
      oracle). Rows cycle filters Sub/Up/Average/Paeth, so decoding
      exercises every unfilter path.
    * jpeg (round-4: the dominant real-web image type): SOI + JFIF +
      COM + SOF header skeleton — width same rule as png, height
      ``2 + h[3]%4``, progressive (SOF2) iff ``h[1]%2 == 1`` so the
      sniffer walks both marker layouts; the COM payload is the md5
      digest itself, so the 8-phase feature means reduce to the SAME
      ``(h[k]+h[k+8])/2`` rule as png.
    * the "jpeg" slot splits three ways on ``h[4]%3`` (round-5):
      0 → JPEG, 1 → GIF89a (digest as the Comment Extension
      payload), 2 → WebP (VP8X canvas dims + digest as the XMP
      payload) — all with the SAME width/height/feature rules, so
      the media-features DuckDB oracle's n==1 formulas validate all
      THREE sniffers without change, and each slot row exercises
      exactly one of them.
    * video: an FRMS container of ``1 + h[2]%4`` copies of the PNG.
    """
    from frontier.kernel import imagecodec

    h = hashlib.md5(f"blob:{target}".encode()).digest()
    w = 4 + 4 * (h[0] % 4)
    if kind == "jpeg":
        if h[4] % 3 == 1:
            return (imagecodec.gif_encode(w, 2 + h[3] % 4, comment=h),
                    "image/gif")
        if h[4] % 3 == 2:
            return (imagecodec.webp_encode(w, 2 + h[3] % 4, comment=h),
                    "image/webp")
        return (imagecodec.jpeg_encode(w, 2 + h[3] % 4, comment=h,
                                       progressive=h[1] % 2 == 1),
                "image/jpeg")
    n = w * 4 * 3
    png = imagecodec.png_encode(w, 4, (h * (n // 16)),
                                filters=[1, 2, 3, 4])
    if kind == "video":
        return (imagecodec.frames_encode([png] * (1 + h[2] % 4)),
                "video/x-frms")
    return png, "image/png"


def _part(content_location: str, content_type: str, encoding: str,
          payload: bytes, include_cte: bool = True) -> bytes:
    cte = (f"Content-Transfer-Encoding: {encoding}\r\n".encode()
           if include_cte else b"")
    return (
        b"--" + BOUNDARY.encode() + b"\r\n"
        + f"Content-Type: {content_type}\r\n".encode()
        + cte
        + f"Content-Location: {content_location}\r\n".encode()
        + b"\r\n"
        + _encode_payload(payload, encoding) + b"\r\n"
    )


def build_page(doc_id: int, text: str, lang: str, n_docs: int,
               omit_cte: bool = False
               ) -> tuple[str, int, bytes, str | None, str]:
    """→ (url, warc_ts_us, html_bytes, expected_text, lang).

    ``expected_text`` is the oracle for the engine's main-text
    extraction: NULL when the main part is displaced off index 0.

    ``omit_cte=True``: binary-encoded main parts (doc_id % 3 == 2)
    drop their Content-Transfer-Encoding header — the real-world
    RFC 2045 §6.1 default-7bit case that parity-strict decode turns
    into NULL text and the ``default_7bit`` flag recovers.
    """
    url = url_for(doc_id)
    encoding = encoding_for(doc_id)
    payload = text.encode("utf-8")

    main = _part(url, "text/html", encoding, payload,
                 include_cte=not (omit_cte and encoding == "binary"))
    subparts = []
    for i, target in enumerate(links_for(doc_id, n_docs)):
        # md5, not blake2b: the media-features oracle restates the
        # PNG's pixel rule in SQL, and DuckDB only has md5.
        # Subresource kind is pure doc_id arithmetic for the oracle:
        # i == 0 → PNG; i == 1 (docs with doc_id%4 >= 2) → JPEG
        # header skeleton (round-4); i == 2 (doc_id%4 == 3) → VIDEO
        # (FRMS multi-frame container of real PNGs) so the
        # frame-sampling path has real rows.
        kind = {0: "png", 1: "jpeg", 2: "video"}[i]
        blob, ctype = _media_blob(target, kind)
        subparts.append(_part(url_for(target), ctype, "base64", blob))

    # displacement must be a pure function of doc_id so the DuckDB
    # oracle can state it as CASE WHEN doc_id % 19 = 0 THEN NULL ...
    displaced = doc_id % MAIN_DISPLACED_EVERY == 0
    if displaced:
        decoy = _part(url + "#decoy", "text/css", "binary", b"body{}")
        parts = [decoy, main] + subparts
    else:
        parts = [main] + subparts

    head = (
        b"From: <Saved by frontier.synth>\r\n"
        + f"Snapshot-Content-Location: {url}\r\n".encode()
        + b"Content-Type: multipart/related;\r\n"
        + b'\ttype="text/html";\r\n'
        + f'\tboundary="{BOUNDARY}"\r\n'.encode()
        + b"\r\n\r\n"
    )
    html = head + b"".join(parts) + b"--" + BOUNDARY.encode() + b"--\r\n"
    expected_text = None if displaced else text
    return url, warc_ts_us(doc_id), html, expected_text, lang


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def pages_from_documents(spark, sf_dir: str, n_docs: int | None = None,
                         amplify: int = 1, omit_cte: bool = False):
    """documents parquet → pages DataFrame, generated executor-side.

    ``amplify=K`` replicates the corpus K× with shifted doc_ids
    (deterministic) — used by the bench to reach web-scale-ish page
    counts from the small driver tables. Oracle queries always use
    amplify=1.
    """
    from pyspark.sql import functions as F

    import pyarrow as pa

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text", "lang")
    if n_docs is None:
        n_docs = docs.count()
    if amplify > 1:
        replicas = spark.range(amplify).withColumnRenamed("id", "replica")
        docs = (docs.crossJoin(replicas)
                .withColumn("doc_id",
                            F.col("doc_id") +
                            F.col("replica") * F.lit(n_docs))
                .drop("replica")
                .repartition(min(512,
                                 max(spark.sparkContext.defaultParallelism,
                                     amplify))))
        n_docs = n_docs * amplify
    total = n_docs

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            langs = batch.column("lang").to_pylist()
            urls, tss, htmls, exp_texts, out_langs = [], [], [], [], []
            for doc_id, text, lang in zip(doc_ids, texts, langs):
                url, ts_us, html, exp, lng = build_page(
                    doc_id, text or "", lang, total, omit_cte=omit_cte)
                urls.append(url)
                tss.append(ts_us)
                htmls.append(html)
                exp_texts.append(exp)
                out_langs.append(lng)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()),
                 pa.array(tss, pa.timestamp("us")),
                 pa.array(htmls, pa.binary()),
                 pa.array(exp_texts, pa.string()),
                 pa.array(out_langs, pa.string())],
                names=["url", "warc_ts", "html", "text", "lang"])

    return docs.mapInArrow(gen, PAGES_DDL)


def seeds_from_documents(spark, sf_dir: str, every: int = 5,
                         unknown_every: int = 20):
    """Deterministic frontier seed list (FIXTURES.md §2): every
    ``every``-th page's url + some URLs that resolve to no page,
    with a deterministic priority and source_rank."""
    import pyarrow as pa

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls, prios, ranks = [], [], []
            for doc_id in batch.column("doc_id").to_pylist():
                if doc_id % every != 0:
                    continue
                if doc_id % (every * unknown_every) == 0:
                    urls.append(f"https://unknown{doc_id}.example/missing")
                else:
                    urls.append(url_for(doc_id))
                prios.append(_h(doc_id, "prio") % 3)
                ranks.append(doc_id)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()),
                 pa.array(prios, pa.int32()),
                 pa.array(ranks, pa.int64())],
                names=["url", "priority", "source_rank"])

    return docs.mapInArrow(gen, "url string, priority int, source_rank bigint")


def audio_parts_from_documents(spark, sf_dir: str):
    """Audio media rows: one REAL RIFF/PCM16 WAV blob per document,
    16 mono samples ``s[j] = ((doc_id*31 + j*17) % 256 - 128) * 256``
    — pure doc_id arithmetic so the DuckDB oracle can restate the
    decoded 8-phase feature means exactly (samples are multiples of
    256 → means are dyadic rationals)."""
    import pyarrow as pa

    from frontier.kernel import imagecodec

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls, idxs, kinds, blobs = [], [], [], []
            for doc_id in batch.column("doc_id").to_pylist():
                samples = [((doc_id * 31 + j * 17) % 256 - 128) * 256
                           for j in range(16)]
                urls.append(f"audio://doc{doc_id}")
                idxs.append(0)
                kinds.append("audio")
                blobs.append(imagecodec.wav_encode(samples, 8000, 1))
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()),
                 pa.array(idxs, pa.int32()),
                 pa.array(kinds, pa.string()),
                 pa.array(blobs, pa.binary())],
                names=["url", "part_index", "media_kind", "content"])

    return docs.mapInArrow(
        gen, "url string, part_index int, media_kind string, "
             "content binary")


def _host_rules(h: int) -> tuple[list[tuple[str, bool]], int]:
    """The deterministic RFC 9309 rule mix for host ``h`` — the single
    source of truth shared by :func:`robots_df` (pre-parsed relation)
    and :func:`robots_txt_df` (raw bytes), so the two are parity-
    testable (tests/test_sitemap.py::test_robots_txt_parity)."""
    rules: list[tuple[str, bool]] = []
    if _h(h, "robo") % 10 == 0:
        rules.append((f"/d{(_h(h, 'roboprefix') % 97):02d}", False))
    if _h(h, "roboallow") % 10 == 3:
        rules.append(("/", False))
        rules.append((f"/d{(_h(h, 'allowseg') % 97):02d}*", True))
    if _h(h, "robodollar") % 20 == 11:
        rules.append(("/*7.html$", False))
    return rules, int(_h(h, "delay") % 5) * 100


def sitemap_kind_for_host(h: int) -> str | None:
    """Which sitemap (if any) host ``h`` advertises in robots.txt:
    ``None`` (no Sitemap record, ~2/3 of hosts), ``"urlset"`` (one
    XML urlset), ``"index"`` (a sitemapindex with two children), or
    ``"plain"`` (a text sitemap). Pure doc_id-free host arithmetic so
    the pure-Python differential test restates it."""
    if _h(h, "hassitemap") % 3 != 0:
        return None
    k = _h(h, "smkind") % 5
    return "index" if k == 0 else "plain" if k == 1 else "urlset"


def sitemap_path_for_host(h: int) -> str:
    return "/sitemap.txt" if sitemap_kind_for_host(h) == "plain" \
        else "/sitemap.xml"


def doc_in_sitemap(doc_id: int) -> bool:
    """Does ``doc_id``'s url appear in its host's sitemap (when the
    host has one)? ~1/3 of docs — sitemaps advertise a subset, the
    rest stay link-discovery-only."""
    return _h(doc_id, "insm") % 3 == 0


def sitemap_priors(doc_id: int) -> tuple[str | None, str | None,
                                         float | None]:
    """(lastmod W3C string, changefreq, priority) the synthetic
    sitemap entry for ``doc_id`` carries — each independently present
    or absent; priority spans 0.0–1.0."""
    import datetime as _dt
    lastmod = None
    if _h(doc_id, "smlm") % 2 == 0:
        sec = warc_ts_us(doc_id) // 1_000_000  # truncate to seconds
        t = _dt.datetime.fromtimestamp(sec, tz=_dt.timezone.utc)
        lastmod = t.strftime("%Y-%m-%dT%H:%M:%SZ")
    freq = None
    if _h(doc_id, "smcf") % 3 > 0:
        from frontier.kernel.sitemap import CHANGEFREQS
        freq = CHANGEFREQS[_h(doc_id, "smcfv") % 7]
    prio = None
    if _h(doc_id, "smpr") % 3 > 0:
        prio = (_h(doc_id, "smprv") % 11) / 10.0
    return lastmod, freq, prio


def robots_txt_for_host(h: int) -> bytes:
    """Raw robots.txt bytes for host ``h`` — parses (via
    kernel.robots.rules_for_agent) to exactly :func:`robots_df`'s
    rules/delay for that host, plus group-independent ``Sitemap:``
    records per :func:`sitemap_kind_for_host` (one deliberately
    placed BEFORE the User-agent group — RFC 9309 'other records' are
    position-independent)."""
    host = f"host{h:04d}.example"
    rules, delay_ms = _host_rules(h)
    kind = sitemap_kind_for_host(h)
    lines = [f"# synthetic robots for {host}"]
    if kind is not None:
        lines.append(
            f"Sitemap: https://{host}{sitemap_path_for_host(h)}")
    lines.append("User-agent: *")
    for pat, allow in rules:
        lines.append(f"{'Allow' if allow else 'Disallow'}: {pat}")
    lines.append(f"Crawl-delay: {delay_ms / 1000:g}")
    if kind is not None and _h(h, "smextra") % 10 == 0:
        # a second advertised sitemap that resolves to no document —
        # the fetch join simply misses it (a dead Sitemap: record is
        # everyday crawled-web reality)
        lines.append(f"Sitemap: https://{host}/sitemap-extra.xml")
    return ("\n".join(lines) + "\n").encode()


def robots_txt_df(spark, num_hosts: int = NUM_HOSTS):
    """(host, robots_txt binary) — the raw-bytes twin of
    :func:`robots_df`: feed it to schedule.robots_from_text for the
    gate relation and to sitemaps.discover_offers for the Sitemap
    records."""
    rows = [(f"host{h:04d}.example", robots_txt_for_host(h))
            for h in range(num_hosts)]
    return spark.createDataFrame(rows, "host string, robots_txt binary")


def _sitemap_xml_entry(url: str, lastmod: str | None,
                       freq: str | None, prio: float | None) -> str:
    loc = url.replace("&", "&amp;")
    parts = [f"<url><loc>{loc}</loc>"]
    if lastmod is not None:
        parts.append(f"<lastmod>{lastmod}</lastmod>")
    if freq is not None:
        parts.append(f"<changefreq>{freq}</changefreq>")
    if prio is not None:
        parts.append(f"<priority>{prio:g}</priority>")
    parts.append("</url>")
    return "".join(parts)


def sitemap_docs_for_host(h: int, member_doc_ids: list[int]
                          ) -> list[tuple[str, bytes]]:
    """All sitemap documents host ``h`` serves, as (url, body) —
    pure function of the host's member doc ids so the Spark builder
    (:func:`sitemap_docs_df`) and the pure-Python differential test
    share it. Bodies are gzipped when ``_h(h,'smgz')%3==0`` (sniffed
    by magic, not extension)."""
    import gzip as _gzip

    kind = sitemap_kind_for_host(h)
    if kind is None:
        return []
    host = f"host{h:04d}.example"
    base = f"https://{host}"
    members = sorted(member_doc_ids)
    gz = _h(h, "smgz") % 3 == 0

    def _finish(url: str, text: str) -> tuple[str, bytes]:
        body = text.encode()
        return url, (_gzip.compress(body, 5, mtime=0) if gz else body)

    if kind == "plain":
        return [_finish(base + "/sitemap.txt",
                        "\n".join(url_for(d) for d in members) + "\n")]

    def _urlset(ids: list[int]) -> str:
        rows = "".join(
            _sitemap_xml_entry(url_for(d), *sitemap_priors(d))
            for d in ids)
        return ('<?xml version="1.0" encoding="UTF-8"?>'
                '<urlset xmlns="http://www.sitemaps.org/schemas/'
                f'sitemap/0.9">{rows}</urlset>')

    if kind == "urlset":
        return [_finish(base + "/sitemap.xml", _urlset(members))]

    # index: two children split by doc hash; the index always lists
    # both even when one side is empty (a dead child = fetch miss)
    a = [d for d in members if _h(d, "smchild") % 2 == 0]
    b = [d for d in members if _h(d, "smchild") % 2 == 1]
    idx = ('<?xml version="1.0"?><sitemapindex>'
           f'<sitemap><loc>{base}/sitemap-a.xml</loc></sitemap>'
           f'<sitemap><loc>{base}/sitemap-b.xml</loc></sitemap>'
           '</sitemapindex>')
    out = [_finish(base + "/sitemap.xml", idx)]
    if a:
        out.append(_finish(base + "/sitemap-a.xml", _urlset(a)))
    if b:
        out.append(_finish(base + "/sitemap-b.xml", _urlset(b)))
    return out


def sitemap_docs_df(spark, sf_dir: str):
    """(url, body binary) of every sitemap document the synthetic web
    serves, distributed: membership is a narrow doc_id map, body
    construction one uniform-key (host) shuffle — ~NUM_HOSTS groups,
    each bounded by the host's member count."""
    # pandas is imported at module level: under ``from __future__
    # import annotations`` applyInPandas resolves the (stringified)
    # type hints against MODULE globals
    import pyarrow as pa

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")

    def members(batches: Iterator[pa.RecordBatch]
                ) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            hs, ds = [], []
            for doc_id in batch.column("doc_id").to_pylist():
                h = host_index(doc_id)
                if sitemap_kind_for_host(h) is None \
                        or not doc_in_sitemap(doc_id):
                    continue
                hs.append(h)
                ds.append(doc_id)
            yield pa.RecordBatch.from_arrays(
                [pa.array(hs, pa.int32()), pa.array(ds, pa.int64())],
                names=["h", "doc_id"])

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd
        h = int(key[0])
        docs_out = sitemap_docs_for_host(h, pdf["doc_id"].tolist())
        return _pd.DataFrame(docs_out, columns=["url", "body"])

    return (docs.mapInArrow(members, "h int, doc_id bigint")
            .groupBy("h")
            .applyInPandas(build, "url string, body binary"))


def robots_df(spark, num_hosts: int = NUM_HOSTS):
    """Per-host robots table (FIXTURES.md §3) — RFC 9309 rule mix:

    * ~10% of hosts (``_h(h,'robo')%10==0``): literal-prefix Disallow;
    * ~10% (``_h(h,'roboallow')%10==3``): ``Disallow: /`` with an
      ``Allow: /dNN*`` carve-out — the real-world pattern the round-2
      prefix-only gate over-blocked;
    * ~5% (``_h(h,'robodollar')%20==11``): wildcard + ``$`` rule
      blocking urls whose path ends ``7.html``.

    Classes can stack (rules concatenate). crawl_delay deterministic
    per host. The crawl differential test mirrors these through the
    pure-Python simulator (kernel.robots.is_allowed)."""
    from frontier.spark import schedule

    host_rules = []
    for h in range(num_hosts):
        rules, delay_ms = _host_rules(h)
        host_rules.append((f"host{h:04d}.example", rules, delay_ms))
    return schedule.rules_relation(spark, host_rules)
