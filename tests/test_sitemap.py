"""Sitemap ingestion: kernel parsing (differential vs stdlib
datetime), robots Sitemap records, and the Spark explode/offer
operators."""

import gzip
import zlib
from datetime import datetime, timedelta, timezone

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from frontier.kernel import robots, sitemap

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://ex.com/a?x=1&amp;y=2</loc>
    <lastmod>2024-02-01T12:30:00+00:00</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://ex.com/b</loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url>
    <loc>https://ex.com/c</loc>
    <changefreq>sometimes</changefreq>
    <priority>7</priority>
  </url>
</urlset>"""

INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://ex.com/s1.xml</loc>
    <lastmod>2024-01-05</lastmod></sitemap>
  <sitemap><loc>https://ex.com/s2.xml.gz</loc></sitemap>
</sitemapindex>"""


def test_urlset_entries():
    got = sitemap.parse_sitemap(URLSET)
    assert got["kind"] == "urlset" and got["children"] == []
    entries = got["entries"]
    # the loc-less <url> is dropped; entities unescaped; junk
    # changefreq and out-of-range priority become None
    assert [e[0] for e in entries] == [
        "https://ex.com/a?x=1&y=2", "https://ex.com/b",
        "https://ex.com/c"]
    assert entries[0][1] == sitemap.w3c_datetime_us(
        "2024-02-01T12:30:00+00:00")
    assert entries[0][2:] == ("daily", 0.8)
    assert entries[1][1:] == (None, None, None)
    assert entries[2][1:] == (None, None, None)


def test_sitemapindex_children():
    got = sitemap.parse_sitemap(INDEX)
    assert got["kind"] == "index" and got["entries"] == []
    assert got["children"] == ["https://ex.com/s1.xml",
                               "https://ex.com/s2.xml.gz"]


def test_namespaced_tags():
    body = (b"<sm:urlset xmlns:sm='x'><sm:url><sm:loc>http://h/p"
            b"</sm:loc></sm:url></sm:urlset>")
    got = sitemap.parse_sitemap(body)
    assert got["kind"] == "urlset"
    assert got["entries"] == [("http://h/p", None, None, None)]


def test_plain_text_sitemap():
    body = b"https://a.com/1\nnot a url\n  ftp://b.com/2  \n\n"
    got = sitemap.parse_sitemap(body)
    assert got["kind"] == "plain"
    assert [e[0] for e in got["entries"]] == [
        "https://a.com/1", "ftp://b.com/2"]


def test_garbage_is_empty():
    for body in (b"", b"\x00\xff\xfe junk", b"<html>nope</html>"):
        got = sitemap.parse_sitemap(body)
        assert got == {"kind": "empty", "entries": [], "children": []}


def test_gzip_roundtrip_and_bomb():
    gz = gzip.compress(URLSET)
    assert sitemap.parse_sitemap(gz) == sitemap.parse_sitemap(URLSET)
    # a 512 MiB zero bomb must degrade (output cap), not OOM/raise
    bomb = gzip.compress(b"\x00" * (512 << 20), compresslevel=9)
    got = sitemap.parse_sitemap(bomb)
    assert got["kind"] == "empty"
    # truncated gzip stream: parse what inflated, never raise
    assert isinstance(sitemap.parse_sitemap(gz[:20]), dict)


def test_entry_cap(monkeypatch):
    monkeypatch.setattr(sitemap, "MAX_ENTRIES", 3)
    body = b"<urlset>" + b"".join(
        b"<url><loc>http://h/%d</loc></url>" % i for i in range(10)
    ) + b"</urlset>"
    assert len(sitemap.parse_sitemap(body)["entries"]) == 3
    idx = b"<sitemapindex>" + b"".join(
        b"<sitemap><loc>http://h/s%d</loc></sitemap>" % i
        for i in range(10)) + b"</sitemapindex>"
    assert len(sitemap.parse_sitemap(idx)["children"]) == 3


W3C_CASES = [
    "2024-02-01", "2004-10-01T18:23:17+00:00", "2024-02-29",
    "1999-12-31T23:59:59Z", "2024-02-01T12:30:00.123456Z",
    "2024-02-01T12:30:00.5+02:00", "2024-06-15t06:07:08-05:30",
    "1970-01-01", "2100-03-01T00:00:00Z", "2000-02-29T01:02:03+14:00",
]


def test_w3c_datetime_matches_stdlib():
    for s in W3C_CASES:
        norm = s.upper().replace("T", "T").replace("t", "T")
        if "T" not in norm:
            dt = datetime(*map(int, s.split("-")), tzinfo=timezone.utc)
        else:
            dt = datetime.fromisoformat(
                s.replace("t", "T").replace("Z", "+00:00")
                .replace("z", "+00:00"))
        want = int(dt.timestamp() * 1_000_000)
        got = sitemap.w3c_datetime_us(s)
        assert got == want, (s, got, want)


def test_w3c_datetime_rejects_junk():
    for s in (None, "", "yesterday", "2024-13-01", "2024-00-10",
              "2024-01-32", "2024-01-01T25:00:00Z", "20240101",
              "2024-1-1"):
        assert sitemap.w3c_datetime_us(s) is None, s


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_parse_sitemap_never_raises(body):
    got = sitemap.parse_sitemap(body)
    assert set(got) == {"kind", "entries", "children"}
    assert got["kind"] in ("urlset", "index", "plain", "empty")


def test_robots_sitemap_records():
    txt = b"""
Sitemap: https://ex.com/before-any-group.xml
User-agent: *
Disallow: /private
sitemap: https://ex.com/lower.xml  # comment stripped
SITEMAP: https://ex.com/before-any-group.xml
Sitemap: not-a-url
Sitemap: https://ex.com/other.xml
"""
    assert robots.sitemap_urls(txt) == [
        "https://ex.com/before-any-group.xml",
        "https://ex.com/lower.xml",
        "https://ex.com/other.xml"]
    # and the rule parse is unaffected
    rules, _ = robots.rules_for_agent(txt, "anybot")
    assert rules == [("/private", False)]


def test_spark_sitemap_entries_matches_kernel(spark):
    from frontier.spark import sitemaps

    corpus = [("https://ex.com/u.xml", URLSET),
              ("https://ex.com/i.xml", INDEX),
              ("https://ex.com/u.xml.gz", gzip.compress(URLSET)),
              ("https://ex.com/t.txt", b"https://a.com/1\njunk\n"),
              ("https://ex.com/junk", b"\x00\xffgarbage")]
    df = spark.createDataFrame(corpus, "url string, body binary")
    rows = sitemaps.sitemap_entries(df).collect()
    got = {}
    for r in rows:
        got.setdefault(r.sitemap_url, []).append(
            (r.kind, r.loc, r.lastmod_us, r.changefreq, r.priority,
             r.is_child))
    # kernel-derived expectation, row for row
    want = {}
    for url, body in corpus:
        parsed = sitemap.parse_sitemap(body)
        out = [(parsed["kind"], c, None, None, None, True)
               for c in parsed["children"]]
        out += [(parsed["kind"], loc, lm, cf, pr, False)
                for loc, lm, cf, pr in parsed["entries"]]
        if out:
            want[url] = out
    assert got == want


def test_spark_sitemap_offers(spark):
    from frontier.spark import sitemaps

    lm = sitemap.w3c_datetime_us("2024-02-01T12:30:00Z")
    entries = spark.createDataFrame(
        [("s", "urlset", "https://EX.com/a", lm, "daily", 0.8, False),
         # duplicate loc (same canon), worse priority: min-struct wins
         ("s", "urlset", "https://ex.com/a", None, None, 0.1, False),
         ("s", "urlset", "https://ex.com/b", None, None, None, False),
         ("s", "index", "https://ex.com/child.xml", None, None, None,
          True),   # children never become offers
         ("s", "urlset", "###", None, None, None, False)],  # no canon
        sitemaps.ENTRY_DDL)
    got = {r.url_canon: r for r in
           sitemaps.sitemap_offers(entries).collect()}
    assert set(got) == {"https://ex.com/a", "https://ex.com/b"}
    a = got["https://ex.com/a"]
    assert a.priority == 2  # round((1-0.8)*10) beats round((1-0.1)*10)
    assert int(a.warc_ts.timestamp() * 1_000_000) == lm
    b = got["https://ex.com/b"]
    assert b.priority == 5  # default 0.5 → 5
    assert b.warc_ts.timestamp() == 0


def test_spark_sitemap_urls_from_robots(spark):
    from frontier.spark import sitemaps

    df = spark.createDataFrame(
        [("h1.com", b"User-agent: *\nSitemap: https://h1.com/s.xml"),
         ("h2.com", b"Disallow: /x"),
         ("h3.com", None)],
        "host string, robots_txt binary")
    got = {(r.host, r.sitemap_url)
           for r in sitemaps.sitemap_urls_from_robots(df).collect()}
    assert got == {("h1.com", "https://h1.com/s.xml")}


def test_changefreq_interval_clamped(spark):
    from frontier.spark import sitemaps

    df = spark.createDataFrame(
        [("always",), ("daily",), ("monthly",), ("yearly",),
         ("never",), (None,), ("bogus",)], "changefreq string")
    got = {r.changefreq: r.iv for r in df.select(
        "changefreq",
        sitemaps.changefreq_interval_sec().alias("iv")).collect()}
    assert got["always"] == 86_400        # clamped up to min
    assert got["daily"] == 86_400
    assert got["monthly"] == 2_592_000
    assert got["yearly"] == 2_592_000     # clamped down to max
    assert got["never"] == 2_592_000
    assert got[None] == 2_592_000
    assert got["bogus"] == 2_592_000
