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


# ---------------------------------------------------------------------------
# End-to-end: synthetic robots.txt / sitemap docs → discover_offers →
# crawl, differentially against a pure-Python reimplementation.
# ---------------------------------------------------------------------------


def _expected_offers(sf_dir):
    """Pure-Python reimplementation of the whole sitemap seed source
    over the synthetic web: robots bytes → Sitemap records → BFS over
    the (url, body) map → kernel parse → canon → first-offer dedup
    with the min-(priority, warc_ts) struct per url — the oracle for
    sitemaps.discover_offers."""
    import pyarrow.parquet as pq

    from frontier import synth
    from frontier.kernel import urlnorm

    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])["doc_id"].to_pylist()
    members: dict[int, list[int]] = {}
    for d in doc_ids:
        h = synth.host_index(d)
        if synth.sitemap_kind_for_host(h) is not None \
                and synth.doc_in_sitemap(d):
            members.setdefault(h, []).append(d)

    bodies: dict[str, bytes] = {}
    sm_urls: list[str] = []
    for h in range(synth.NUM_HOSTS):
        if synth.sitemap_kind_for_host(h) is None:
            continue
        sm_urls.extend(robots.sitemap_urls(synth.robots_txt_for_host(h)))
        for url, body in synth.sitemap_docs_for_host(
                h, members.get(h, [])):
            bodies[url] = body

    offers: dict[str, tuple[int, int]] = {}
    pending, fetched = list(dict.fromkeys(sm_urls)), set()
    for _depth in range(3):
        children = []
        for u in pending:
            fetched.add(u)
            if u not in bodies:
                continue  # dead Sitemap record / dead index child
            parsed = sitemap.parse_sitemap(bodies[u])
            children.extend(c for c in parsed["children"]
                            if c not in fetched)
            for loc, lastmod_us, _freq, prio in parsed["entries"]:
                canon = urlnorm.canonicalize(loc)
                if canon is None:
                    continue
                p = round((1.0 - (prio if prio is not None else 0.5))
                          * 10)
                ts = lastmod_us if lastmod_us is not None else 0
                cur = offers.get(canon)
                if cur is None or (p, ts) < cur:
                    offers[canon] = (p, ts)
        pending = list(dict.fromkeys(children))
        if not pending:
            break
    return offers


@pytest.fixture(scope="module")
def synth_offers(spark, sf_dir):
    from frontier import synth
    from frontier.spark import sitemaps

    robots_txt = synth.robots_txt_df(spark)
    docs = synth.sitemap_docs_df(spark, sf_dir)
    offers = sitemaps.discover_offers(robots_txt, docs).collect()
    sitemaps.release_checkpoints()
    return offers


def test_robots_txt_parity_with_rules_relation(spark):
    """robots_from_text(raw bytes) must equal the pre-parsed
    robots_df relation rule-for-rule — one source of truth for the
    gate regardless of which form the caller feeds it."""
    from frontier import synth
    from frontier.spark import schedule

    parsed = {r.host: ([(ru.pat, ru.re, ru.spec, ru.allow)
                        for ru in r.rules], r.crawl_delay_ms)
              for r in schedule.robots_from_text(
                  synth.robots_txt_df(spark)).collect()}
    direct = {r.host: ([(ru.pat, ru.re, ru.spec, ru.allow)
                        for ru in r.rules], r.crawl_delay_ms)
              for r in synth.robots_df(spark).collect()}
    assert parsed == direct


def test_discover_offers_differential(spark, sf_dir, synth_offers):
    got = {r.url_canon: (r.priority,
                         int(r.warc_ts.timestamp() * 1_000_000))
           for r in synth_offers}
    assert len(got) == len(synth_offers), "offers not unique per url"
    expected = _expected_offers(sf_dir)
    assert got == expected
    assert expected, "synthetic web produced no sitemap offers"
    # the corpus must actually exercise the priors
    assert any(ts > 0 for _, ts in expected.values())
    assert any(p != 5 for p, _ in expected.values())


def test_crawl_with_sitemap_offers_matches_simulator(
        spark, sf_dir, synth_offers, tmp_path):
    """Full-loop differential: a crawl seeded with sitemap offers vs
    the pure-Python simulator fed the same offers after the seed list
    (first-wins) — per-round scheduled sets, seen set, and blocked
    set all match; and the sitemap source actually bites (round 0
    schedules URLs no seed offered)."""
    from frontier import synth
    from frontier.kernel import simulator
    from frontier.spark import crawl, schedule
    from frontier.spark.snapshots import SnapshotStore

    budget, rounds = 3, 3
    pages = synth.pages_from_documents(spark, sf_dir)
    page_index = crawl.prepare_page_index(pages).cache()
    seeds = synth.seeds_from_documents(spark, sf_dir)
    robots_rel = schedule.robots_from_text(
        synth.robots_txt_df(spark)).cache()

    offers_df = spark.createDataFrame(
        [(u, p, ts) for u, (p, ts) in
         sorted(_expected_offers(sf_dir).items())],
        "url_canon string, priority int, ts_us long") \
        .select("url_canon", "priority",
                F.timestamp_micros("ts_us").alias("warc_ts"))
    store = SnapshotStore(str(tmp_path / "crawl_sm"))
    crawl.crawl(spark, page_index, seeds, robots_rel, store,
                budget_per_host=budget, max_rounds=rounds,
                num_buckets=8, sitemap_offers=offers_df)

    pages_map = {}
    for row in page_index.collect():
        ts = int(row.warc_ts.timestamp() * 1_000_000)
        pages_map[row.url_canon] = (ts, row.text, list(row.links))
    seed_list = [(r.url, r.priority, 0) for r in
                 seeds.orderBy("source_rank").collect()]
    seed_list += [(u, p, ts) for u, (p, ts) in
                  sorted(_expected_offers(sf_dir).items())]
    robots_map = {r.host: [(ru.pat, ru.allow) for ru in r.rules]
                  for r in robots_rel.collect() if r.rules}
    sim = simulator.simulate(pages_map, seed_list, robots_map,
                             budget_per_host=budget, max_rounds=rounds)

    sim_sched = [set(rd["scheduled"]) for rd in sim.rounds]
    spark_sched = []
    for sid in store.snapshot_ids():
        batch = store.read(spark, "batch", sid)
        spark_sched.append({r.url_canon for r in
                            batch.select("url_canon").collect()})
    assert spark_sched == sim_sched[:len(spark_sched)]

    seen_rows = store.read(spark, "seen_exact").collect()
    assert {r.url_canon for r in seen_rows} == sim.seen
    blocked_rows = store.read(spark, "blocked").collect()
    assert {r.url_canon for r in blocked_rows} == sim.blocked

    # the sitemap source bites: round 0 schedules offer-only URLs
    seed_canons = {simulator.urlnorm.canonicalize(u)
                   for u, _, _ in seed_list[:len(seed_list)
                                            - len(synth_offers)]}
    offer_only = set(_expected_offers(sf_dir)) - seed_canons
    assert spark_sched and spark_sched[0] & offer_only
