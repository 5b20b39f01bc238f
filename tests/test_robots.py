"""robots.txt parsing (RFC 9309 subset) + Spark gate equivalence."""

import pyspark.sql.functions as F

from frontier.kernel import robots

SAMPLE = b"""\
# comments ignored
User-agent: googlebot
Disallow: /private
Crawl-delay: 2

User-agent: frontier-deep
Disallow: /deep

User-agent: *
Disallow: /tmp
Disallow:
Crawl-delay: 0.5
Unknown-directive: whatever
"""


def test_group_selection_specificity():
    # exact/prefix agent beats *; longest prefix wins
    assert robots.rules_for_agent(SAMPLE, "googlebot") \
        == (["/private"], 2000)
    assert robots.rules_for_agent(SAMPLE, "frontier-deep-v2") \
        == (["/deep"], 0)
    assert robots.rules_for_agent(SAMPLE, "frontier") == (["/tmp"], 500)
    assert robots.rules_for_agent(SAMPLE, "otherbot") == (["/tmp"], 500)


def test_empty_disallow_is_allow_all():
    txt = b"User-agent: *\nDisallow:\n"
    assert robots.rules_for_agent(txt, "x") == ([], 0)


def test_consecutive_agents_share_group():
    txt = b"User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert robots.rules_for_agent(txt, "a") == (["/x"], 0)
    assert robots.rules_for_agent(txt, "b") == (["/x"], 0)


def test_junk_tolerated():
    assert robots.rules_for_agent(b"", "x") == ([], 0)
    assert robots.rules_for_agent(b"\xff\xfe\x00garbage", "x") == ([], 0)
    assert robots.rules_for_agent(
        b"Disallow: /orphan\nUser-agent: *\nCrawl-delay: nope\n",
        "x") == ([], 0)  # orphan rule + bad delay ignored


def test_delay_capped():
    txt = b"User-agent: *\nDisallow: /a\nCrawl-delay: 999999\n"
    assert robots.rules_for_agent(txt, "x")[1] == robots.MAX_DELAY_MS


def test_spark_robots_text_to_gate(spark):
    """bytes → robots_from_text → apply_robots must gate exactly like
    a hand-built rules relation."""
    from frontier import synth
    from frontier.spark import schedule

    rules = synth.robots_df(spark, num_hosts=50)

    def to_text(host, prefixes, delay_ms):
        lines = ["User-agent: *"]
        lines += [f"Disallow: {p}" for p in prefixes]
        if delay_ms:
            lines.append(f"Crawl-delay: {delay_ms / 1000}")
        return (host, "\n".join(lines).encode())

    raw = spark.createDataFrame(
        [to_text(r.host, r.disallow_prefixes, r.crawl_delay_ms)
         for r in rules.collect()],
        "host string, robots_txt binary")
    parsed = schedule.robots_from_text(raw)

    a = {r.host: (list(r.disallow_prefixes), r.crawl_delay_ms)
         for r in parsed.collect()}
    b = {r.host: (list(r.disallow_prefixes), r.crawl_delay_ms)
         for r in rules.collect()}
    assert a == b

    # and the gate behaves identically through either relation
    urls = spark.createDataFrame(
        [(f"https://host{h:04d}.example/d{d:02d}/p.html",)
         for h in range(50) for d in (0, 5, 42)], "url string")
    staged = schedule.with_host(schedule.with_url_canon(urls))
    g1 = {r.url_canon: r.robots_allowed for r in
          schedule.apply_robots(staged, rules).collect()}
    g2 = {r.url_canon: r.robots_allowed for r in
          schedule.apply_robots(staged, parsed).collect()}
    assert g1 == g2 and len(g1) == 150


def test_robots_parser_fuzz_never_raises():
    """robots.txt arrives as arbitrary crawled bytes: the parser must
    ALWAYS return a well-formed rules tuple (the Spark kernel treats
    any exception as allow-all, but the kernel itself shouldn't
    need that net for byte junk)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=400))
    def run(blob):
        dis, delay = robots.rules_for_agent(blob, "frontier")
        assert isinstance(dis, list)
        assert all(isinstance(p, str) for p in dis)
        assert 0 <= delay <= robots.MAX_DELAY_MS

    run()
