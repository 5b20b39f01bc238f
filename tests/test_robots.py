"""robots.txt parsing + RFC 9309 matching + Spark gate equivalence."""

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
Allow: /tmp/pub
Disallow:
Crawl-delay: 0.5
Unknown-directive: whatever
"""


def test_group_selection_specificity():
    # exact/prefix agent beats *; longest prefix wins
    assert robots.rules_for_agent(SAMPLE, "googlebot") \
        == ([("/private", False)], 2000)
    assert robots.rules_for_agent(SAMPLE, "frontier-deep-v2") \
        == ([("/deep", False)], 0)
    assert robots.rules_for_agent(SAMPLE, "frontier") \
        == ([("/tmp", False), ("/tmp/pub", True)], 500)
    assert robots.rules_for_agent(SAMPLE, "otherbot") \
        == ([("/tmp", False), ("/tmp/pub", True)], 500)


def test_empty_disallow_is_allow_all():
    txt = b"User-agent: *\nDisallow:\n"
    assert robots.rules_for_agent(txt, "x") == ([], 0)


def test_consecutive_agents_share_group():
    txt = b"User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert robots.rules_for_agent(txt, "a") == ([("/x", False)], 0)
    assert robots.rules_for_agent(txt, "b") == ([("/x", False)], 0)


def test_junk_tolerated():
    assert robots.rules_for_agent(b"", "x") == ([], 0)
    assert robots.rules_for_agent(b"\xff\xfe\x00garbage", "x") == ([], 0)
    assert robots.rules_for_agent(
        b"Disallow: /orphan\nUser-agent: *\nCrawl-delay: nope\n",
        "x") == ([], 0)  # orphan rule + bad delay ignored


def test_delay_capped():
    txt = b"User-agent: *\nDisallow: /a\nCrawl-delay: 999999\n"
    assert robots.rules_for_agent(txt, "x")[1] == robots.MAX_DELAY_MS


# ---------------------------------------------------------------------------
# RFC 9309 matching semantics (Allow, wildcards, longest-match)
# ---------------------------------------------------------------------------


def test_allow_overrides_disallow_by_length():
    rules = [("/", False), ("/public", True)]
    assert robots.is_allowed(rules, "/public/index.html")
    assert not robots.is_allowed(rules, "/private/index.html")
    assert not robots.is_allowed(rules, "/")


def test_tie_allow_wins():
    # RFC 9309 §2.2.2: equivalent allow and disallow → allow SHOULD win
    rules = [("/page", False), ("/page", True)]
    assert robots.is_allowed(rules, "/page.html")


def test_no_match_allowed():
    assert robots.is_allowed([("/a", False)], "/b")
    assert robots.is_allowed([], "/anything")


def test_wildcard_star():
    rules = [("/*.gif$", False)]
    assert not robots.is_allowed(rules, "/pics/cat.gif")
    assert robots.is_allowed(rules, "/pics/cat.gif?v=1")  # $ anchors
    assert robots.is_allowed(rules, "/pics/cat.gifx")
    rules = [("/fish*", False)]
    assert not robots.is_allowed(rules, "/fishheads/yummy.html")
    assert robots.is_allowed(rules, "/catfish")


def test_rfc9309_222_examples():
    """RFC 9309 §2.2.2 / §5.2-flavoured example matrix."""
    # allow longer than disallow
    r = [("/example", True), ("/ex", False)]
    assert robots.is_allowed(r, "/example/page.html")
    assert not robots.is_allowed(r, "/extra")
    # disallow longer than allow
    r = [("/example/page/", False), ("/example", True)]
    assert not robots.is_allowed(r, "/example/page/index.html")
    assert robots.is_allowed(r, "/example/other")
    # wildcard specificity counts pattern characters
    r = [("/example/page/*.html", False), ("/example/page/", True)]
    assert not robots.is_allowed(r, "/example/page/x.html")
    assert robots.is_allowed(r, "/example/page/x.txt")


def test_compile_pattern_portable():
    """Compiled regexes behave identically under Python re and the
    JVM (via a literal Spark expression) for metachar-heavy rules."""
    import re
    pats = ["/a.b", "/a(b)c", "/x[1]", "/q?r", "/s+t", "/u^v",
            "/w|z", "/p{2}", "/*mid*", "/end$", "/\\back", "/ sp"]
    paths = ["/a.b/c", "/axb", "/a(b)c", "/x[1]", "/q?r", "/qxr",
             "/s+t", "/u^v", "/w|z", "/p{2}", "/amidz", "/end", "/endx",
             "/\\back", "/ sp"]
    for p in pats:
        rx = robots.compile_pattern(p)
        for path in paths:
            assert isinstance(bool(re.search(rx, path)), bool)
    assert re.search(robots.compile_pattern("/a.b"), "/axb") is None
    assert re.search(robots.compile_pattern("/*mid*"), "/amidz")
    assert re.search(robots.compile_pattern("/end$"), "/endx") is None


def test_jvm_matcher_equals_python(spark):
    """Differential: robots_allowed_expr (rlike, JVM) == is_allowed
    (Python re) over a rule × path matrix including metachars."""
    from frontier.spark import schedule

    rule_sets = [
        [("/", False), ("/public", True)],
        [("/page", False), ("/page", True)],
        [("/*.gif$", False)],
        [("/fish*", False), ("/fish*/bowl", True)],
        [("/example/page/*.html", False), ("/example/page/", True)],
        [("/a.b", False)],
        [("/q?r", False), ("/q", True)],
        [],
    ]
    paths = ["/", "/public/x", "/private", "/page.html", "/pics/c.gif",
             "/pics/c.gif?v=1", "/fishheads/y.html", "/fish/bowl/z",
             "/example/page/x.html", "/example/page/x.txt", "/a.b",
             "/axb", "/q?r", "/qxr", "/catfish"]
    rows = [(i, j, path)
            for i, _ in enumerate(rule_sets)
            for j, path in enumerate(paths)]
    rules_rel = schedule.rules_relation(
        spark, [(str(i), rs, 0) for i, rs in enumerate(rule_sets)])
    df = spark.createDataFrame(rows, "i int, j int, path string") \
        .join(rules_rel.select(F.col("host").cast("int").alias("i"),
                               "rules"), "i")
    got = {(r.i, r.j): r.allowed for r in df.select(
        "i", "j",
        schedule.robots_allowed_expr(F.col("path"), F.col("rules"))
        .alias("allowed")).collect()}
    for i, rs in enumerate(rule_sets):
        for j, path in enumerate(paths):
            assert got[(i, j)] == robots.is_allowed(rs, path), (rs, path)


def test_spark_robots_text_to_gate(spark):
    """bytes → robots_from_text → apply_robots must gate exactly like
    a hand-built rules relation (incl. Allow lines — synth emits
    them)."""
    from frontier import synth
    from frontier.spark import schedule

    rules = synth.robots_df(spark, num_hosts=50)

    def to_text(host, rule_structs, delay_ms):
        lines = ["User-agent: *"]
        for ru in rule_structs:
            verb = "Allow" if ru.allow else "Disallow"
            lines.append(f"{verb}: {ru.pat}")
        if delay_ms:
            lines.append(f"Crawl-delay: {delay_ms / 1000}")
        return (host, "\n".join(lines).encode())

    raw = spark.createDataFrame(
        [to_text(r.host, list(r.rules), r.crawl_delay_ms)
         for r in rules.collect()],
        "host string, robots_txt binary")
    parsed = schedule.robots_from_text(raw)

    a = {r.host: ([tuple(ru) for ru in r.rules], r.crawl_delay_ms)
         for r in parsed.collect()}
    b = {r.host: ([tuple(ru) for ru in r.rules], r.crawl_delay_ms)
         for r in rules.collect()}
    assert a == b

    # and the gate behaves identically through either relation
    urls = spark.createDataFrame(
        [(f"https://host{h:04d}.example/d{d:02d}/p{h}7.html",)
         for h in range(50) for d in (0, 5, 42)], "url string")
    staged = schedule.with_host(schedule.with_url_canon(urls))
    g1 = {r.url_canon: r.robots_allowed for r in
          schedule.apply_robots(staged, rules).collect()}
    g2 = {r.url_canon: r.robots_allowed for r in
          schedule.apply_robots(staged, parsed).collect()}
    assert g1 == g2 and len(g1) == 150
    assert False in g1.values() and True in g1.values()


def test_robots_parser_fuzz_never_raises():
    """robots.txt arrives as arbitrary crawled bytes: the parser must
    ALWAYS return a well-formed rules tuple, and every parsed pattern
    must compile under Python re AND match without raising."""
    import re

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=400))
    def run(blob):
        rules, delay = robots.rules_for_agent(blob, "frontier")
        assert isinstance(rules, list)
        assert 0 <= delay <= robots.MAX_DELAY_MS
        for pat, allow in rules:
            assert isinstance(pat, str) and isinstance(allow, bool)
            re.search(robots.compile_pattern(pat), "/some/path")

    run()


def test_multiple_star_groups_merge():
    # RFC 9309 §2.2.1: two 'User-agent: *' stanzas combine — the
    # second stanza's rules must NOT be dropped (ADVICE r3).
    txt = (b"User-agent: *\nDisallow: /a\nCrawl-delay: 1\n\n"
           b"User-agent: *\nDisallow: /b\nAllow: /b/pub\nCrawl-delay: 3\n")
    rules, delay = robots.rules_for_agent(txt, "anybot")
    assert rules == [("/a", False), ("/b", False), ("/b/pub", True)]
    assert delay == 3000  # max across merged groups
    assert not robots.is_allowed(rules, "/a/x")
    assert not robots.is_allowed(rules, "/b/x")
    assert robots.is_allowed(rules, "/b/pub/x")


def test_named_groups_merge_star_excluded():
    # two groups naming the same agent merge; '*' group does NOT
    # leak into a named match
    txt = (b"User-agent: bot\nDisallow: /a\n\n"
           b"User-agent: *\nDisallow: /star\n\n"
           b"User-agent: bot\nDisallow: /b\n")
    rules, _ = robots.rules_for_agent(txt, "bot")
    assert rules == [("/a", False), ("/b", False)]


def test_query_string_rules_match():
    # §2.2.2 matches path+query: 'Disallow: /*?*' blocks querystring
    # URLs. The matcher itself is path-string based — both callers
    # (Spark gate, simulator) now pass path+query.
    rules = [("/*?*", False)]
    assert robots.is_allowed(rules, "/page")
    assert not robots.is_allowed(rules, "/page?x=1")
    rules2 = [("/search?q=", False)]
    assert not robots.is_allowed(rules2, "/search?q=foo")
    assert robots.is_allowed(rules2, "/search")


def test_spark_gate_sees_query(spark):
    # apply_robots must evaluate rules against path PLUS query
    from frontier.spark import schedule

    rules = [("/*?*", False), ("/q", True)]
    robots_df = spark.createDataFrame(
        [("h.co",
          [(p, robots.compile_pattern(p), len(p), a) for p, a in rules],
          0)],
        "host string, rules array<struct<pat:string,re:string,"
        "spec:int,allow:boolean>>, crawl_delay_ms int")
    frontier = spark.createDataFrame(
        [("http://h.co/q?x=1", "h.co"),
         ("http://h.co/q", "h.co"),
         ("http://h.co/", "h.co")],
        "url_canon string, host string")
    got = {r["url_canon"]: r["robots_allowed"]
           for r in schedule.apply_robots(frontier, robots_df).collect()}
    # /q?x=1: '/*?*' (4 chars, block) vs '/q' (2 chars, allow) → block
    assert got["http://h.co/q?x=1"] is False
    assert got["http://h.co/q"] is True
    assert got["http://h.co/"] is True


def test_gate_broadcast_is_pruned(spark):
    """Scale invariant (r4 VERDICT item 1): apply_robots must never
    broadcast the full robots relation — one row per host EVER SEEN,
    GBs at 10^8 hosts. The plan must (a) semi-join robots down to the
    batch's bounded host set with the HOSTS side broadcast, then (b)
    broadcast only that pruned relation into the left-outer gate."""
    from frontier import synth
    from frontier.spark import schedule

    robots_df = synth.robots_df(spark, num_hosts=200)
    urls = spark.createDataFrame(
        [(f"https://host{h:04d}.example/d{h % 7:02d}/p.html",)
         for h in range(20)], "url string")
    staged = schedule.with_host(schedule.with_url_canon(urls))

    gated = schedule.apply_robots(staged, robots_df)
    plan = gated._jdf.queryExecution().executedPlan().toString()
    # the prune: a broadcast LeftSemi on host (hosts side broadcast)
    assert "LeftSemi" in plan, plan
    # the gate: a broadcast left-outer on host exists above it
    assert "LeftOuter" in plan, plan
    # tree order: the outer gate join prints ABOVE the semi-join,
    # i.e. the pruned (semi-joined) relation is what gets broadcast
    # into the gate — the robots scan never feeds a BroadcastExchange
    # directly
    assert plan.index("LeftOuter") < plan.index("LeftSemi"), plan

    # prune=False keeps the legacy single-broadcast shape (used by
    # bounded-robots callers) and both gates agree row-for-row
    legacy = schedule.apply_robots(staged, robots_df, prune=False)
    lplan = legacy._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in lplan
    a = {r.url_canon: r.robots_allowed for r in gated.collect()}
    b = {r.url_canon: r.robots_allowed for r in legacy.collect()}
    assert a == b and len(a) == 20

    # prune_hosts path (r5): the host set comes from the RAW url via
    # host_expr — a SUPERSET of the staged hosts (here genuinely
    # proper: urls covers hosts the staged side lacks after the canon
    # NULL filter can't drop any, plus an unrelated extra host).
    # Same rows, same pruned plan shape, and the staged canon subtree
    # is read exactly once (no second scan of `urls` in the plan).
    from frontier.spark import urlcanon
    extra = spark.createDataFrame(
        [("https://unrelated.example/x",)], "url string")
    hosts = urls.unionByName(extra).select(
        urlcanon.host_expr(F.col("url")).alias("host"))
    gated2 = schedule.apply_robots(staged, robots_df, prune_hosts=hosts)
    plan2 = gated2._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan2
    assert plan2.index("LeftOuter") < plan2.index("LeftSemi"), plan2
    c = {r.url_canon: r.robots_allowed for r in gated2.collect()}
    assert c == a
