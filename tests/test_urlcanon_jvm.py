"""Differential test: JVM Catalyst url-canon == Python kernel.

The JVM chain (frontier/spark/urlcanon.py) is the crawl loop's default;
the pandas kernel (frontier/kernel/urlnorm.py) is the oracle. Both are
driven over the SAME adversarial + hypothesis-generated URL corpus and
must agree exactly (including on which URLs are un-canonicalizable).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from frontier.kernel import urlnorm

ADVERSARIAL = [
    None, "", "   ", "not a url", "http://",
    "http:///path", "http://@/p", "http://:80/p",
    "HTTP://ExAmple.COM:80/A", "https://example.com:443/",
    "https://example.com:8443/x", "http://h.co/p?b=2&a=1#frag",
    "http://h.co/p?b=2&a=1&b=1", "http://h.co/p?", "http://h.co",
    "http://h.co/a/./b/../c", "http://host:notaport/",
    "http://h:99999/", "http://h:-1/x", "http://h:0080/x",
    "http://h:65535/x", "http://h:65536/x", "http://h:123456789012/x",
    "http://h:0000000080/x", "http://h:0000000000000/x",
    "http://h:00000099999/x", "http://h:0/x",
    "//scheme.less/p", "ftp://h:21/f", "http://user:pass@h/p",
    "http://user@h:81/p", "http://a@b@h/p", "http://[::1]/p",
    "http://[::1]:8080/p", "http://[::1]:80/p", "HTTPS://[2001:DB8::1]/",
    "http://[::1", "http://[]:80/", "http://h/p#f?q=1",
    "http://h/p?#f", "http://h/p?a", "http://h/p?a&",
    "http://h/p?&&a=1", "http://h/p?=v", "http://h/p?a==b",
    "http://h/p?a=b=c", "http://h/p?A=1&a=2", "http://h/p?a+b=c%20d",
    "http://h/p?x=%2F&x=2", "http://h/..", "http://h/../..",
    "http://h/a/../../b", "http://h//a//b/./", "http://h/a/b/..",
    "http://h/a/b/../", "  http://h/p  ", "\thttp://h/p\n",
    "http://h/p q", "http://h/p\nq", "1http://h/", "ht~tp://h/",
    "a:b://h/", "http://h:/p", "http://hö.st/p", "http://H\u00d6.st/p",
    "http://h/\u00fcber?sch\u00f6n=ja&a=1", "mailto:x@y.z",
    "http://h/p?b=\u00e9&a=1", "http://h/%2e%2e/p",
    "scheme+x-y.z://H/p", "http://h.:80/", "http://h/?",
    "http://h?a=1", "http://h#f", "//h", "http://h/p?z&y&x",
    "http://h/p?k=&k&k=v",
]

_part = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ09._~%+!$&'()*,;=:@[]/?#-\\ \t\u00e9\u4e16")),
    max_size=8)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(
        ["http", "https", "HTTP", "ftp", "", "1bad", "a+b-c.d"]))
    host = draw(st.sampled_from(
        ["h", "Ex.Ample.com", "h\u00f6st", "[::1]", "[::1", "", "a@b",
         "user:pw@Host.co"]))
    port = draw(st.sampled_from(
        ["", ":80", ":443", ":8080", ":0080", ":99999", ":x", ":",
         ":12345678901234567890", ":0000000080", ":0000000000000"]))
    path = draw(st.lists(_part, max_size=4).map(
        lambda segs: "".join("/" + s for s in segs)))
    query = draw(st.one_of(st.just(""),
                           st.just("?"),
                           _part.map(lambda q: "?" + q)))
    frag = draw(st.sampled_from(["", "#f", "#?x"]))
    sep = draw(st.sampled_from(["://", ":/", "//", ":", ""]))
    pad = draw(st.sampled_from(["", " ", "\n"]))
    body = (scheme + sep if scheme else sep.lstrip(":"))
    return pad + body + host + port + path + query + frag + pad


def _run_jvm(spark, batch):
    from frontier.spark import urlcanon
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(batch)], "i int, url string")
    rows = (df.select("i", urlcanon.canon_expr(F.col("url")).alias("c"),
                      urlcanon.host_expr(F.col("url")).alias("h"))
            .collect())
    by_i = {r["i"]: (r["c"], r["h"]) for r in rows}
    return [by_i[i] for i in range(len(batch))]


def test_adversarial_corpus_matches_kernel(spark):
    got = _run_jvm(spark, ADVERSARIAL)
    for url, (jvm_c, jvm_h) in zip(ADVERSARIAL, got):
        assert jvm_c == urlnorm.canonicalize(url), repr(url)
        assert jvm_h == urlnorm.host_of(url), repr(url)


def test_hypothesis_urls_match_kernel(spark):
    # collect one corpus via hypothesis, run ONE spark job over it —
    # per-example spark jobs would be minutes, not seconds
    corpus = []

    @settings(max_examples=400, deadline=None)
    @given(urls())
    def _collect(u):
        corpus.append(u)

    _collect()
    got = _run_jvm(spark, corpus)
    for url, (jvm_c, jvm_h) in zip(corpus, got):
        assert jvm_c == urlnorm.canonicalize(url), repr(url)
        assert jvm_h == urlnorm.host_of(url), repr(url)


def test_idempotent_through_jvm(spark):
    once = [urlnorm.canonicalize(u) for u in ADVERSARIAL]
    once = [c for c in once if c is not None]
    got = _run_jvm(spark, once)
    for c, (jvm_c, _) in zip(once, got):
        assert jvm_c == c


def test_canon_impl_contract(spark, monkeypatch):
    """impl='jvm' must contain no Python eval node (the cluster
    default); impl='auto' resolves to the pandas kernel under a
    local master and honors $FRONTIER_CANON_IMPL; both agree."""
    from frontier.spark import schedule
    df = spark.createDataFrame([("http://A.b:80/x?b=1&a=2",)], "url string")
    plan = schedule.with_url_canon(df, impl="jvm") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    for impl in ("jvm", "pandas", "auto"):
        row = schedule.with_url_canon(df, impl=impl).collect()[0]
        assert row["url_canon"] == "http://a.b/x?a=2&b=1", impl
    # auto under local[..] -> pandas (Python eval node present)
    monkeypatch.delenv("FRONTIER_CANON_IMPL", raising=False)
    auto_plan = schedule.with_url_canon(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" in auto_plan
    # env override pins the impl
    monkeypatch.setenv("FRONTIER_CANON_IMPL", "jvm")
    forced = schedule.with_url_canon(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in forced


def test_pandas_impl_still_available(spark):
    from frontier.spark import schedule
    df = spark.createDataFrame([("HTTP://H/p?b=1&a=2#f",)], "url string")
    row = schedule.with_url_canon(df, impl="pandas").collect()[0]
    assert row["url_canon"] == "http://h/p?a=2&b=1"
    with pytest.raises(ValueError):
        schedule.with_url_canon(df, impl="bogus")


def test_staged_with_canon_equals_column_form(spark):
    """urlcanon.with_canon (plan-cheap staged projections, the
    scheduler default) must agree exactly with canon_expr AND the
    Python kernel on the adversarial corpus."""
    from pyspark.sql import functions as F

    from frontier.spark import urlcanon

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(ADVERSARIAL)], "i long, url string")
    both = urlcanon.with_canon(df, "url", "staged") \
        .withColumn("expr_form", urlcanon.canon_expr(F.col("url")))
    rows = both.orderBy("i").collect()
    assert list(both.columns) == ["i", "url", "staged", "expr_form"]
    for r in rows:
        assert r.staged == r.expr_form, repr(r.url)
        assert r.staged == urlnorm.canonicalize(r.url), repr(r.url)


def test_host_expr_covers_staged_gate_keys(spark):
    """Prune-safety (r5): the robots prune may derive its host set
    from the RAW url via host_expr instead of the staged canon chain
    (apply_robots prune_hosts=...). That is sound iff every gate key
    the staged frontier can produce — with_host(canon).host — is
    either host_expr(url) itself, or a value no real robots key ever
    takes: '' / NULL (canon failed or scheme-relative; joins no
    hostname) or a '['-prefixed bracketed-IPv6 artifact (robots
    relations are keyed on host_of output, which strips brackets).
    Checked over the adversarial corpus through the REAL operators."""
    from pyspark.sql import functions as F

    from frontier.spark import schedule, urlcanon

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(ADVERSARIAL)], "i long, url string")
    staged = schedule.with_host(
        schedule.with_url_canon(df, impl="jvm")
        .where(F.col("url_canon").isNotNull()))
    rows = (staged
            .withColumn("cheap", urlcanon.host_expr(F.col("url")))
            .withColumn("fast", urlcanon.host_expr(F.col("url"),
                                                   validate=False))
            .select("url", "host", "cheap", "fast").collect())
    assert rows, "adversarial corpus produced no canonicalizable URLs"
    covered = 0
    for r in rows:
        if r.host in ("", None) or r.host.startswith("["):
            continue
        assert r.host == r.cheap, (r.url, r.host, r.cheap)
        # the validation-free variant (the robots-prune default) must
        # agree wherever the validated one produced the gate key
        assert r.host == r.fast, (r.url, r.host, r.fast)
        covered += 1
    assert covered > 10  # the property must actually bite
