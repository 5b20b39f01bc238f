from frontier.kernel.urlnorm import canonicalize, host_of


def test_case_and_default_ports():
    assert canonicalize("HTTP://ExAmple.COM:80/A") == "http://example.com/A"
    assert canonicalize("https://example.com:443/") == "https://example.com/"
    assert canonicalize("https://example.com:8443/x") == \
        "https://example.com:8443/x"


def test_fragment_stripped_query_sorted():
    assert canonicalize("http://h.co/p?b=2&a=1#frag") == "http://h.co/p?a=1&b=2"
    # duplicate keys keep relative order (stable sort)
    assert canonicalize("http://h.co/p?b=2&a=1&b=1") == \
        "http://h.co/p?a=1&b=2&b=1"
    assert canonicalize("http://h.co/p?") == "http://h.co/p"


def test_path_dot_segments():
    assert canonicalize("http://h.co/a/./b/../c") == "http://h.co/a/c"
    assert canonicalize("http://h.co") == "http://h.co/"


def test_invalid_inputs():
    assert canonicalize(None) is None
    assert canonicalize("") is None
    assert canonicalize("not a url") is None
    assert host_of("nope") is None


def test_invalid_ports_do_not_raise():
    # urlsplit defers port validation to .port — a crawler-discovered
    # link with a junk port must canonicalize to None, not ValueError
    assert canonicalize("http://host:notaport/") is None
    assert canonicalize("http://h:99999/") is None
    assert canonicalize("http://h:-1/x") is None


def test_idempotent():
    for url in ("HTTP://A.B:80/x/../y?z=1&a=2#f",
                "https://h.co:8443/deep/path?q=1"):
        once = canonicalize(url)
        assert canonicalize(once) == once


def test_host_of():
    assert host_of("https://Sub.Example.com:9090/p") == "sub.example.com"
