"""JVM-side URL canonicalization — a pure Catalyst expression chain.

Same spec as frontier/kernel/urlnorm.py (see that module's docstring
for the rules). Motivation: round-2 profiling showed the crawl loop's
only width-flat stage was the pandas ``canonicalize`` UDF — Python
workers saturate and do not benefit from more JVM cores. This module
re-expresses the whole canonicalization as built-in string/array
functions, so link discovery stays inside whole-stage codegen and
scales with executor cores. The pandas kernel remains as the
differential oracle (tests/test_urlcanon_jvm.py proves jvm == python
on generated + adversarial URLs).

Building blocks and why they are exact:

* the master regex is the SAME pattern string as the kernel's
  (urlnorm.URL_REGEX) — it uses only constructs with identical
  semantics in Python ``re`` and ``java.util.regex``;
* UTF-8 binary string comparison (Spark) equals code-point comparison
  (Python sort) because UTF-8 byte order preserves code-point order;
* ``lower()`` agrees because the host is gated to ASCII first;
* dot-segment resolution is a left fold — ``F.aggregate`` over the
  split path with an array accumulator;
* stable sort of query pairs rides ``array_sort`` over
  ``struct(key, index, rendered)`` — struct comparison is
  lexicographic by field, so the index field IS the stability.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from frontier.kernel.urlnorm import URL_REGEX

_WS = r"^[ \t\r\n\x0B\f]+|[ \t\r\n\x0B\f]+$"
_ASCII_ONLY = r"^[\x00-\x7F]*$"
_AFTER_FIRST_COLON = r"^[^:]*:([\s\S]*)$"


def canon_expr(url: Column) -> Column:
    """Column of canonicalized URLs (NULL where not canonicalizable)."""
    u = F.regexp_replace(url, _WS, "")
    matched = u.rlike(URL_REGEX)

    scheme = F.lower(F.regexp_extract(u, URL_REGEX, 1))
    netloc = F.regexp_extract(u, URL_REGEX, 2)
    path_raw = F.regexp_extract(u, URL_REGEX, 3)
    query_raw = F.regexp_extract(u, URL_REGEX, 4)

    # --- host / port (kernel _split_hostport) ---
    hostinfo = F.element_at(F.split(netloc, "@", -1), -1)
    bracketed = hostinfo.startswith("[")
    host_raw = F.when(
        bracketed, F.regexp_extract(hostinfo, r"^\[([^\]]*)", 1)
    ).otherwise(F.substring_index(hostinfo, ":", 1))
    port_s = F.when(
        bracketed,
        F.regexp_extract(
            F.regexp_extract(hostinfo, r"^\[[^\]]*\]([\s\S]*)$", 1),
            _AFTER_FIRST_COLON, 1),
    ).otherwise(F.regexp_extract(hostinfo, _AFTER_FIRST_COLON, 1))

    host_ok = (host_raw != "") & host_raw.rlike(_ASCII_ONLY)
    host = F.lower(host_raw)

    # {1,9} digits so the int cast can never overflow under ANSI mode;
    # longer all-digit ports exceed 65535 anyway → invalid.
    port_numeric = port_s.rlike(r"^[0-9]{1,9}$")
    port_i = F.when(port_numeric, port_s.cast("int"))
    port_ok = (port_s == "") | (port_numeric & (port_i <= 65535))

    default_port = (F.when(scheme == "http", 80)
                    .when(scheme == "https", 443))
    hostfmt = F.when(host.contains(":"),
                     F.concat(F.lit("["), host, F.lit("]"))) \
        .otherwise(host)
    netloc_out = F.when(
        (port_s == "") | (port_i == F.coalesce(default_port, F.lit(-1))),
        hostfmt,
    ).otherwise(F.concat(hostfmt, F.lit(":"), port_i.cast("string")))

    # --- path: left fold over '/'-split segments (kernel
    # _normalize_path). The nested whens are lazily evaluated, so
    # element_at(acc, -1) only runs when the accumulator is non-empty.
    def _fold(acc, seg):
        last_empty = F.element_at(acc, -1) == ""
        popped = F.slice(acc, F.lit(1), F.size(acc) - 1)
        return (F.when(seg == ".", acc)
                .when(seg == "..",
                      F.when(F.size(acc) == 0, acc)
                      .when(last_empty, acc)
                      .otherwise(popped))
                .otherwise(F.concat(acc, F.array(seg))))

    segs = F.split(path_raw, "/", -1)
    folded = F.aggregate(
        segs, F.expr("CAST(array() AS array<string>)"), _fold)
    norm = F.array_join(folded, "/")
    path_out = F.when(norm.startswith("/"), norm) \
        .otherwise(F.concat(F.lit("/"), norm))

    # --- query: stable sort by key via struct(key, index, rendered)
    chunks = F.filter(F.split(query_raw, "&", -1),
                      lambda c: c != F.lit(""))
    pairs = F.transform(
        chunks,
        lambda c, i: F.struct(
            F.substring_index(c, "=", 1).alias("k"),
            i.alias("i"),
            F.when(c.contains("="), c)
            .otherwise(F.concat(c, F.lit("="))).alias("kv")))
    q_out = F.array_join(
        F.transform(F.array_sort(pairs), lambda s: s.getField("kv")), "&")

    base = F.concat(
        F.when(scheme != "", F.concat(scheme, F.lit(":")))
        .otherwise(F.lit("")),
        F.lit("//"), netloc_out, path_out)
    result = F.when(q_out != "", F.concat(base, F.lit("?"), q_out)) \
        .otherwise(base)

    valid = (F.coalesce(matched, F.lit(False))
             & host_ok & F.coalesce(port_ok, F.lit(False)))
    return F.when(valid, result)


def host_expr(url: Column) -> Column:
    """Column of lowercased hosts (kernel host_of), NULL where absent."""
    u = F.regexp_replace(url, _WS, "")
    matched = u.rlike(URL_REGEX)
    netloc = F.regexp_extract(u, URL_REGEX, 2)
    hostinfo = F.element_at(F.split(netloc, "@", -1), -1)
    host_raw = F.when(
        hostinfo.startswith("["),
        F.regexp_extract(hostinfo, r"^\[([^\]]*)", 1),
    ).otherwise(F.substring_index(hostinfo, ":", 1))
    valid = (F.coalesce(matched, F.lit(False))
             & (host_raw != "") & host_raw.rlike(_ASCII_ONLY))
    return F.when(valid, F.lower(host_raw))
