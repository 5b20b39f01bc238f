"""Partitioned Bloom-filter URL-seen set.

The reference's seen set is a Python ``set`` of resource locations
(merge.py:30-44). At 10^10 URLs that is ~1 TB of strings — so the
scaled design is a *partitioned* Bloom filter relation::

    seen_bloom(bucket int, bloom binary)

* ``bucket = pmod(xxhash64(url_canon), num_buckets)`` — computed
  JVM-side (whole-stage codegen), so Python never hashes strings.
* per-bucket bit arrays are numpy ``uint8`` vectors built/probed with
  ``applyInPandas`` grouped on ``bucket`` — pure vectorized bit math.
* k hash positions come from double hashing (Kirsch-Mitzenmacher):
  ``pos_i = (h1 + i*h2) mod m`` with ``h1 = xxhash64(url)``,
  ``h2 = xxhash64(url, salt)`` — both JVM-side columns.

Sizing: at 10 bits/key and k=7 the FPP is ~0.8%. 10^10 keys → 12.5 GB
of filter across ``num_buckets`` rows; with 4096 buckets each blob is
~3 MB — comfortably broadcastable per-bucket and unionable via
``np.bitwise_or``. Locally we default to 64 buckets.

Correctness contract: the Bloom is a PRE-filter. "definitely new" URLs
skip the expensive exact check; "maybe seen" URLs are confirmed with an
exact ``left_anti`` join against the seen-urls relation, so a false
positive can never drop a URL (SURVEY.md §7.2).

Spark's own ``bloom_filter_agg`` / ``might_contain`` are not SQL
registered in PySpark 4.1.2 (verified in-sandbox) and the north_rule
mandates from-scratch anyway.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

DEFAULT_NUM_BUCKETS = 64
DEFAULT_BITS_PER_KEY = 10
DEFAULT_K = 7
_SALT = "frontier-bloom-h2"

BLOOM_DDL = "bucket int, bloom binary, n_keys bigint"


def with_hash_cols(df: DataFrame, url_col: str = "url_canon",
                   num_buckets: int = DEFAULT_NUM_BUCKETS) -> DataFrame:
    """Attach (bucket, h1, h2) — all JVM-side, codegen'd."""
    return (df
            .withColumn("h1", F.xxhash64(F.col(url_col)))
            .withColumn("h2", F.xxhash64(F.col(url_col), F.lit(_SALT)))
            .withColumn("bucket",
                        F.pmod(F.col("h1"), F.lit(num_buckets))
                        .cast("int")))


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m_bits: int):
    """(n, k) matrix of bit positions via double hashing, uint64 math."""
    h1u = h1.astype(np.uint64)
    h2u = h2.astype(np.uint64) | np.uint64(1)  # force odd → full cycle
    i = np.arange(k, dtype=np.uint64)
    return (h1u[:, None] + i[None, :] * h2u[:, None]) % np.uint64(m_bits)


def build(urls: DataFrame, url_col: str = "url_canon",
          num_buckets: int = DEFAULT_NUM_BUCKETS,
          bits_per_bucket: int | None = None,
          expected_keys_per_bucket: int = 200_000,
          k: int = DEFAULT_K) -> DataFrame:
    """URLs → seen_bloom(bucket, bloom, n_keys), one row per bucket."""
    if bits_per_bucket is None:
        bits_per_bucket = expected_keys_per_bucket * DEFAULT_BITS_PER_KEY
    # probe() recovers m_bits as len(blob)*8, so build must take
    # positions modulo a multiple of 8 — otherwise the two moduli
    # disagree and the filter gains FALSE NEGATIVES (seen URLs
    # re-entering the frontier), breaking the pre-filter contract.
    m_bytes = (int(bits_per_bucket) + 7) // 8
    m_bits = m_bytes * 8

    hashed = with_hash_cols(urls.select(url_col).dropDuplicates([url_col]),
                            url_col, num_buckets)

    def make_filter(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bytes, dtype=np.uint8)
        pos = _positions(pdf["h1"].to_numpy(), pdf["h2"].to_numpy(),
                         k, m_bits).ravel()
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))
        return pd.DataFrame({
            "bucket": [int(pdf["bucket"].iloc[0])],
            "bloom": [bits.tobytes()],
            "n_keys": [len(pdf)],
        })

    return hashed.groupBy("bucket").applyInPandas(make_filter, BLOOM_DDL)


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two bloom relations bucket-wise (bitwise OR)."""
    both = a.unionByName(b)

    def orr(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        total = 0
        for blob, n in zip(pdf["bloom"], pdf["n_keys"]):
            arr = np.frombuffer(blob, dtype=np.uint8)
            acc = arr.copy() if acc is None else np.bitwise_or(acc, arr)
            total += int(n)
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])],
                             "bloom": [acc.tobytes()],
                             "n_keys": [total]})

    return both.groupBy("bucket").applyInPandas(orr, BLOOM_DDL)


def probe(candidates: DataFrame, seen_bloom: DataFrame,
          url_col: str = "url_canon",
          num_buckets: int = DEFAULT_NUM_BUCKETS,
          k: int = DEFAULT_K) -> DataFrame:
    """Tag candidates with ``maybe_seen``.

    Shuffles both sides on ``bucket`` (co-partitioned join), then a
    vectorized membership test per bucket group. Output keeps all
    candidate columns + ``maybe_seen boolean``.
    """
    cand = with_hash_cols(candidates, url_col, num_buckets)
    out_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in cand.schema.fields) + ", maybe_seen boolean"
    cols = list(cand.columns)

    # cogroup keeps the bloom blob ONE row per bucket instead of
    # replicating ~KB-MB of filter bytes onto every candidate row
    def check(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame
              ) -> pd.DataFrame:
        if cand_pdf.empty:
            out = cand_pdf[cols].copy()
            out["maybe_seen"] = pd.Series([], dtype=bool)
            return out
        out = cand_pdf[cols].copy()
        if bloom_pdf.empty or bloom_pdf["bloom"].iloc[0] is None:
            out["maybe_seen"] = False
            return out
        bits = np.frombuffer(bloom_pdf["bloom"].iloc[0], dtype=np.uint8)
        m_bits = bits.shape[0] * 8
        pos = _positions(cand_pdf["h1"].to_numpy(),
                         cand_pdf["h2"].to_numpy(), k, m_bits)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit_mask = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        hit = (bits[byte_idx] & bit_mask) != 0
        out["maybe_seen"] = hit.all(axis=1)
        return out

    return (cand.groupBy("bucket")
            .cogroup(seen_bloom.groupBy("bucket"))
            .applyInPandas(check, out_ddl))


# ---------------------------------------------------------------------------
# cuckoo variant — supports deletion (recrawl / retraction paths)
# ---------------------------------------------------------------------------

CUCKOO_DDL = "bucket int, table binary, n_keys bigint"


def build_cuckoo(urls: DataFrame, url_col: str = "url_canon",
                 num_buckets: int = DEFAULT_NUM_BUCKETS) -> DataFrame:
    """URLs → seen_cuckoo(bucket, table, n_keys): a deletable seen-set.

    Same partitioned shape as the Bloom relation; per-bucket tables
    built deterministically (sorted insert) so snapshot bytes are
    stable at any parallelism.
    """
    from frontier.kernel import cuckoo as ck

    hashed = with_hash_cols(urls.select(url_col).dropDuplicates([url_col]),
                            url_col, num_buckets)

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        h1 = pdf["h1"].to_numpy().astype(np.uint64)
        h2 = pdf["h2"].to_numpy().astype(np.uint64)
        filt = ck.build_sorted(h1, h2, capacity=2 * len(pdf))
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])],
                             "table": [filt.to_bytes()],
                             "n_keys": [len(pdf)]})

    return hashed.groupBy("bucket").applyInPandas(make, CUCKOO_DDL)


def probe_cuckoo(candidates: DataFrame, seen_cuckoo: DataFrame,
                 url_col: str = "url_canon",
                 num_buckets: int = DEFAULT_NUM_BUCKETS) -> DataFrame:
    """Tag candidates with ``maybe_seen`` against the cuckoo relation
    (cogroup, same shape as :func:`probe`)."""
    from frontier.kernel import cuckoo as ck

    cand = with_hash_cols(candidates, url_col, num_buckets)
    out_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in cand.schema.fields) + ", maybe_seen boolean"
    cols = list(cand.columns)

    def check(cand_pdf: pd.DataFrame, filt_pdf: pd.DataFrame
              ) -> pd.DataFrame:
        out = cand_pdf[cols].copy()
        if cand_pdf.empty:
            out["maybe_seen"] = pd.Series([], dtype=bool)
            return out
        if filt_pdf.empty or filt_pdf["table"].iloc[0] is None:
            out["maybe_seen"] = False
            return out
        filt = ck.CuckooFilter.from_bytes(filt_pdf["table"].iloc[0])
        out["maybe_seen"] = filt.contains_many(
            cand_pdf["h1"].to_numpy().astype(np.uint64),
            cand_pdf["h2"].to_numpy().astype(np.uint64))
        return out

    return (cand.groupBy("bucket")
            .cogroup(seen_cuckoo.groupBy("bucket"))
            .applyInPandas(check, out_ddl))


def cuckoo_delete(seen_cuckoo: DataFrame, urls: DataFrame,
                  url_col: str = "url_canon",
                  num_buckets: int = DEFAULT_NUM_BUCKETS) -> DataFrame:
    """Remove URLs from the cuckoo relation — the operation a Bloom
    filter cannot do. Returns the updated relation."""
    from frontier.kernel import cuckoo as ck

    hashed = with_hash_cols(urls.select(url_col).dropDuplicates([url_col]),
                            url_col, num_buckets)

    def remove(filt_pdf: pd.DataFrame, del_pdf: pd.DataFrame
               ) -> pd.DataFrame:
        if filt_pdf.empty:
            return pd.DataFrame(
                {"bucket": pd.Series([], dtype="int32"),
                 "table": pd.Series([], dtype=object),
                 "n_keys": pd.Series([], dtype="int64")})
        filt = ck.CuckooFilter.from_bytes(filt_pdf["table"].iloc[0])
        removed = 0
        if not del_pdf.empty:
            order = del_pdf.sort_values(["h1", "h2"])
            for h1, h2 in zip(order["h1"], order["h2"]):
                removed += filt.delete(int(np.uint64(h1)),
                                       int(np.uint64(h2)))
        return pd.DataFrame({
            "bucket": [int(filt_pdf["bucket"].iloc[0])],
            "table": [filt.to_bytes()],
            "n_keys": [int(filt_pdf["n_keys"].iloc[0]) - removed]})

    return (seen_cuckoo.groupBy("bucket")
            .cogroup(hashed.groupBy("bucket"))
            .applyInPandas(remove, CUCKOO_DDL))


def filter_unseen(candidates: DataFrame, seen_bloom: DataFrame,
                  seen_exact: DataFrame | None = None,
                  url_col: str = "url_canon",
                  num_buckets: int = DEFAULT_NUM_BUCKETS,
                  impl: str = "auto") -> DataFrame:
    """The full anti-join: Bloom pre-filter + exact confirm.

    * ``maybe_seen = False`` → definitely new (Bloom has no false
      negatives) — passes through with NO exact-join cost.
    * ``maybe_seen = True`` → confirmed against ``seen_exact`` with a
      ``left_anti`` join; survivors are Bloom false positives.

    At 10^10 scale the exact join touches only FPP≈1% of candidates —
    that is the whole point of the partitioned Bloom.

    ``impl`` picks the probe kernel (bit-identical, differential-
    tested — tests/test_seen.py): ``pandas`` = cogroup numpy kernel
    (:func:`probe`) — the DEFAULT everywhere: the membership test is
    exactly the vectorized-batch shape Arrow-batched pandas is for,
    and it beat the JVM expression probe 4.5× in measurement
    (probe_jvm's broadcast join materializes each bucket's ~250 KB
    word array into every joined row). ``jvm`` = whole-stage-codegen
    bit test (:func:`probe_jvm`) — the Python-free alternative for
    environments where Python workers are unavailable or rationed.
    Override with $FRONTIER_PROBE_IMPL.
    """
    if impl == "auto":
        import os

        impl = os.environ.get("FRONTIER_PROBE_IMPL", "") or "pandas"
    if impl == "jvm":
        tagged = probe_jvm(candidates, seen_bloom, url_col, num_buckets)
    elif impl == "pandas":
        tagged = probe(candidates, seen_bloom, url_col, num_buckets)
    else:
        raise ValueError(f"unknown probe impl: {impl!r}")
    fresh = tagged.where(~F.col("maybe_seen")).drop("maybe_seen", "h1",
                                                    "h2", "bucket")
    if seen_exact is None:
        return fresh
    suspects = tagged.where(F.col("maybe_seen")).drop("maybe_seen", "h1",
                                                      "h2", "bucket")
    confirmed_new = suspects.join(
        seen_exact.select(F.col(url_col)).dropDuplicates([url_col]),
        url_col, "left_anti")
    return fresh.unionByName(confirmed_new)


def _bloom_words(bloom_col):
    """binary bloom blob → array<bigint> of LITTLE-ENDIAN 64-bit
    words (word w holds bytes 8w..8w+7, byte b contributes bits
    8b..8b+7), so bit i of the FILTER is bit (i % 64) of word
    (i // 64) — matching the numpy kernel's byte/bit layout
    (byte = pos >> 3, mask = 1 << (pos & 7)).

    One Arrow-batched numpy pass over the BLOOM relation (one row
    per bucket — 64..4096 rows, trivially small). A first cut did
    this as a Catalyst higher-order transform with 8 substring/hex/
    conv per word: HOF lambdas run INTERPRETED, and 2M-bit buckets
    took 180 s to expand — the pandas_udf does the same in
    milliseconds. The expansion sits on the tiny BROADCAST side of
    the probe join; the 10^10-row candidate side stays whole-stage
    codegen either way."""
    @pandas_udf("array<bigint>")
    def words(blobs: pd.Series) -> pd.Series:
        out = []
        for blob in blobs:
            if blob is None:
                out.append(None)
                continue
            arr = np.frombuffer(blob, dtype=np.uint8)
            pad = (-len(arr)) % 8
            if pad:
                arr = np.concatenate(
                    [arr, np.zeros(pad, dtype=np.uint8)])
            # little-endian u64 view; astype int64 keeps the BIT
            # pattern (two's-complement wrap), which is what getbit
            # reads
            out.append(arr.view("<u8").astype(np.int64).tolist())
        return pd.Series(out)

    return words(bloom_col)


def probe_jvm(candidates: DataFrame, seen_bloom: DataFrame,
              url_col: str = "url_canon",
              num_buckets: int = DEFAULT_NUM_BUCKETS,
              k: int = DEFAULT_K) -> DataFrame:
    """Pure-JVM bloom membership test — same contract as
    :func:`probe` (differential-tested bit-identical): candidates
    never leave the JVM, for environments without Python workers.
    NOT the default: measured 4.5× slower than the Arrow-batched
    numpy probe at 1M candidates because the BroadcastHashJoin
    materializes each bucket's ~250 KB word array into every joined
    candidate row — the vectorized cogroup kernel touches each
    filter once per BATCH instead. Kept as the documented
    alternative + second differential witness for the position
    arithmetic.

    Unsigned-arithmetic note: the numpy kernel computes positions as
    ``(h1u + i·h2u) mod 2^64`` (uint64 WRAPPING add/multiply) and
    only then ``mod m_bits`` — reduced-space modular math is NOT
    equivalent when m does not divide 2^64 (a power-of-two test
    filter hid exactly that; the default 2,000,000-bit filter
    exposed it). ANSI mode forbids overflowing long ``+``/``*``, and
    DECIMAL(38) reproduces the wrap but drags BigDecimal into the
    hot loop (measured 7× slower than the pandas probe) — so the
    wrap is done in 32-bit LIMBS with pure bit ops: split each
    uint64 into (hi, lo) halves via shiftrightunsigned/mask, multiply
    and add limbs (every intermediate < 2^36), carry with shifts,
    and reassemble with ``shiftleft | low32`` (bit shifts wrap
    silently; OR never carries because the low 32 bits of the
    shifted half are zero). Final unsigned ``mod m`` adds the
    plan-time constant ``2^64 mod m`` for negative-wrapped values.
    Bit extraction uses ``getbit`` (column-position bit test over
    the long's two's-complement bits — exactly the stored layout).
    """
    cand = with_hash_cols(candidates, url_col, num_buckets)
    blooms = seen_bloom.select(
        "bucket", _bloom_words(F.col("bloom")).alias("_words"),
        (F.octet_length("bloom") * 8).alias("_m_bits"))

    joined = cand.join(F.broadcast(blooms), "bucket", "left")
    m = F.col("_m_bits").cast("bigint")
    low32 = F.lit(0xFFFFFFFF).cast("bigint")
    two32 = F.lit(1 << 32).cast("bigint")
    # 2^64 mod m from 2^62 (representable): ((2^62 mod m) * 4) mod m
    wrap64 = F.pmod(F.pmod(F.lit(1 << 62).cast("bigint"), m) * 4, m)

    def split(x):
        return F.shiftrightunsigned(x, 32), x.bitwiseAND(low32)

    h1 = F.col("h1")
    h2p = F.expr("h2 | 1")
    h1_hi, h1_lo = split(h1)
    h2_hi, h2_lo = split(h2p)
    bits = []
    for i in range(k):
        # i·h2' mod 2^64 in limbs (i ≤ k-1 ≤ 6 keeps products < 2^36)
        ilo = F.lit(i) * h2_lo
        ihi = F.pmod(F.lit(i) * h2_hi
                     + F.shiftrightunsigned(ilo, 32), two32)
        # wrapped sum h1 + i·h2' mod 2^64, again limb-wise
        s_lo = h1_lo + ilo.bitwiseAND(low32)
        s_hi = F.pmod(h1_hi + ihi
                      + F.shiftrightunsigned(s_lo, 32), two32)
        wrapped = F.shiftleft(s_hi, 32) \
            .bitwiseOR(s_lo.bitwiseAND(low32))
        # unsigned mod m of the two's-complement-wrapped long
        pos = F.pmod(F.pmod(wrapped, m)
                     + F.when(wrapped < 0, wrap64)
                     .otherwise(F.lit(0)), m)
        word = F.element_at(F.col("_words"),
                            F.floor(pos / 64).cast("int") + 1)
        bits.append(F.getbit(word, F.pmod(pos, 64)) == 1)
    all_set = bits[0]
    for b in bits[1:]:
        all_set = all_set & b
    maybe = F.when(F.col("_words").isNull(), F.lit(False)) \
        .otherwise(all_set)
    return joined.withColumn("maybe_seen", maybe) \
        .drop("_words", "_m_bits")
