"""Similarity search over ``embeddings(vec_id, embedding array<float>,
label)``.

* :func:`cosine_topk` — brute-force exact top-k: broadcast the query
  set, JVM-side dot products (``zip_with`` + ``aggregate``), window
  rank. O(n·q) but embarrassingly parallel — the correct baseline and
  the verifier for approximate variants.
* :func:`lsh_topk` — random-hyperplane LSH bucketing: 16-bit sign
  sketches from md5-seeded pseudo-random hyperplanes (deterministic,
  no RNG state), candidates = bucket collisions in ≥1 of the bands,
  exact re-rank of candidates only. The 100 TB path: candidate count
  per query is ~n/2^bits × bands instead of n.

All vector math stays in Spark SQL higher-order functions — doubles,
JVM codegen — no Python in the distance loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3
                ) -> DataFrame:
    """Exact cosine top-k neighbors for every query vector.

    queries: (query_id, q_embedding). Broadcast-joined (query sets are
    small by construction); ties broken by neighbor id — fully
    deterministic output (query_id, neighbor_id, rank).
    """
    emb = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("v"))
    qry = queries.select(
        "query_id", _as_double(F.col("q_embedding")).alias("q"))
    scored = (emb.crossJoin(F.broadcast(qry))
              .where(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("cosine",
                          _dot(F.col("v"), F.col("q")) /
                          (_norm(F.col("v")) * _norm(F.col("q")))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine"))


def _hyperplane(dim: int, bit: int, band: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: md5-seeded ±1 dims.
    The DuckDB oracle restates the identical arithmetic (first md5
    byte's low bit), so sketches are engine-portable."""
    import hashlib
    vec = []
    for d in range(dim):
        h = hashlib.md5(f"hp:{band}:{bit}:{d}".encode()).digest()[0]
        vec.append(1.0 if h & 1 else -1.0)
    return vec


def _hyperplane_dyn(bit: int, band: int):
    """The same ±1 rule as a JVM expression over the dim index —
    used when dim is unknown at plan-build time (no driver action
    needed). Cost: one md5 per (band, bit, element) per ROW, so at
    large dim prefer the literal-array path with dim from config or
    file metadata."""
    def weight(d):
        s = F.concat(F.lit(f"hp:{band}:{bit}:"), d.cast("string"))
        parity = F.conv(F.substring(F.md5(s), 1, 2), 16, 10) \
            .cast("int").bitwiseAND(F.lit(1))
        return F.when(parity == 1, F.lit(1.0)).otherwise(F.lit(-1.0))
    return weight


def sign_sketch(df: DataFrame, vec_col: str, dim: int | None,
                n_bands: int = 4, bits_per_band: int = 8) -> DataFrame:
    """Attach LSH band keys: per band, a ``bits_per_band``-bit sign
    sketch of the vector against fixed hyperplanes.

    ``dim`` given → each hyperplane ships as ONE array literal
    (``F.lit(list)``), n_bands×bits plan nodes total instead of
    n_bands×bits×dim scalar literals (round-1 plan-bloat fix).
    ``dim=None`` → hyperplane weights are computed per element with
    JVM md5 (same values), no dim needed and no driver-side action —
    right for ad-hoc queries; pass dim explicitly in hot pipelines.
    """
    v = _as_double(F.col(vec_col))
    band_structs = []
    for band in range(n_bands):
        bits = None
        for bit in range(bits_per_band):
            if dim is not None:
                hp = F.lit(_hyperplane(dim, bit, band))
                dot = _dot(v, hp)
            else:
                w = _hyperplane_dyn(bit, band)
                idx = F.sequence(F.lit(0), F.size(v) - 1)
                dot = F.aggregate(
                    F.zip_with(v, idx, lambda x, d: x * w(d)),
                    F.lit(0.0), lambda acc, x: acc + x)
            sign = (dot >= 0).cast("int")
            term = sign * F.lit(1 << bit)
            bits = term if bits is None else bits + term
        band_structs.append(
            F.struct(F.lit(band).alias("band"), bits.alias("key")))
    return df.withColumn("bands", F.array(*band_structs))


def lsh_topk(embeddings: DataFrame, queries: DataFrame,
             dim: int | None = None,
             k: int = 3, n_bands: int = 4, bits_per_band: int = 8
             ) -> DataFrame:
    """Approximate cosine top-k: hyperplane-LSH candidate generation +
    exact re-rank of candidates.

    Recall grows with n_bands; cost per query shrinks by ~2^bits.
    Same output schema as :func:`cosine_topk` for recall evaluation.
    """
    emb = sign_sketch(
        embeddings.select(F.col("vec_id").alias("neighbor_id"),
                          _as_double(F.col("embedding")).alias("v")),
        "v", dim, n_bands, bits_per_band) \
        .select("neighbor_id", "v", F.explode("bands").alias("b")) \
        .select("neighbor_id", "v", "b.band", "b.key")
    qry = sign_sketch(
        queries.select("query_id",
                       _as_double(F.col("q_embedding")).alias("q")),
        "q", dim, n_bands, bits_per_band) \
        .select("query_id", "q", F.explode("bands").alias("b")) \
        .select("query_id", "q", "b.band", "b.key")

    cand = (emb.join(qry, ["band", "key"])
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "q", "neighbor_id", "v")
            .dropDuplicates(["query_id", "neighbor_id"]))
    scored = cand.withColumn(
        "cosine", _dot(F.col("v"), F.col("q")) /
        (_norm(F.col("v")) * _norm(F.col("q"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine"))
