"""Similarity search: brute-force correctness vs numpy, LSH recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from frontier.spark import ann

DIM = 16
N = 200


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(42)
    vecs = rng.randn(N, DIM).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]], int(i % 3))
            for i in range(N)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    return df, vecs


def _numpy_topk(vecs, qids, k):
    out = {}
    norms = np.linalg.norm(vecs.astype(np.float64), axis=1)
    for q in qids:
        sims = vecs.astype(np.float64) @ vecs[q].astype(np.float64) \
            / (norms * norms[q])
        order = sorted(range(len(vecs)),
                       key=lambda i: (-sims[i], i))
        out[q] = [i for i in order if i != q][:k]
    return out


def test_cosine_topk_matches_numpy(emb):
    df, vecs = emb
    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"))
    got = ann.cosine_topk(df, queries, k=5).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    want = _numpy_topk(vecs, range(4), 5)
    assert by_q == {q: want[q] for q in range(4)}


def test_lsh_topk_recall(emb):
    df, vecs = emb
    queries = df.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"))
    exact = ann.cosine_topk(df, queries, k=3).collect()
    approx = ann.lsh_topk(df, queries, dim=DIM, k=3,
                          n_bands=8, bits_per_band=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 8 bands x 4 bits on random gaussians: recall well above chance
    assert recall >= 0.5, recall
    # approx candidates are a subset of the space and scored exactly:
    # any overlapping pair must have identical rank ordering per query
    assert all(r.rank <= 3 for r in approx)


def test_lsh_candidates_cheaper_than_brute(emb):
    df, vecs = emb
    queries = df.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"))
    emb_sk = ann.sign_sketch(
        df.select(F.col("vec_id").alias("neighbor_id"),
                  ann._as_double(F.col("embedding")).alias("v")),
        "v", DIM, n_bands=8, bits_per_band=4) \
        .select("neighbor_id", F.explode("bands").alias("b"))
    qry_sk = ann.sign_sketch(
        queries.select("query_id",
                       ann._as_double(F.col("q_embedding")).alias("q")),
        "q", DIM, n_bands=8, bits_per_band=4) \
        .select("query_id", F.explode("bands").alias("b"))
    n_cand = (emb_sk.join(qry_sk, emb_sk.b == qry_sk.b)
              .select("query_id", "neighbor_id").distinct().count())
    assert n_cand < N * 8  # strictly smaller than brute-force n*q space


def test_ivf_topk_recall_and_determinism(emb):
    """IVF probe path: candidates shrink, recall vs exact stays
    useful, and two runs are identical (fixed centroids)."""
    df, vecs = emb
    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"))
    got = ann.ivf_topk(df, queries, k=3, n_cells=8, n_probe=4)
    rows = [(r.query_id, r.neighbor_id, r.rank) for r in got.collect()]
    rows2 = [(r.query_id, r.neighbor_id, r.rank)
             for r in ann.ivf_topk(df, queries, k=3, n_cells=8,
                                   n_probe=4).collect()]
    assert sorted(rows) == sorted(rows2)  # deterministic
    exact = _numpy_topk(vecs, range(4), 3)
    hits = sum(1 for q, n, _ in rows if n in exact[q])
    # probing half the cells: expect useful but not perfect recall
    assert hits >= 0.4 * (4 * 3), f"recall too low: {hits}/12"
    for q, n, r in rows:
        assert n != q and 1 <= r <= 3


def test_cosine_near_dup_no_false_positives(emb):
    """Every returned pair really is >= threshold under the
    operator's QUANTIZED verify (r5: floor(x·2^10) vectors —
    cosine_u must equal the quantized numpy cosine EXACTLY, every
    summation order being integer-equal), the raw-vector cosine
    agrees within the quantization error bound, and pairs are
    canonical a<b and deduped."""
    df, vecs = emb
    thr = 0.3
    got = ann.cosine_near_dup(df, threshold=thr, dim=DIM,
                              n_bands=8, bits_per_band=4)
    rows = [(r.vec_a, r.vec_b, r.cosine_u) for r in got.collect()]
    assert len(rows) == len(set((a, b) for a, b, _ in rows))
    v64 = vecs.astype(np.float64)
    q = np.floor(v64 * ann.IVF_QUANT)
    qnorms = np.linalg.norm(q, axis=1)
    norms = np.linalg.norm(v64, axis=1)
    for a, b, cu in rows:
        assert a < b
        qcos = float(q[a] @ q[b] / (qnorms[a] * qnorms[b]))
        assert qcos >= thr
        assert cu == int(np.floor(qcos * 1_000_000))  # EXACT
        raw = float(v64[a] @ v64[b] / (norms[a] * norms[b]))
        assert abs(raw - qcos) < 5e-3  # quantization error bound


def test_ivf_trained_codebook_beats_seeds_on_clustered(spark):
    """Lloyd-trained codebook vs untrained md5-seeded codebook on
    CLUSTERED embeddings with sparse/offset vec_ids (ids start at
    1000 — the round-2 ADVICE failure mode for the old
    ``vec_id < n_cells`` centroid pick). Training must not lose
    recall, and on this construction strictly gains it."""
    rng = np.random.RandomState(7)
    n_clusters, per = 8, 25
    centers = rng.randn(n_clusters, DIM) * 4
    vecs = np.concatenate(
        [centers[c] + 0.15 * rng.randn(per, DIM)
         for c in range(n_clusters)]).astype(np.float32)
    ids = [1000 + 3 * i for i in range(len(vecs))]  # sparse + offset
    df = spark.createDataFrame(
        [(ids[i], [float(x) for x in vecs[i]], 0)
         for i in range(len(vecs))],
        "vec_id long, embedding array<float>, label int")
    qids = ids[::37]
    queries = df.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"))

    norms = np.linalg.norm(vecs.astype(np.float64), axis=1)
    id_to_row = {v: i for i, v in enumerate(ids)}
    exact = {}
    for q in qids:
        qi = id_to_row[q]
        sims = vecs.astype(np.float64) @ vecs[qi].astype(np.float64) \
            / (norms * norms[qi])
        order = sorted(range(len(vecs)), key=lambda i: (-sims[i], ids[i]))
        exact[q] = {ids[i] for i in order if ids[i] != q}and None or \
            [ids[i] for i in order if ids[i] != q][:3]

    def recall(n_iter):
        got = ann.ivf_topk(df, queries, k=3, n_cells=n_clusters,
                           n_probe=1, n_iter=n_iter).collect()
        return sum(1 for r in got if r.neighbor_id in exact[r.query_id])

    r_seed, r_trained = recall(0), recall(2)
    total = 3 * len(qids)
    assert r_trained >= r_seed
    assert r_trained >= 0.9 * total, (r_seed, r_trained, total)


def test_ivf_codebook_deterministic_and_nonempty(emb):
    df, _ = emb
    a = {r.cell_id: list(r.c)
         for r in ann.ivf_codebook(df, n_cells=8, n_iter=2).collect()}
    b = {r.cell_id: list(r.c)
         for r in ann.ivf_codebook(df, n_cells=8, n_iter=2).collect()}
    assert a == b and len(a) == 8
    # every centroid element is an exact integer-valued double
    for c in a.values():
        assert all(x == int(x) for x in c)


def _quantized_sims(vecs):
    """The operator's pair-scorer restated: cosine over
    floor(x·2^10) vectors — integer-valued doubles, exact in any
    summation order (ann._pair_cos / the DuckDB list_transform
    oracle idiom)."""
    q = np.floor(vecs.astype(np.float64) * ann.IVF_QUANT)
    norms = np.linalg.norm(q, axis=1)
    return (q @ q.T) / np.outer(norms, norms)


def test_semantic_dedup_prune_rule_matches_numpy(emb):
    """The SemDeDup rule, checked against numpy given the operator's
    own cell assignment: vec i is dropped iff SOME j < i in the same
    cell has QUANTIZED cosine(i, j) >= threshold — and never
    otherwise (r6: the prune scores through the shared Arrow-numpy
    quantized pair scorer, so the reference is exact, not
    tolerance-based)."""
    df, vecs = emb
    thr = 0.3
    rows = ann.semantic_dedup(df, n_cells=8, n_iter=1,
                              threshold=thr).collect()
    assert len(rows) == N
    assert {r.vec_id for r in rows} == set(range(N))
    cell = {r.vec_id: r.cell_id for r in rows}
    keep = {r.vec_id: r.keep for r in rows}
    sims = _quantized_sims(vecs)
    for i in range(N):
        dup = any(cell[j] == cell[i] and sims[i, j] >= thr
                  for j in range(i))
        assert keep[i] == (not dup), i
    # the threshold must actually bite on this corpus
    assert 0 < sum(not k for k in keep.values()) < N


def test_ivf_lsh_rerank_cosine_is_quantized_numpy(emb):
    """r6 re-rank parity: every cosine the ivf/lsh approximate paths
    emit must EQUAL the quantized numpy pair cosine bit-for-bit (the
    re-ranks now score through ann._pair_cos instead of the
    interpreted raw-double SQL fold), and ranks must be consistent
    with (cosine DESC, neighbor_id ASC) within each query."""
    df, vecs = emb
    queries = df.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"))
    sims = _quantized_sims(vecs)
    for got in (ann.ivf_topk(df, queries, k=3, n_cells=8, n_probe=4),
                ann.lsh_topk(df, queries, dim=DIM, k=3,
                             n_bands=8, bits_per_band=4)):
        rows = sorted(got.collect(),
                      key=lambda r: (r.query_id, r.rank))
        assert rows, "approximate path returned nothing"
        by_q = {}
        for r in rows:
            assert r.cosine == sims[r.query_id, r.neighbor_id], r
            by_q.setdefault(r.query_id, []).append(r)
        for q, rs in by_q.items():
            assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
            keys = [(-r.cosine, r.neighbor_id) for r in rs]
            assert keys == sorted(keys), (q, rs)


def test_semantic_dedup_drops_planted_duplicates(emb):
    """Exact copies (higher vec_id) land in their original's cell
    (assignment is a deterministic function of the vector) and are
    pruned; the originals survive (min-id wins)."""
    df, _ = emb
    dups = df.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label")
    rows = {r.vec_id: r for r in
            ann.semantic_dedup(df.unionByName(dups), n_cells=8,
                               n_iter=1, threshold=0.99).collect()}
    for i in range(5):
        assert rows[1000 + i].cell_id == rows[i].cell_id, i
        assert not rows[1000 + i].keep, i
        assert rows[i].keep, i


def test_semantic_dedup_plan_no_cartesian(emb):
    """The within-cell prune must be an equi-join on cell_id — never
    an all-pairs product (the 10^9-vector scale contract). The only
    nested-loop joins allowed are the broadcast-codebook assignment
    crosses (BuildRight against the ≤ n_cells centroid relation, the
    same bounded pattern ivf_topk uses)."""
    df, _ = emb
    plan = ann.semantic_dedup(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "BuildRight, Cross" in line, line
    # r7: the vector-vs-vector prune is a grouped-map Arrow kernel
    # behind ONE hash exchange on the cell key — the Σ|cell|² pairs
    # never materialize as join rows (the r6 _lcell equi-join
    # shuffled |cell|² rows each carrying two vectors)
    assert "FlatMapGroupsInPandas" in plan, plan
    assert any("hashpartitioning(cell_id" in ln
               for ln in plan.splitlines()), plan
    assert "SortMergeJoin" not in plan, plan


def test_ivf_assign_tie_and_nan_rules(spark):
    """Winner-rule pins for the batch-numpy keep_top=1 assignment
    (r5): exact similarity ties (duplicate centroids) resolve to the
    LOWEST cell_id, and a zero-norm vector (all sims NaN) also lands
    in the lowest cell — the same (sim DESC, cell_id ASC)
    NaN-greatest ordering the window/max_by formulations used and
    the DuckDB oracle encodes."""
    df = spark.createDataFrame(
        [(0, [2.0, 0.0]),     # ties between duplicate centroids 1,2
         (1, [0.0, 3.0]),     # clear winner: cell 0
         (2, [0.0, 0.0])],    # zero norm: all sims NaN
        "vec_id int, xq array<double>")
    cents = [(2, [1.0, 0.0]),  # duplicate of cell 1 (higher id)
             (0, [0.0, 1.0]),
             (1, [1.0, 0.0])]
    got = {r.vec_id: r.cell_id
           for r in ann._ivf_assign(df, "xq", "vec_id",
                                    cents, 1).collect()}
    assert got == {0: 1,   # tie between cells 1 and 2 → lowest (1)
                   1: 0,
                   2: 0}   # NaN row → lowest cell_id


def test_sign_sketch_paths_agree(emb):
    """The numpy-matmul path (dim given) and the JVM-md5 per-element
    path (dim=None) must emit IDENTICAL band keys — the quantized
    integer-double dots make every summation order bit-equal, which
    is the invariant that licenses the fast path."""
    df, _ = emb
    base = df.select("vec_id",
                     ann._as_double(F.col("embedding")).alias("v"))

    def keys(sk):
        return {(r.vec_id, r.b.band, r.b.key)
                for r in sk.select("vec_id",
                                   F.explode("bands").alias("b"))
                .collect()}

    fast = keys(ann.sign_sketch(base, "v", DIM,
                                n_bands=8, bits_per_band=4))
    dyn = keys(ann.sign_sketch(base, "v", None,
                               n_bands=8, bits_per_band=4))
    assert fast == dyn
    assert len(fast) == df.count() * 8


def test_recall_at_k_evaluator(emb):
    """recall_at_k over the tagged union: the baseline scores 1.0
    against itself (trivially — excluded from output), each approx
    arm lands in [0,1], and a hand-built union with a known overlap
    yields the exact fraction."""
    df, _ = emb
    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"))
    exact = ann.cosine_topk(df, queries, k=3).select(
        F.lit("exact").alias("method"), "query_id", "neighbor_id")
    ivf = ann.ivf_topk(df, queries, k=3, n_cells=8, n_probe=4).select(
        F.lit("ivf").alias("method"), "query_id", "neighbor_id")
    got = ann.recall_at_k(exact.unionByName(ivf))
    assert set(got) == {"ivf"}
    assert 0.0 <= got["ivf"] <= 1.0
    # identical arm -> recall exactly 1.0
    clone = exact.select(F.lit("copy").alias("method"),
                         "query_id", "neighbor_id")
    assert ann.recall_at_k(exact.unionByName(clone)) == {"copy": 1.0}
    # known overlap: half the baseline pairs
    spark = df.sparkSession
    base = spark.createDataFrame(
        [("exact", 0, i) for i in range(4)]
        + [("half", 0, 0), ("half", 0, 1), ("half", 0, 90),
           ("half", 0, 91)],
        "method string, query_id long, neighbor_id long")
    assert ann.recall_at_k(base) == {"half": 0.5}


def test_semantic_dedup_high_cell_count_sanity(spark):
    """r6 (VERDICT item 6 companion): SemDeDup behavior at a cell
    count much larger than the oracle's 16 — planted exact
    duplicates are still caught (dedup recall 1.0: identical vectors
    always share a cell, any threshold passes), the drop rate stays
    sane (casualties exist, survivors dominate the unique portion),
    and the realized within-cell pair count stays FAR below
    all-pairs (the paper's Σ|cell|² lever)."""
    import numpy as np
    rng = np.random.RandomState(11)
    n_unique, n_dup = 3000, 150
    base = rng.randn(n_unique, DIM).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]], 0)
            for i in range(n_unique)]
    # exact copies of the first n_dup vectors, higher ids
    rows += [(10_000 + i, [float(x) for x in base[i]], 0)
             for i in range(n_dup)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {r.vec_id: r for r in
           ann.semantic_dedup(df, n_cells=64, n_iter=2,
                              threshold=0.99).collect()}
    assert len(out) == n_unique + n_dup
    # every planted duplicate is dropped, every original kept
    assert all(not out[10_000 + i].keep for i in range(n_dup))
    assert all(out[i].keep for i in range(n_dup))
    n_dropped = sum(1 for r in out.values() if not r.keep)
    # all plants die; random gaussians at cos>=0.99 almost never do
    assert n_dup <= n_dropped <= n_dup + 0.02 * n_unique
    # Σ|cell|·(|cell|-1)/2 bounded far below all-pairs
    from collections import Counter
    sizes = Counter(r.cell_id for r in out.values())
    pairs = sum(s * (s - 1) // 2 for s in sizes.values())
    allp = (n_unique + n_dup) * (n_unique + n_dup - 1) // 2
    assert pairs < allp / 10, (pairs, allp)


def test_pair_cos_raw_bitwise_equals_sql_fold(spark):
    """r7: cosine_topk's scorer moved from the interpreted SQL
    ``aggregate(zip_with(...))`` fold to the sequential-accumulate
    numpy kernel `_pair_cos_raw`. The swap is licensed ONLY by
    bit-identity: ``np.add.accumulate`` applies IEEE adds strictly
    left-to-right — the same rounding chain as the JVM fold — so
    every emitted double must EQUAL the fold's, including adversarial
    magnitude spreads where pairwise summation (np.sum) would differ
    in the last ulp."""
    rng = np.random.RandomState(7)
    dim = 64
    vecs = []
    for i in range(64):
        v = rng.randn(dim) * (10.0 ** rng.randint(-6, 7, size=dim))
        vecs.append([float(x) for x in v])
    rows = [(i, vecs[i], vecs[(i * 7 + 1) % len(vecs)])
            for i in range(len(vecs))]
    df = spark.createDataFrame(
        rows, "pid long, va array<double>, vb array<double>")

    def _dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)

    def _norm(a):
        return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                                  F.lit(0.0), lambda acc, x: acc + x))

    got = df.select(
        "pid",
        ann._pair_cos_raw(F.col("va"), F.col("vb")).alias("fast"),
        (_dot(F.col("va"), F.col("vb")) /
         (_norm(F.col("va")) * _norm(F.col("vb")))).alias("fold"),
    ).collect()
    assert len(got) == len(vecs)
    import struct
    for r in got:
        assert struct.pack("<d", r.fast) == struct.pack("<d", r.fold), r
