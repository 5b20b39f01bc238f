"""Generate an sf1.0-LIKE profiling dataset (default /tmp/sfbig).

The driver's round-end MEASUREMENT runs at a driver-generated scale
factor (BENCH_r06.json: sf=1.0) that is not present under
/root/testdata (read-only, sf<=0.1). This script synthesizes tables
with the same schemas and the observed per-sf row-count scaling
(documents 500/sf0.01 -> 50k/sf1.0, embeddings 2k/sf0.1 -> 20k/sf1.0,
lineitem 600k/sf0.1 -> 6M/sf1.0, ...) so optimization work can be
profiled at the scale the driver grades.

It is a PROFILING approximation, not the driver's generator: text
comes from the observed 31-word vocabulary with the observed length
distribution and a linear plant rate of exact/near duplicates;
embeddings are unit-norm vectors around 10 label centroids; the
TPC-H-ish tables and events replicate sf0.1 10x with consistent key
offsets. Never used by bench.py or any query path.

Usage: python tools/gen_profile_data.py [out_dir] [scale_vs_sf0.1]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = ("small vector key join customer stream filter table window "
         "scan column data batch part spark line order sort fast "
         "value a hash slow group agg query big row merge table "
         "index").split()


def gen_documents(out, n_docs, rng):
    # ~0.5% of docs are exact duplicates of an earlier doc; ~0.5% are
    # near-duplicates (one token changed) — keeps LSH/exact-dedup
    # selectivity linear in corpus size like the graded fixtures.
    lens = rng.integers(10, 101, size=n_docs)
    texts = []
    langs = rng.choice(["en", "zh", "es", "fr", "de"], size=n_docs,
                       p=[0.42, 0.15, 0.15, 0.14, 0.14])
    for i in range(n_docs):
        r = rng.random()
        if i > 100 and r < 0.005:
            texts.append(texts[rng.integers(0, i)])
        elif i > 100 and r < 0.010:
            base = texts[rng.integers(0, i)].split()
            base[rng.integers(0, len(base))] = VOCAB[
                rng.integers(0, len(VOCAB))]
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(
                VOCAB[j] for j in rng.integers(0, len(VOCAB),
                                               size=lens[i])))
    tbl = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([str(x) for x in langs]),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")


def gen_embeddings(out, n_vec, rng):
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, size=n_vec)
    vecs = centers[labels] + 0.35 * rng.normal(size=(n_vec, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array([v.astype(np.float32).tolist()
                               for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int64()),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")


KEY_OFFSETS = {
    "events": {"event_id": 1_000_000, "user_id": 100_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 100_000},
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 1_000_000},
}


def replicate(out, name, copies):
    tbl = pq.read_table(f"{SRC}/{name}.parquet")
    offs = KEY_OFFSETS.get(name, {})
    parts = []
    for c in range(copies):
        cols = {}
        for field in tbl.schema.names:
            col = tbl.column(field)
            if field in offs and c > 0:
                col = pa.compute.add(col, offs[field] * c)
            cols[field] = col
        parts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(parts), f"{out}/{name}.parquet")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    gen_documents(out, int(5000 * scale), rng)
    gen_embeddings(out, int(2000 * scale), rng)
    for name in ("events", "orders", "lineitem", "customer",
                 "supplier", "part"):
        replicate(out, name, int(scale))
    for name in ("nation", "region"):
        replicate(out, name, 1)
    open(f"{out}/_DONE", "w").close()
    print(f"wrote {out} at {scale}x sf0.1")


if __name__ == "__main__":
    main()
