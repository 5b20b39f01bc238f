"""spark-submit entry point: curate a training-data set from crawled
documents — the pipeline a user of this engine actually runs after
the crawl:

    spark-submit --py-files frontier.zip jobs/curate.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/curated \
        [--from-crawl /tmp/crawl_state] [--html-wrapped]

Stages (each an operator from frontier/spark/textops.py, all fused
into ONE Spark plan — flags are columns, not separate passes):

1. optional HTML tag-strip (``html_clean``) when the text column
   carries markup;
2. Gopher-style quality gate (``gopher_quality``);
3. exact-dedup representative selection (``exact_dedup``);
4. paragraph-level dedup pressure (``paragraph_dedup`` — documents
   whose duplicated-paragraph fraction exceeds ``--max-dup-para``
   are dropped, Lee et al. 2022);
5. benchmark decontamination (``decontam_overlap`` vs the eval
   slice — zero 8-gram overlap required);
6. unigram-LM quality floor (``unigram_logprob`` ≥ ``--min-lp``).

Writes the curated ``(doc_id, text, lang)`` parquet and prints one
JSON line with per-gate survivor counts (computed from ONE
aggregation over the flag columns — no per-gate actions).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--from-crawl", metavar="STORE",
                    help="curate the crawl store's extracted texts "
                         "instead of the documents table")
    ap.add_argument("--html-wrapped", action="store_true",
                    help="input text carries HTML markup: strip it "
                         "first (html_clean) and curate clean_text")
    ap.add_argument("--max-dup-para", type=float, default=0.5,
                    help="drop docs whose duplicated-paragraph "
                         "fraction exceeds this")
    ap.add_argument("--min-lp", type=int, default=-3_405_000,
                    help="unigram mean log-prob floor (micro-nats)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from frontier.spark import textops
    from frontier.spark.session import get_spark

    spark = get_spark(app="frontier-curate", cores=args.cpus)
    t0 = time.perf_counter()

    if args.from_crawl:
        from frontier.spark import crawl
        from frontier.spark.snapshots import SnapshotStore

        results = crawl.collect_results(
            spark, SnapshotStore(args.from_crawl))
        docs = (results
                .select(F.col("url_canon"), F.col("text"))
                .withColumn("doc_id",
                            F.xxhash64("url_canon"))
                .withColumn("lang", F.lit(None).cast("string")))
    else:
        docs = spark.read.parquet(
            os.path.join(args.sf_dir, "documents.parquet")) \
            .select("doc_id", "text", "lang")

    if args.html_wrapped:
        docs = textops.html_clean(
            docs.withColumnRenamed("text", "html")) \
            .withColumnRenamed("clean_text", "text").drop("html")

    # each gate is a (doc_id, flag) relation; ONE plan joins them
    gates = [
        ("q_gopher",
         textops.gopher_quality(docs)
         .select("doc_id", F.col("passes_gopher").alias("q_gopher"))),
        ("q_exact_rep",
         textops.exact_dedup(docs)
         .select("doc_id", F.lit(True).alias("q_exact_rep"))),
        ("q_para",
         textops.paragraph_dedup(docs)
         .groupBy("doc_id")
         .agg((F.sum(F.col("is_dup").cast("long"))
               / F.count("*") <= args.max_dup_para).alias("q_para"))),
        ("q_decontam",
         textops.decontam_overlap(
             docs, docs.where(F.col("doc_id") % 97 == 0))
         .select("doc_id", (F.col("n_overlap") == 0)
                 .alias("q_decontam"))),
        ("q_lm",
         textops.unigram_logprob(docs)
         .select("doc_id", (F.col("mean_lp_micro") >= args.min_lp)
                 .alias("q_lm"))),
    ]
    flagged = docs
    for name, g in gates:
        flagged = flagged.join(g, "doc_id", "left") \
            .withColumn(name, F.coalesce(F.col(name), F.lit(False)))

    flag_cols = [n for n, _ in gates]
    keep = flagged
    for n in flag_cols:
        keep = keep.where(F.col(n))
    selected = keep.select("doc_id", "text", "lang")
    selected.write.mode("overwrite").parquet(args.out)

    # per-gate survivors from ONE aggregation over flag columns
    agg = flagged.agg(
        F.count("*").alias("n_docs"),
        *[F.sum(F.col(n).cast("long")).alias(n) for n in flag_cols]
    ).collect()[0]
    import pyarrow.dataset as ds
    n_out = sum(f.count_rows()
                for f in [ds.dataset(args.out)])
    print(json.dumps({
        "n_docs": agg["n_docs"],
        **{n: agg[n] for n in flag_cols},
        "n_selected": n_out,
        "wall_sec": round(time.perf_counter() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
