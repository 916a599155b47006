"""One-command training-data release: corpus in, curated + packed
training set out, audit manifest alongside.

Glues the certified pieces end to end::

    python tools/make_release.py \
        --sf-dir /root/testdata/sf0.01 \
        --out /tmp/release1 \
        --capacity 2048 --near-dedup --eval-frac 200

Steps (each optional via flags): exact dedup → minhash near-dedup →
exact-substring span removal → n-gram decontamination against the
eval slice → quality/length/repetition gates → bigram-LM perplexity
gate → per-source cap + rebalance → deterministic sample → split
assignment — then the survivors land in ``<out>/curated`` parquet
partitioned by split, the train split is packed into
fixed-``capacity`` sequences at ``<out>/packed`` (chunk-ordered,
size-bounded files), and ``<out>/manifest.json`` records every
stage's in/out counts plus output shapes — the release-review
document.

Everything is driver-reproducible: rerunning with the same inputs
and salts yields byte-identical selections (hash sampling, hash
splits, deterministic dedup representatives).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pipeline(args, spark, docs):
    from pyspark.sql import functions as F

    from serverless_data_lake_spark.operators.lm import train_bigram_lm
    from serverless_data_lake_spark.pipeline.curation import (
        CurationPipeline,
    )

    pipe = CurationPipeline("doc_id", "text").exact_dedup()
    if args.near_dedup:
        pipe = pipe.near_dedup(method="minhash", threshold=args.near_threshold)
    if args.span_dedup:
        pipe = pipe.remove_duplicate_spans(k=args.span_k)
    eval_df = None
    if getattr(args, "eval_path", None):
        # A REAL eval suite: any parquet/JSONL with a text column —
        # the production decontamination shape (the corpus-derived
        # --eval-frac slice below is the dependency-free demo).
        reader = spark.read
        if args.eval_path.endswith((".jsonl", ".json")):
            eval_raw = reader.json(args.eval_path)
        else:
            eval_raw = reader.parquet(args.eval_path)
        if args.eval_text_col not in eval_raw.columns:
            raise SystemExit(
                f"--eval-path has no column {args.eval_text_col!r} "
                f"(columns: {eval_raw.columns}); pass --eval-text-col"
            )
        eval_df = eval_raw.select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col(args.eval_text_col).alias("text"),
        )
        pipe = pipe.decontaminate(eval_df, n=args.decontaminate_n)
    elif args.eval_frac:
        eval_df = (
            docs.filter(F.col("doc_id") % args.eval_frac == 0)
            .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        )
        pipe = pipe.decontaminate(eval_df, n=args.decontaminate_n)
    pipe = (
        pipe.quality_filter(min_score=args.min_quality)
        .length_filter(min_tokens=args.min_tokens)
        .repetition_filter(
            max_dup_gram_frac=args.max_dup_frac,
            max_top_gram_frac=args.max_top_frac,
        )
    )
    lm = None
    if args.perplexity_cut:
        lm = train_bigram_lm(docs).persist()
        pipe = pipe.perplexity_filter(lm, max_perplexity=args.perplexity_cut)
    if args.cap_per_source:
        pipe = pipe.cap_per_source("source", max_rows=args.cap_per_source)
    if args.max_source_frac < 1.0:
        pipe = pipe.rebalance_sources(
            "source", max_frac=args.max_source_frac, salt=args.salt
        )
    if args.sample_rate < 1.0:
        pipe = pipe.sample(rate=args.sample_rate, salt=args.salt)
    pipe = pipe.assign_splits(
        {"train": args.train_frac,
         "val": (1 - args.train_frac) / 2,
         "test": (1 - args.train_frac) / 2},
        salt=args.salt,
    )
    return pipe, lm, eval_df


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", required=True)
    p.add_argument("--capacity", type=int, default=2048)
    p.add_argument("--chunks-per-file", type=int, default=10_000)
    p.add_argument("--near-dedup", action="store_true")
    p.add_argument("--near-threshold", type=float, default=0.8)
    p.add_argument("--span-dedup", action="store_true")
    p.add_argument("--span-k", type=int, default=13)
    p.add_argument("--eval-path", default=None,
                   help="path to an EXTERNAL eval corpus "
                        "(parquet or JSONL) to decontaminate "
                        "against; takes precedence over --eval-frac")
    p.add_argument("--eval-text-col", default="text",
                   help="text column name in --eval-path")
    p.add_argument("--eval-frac", type=int, default=0,
                   help="hold out every Nth doc as the eval set and "
                        "decontaminate against it (0 = off)")
    p.add_argument("--decontaminate-n", type=int, default=13)
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--min-tokens", type=int, default=10)
    p.add_argument("--max-dup-frac", type=float, default=0.9)
    p.add_argument("--max-top-frac", type=float, default=0.5)
    p.add_argument("--perplexity-cut", type=float, default=0.0,
                   help="train a bigram LM on the corpus and drop docs "
                        "above this perplexity (0 = off)")
    p.add_argument("--cap-per-source", type=int, default=0)
    p.add_argument("--max-source-frac", type=float, default=1.0)
    p.add_argument("--sample-rate", type=float, default=1.0)
    p.add_argument("--train-frac", type=float, default=0.9)
    p.add_argument("--salt", default="release")
    p.add_argument("--master", default="local[*]")
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from serverless_data_lake_spark.operators.packing import export_packed
    from serverless_data_lake_spark.session import get_spark

    spark = get_spark(master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    pipe, lm, eval_df = build_pipeline(args, spark, docs)

    curated_path = os.path.join(args.out, "curated")
    out, report = pipe.execute(
        docs,
        sink=lambda df: df.write.mode("overwrite")
        .partitionBy("split")
        .parquet(curated_path),
    )
    curated = spark.read.parquet(curated_path)
    train = curated.filter(F.col("split") == "train")
    packed_path = os.path.join(args.out, "packed")
    export_packed(
        train, "doc_id", args.capacity, packed_path,
        chunks_per_file=args.chunks_per_file,
    )
    n_sequences = spark.read.parquet(packed_path).count()
    n_train = train.count()

    contamination = None
    if eval_df is not None:
        from serverless_data_lake_spark.operators.dedup import (
            contamination_report,
        )

        rep = contamination_report(
            docs, eval_df, "doc_id", "text", n=args.decontaminate_n
        )
        rep_path = os.path.join(args.out, "contamination")
        rep.write.mode("overwrite").parquet(rep_path)
        rep_back = spark.read.parquet(rep_path)
        agg = rep_back.agg(
            F.count("*").alias("eval_docs"),
            F.sum((F.col("n_contaminated") > 0).cast("int")).alias("leaked"),
            F.sum("n_contaminated").alias("pairs"),
        ).first()
        contamination = {
            "report": rep_path,
            "eval_docs": int(agg["eval_docs"]),
            "eval_docs_leaked": int(agg["leaked"]),
            "contaminated_pairs": int(agg["pairs"]),
        }

    manifest = {
        "sf_dir": args.sf_dir,
        "salt": args.salt,
        "stages": [
            {"stage": r.stage, "rows_in": r.rows_in,
             "rows_out": r.rows_out, "dropped": r.rows_dropped}
            for r in report
        ],
        "contamination": contamination,
        "outputs": {
            "curated": curated_path,
            "curated_rows": report[-1].rows_out,
            "train_rows": n_train,
            "packed": packed_path,
            "capacity": args.capacity,
            "sequences": n_sequences,
        },
        "seconds": round(time.time() - t0, 1),
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(json.dumps(manifest))
    if lm is not None:
        lm.unigrams.unpersist()
        lm.bigrams.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
