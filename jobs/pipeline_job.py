"""End-to-end engine pipeline in one spark-submit: the full tinybrain
retention-engine story over a tokenized-sequence table.

  1. ingest (or generate) the sequence table
  2. materialize the avg retention pyramid (persisted accumulators,
     lineage + metrics checkpointing, resumable)
  3. fold the base table into the continuous aggregate
  4. gap-fill the hourly aggregate (zero policy)
  5. Gorilla-encode the filled series into chunked binary blobs, then
     decode-verify a sample
  6. enforce a retention policy over the pyramid

Usage:
  spark-submit --py-files tinybrain_spark.zip jobs/pipeline_job.py \
      --output /warehouse/run1 [--gen-docs 10000] [--tiers 3] ...

Prints one JSON line with per-stage stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="sequence parquet dir")
    ap.add_argument("--output", required=True)
    ap.add_argument("--gen-docs", type=int, default=10_000)
    ap.add_argument("--gen-ntok", type=int, default=256)
    ap.add_argument("--tiers", type=int, default=3)
    ap.add_argument("--kernel", default="avg")
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--keep-buckets", type=int, default=64,
                    help="retention: tier 1 keeps this many newest buckets")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tinybrain_spark.aggregates import update_continuous_aggregate
    from tinybrain_spark.compress import decode_blob, encode_series_table
    from tinybrain_spark.datagen import generate
    from tinybrain_spark.gapfill import gap_fill
    from tinybrain_spark.retention import RetentionPolicy, enforce_retention
    from tinybrain_spark.rollup import RollupConfig, RollupEngine
    from tinybrain_spark.session import get_spark

    spark = get_spark("pipeline-job", master=args.master)
    stats: dict = {}
    try:
        t0 = time.time()
        if args.input:
            seq = spark.read.parquet(args.input)
        else:
            seq_path = os.path.join(args.output, "seq")
            generate(
                spark, n_docs=args.gen_docs, n_tok=args.gen_ntok, seed=42
            ).write.mode("overwrite").parquet(seq_path)
            seq = spark.read.parquet(seq_path)
        if "time_bucket" not in seq.columns:
            from tinybrain_spark.datagen import with_time_bucket

            seq = with_time_bucket(seq)

        # 2. retention pyramid
        engine = RollupEngine(spark, args.output)
        cfg = RollupConfig(
            kernel=args.kernel, window=args.window, num_tiers=args.tiers,
            run_kind="pipeline",
        )
        pyr = engine.run_pyramid(seq, cfg)
        stats["pyramid"] = {
            str(k): {kk: vv for kk, vv in v.items()} for k, v in pyr.items()
        }

        # 3. continuous aggregate
        agg = update_continuous_aggregate(engine.catalog, "cagg", seq)
        stats["cagg_rows"] = agg.count()

        # 4. gap-fill the aggregate on its bucket spine
        filled = gap_fill(
            agg.select("source", "time_bucket", "token_sum"),
            ["source"], "time_bucket", ["token_sum"], policy="zero",
        )
        filled.write.mode("overwrite").parquet(
            os.path.join(args.output, "cagg_filled")
        )
        stats["filled_rows"] = spark.read.parquet(
            os.path.join(args.output, "cagg_filled")
        ).count()

        # 5. Gorilla blobs + decode-verify one
        blobs = encode_series_table(
            spark.read.parquet(os.path.join(args.output, "cagg_filled"))
        )
        blobs.write.mode("overwrite").parquet(
            os.path.join(args.output, "blobs")
        )
        stored = spark.read.parquet(os.path.join(args.output, "blobs"))
        sample = stored.orderBy("source", "chunk").first()
        b, v = decode_blob(sample["blob"])
        assert len(b) == sample["n_points"] == len(v)
        stats["blobs"] = stored.count()
        stats["blob_bytes"] = int(
            stored.agg(F.sum(F.octet_length("blob"))).first()[0]
        )
        stats["raw_bytes"] = int(stored.agg(F.sum("raw_bytes")).first()[0])

        # 6. retention on tier 1
        policy = RetentionPolicy({1: args.keep_buckets})
        stats["retention"] = enforce_retention(
            engine.catalog, cfg.name(1), 1, policy
        )

        stats["wall_sec"] = round(time.time() - t0, 2)
        print(json.dumps(stats))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
