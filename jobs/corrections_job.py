"""spark-submit entry for the CDC correction pipeline: drain a
directory stream of keyed upsert/delete ops into the raw sequence table
and keep the stored continuous aggregate consistent via targeted
invalidation refreshes (only dirtied bucket ranges recompute, only
touched source partitions rewrite).

    spark-submit --py-files tinybrain_spark.zip jobs/corrections_job.py \
        --ops-input /path/to/ops --warehouse /path/to/wh \
        --raw-table raw_seq --cagg-table cagg \
        [--max-files-per-trigger 4] [--checkpoint /path/to/ckpt]

Exactly-once: both steps of a micro-batch are idempotent, so a crash
between the table writes and the checkpoint commit replays safely; the
stream resumes from --checkpoint (defaults under the warehouse).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ops-input", required=True)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--raw-table", default="raw_seq")
    p.add_argument("--cagg-table", default="cagg")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--max-files-per-trigger", type=int, default=4)
    p.add_argument("--timeout-sec", type=int, default=3600)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from tinybrain_spark.catalog import Catalog
    from tinybrain_spark.session import get_spark
    from tinybrain_spark.streaming import run_correction_stream

    spark = get_spark("tinybrain-corrections", master=args.master)
    try:
        q = run_correction_stream(
            spark,
            args.ops_input,
            args.warehouse,
            raw_table=args.raw_table,
            cagg_table=args.cagg_table,
            checkpoint=args.checkpoint,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        drained = q.awaitTermination(args.timeout_sec)
        if not drained:
            q.stop()
            print(json.dumps({"error": "timeout before drain"}))
            return 2
        catalog = Catalog(spark, args.warehouse)
        stats = {"raw_rows": 0, "cagg_rows": 0, "cagg_sources": 0}
        if catalog.exists(args.raw_table):
            stats["raw_rows"] = catalog.read(args.raw_table).count()
        if catalog.exists(args.cagg_table):
            cagg = catalog.read(args.cagg_table)
            stats["cagg_rows"] = cagg.count()
            stats["cagg_sources"] = cagg.select("source").distinct().count()
        print(json.dumps(stats))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
