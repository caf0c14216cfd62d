"""spark-submit entry point for the pyramid serving/read path.

Reads a warehouse that jobs/rollup_job.py materialized and serves a
series at the requested resolution, routed to the coarsest usable
retention tier (tinybrain's serve-the-right-mip contract, recast):

    spark-submit --py-files tinybrain_spark.zip jobs/serve_job.py \
        --warehouse /path/to/warehouse --run-kind job \
        --kernel avg --window 4 --tiers 3 \
        --resolution 64 [--sources src1 src2] [--buckets LO HI] \
        [--input /path/to/raw]   # only needed when resolution < window \
        [--output /path/to/result]   # else prints count + sample

Prints one JSON line with the serving plan (tier scanned, residual
in-flight steps) and the output row/point counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--run-kind", default="job")
    p.add_argument("--kernel", default="avg",
                   choices=["avg", "mode", "max", "min", "stride"])
    p.add_argument("--window", type=int, default=4, choices=[2, 4, 8])
    p.add_argument("--tiers", type=int, default=3,
                   help="depth of the materialized pyramid")
    p.add_argument("--sparse", action="store_true")
    p.add_argument("--resolution", type=int, required=True,
                   help="tokens pooled per served point (power of window)")
    p.add_argument("--sources", nargs="*", default=None)
    p.add_argument("--buckets", nargs=2, type=int, default=None,
                   metavar=("LO", "HI"))
    p.add_argument("--input", default=None,
                   help="raw tier-0 table (needed only when resolution "
                        "< window)")
    p.add_argument("--output", default=None,
                   help="write the served series here as parquet")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from tinybrain_spark.rollup import RollupConfig, RollupEngine
    from tinybrain_spark.serving import plan_read, read_series
    from tinybrain_spark.session import get_spark

    cfg = RollupConfig(kernel=args.kernel, window=args.window,
                       num_tiers=args.tiers, sparse=args.sparse,
                       run_kind=args.run_kind)
    plan = plan_read(cfg, args.resolution)
    if plan.tier == 0 and args.input is None:
        p.error("resolution below the first tier needs --input (raw table)")

    spark = get_spark("tinybrain-serve", master=args.master)
    engine = RollupEngine(spark, args.warehouse)
    base = spark.read.parquet(args.input) if args.input else None

    t0 = time.time()
    served = read_series(engine, cfg, base, args.resolution,
                         sources=args.sources,
                         bucket_range=tuple(args.buckets)
                         if args.buckets else None)
    if args.output:
        served.write.mode("overwrite").parquet(args.output)
        stats = spark.read.parquet(args.output).agg(
            F.count(F.lit(1)).alias("rows"),
            F.coalesce(F.sum(F.size("tokens")), F.lit(0)).alias("points"),
        ).collect()[0]
    else:
        stats = served.agg(
            F.count(F.lit(1)).alias("rows"),
            F.coalesce(F.sum(F.size("tokens")), F.lit(0)).alias("points"),
        ).collect()[0]

    print(json.dumps({
        "metric": "served_points",
        "tier_scanned": plan.tier,
        "residual_steps": plan.residual_steps,
        "resolution": args.resolution,
        "rows": int(stats["rows"]),
        "points": int(stats["points"]),
        "wall_sec": round(time.time() - t0, 3),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
