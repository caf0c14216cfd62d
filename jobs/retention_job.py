"""spark-submit entry for retention enforcement over a pyramid.

    spark-submit --py-files tinybrain_spark.zip jobs/retention_job.py \
        --warehouse /path/to/wh --run-kind job --tiers 3 \
        --keep 1:64 --keep 2:256      # tier:max_age_buckets
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--run-kind", default="job")
    p.add_argument("--tiers", type=int, required=True)
    p.add_argument(
        "--keep",
        action="append",
        default=[],
        metavar="TIER:BUCKETS",
        help="retain this many newest buckets for a tier (repeatable)",
    )
    p.add_argument("--newest-bucket", type=int, default=None)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    max_age = {}
    for spec in args.keep:
        tier, buckets = spec.split(":")
        max_age[int(tier)] = int(buckets)

    from tinybrain_spark.catalog import Catalog
    from tinybrain_spark.retention import RetentionPolicy, enforce_pyramid_retention
    from tinybrain_spark.session import get_spark

    spark = get_spark("tinybrain-retention", master=args.master)
    try:
        catalog = Catalog(spark, args.warehouse)
        results = enforce_pyramid_retention(
            catalog,
            args.run_kind,
            args.tiers,
            RetentionPolicy(max_age),
            newest_bucket=args.newest_bucket,
        )
        print(json.dumps({"per_tier": {str(k): v for k, v in results.items()}}))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
