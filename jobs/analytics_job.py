"""spark-submit entry for batch analytics over the fixture tables.

Runs any set of registry queries (all queries the driver contract
exposes) against a directory of the engine's parquet tables
and lands each result as parquet — the production path for scheduled
dashboards/backfills, so "every query a user runs today" really does
run via spark-submit:

    spark-submit --py-files tinybrain_spark.zip jobs/analytics_job.py \
        --sf-dir /data/tables --output /data/marts \
        --query q_acf_lags --query q_funnel_steps --query q_sax_motifs

Emits ONE JSON line: per-query row counts and wall seconds.  Unknown
query names fail fast with the available-name list.  Results land under
<output>/<query_name>/ (dynamic per-query subdirs, overwrite mode —
idempotent re-runs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q_continuous_agg",
    "q_acf_lags",
    "q_funnel_steps",
    "q_cohort_retention",
    "q_top_tokens",
]


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument(
        "--query",
        action="append",
        default=[],
        help="registry query name (repeatable; default: a headline set)",
    )
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from tinybrain_spark import driver_contract as dc
    from tinybrain_spark.session import get_spark

    registry = dc.queries()
    names = args.query or DEFAULT_QUERIES
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(
            f"unknown queries {unknown}; available: {sorted(registry)}"
        )

    spark = get_spark("tinybrain-analytics", master=args.master)
    stats: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        df = registry[name](spark, args.sf_dir)
        out = os.path.join(args.output, name)
        df.write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        stats[name] = {"rows": n, "secs": round(time.time() - t0, 3)}
    print(json.dumps({"queries": stats, "sf_dir": args.sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
