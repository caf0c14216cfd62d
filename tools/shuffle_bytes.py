"""Measure total shuffle write bytes + records for one registry query.

Runs the named query at --sf, then sums shuffle write bytes/records
across all stages via the local Spark UI REST API.  Bytes are
deterministic (unlike wall time), so this is valid evidence even when
the VM's memory backing is sick.

Usage:
    python tools/shuffle_bytes.py q_dup_spans [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from tinybrain_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})
    import __spark_entry__ as entry

    q = entry.queries()[args.query]
    t0 = time.time()
    df = q(spark, args.sf)
    # a checksum over every column forces full value materialization —
    # count() would let Catalyst eliminate unique-key outer joins and
    # whole aggregation subtrees
    from pyspark.sql import functions as F

    row = df.select(
        F.count(F.lit(1)).alias("n"),
        # modulo keeps the ANSI-mode sum far from long overflow
        F.sum(F.xxhash64(*df.columns) % F.lit(1_000_000_007)).alias("chk"),
    ).collect()[0]
    n = row["n"]
    wall = time.time() - t0

    ui = spark.sparkContext.uiWebUrl
    apps = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications")
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    wb = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteRecords", 0) for s in stages)
    print(
        json.dumps(
            {
                "query": args.query,
                "rows": n,
                "wall_sec": round(wall, 2),
                "shuffle_write_bytes": wb,
                "shuffle_write_mb": round(wb / 1e6, 1),
                "shuffle_write_records": wr,
                "stages": len(stages),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
