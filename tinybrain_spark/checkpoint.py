"""Per-partition lineage + metrics checkpointing (north_rule: 'checkpoints
per-partition lineage and rollup metrics ... so any tier can resume
mid-pyramid').

Lineage granularity is (run kind, tier, source): one row per completed
source partition per tier, carrying row counts and a content checksum.
Resume = LEFT ANTI join of the tier's input sources against completed
lineage — only missing partitions are recomputed, and their output is
appended (tier tables are partitioned by source, so a crashed partial
write is overwritten partition-wise).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .catalog import Catalog

LINEAGE_TABLE = "lineage"
METRICS_TABLE = "metrics"

# Per-source rows come from parquet footers (metadata-only; Iceberg
# manifests carry them natively); per-source VALUE sums would need a
# second scan per tier, so points/checksum live at tier granularity in
# METRICS, computed by df.observe on the write job itself.
LINEAGE_SCHEMA = StructType(
    [
        StructField("run_kind", StringType(), False),
        StructField("tier", IntegerType(), False),
        StructField("source", StringType(), False),
        StructField("rows_in", LongType(), False),
        StructField("rows_out", LongType(), False),
        StructField("status", StringType(), False),
        StructField("completed_at", TimestampType(), False),
    ]
)

METRICS_SCHEMA = StructType(
    [
        StructField("run_kind", StringType(), False),
        StructField("tier", IntegerType(), False),
        StructField("rows_out", LongType(), False),
        StructField("points_out", LongType(), False),
        StructField("checksum", LongType(), False),
        StructField("min_n_tok", LongType(), False),
        StructField("wall_sec", DoubleType(), False),
        StructField("points_per_sec", DoubleType(), False),
        StructField("completed_at", TimestampType(), False),
    ]
)


class CheckpointStore:
    def __init__(self, catalog: Catalog):
        self.catalog = catalog

    # -- lineage ---------------------------------------------------------

    def completed_sources(self, run_kind: str, tier: int) -> DataFrame:
        spark = self.catalog.spark
        if not self.catalog.exists(LINEAGE_TABLE):
            return spark.createDataFrame([], "source string")
        return (
            self.catalog.read(LINEAGE_TABLE)
            .where(
                (F.col("run_kind") == run_kind)
                & (F.col("tier") == tier)
                & (F.col("status") == "complete")
            )
            .select("source")
            .distinct()
        )

    def filter_pending(
        self, df: DataFrame, run_kind: str, tier: int
    ) -> DataFrame:
        """LEFT ANTI join input against completed lineage partitions."""
        done = self.completed_sources(run_kind, tier)
        return df.join(F.broadcast(done), on="source", how="left_anti")

    def record_tier(
        self,
        run_kind: str,
        tier: int,
        per_source: list[dict],
        totals: dict,
        wall_sec: float,
    ) -> None:
        """per_source: rows of {source, rows_in, rows_out} (parquet-
        footer counts); totals: {rows_out, points_out, checksum,
        min_n_tok} observed on the write job."""
        spark = self.catalog.spark
        now = time.time()
        import datetime as dt

        ts = dt.datetime.fromtimestamp(now, dt.timezone.utc).replace(tzinfo=None)
        lineage_rows = [
            (
                run_kind,
                tier,
                r["source"],
                int(r["rows_in"]),
                int(r["rows_out"]),
                "complete",
                ts,
            )
            for r in per_source
        ]
        if lineage_rows:
            self.catalog.write(
                spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA),
                LINEAGE_TABLE,
                mode="append",
            )
        points = int(totals["points_out"])
        metrics = [
            (
                run_kind,
                tier,
                int(totals["rows_out"]),
                points,
                int(totals["checksum"]),
                int(totals["min_n_tok"]),
                float(wall_sec),
                points / wall_sec if wall_sec > 0 else 0.0,
                ts,
            )
        ]
        self.catalog.write(
            spark.createDataFrame(metrics, METRICS_SCHEMA),
            METRICS_TABLE,
            mode="append",
        )
