"""The retention-tier rollup engine — tinybrain's mip pyramid recast as
materialized tiers over a tokenized-sequence table (SURVEY.md §3.4).

Each tier halves/quarters/eighths every row's token array with one of
the five pooling kernels.  AVG tiers extend a persisted int64 block-sum
accumulator (+ nonzero-count denominator when sparse) instead of
re-pooling rendered values — the engine analog of the reference's
multi-mip shared accumulator (accelerated.pyx:223-259), which keeps
integer truncation to once per cycle.  MODE/MAX/MIN/STRIDE tiers pool
the previous tier's rendered output (mode-of-modes, downsample.py:
215-217).

Plan shape per tier (see .explain in tests): parquet scan -> one
ArrowEvalPython projection -> range-partitioned exchange (write
clustering only) -> partitioned write.  Pooling itself never shuffles.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import kernels as K
from .catalog import Catalog
from .checkpoint import CheckpointStore
from .partitioning import cluster_for_write
from .udfs import avg_step_udf, pool_udf

TIER_KEY_COLS = ("doc_id", "source", "time_bucket")


@dataclass(frozen=True)
class RollupConfig:
    kernel: str = "avg"  # avg | mode | max | min | stride
    window: int = 4  # 2 | 4 | 8
    num_tiers: int = 3
    sparse: bool = False
    run_kind: str = "default"

    def name(self, tier: int) -> str:
        return f"{self.run_kind}/tier_{tier:02d}"

    def validate(self, min_n_tok: int) -> None:
        K.validate_pool_args(min_n_tok, self.window, self.num_tiers)


class RollupEngine:
    """Materializes a retention pyramid under ``catalog.base_path``.

    Tier table schema: (doc_id, source, time_bucket, tokens, n_tok
    [, accum, denom]) partitioned by source.
    """

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.catalog = Catalog(spark, base_path)
        self.checkpoints = CheckpointStore(self.catalog)

    # -- public API -------------------------------------------------------

    def run_pyramid(
        self,
        df: DataFrame,
        config: RollupConfig,
        resume: bool = True,
    ) -> dict:
        """Run all tiers, resuming any tier whose lineage is incomplete.

        Returns {tier -> {rows_out, points_out, wall_sec}}.
        """
        min_n = df.agg(F.min("n_tok")).collect()[0][0]
        if min_n is None:
            raise ValueError("empty input table")
        config.validate(int(min_n))

        stats: dict[int, dict] = {}
        for tier in range(1, config.num_tiers + 1):
            stats[tier] = self.run_tier(df, config, tier, resume=resume)
        return stats

    def run_pyramid_single_pass(
        self,
        df: DataFrame,
        config: RollupConfig,
    ) -> dict:
        """Materialize ALL tiers from ONE scan + ONE kernel pass.

        The multi-tier kernel already computes every level from the
        shared accumulator (the reference's num_mips semantics,
        accelerated.pyx:223-259), so when per-tier resume granularity is
        not needed this writes the whole pyramid with a single input
        scan — k fewer scans and k-1 fewer Arrow exchanges than the
        tiered path.  Output: one table `<run_kind>/pyramid` partitioned
        by (tier, source).  Results are identical to the tiered path
        (pinned by test)."""
        from .udfs import pool_all_tiers_udf

        min_n = df.agg(F.min("n_tok")).collect()[0][0]
        if min_n is None:
            raise ValueError("empty input table")
        config.validate(int(min_n))

        t0 = time.time()
        udf = pool_all_tiers_udf(
            config.kernel,
            window=config.window,
            num_tiers=config.num_tiers,
            sparse=config.sparse,
        )
        clustered = cluster_for_write(df.select(*TIER_KEY_COLS, "tokens"))
        out = clustered.select(
            *TIER_KEY_COLS,
            F.posexplode(udf("tokens")).alias("tier0", "tokens"),
        ).select(
            *TIER_KEY_COLS,
            (F.col("tier0") + 1).alias("tier"),
            "tokens",
            F.size("tokens").alias("n_tok"),
        )
        table = f"{config.run_kind}/pyramid"
        self.catalog.write(
            out, table, partition_by=("tier", "source"), mode="overwrite_partitions"
        )
        written = self.catalog.read(table)
        stats_rows = (
            written.groupBy("tier")
            .agg(
                F.count("*").alias("rows_out"),
                F.sum(F.size("tokens")).alias("points_out"),
            )
            .collect()
        )
        wall = time.time() - t0
        return {
            int(r["tier"]): {
                "rows_out": r["rows_out"],
                "points_out": r["points_out"],
                "wall_sec": wall,
            }
            for r in stats_rows
        }

    def read_pyramid_tier(self, config: RollupConfig, tier: int) -> DataFrame:
        return self.catalog.read(f"{config.run_kind}/pyramid").where(
            F.col("tier") == tier
        )

    def run_tier(
        self,
        df: DataFrame,
        config: RollupConfig,
        tier: int,
        resume: bool = True,
    ) -> dict:
        """Compute one tier.  ``df`` is the base (tier-0) table; tiers > 1
        read their input from the materialized previous tier."""
        t0 = time.time()
        table = config.name(tier)

        if tier == 1:
            src = df.select(*TIER_KEY_COLS, "tokens", "n_tok")
            prev_has_accum = False
        else:
            prev = self.catalog.read(config.name(tier - 1))
            prev_has_accum = "accum" in prev.columns
            src = prev

        run_kind = f"{config.run_kind}:{config.kernel}{config.window}"
        pending = src
        completed: set[str] = set()
        if resume:
            completed = {
                r["source"]
                for r in self.checkpoints.completed_sources(
                    run_kind, tier
                ).collect()
            }
            if completed:
                pending = src.where(~F.col("source").isin(completed))

        # Cluster BEFORE pooling: repartitionByRange samples its child to
        # pick range bounds — with the UDF upstream that would execute the
        # whole pooling stage twice.  Pooling is row-wise, so clustering
        # the raw input yields identically-clustered output with exactly
        # ONE kernel pass.
        clustered = cluster_for_write(pending)
        out = self._pool_tier(clustered, config, tier, prev_has_accum)
        self.catalog.write(
            out, table, partition_by=("source",), mode="overwrite_partitions"
        )

        # stats from the materialized tier (a cheap scan of the 4x-smaller
        # output; also validates the write)
        written = self.catalog.read(table)
        per_source_rows = (
            written.groupBy("source")
            .agg(
                F.count("*").alias("rows_out"),
                F.sum(F.size("tokens")).alias("points_out"),
                F.sum(
                    F.aggregate(
                        "tokens", F.lit(0).cast("long"), lambda a, x: a + x
                    )
                ).alias("checksum"),
            )
            .collect()
        )
        per_source = [
            {
                "source": r["source"],
                # pooling is per-row: rows_in == rows_out, no extra scan
                "rows_in": r["rows_out"],
                "rows_out": r["rows_out"],
                "points_out": r["points_out"],
                "checksum": r["checksum"] or 0,
            }
            for r in per_source_rows
            if r["source"] not in completed  # only newly-computed partitions
        ]
        wall = time.time() - t0
        self.checkpoints.record_tier(run_kind, tier, per_source, wall)

        total_rows = sum(r["rows_out"] for r in per_source_rows)
        total_points = sum(r["points_out"] for r in per_source_rows)
        return {
            "rows_out": total_rows,
            "points_out": total_points,
            "wall_sec": wall,
        }

    def read_tier(self, config: RollupConfig, tier: int) -> DataFrame:
        return self.catalog.read(config.name(tier))

    # -- internals --------------------------------------------------------

    def _pool_tier(
        self,
        src: DataFrame,
        config: RollupConfig,
        tier: int,
        prev_has_accum: bool,
    ) -> DataFrame:
        w = config.window
        if config.kernel == "avg":
            step = avg_step_udf(window=w, sparse=config.sparse, tier=tier)
            if tier == 1:
                stepped = src.withColumn(
                    "step", step(F.col("tokens"), F.col("tokens").cast("array<long>"))
                )
            else:
                if not prev_has_accum:
                    raise ValueError(
                        f"tier {tier - 1} table lacks the persisted accumulator"
                    )
                stepped = src.withColumn(
                    "step", step(F.col("accum"), F.col("denom"))
                )
            return stepped.select(
                *TIER_KEY_COLS,
                F.col("step.rendered").alias("tokens"),
                F.size("step.rendered").alias("n_tok"),
                F.col("step.accum").alias("accum"),
                F.col("step.denom").alias("denom"),
            )

        # mode/max/min/stride: recursive pooling of rendered values
        udf = pool_udf(
            config.kernel, window=w, num_tiers=1, sparse=config.sparse
        )
        return src.select(
            *TIER_KEY_COLS,
            udf(F.col("tokens")).alias("tokens"),
        ).withColumn("n_tok", F.size("tokens"))
