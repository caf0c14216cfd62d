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
from .udfs import avg_step_map_in_arrow, pool_tier_map_in_arrow

TIER_KEY_COLS = ("doc_id", "source", "time_bucket")

_GUARD_MSG = "Can't downsample below one window"


def _reraise_kernel_guard(exc: Exception) -> None:
    """The minimum-size guard runs inside the kernel (per batch, no
    driver pre-scan job); translate the wrapped executor error back to
    the ValueError the reference raises (accelerated.pyx:89-90)."""
    msg = str(exc)
    if _GUARD_MSG in msg:
        detail = next(
            (ln for ln in msg.splitlines() if _GUARD_MSG in ln), _GUARD_MSG
        )
        raise ValueError(detail.strip()) from exc


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

    def validate_static(self) -> None:
        """Window/tier sanity without scanning the data.  The per-row
        minimum-length guard (accelerated.pyx:89-90) is enforced inside
        the kernel on every batch, so a dedicated driver-side
        min(n_tok) pre-scan job is unnecessary; the observed min is
        still recorded in the tier metrics."""
        K.validate_pool_args(
            self.window**self.num_tiers, self.window, self.num_tiers
        )


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
        config.validate_static()

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
        from pyspark.sql import Observation

        from .udfs import pool_all_tiers_udf

        config.validate_static()

        t0 = time.time()
        udf = pool_all_tiers_udf(
            config.kernel,
            window=config.window,
            num_tiers=config.num_tiers,
            sparse=config.sparse,
        )
        clustered = cluster_for_write(df.select(*TIER_KEY_COLS, "tokens"))
        tiers = clustered.select(
            *TIER_KEY_COLS, udf("tokens").alias("tiers")
        )
        # per-tier stats ride the write job as observe metrics (the tier
        # count is known, so 'group by tier' unrolls into one aggregate
        # expression per tier) — no post-write stats re-scan
        obs = Observation(f"pyramid_{config.run_kind}")
        metrics = [F.count(F.lit(1)).alias("rows")]
        for k in range(1, config.num_tiers + 1):
            metrics.append(
                F.coalesce(
                    F.sum(F.size(F.element_at("tiers", k))), F.lit(0)
                ).alias(f"points_t{k}")
            )
        tiers = tiers.observe(obs, *metrics)
        out = tiers.select(
            *TIER_KEY_COLS,
            F.posexplode("tiers").alias("tier0", "tokens"),
        ).select(
            *TIER_KEY_COLS,
            (F.col("tier0") + 1).alias("tier"),
            "tokens",
            F.size("tokens").alias("n_tok"),
        )
        table = f"{config.run_kind}/pyramid"
        try:
            self.catalog.write(
                out, table, partition_by=("tier", "source"),
                mode="overwrite_partitions",
            )
        except Exception as exc:
            _reraise_kernel_guard(exc)
            raise
        got = obs.get
        if got["rows"] == 0:
            raise ValueError("empty input table")
        wall = time.time() - t0
        return {
            k: {
                "rows_out": got["rows"],
                "points_out": got[f"points_t{k}"],
                "wall_sec": wall,
            }
            for k in range(1, config.num_tiers + 1)
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
            # the set is collected once for lineage-row exclusion (source
            # cardinality is low by design); the DATA filter is a
            # broadcast LEFT ANTI join, not an isin literal — correct
            # even if a future deployment keys partitions more finely
            completed = {
                r["source"]
                for r in self.checkpoints.completed_sources(
                    run_kind, tier
                ).collect()
            }
            if completed:
                pending = self.checkpoints.filter_pending(
                    src, run_kind, tier
                )

        # Cluster BEFORE pooling: repartitionByRange samples its child to
        # pick range bounds — with the UDF upstream that would execute the
        # whole pooling stage twice.  Pooling is row-wise, so clustering
        # the raw input yields identically-clustered output with exactly
        # ONE kernel pass.
        clustered = cluster_for_write(pending)
        out = self._pool_tier(clustered, config, tier, prev_has_accum)

        # tier metrics ride the write job via observe — no post-write
        # stats re-scan (VERDICT r01 item 10)
        from pyspark.sql import Observation

        obs = Observation(f"{run_kind}_t{tier}")
        observed = out.observe(
            obs,
            F.count(F.lit(1)).alias("rows_out"),
            F.coalesce(F.sum(F.size("tokens")), F.lit(0)).alias("points_out"),
            F.coalesce(
                F.sum(
                    F.aggregate(
                        "tokens", F.lit(0).cast("long"), lambda a, x: a + x
                    )
                ),
                F.lit(0),
            ).alias("checksum"),
            F.min(F.size("tokens")).alias("min_n_tok"),
        )
        try:
            self.catalog.write(
                observed, table, partition_by=("source",),
                mode="overwrite_partitions",
            )
        except Exception as exc:  # surface the in-kernel guard cleanly
            _reraise_kernel_guard(exc)
            raise
        got = obs.get

        # per-source lineage rows (resume granularity) from parquet
        # footers — an exact metadata-only read, no Spark job.  On a real
        # deployment Iceberg manifests carry these per-partition counts
        # natively; per-source VALUE sums would need a second scan, so
        # sums live at tier granularity in the metrics table.
        per_source_rows = self._partition_row_counts(table)
        per_source = [
            # pooling is per-row: rows_in == rows_out
            {"source": s, "rows_in": n, "rows_out": n}
            for s, n in sorted(per_source_rows.items())
            if s not in completed  # only newly-computed partitions
        ]
        wall = time.time() - t0
        self.checkpoints.record_tier(
            run_kind,
            tier,
            per_source,
            totals={
                "rows_out": int(got["rows_out"]),
                "points_out": int(got["points_out"]),
                "checksum": int(got["checksum"]),
                "min_n_tok": int(got["min_n_tok"] or 0),
            },
            wall_sec=wall,
        )

        return {
            "rows_out": int(got["rows_out"]),
            "points_out": int(got["points_out"]),
            "wall_sec": wall,
        }

    def _partition_row_counts(self, table: str, key: str = "source") -> dict:
        """Exact per-partition row counts from parquet footers (metadata
        only — kilobytes even for a 10^9-row tier).  On a remote-FS
        catalog the footers aren't os.path-reachable: fall back to one
        Spark per-partition count (partition-pruned scan) rather than a
        local glob that silently returns {} and re-runs every source on
        resume."""
        import glob
        import os
        from urllib.parse import unquote

        import pyarrow.parquet as pq

        if not self.catalog.is_local:
            return {
                r[key]: r["n"]
                for r in self.catalog.read(table)
                .groupBy(key)
                .agg(F.count("*").alias("n"))
                .collect()
            }

        counts: dict[str, int] = {}
        base = self.catalog.path(table)
        for d in glob.glob(os.path.join(base, f"{key}=*")):
            src = unquote(os.path.basename(d).split("=", 1)[1])
            counts[src] = sum(
                pq.ParquetFile(f).metadata.num_rows
                for f in glob.glob(os.path.join(d, "*.parquet"))
            )
        return counts

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
        guard = config.num_tiers if tier == 1 else None
        # mapInArrow tier mappers: zero-copy dense view per uniform
        # batch, key passthrough, no pandas object Series (semantics
        # shared with the pandas UDFs via _avg_step_matrices / K.pool,
        # pinned by test_rollup_e2e equality tests)
        if config.kernel == "avg":
            if tier > 1 and not prev_has_accum:
                raise ValueError(
                    f"tier {tier - 1} table lacks the persisted accumulator"
                )
            step = avg_step_map_in_arrow(
                window=w, sparse=config.sparse, tier=tier,
                guard_tiers=guard, key_cols=TIER_KEY_COLS,
            )
            return step(src)

        # mode/max/min/stride: recursive pooling of rendered values
        pool = pool_tier_map_in_arrow(
            config.kernel, window=w, sparse=config.sparse,
            guard_tiers=guard, key_cols=TIER_KEY_COLS,
        )
        return pool(src)
