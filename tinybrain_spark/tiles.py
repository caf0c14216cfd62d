"""Grouped 2-D tile pooling — the reference's actual 2x2 image geometry
(SURVEY.md §1.2: 'a (source, time_bucket) group of rows ≈ one image
tile').

Input is a cell table (tile_id, r, c, tok); each tile group is stacked
into a dense 2-D numpy array inside applyInPandas (the Arrow batch is
the process boundary, like the reference's Python->Cython hop) and
pooled with the true 2-D kernels from kernels.py.  Output is the
exploded pooled tile (tile_id, i, j, token).

Grouped-aggregation path notes for scale: one tile = one group = one
task-local dense block; tiles never split across partitions (the
groupBy shuffle key is tile_id), which is exactly the constraint that
keeps COUNTLESS's positional tie-break exact under any partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from . import kernels as K

TILE_OUT_SCHEMA = StructType(
    [
        StructField("tile_id", LongType(), False),
        StructField("i", IntegerType(), False),
        StructField("j", IntegerType(), False),
        StructField("token", IntegerType(), False),
    ]
)


def tile_pool(
    cells: DataFrame, kernel: str = "avg", num_tiers: int = 1
) -> DataFrame:
    """cells: (tile_id long, r int, c int, tok int) with dense even-sided
    tiles.  Returns (tile_id, i, j, token) pooled 2x2 ``num_tiers``
    times: AVG uses the shared multi-mip accumulator (render per tier,
    renorm at the shift-8 boundary), MODE is mode-of-modes — the
    reference's pyramid semantics in the true 2-D geometry."""
    if kernel not in ("avg", "mode"):
        raise ValueError(f"tile kernel must be avg or mode, got {kernel!r}")

    def _pool(pdf: pd.DataFrame) -> pd.DataFrame:
        r = pdf["r"].to_numpy(dtype=np.int64)
        c = pdf["c"].to_numpy(dtype=np.int64)
        tok = pdf["tok"].to_numpy(dtype=np.int64)
        nr, nc = int(r.max()) + 1, int(c.max()) + 1
        mat = np.zeros((nr, nc), dtype=np.int64)
        mat[r, c] = tok
        if kernel == "avg":
            out = K.avg_pool_2d_multi(mat, num_tiers, dtype=np.int64)[-1]
        else:
            out = K.mode_pool_2d_multi(mat, num_tiers)[-1]
        ii, jj = np.meshgrid(
            np.arange(out.shape[0]), np.arange(out.shape[1]), indexing="ij"
        )
        return pd.DataFrame(
            {
                "tile_id": np.full(out.size, pdf["tile_id"].iloc[0]),
                "i": ii.ravel().astype(np.int32),
                "j": jj.ravel().astype(np.int32),
                "token": out.ravel().astype(np.int32),
            }
        )

    return cells.groupBy("tile_id").applyInPandas(_pool, TILE_OUT_SCHEMA)
