"""Catalyst-native pooling (tinybrain_spark.sqlkernels) must be
bit-identical to the numpy kernels the Arrow path runs — differential
over random lengths (incl. odd edges), signs, zeros (sparse), tier
depths crossing the renorm boundary, and both kinds."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tinybrain_spark import kernels as K
from tinybrain_spark.sqlkernels import pool_tiers_sql


def _df(spark, arrays):
    return spark.createDataFrame(
        [([int(x) for x in a],) for a in arrays], "tokens array<int>"
    )


def _got(spark, arrays, kind, window, tiers, sparse):
    out = pool_tiers_sql(kind, window=window, num_tiers=tiers,
                         sparse=sparse)(_df(spark, arrays))
    return [r["tiers"] for r in out.collect()]


def _want(arrays, kind, window, tiers, sparse):
    res = []
    for a in arrays:
        pooled = K.pool(kind, np.array(a, dtype=np.int32), window=window,
                        num_tiers=tiers, sparse=sparse, dtype=np.int32)
        res.append([t.tolist() for t in pooled])
    return res


CASES = [
    ("avg", 4, 3, False),
    ("avg", 4, 5, False),  # crosses the shift-8 cycle renorm
    ("avg", 4, 2, True),   # sparse: nonzero-count denominator
    ("avg", 2, 4, False),  # w=2 engine extension (cycle 8)
    ("mode", 4, 2, False),  # COUNTLESS chain, mode-of-modes
    ("mode", 4, 2, True),   # stippled sparse
    ("avg", 8, 2, False),   # 2x2x2 family
    ("avg", 8, 2, True),    # sparse 2x2x2 (w=8 renorm sits at tier 9
    #                         = 8^9 tokens/row — unreachable here, like
    #                         everywhere else in the engine)
    ("mode", 8, 2, False),  # counting mode, scan-order tie-break
    ("mode", 8, 2, True),   # sparse counting mode
    ("mode", 2, 3, False),  # pair mode: first ties-or-wins
    ("mode", 2, 3, True),   # sparse pair mode
]


@pytest.mark.parametrize("kind,window,tiers,sparse", CASES)
def test_sql_pool_matches_numpy_kernels(spark, kind, window, tiers, sparse):
    rng = np.random.default_rng(hash((kind, window, tiers, sparse)) % 2**32)
    floor = window**tiers
    arrays = []
    for n in [floor, floor + 1, floor + window - 1, 4 * floor,
              4 * floor + 3, 256]:
        if n < floor:
            continue
        lo = 0 if kind == "mode" or sparse else -50
        vals = rng.integers(lo, 9, size=n)  # small domain -> real ties
        if sparse:
            vals[rng.random(n) < 0.4] = 0  # plenty of background zeros
        arrays.append(vals.tolist())
    assert _got(spark, arrays, kind, window, tiers, sparse) == _want(
        arrays, kind, window, tiers, sparse
    )


def test_sql_pool_avg_negative_renders_toward_zero(spark):
    """-1,-1,-1,-1 averages to -1 (toward zero), never -1.x floored."""
    arrays = [[-1, -1, -1, -1], [-3, 0, 0, 0], [-50, 49, 0, 0]]
    got = _got(spark, arrays, "avg", 4, 1, False)
    want = _want(arrays, "avg", 4, 1, False)
    assert got == want
    assert got[0] == [[-1]]
    assert got[1] == [[0]]  # -3 >> 2 toward zero = 0, floor would be -1


def test_sql_pool_rejects_below_one_window(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    f = pool_tiers_sql("avg", window=4, num_tiers=2)
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        f(_df(spark, [[1, 2, 3]])).collect()


def test_sql_pool_unsupported_combo_raises():
    with pytest.raises(ValueError):
        pool_tiers_sql("max", window=4)
    with pytest.raises(ValueError):
        pool_tiers_sql("avg", window=3)


def test_sql_pool_whole_stage_codegen_no_python(spark):
    """The plan must contain NO Python/Arrow eval node — the entire
    pyramid stays inside codegen projections."""
    f = pool_tiers_sql("avg", window=4, num_tiers=3)
    df = f(_df(spark, [list(range(256))]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEval" not in plan and "BatchEval" not in plan
    assert "PythonUDF" not in plan
