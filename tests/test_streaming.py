"""Structured Streaming: file-stream continuous aggregate equals the
batch recompute; windowed aggregate plan produces per-bucket state."""

import os

import pytest
from pyspark.sql import functions as F

from tinybrain_spark.aggregates import aggregate_batch
from tinybrain_spark.catalog import Catalog
from tinybrain_spark.datagen import generate
from tinybrain_spark.streaming import (
    run_incremental_stream,
    windowed_aggregate,
    with_event_time,
)


@pytest.fixture(scope="module")
def seq_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "seq")
    # several files so availableNow produces multiple micro-batches
    generate(spark, n_docs=120, n_tok=32, seed=3, num_partitions=6).write.parquet(
        path
    )
    return path


def _drain(q, timeout=300):
    """awaitTermination with the timeout actually CHECKED — a stream
    that fails to drain must fail loudly here, not as a confusing
    partial-output set mismatch downstream (and must not keep running
    against the session-scoped Spark fixture)."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise AssertionError(
            f"stream did not drain within {timeout}s — refusing to "
            "read a partial end state"
        )


def _state(df):
    return {
        (r["source"], r["time_bucket"]): (
            r["n_docs"], r["n_points"], r["token_sum"], r["token_min"], r["token_max"]
        )
        for r in df.collect()
    }


def test_incremental_stream_equals_batch(spark, seq_dir, workdir):
    q = run_incremental_stream(
        spark, seq_dir, workdir, table="cs", max_files_per_trigger=2
    )
    _drain(q)
    result = Catalog(spark, workdir).read("cs")
    batch = aggregate_batch(spark.read.parquet(seq_dir))
    assert _state(result) == _state(batch)


def test_stream_resume_is_exactly_once(spark, seq_dir, workdir):
    """Re-running the drained stream with the same checkpoint must not
    double-count anything."""
    q = run_incremental_stream(spark, seq_dir, workdir, table="cs2")
    _drain(q)
    first = _state(Catalog(spark, workdir).read("cs2"))
    q2 = run_incremental_stream(spark, seq_dir, workdir, table="cs2")
    _drain(q2)
    second = _state(Catalog(spark, workdir).read("cs2"))
    assert first == second


def test_windowed_aggregate_batch_semantics(spark, seq_dir):
    """The streaming plan's aggregation logic, applied in batch mode,
    matches aggregate_batch keyed by the hour bucket."""
    df = with_event_time(spark.read.parquet(seq_dir))
    got = _state(windowed_aggregate(df))
    want = _state(aggregate_batch(spark.read.parquet(seq_dir)))
    assert got == want


def test_windowed_aggregate_streams(spark, seq_dir, tmp_path):
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(seq_dir).schema)
        .load(seq_dir)
    )
    agg = windowed_aggregate(with_event_time(stream))
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = _state(spark.sql("SELECT * FROM win_agg"))
    want = _state(aggregate_batch(spark.read.parquet(seq_dir)))
    assert got == want


def test_stateful_running_rollup(spark, seq_dir, tmp_path):
    from tinybrain_spark.streaming import read_sequence_stream, stateful_running_rollup

    stream = read_sequence_stream(spark, seq_dir, max_files_per_trigger=2)
    agg = stateful_running_rollup(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("state_rollup")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    # last emitted row per source == full batch totals
    rows = spark.sql(
        """SELECT source, n_docs, n_points, token_sum FROM (
             SELECT *, row_number() OVER (PARTITION BY source
                                          ORDER BY n_docs DESC) rn
             FROM state_rollup) WHERE rn = 1"""
    ).collect()
    got = {r["source"]: (r["n_docs"], r["n_points"], r["token_sum"]) for r in rows}
    batch = (
        spark.read.parquet(seq_dir)
        .groupBy("source")
        .agg(
            F.count("*").alias("d"),
            F.sum(F.size("tokens")).alias("p"),
            F.sum(F.aggregate("tokens", F.lit(0).cast("long"),
                              lambda a, x: a + x)).alias("s"),
        )
        .collect()
    )
    want = {r["source"]: (r["d"], r["p"], r["s"]) for r in batch}
    assert got == want


def test_stream_rollup_tier_equals_batch(spark, seq_dir, tmp_path):
    """Rollup-on-ingest: the streaming pooling tier emits byte-identical
    rows to the batch tier (pooling is stateless per-row, so the stream
    needs no watermark or state store)."""
    from tinybrain_spark.streaming import read_sequence_stream, stream_rollup_tier
    from tinybrain_spark.udfs import pool_udf

    stream = read_sequence_stream(spark, seq_dir)
    tier = stream_rollup_tier(stream, kernel="avg", window=4, num_tiers=1)
    q = (
        tier.writeStream.format("memory")
        .queryName("stream_tier")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_tier"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {
        r["doc_id"]: tuple(r["tokens"])
        for r in spark.sql("SELECT doc_id, tokens FROM stream_tier").collect()
    }
    udf = pool_udf("avg", window=4, num_tiers=1)
    want = {
        r["doc_id"]: tuple(r["t"])
        for r in spark.read.parquet(seq_dir)
        .select("doc_id", udf("tokens").alias("t"))
        .collect()
    }
    assert got == want


def test_stream_dedup_drops_reingested_duplicates(spark, seq_dir, tmp_path):
    """Streaming exact dedup: a directory holding every document TWICE
    (re-ingestion) streams through stream_dedup to exactly the batch
    distinct-by-fingerprint set."""
    from tinybrain_spark.streaming import read_sequence_stream, stream_dedup

    dup_dir = str(tmp_path / "dup_seq")
    # shift buckets off 0: an event at exactly epoch 0 equals the
    # floor-clamped watermark and is dropped as expired (epoch-0
    # fixture artifact, impossible with real ingest timestamps)
    base = spark.read.parquet(seq_dir).withColumn(
        "time_bucket", F.col("time_bucket") + 1
    )
    # two interleaved copies across many files -> duplicates land in
    # different micro-batches (state must carry across batches)
    base.union(base).repartition(8).write.parquet(dup_dir)

    stream = read_sequence_stream(spark, dup_dir, max_files_per_trigger=2)
    # bucket_seconds=1: the fixture's whole bucket range spans seconds,
    # so nothing is ever LATE relative to the 24h horizon and the test
    # isolates dedup semantics from watermark lateness drops
    q = (
        stream_dedup(stream, bucket_seconds=1)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = spark.sql("SELECT fingerprint FROM dedup_stream")
    want = (
        base.withColumn(
            "fingerprint",
            F.md5(F.concat_ws(",", F.col("tokens").cast("array<string>"))),
        )
        .select("fingerprint")
        .distinct()
    )
    got_fps = sorted(r["fingerprint"] for r in got.collect())
    want_fps = sorted(r["fingerprint"] for r in want.collect())
    assert got_fps == want_fps  # every unique doc once, no duplicate survives


def test_session_window_stream_equals_batch(spark, tmp_path):
    """Native session_window (r04): the streaming run (complete mode,
    availableNow) must equal the batch run on the same files, and both
    must match the hand-computed strictly-greater-than-gap semantics
    (gap of exactly 1800s keeps the session; 1801s splits)."""
    import datetime

    from tinybrain_spark.streaming import session_windows

    base = datetime.datetime(2024, 1, 1)

    def t(s):
        return base + datetime.timedelta(seconds=s)

    rows = [
        # user 1: session A (0, 100, 1900=gap exactly 1800 from 100),
        # then 1901s of silence -> session B
        (1, t(0)), (1, t(100)), (1, t(1900)),
        (1, t(3701)), (1, t(3800)),
        # user 2: single event
        (2, t(50)),
        # user 3: two sessions split by exactly 1801
        (3, t(0)), (3, t(1801)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    path = str(tmp_path / "sess_ev")
    df.repartition(3).write.parquet(path)

    epoch = int(base.replace(tzinfo=datetime.timezone.utc).timestamp())
    want = {
        (1, epoch + 0): (3, 1900),
        (1, epoch + 3701): (2, 99),
        (2, epoch + 50): (1, 0),
        (3, epoch + 0): (1, 0),
        (3, epoch + 1801): (1, 0),
    }

    batch = {
        (r["user_id"], r["started_at"]): (r["n_events"], r["duration_s"])
        for r in session_windows(spark.read.parquet(path)).collect()
    }
    assert batch == want

    stream = spark.readStream.schema(df.schema).parquet(path)
    q = (
        session_windows(stream)
        .writeStream.format("memory")
        .queryName("sess_sw")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, 120)
    got = {
        (r["user_id"], r["started_at"]): (r["n_events"], r["duration_s"])
        for r in spark.table("sess_sw").collect()
    }
    assert got == want


def test_cms_stream_equals_batch_and_stays_bounded(spark, seq_dir, tmp_path):
    """The count-min sketch as streaming state: after draining the
    directory micro-batch by micro-batch (cell-wise adds under the
    exactly-once checkpoint), the stored sketch must be CELL-FOR-CELL
    identical to the batch sketch over the same files — and the state
    table never exceeds depth*width rows regardless of volume."""
    from tinybrain_spark.streaming import cms_cells, run_cms_stream

    wd = str(tmp_path / "wh")
    q = run_cms_stream(
        spark, seq_dir, wd, table="cms", max_files_per_trigger=2
    )
    _drain(q)
    stored = Catalog(spark, wd).read("cms")
    batch = cms_cells(spark.read.parquet(seq_dir))
    got = {(r.r, r.b): r.c for r in stored.collect()}
    want = {(r.r, r.b): r.c for r in batch.collect()}
    assert got == want
    assert stored.count() <= 4 * 1024


def test_cms_stream_resume_no_double_count(spark, seq_dir, tmp_path):
    """Re-running the drained stream with the same checkpoint must not
    fold any batch twice (cell counts unchanged)."""
    from tinybrain_spark.streaming import cms_cells, run_cms_stream

    wd = str(tmp_path / "wh")
    _drain(run_cms_stream(spark, seq_dir, wd, table="cms"))
    first = {
        (r.r, r.b): r.c for r in Catalog(spark, wd).read("cms").collect()
    }
    _drain(run_cms_stream(spark, seq_dir, wd, table="cms"))
    again = {
        (r.r, r.b): r.c for r in Catalog(spark, wd).read("cms").collect()
    }
    assert again == first


# -- CDC correction stream (upsert/delete -> invalidation refresh) -------


def _ops_df(spark, rows):
    """rows: (doc_id, tokens|None, source, time_bucket|None, op)."""
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StringType, StructField,
        StructType,
    )

    schema = StructType([
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType()), True),
        StructField("n_tok", IntegerType(), True),
        StructField("source", StringType(), False),
        StructField("time_bucket", LongType(), True),
        StructField("op", StringType(), False),
    ])
    data = [
        (d, t, len(t) if t is not None else None, s, b, op)
        for d, t, s, b, op in rows
    ]
    return spark.createDataFrame(data, schema)


def test_apply_raw_corrections_upsert_delete_move(spark, workdir):
    """Upsert replaces by key, delete removes, a bucket-moving upsert
    dirties BOTH the old and new bucket; ranges cover all of it."""
    from tinybrain_spark.streaming import apply_raw_corrections

    cat = Catalog(spark, workdir)
    base = _ops_df(spark, [
        ("d1", [1, 2], "a", 100, "upsert"),
        ("d2", [3, 4], "a", 200, "upsert"),
        ("d3", [5, 6], "b", 100, "upsert"),
    ])
    r1 = apply_raw_corrections(cat, "raw", base)
    assert sorted(r1) == [("a", 100, 200), ("b", 100, 100)]
    fix = _ops_df(spark, [
        ("d1", [9, 9], "a", 300, "upsert"),   # moves bucket 100 -> 300
        ("d3", None, "b", None, "delete"),    # bucket recovered from store
    ])
    r2 = apply_raw_corrections(cat, "raw", fix)
    # a: old bucket 100 + new bucket 300 both dirty; b: stored bucket 100
    assert sorted(r2) == [("a", 100, 300), ("b", 100, 100)]
    rows = {
        r["doc_id"]: (r["source"], r["time_bucket"], list(r["tokens"]))
        for r in cat.read("raw").collect()
    }
    assert rows == {
        "d1": ("a", 300, [9, 9]),
        "d2": ("a", 200, [3, 4]),
    }
    # b lost its only doc: the partition directory must be gone
    import os
    assert not os.path.isdir(os.path.join(workdir, "raw", "source=b"))
    # idempotency: re-applying the same batch converges
    r3 = apply_raw_corrections(cat, "raw", fix)
    assert sorted(r3) == [("a", 300, 300)]  # old row already replaced
    rows2 = {
        r["doc_id"]: (r["source"], r["time_bucket"], list(r["tokens"]))
        for r in cat.read("raw").collect()
    }
    assert rows2 == rows


def test_correction_stream_end_state_equals_batch(spark, seq_dir, workdir):
    """Drain a correction stream (corrupted inserts, then fixing
    upserts + deletes) and require: stored raw == last-op-wins, stored
    cagg == full recompute over the corrected raw."""
    from tinybrain_spark.streaming import run_correction_stream

    base = spark.read.parquet(seq_dir)
    corrupted = base.withColumn(
        "tokens", F.transform("tokens", lambda t: t + 7)
    ).withColumn("op", F.lit("upsert"))
    kill = F.crc32(F.col("doc_id")) % 5 == 0
    fixes = base.where(~kill).withColumn("op", F.lit("upsert"))
    deletes = (
        base.where(kill)
        .withColumn("tokens", F.lit(None).cast("array<int>"))
        .withColumn("n_tok", F.lit(None).cast("int"))
        .withColumn("time_bucket", F.lit(None).cast("long"))
        .withColumn("op", F.lit("delete"))
    )
    cols = ["doc_id", "tokens", "n_tok", "source", "time_bucket", "op"]
    ops_dir = f"{workdir}/ops"
    # two files per phase; lexicographic file order doesn't matter
    # WITHIN a phase (key-disjoint), so write phases separately and let
    # maxFilesPerTrigger batch them in arbitrary interleavings
    corrupted.select(cols).repartition(2).write.parquet(ops_dir)
    fixes.select(cols).unionByName(deletes.select(cols)).repartition(
        2
    ).write.parquet(ops_dir, mode="append")
    q = run_correction_stream(
        spark, ops_dir, workdir, raw_table="rawc", cagg_table="caggc",
        max_files_per_trigger=1,
    )
    _drain(q, 600)
    want_raw = base.where(~kill)
    got_raw = Catalog(spark, workdir).read("rawc")
    assert _state(aggregate_batch(got_raw)) == _state(
        aggregate_batch(want_raw)
    )
    got_cagg = Catalog(spark, workdir).read("caggc")
    assert _state(got_cagg) == _state(aggregate_batch(want_raw))


def test_attribution_stream_multibatch_time_ordered(spark, tmp_path):
    """Stream-stream join across MICRO-BATCH boundaries: purchases in a
    later file must still pair with clicks buffered from an earlier
    file (watermark state holds them), and the drained pair set must
    equal the batch range join.  Files are written as disjoint
    ascending time ranges with forced ascending modtimes so the file
    source replays them in event-time order — the documented
    deterministic multi-batch mode of run_attribution_stream."""
    import datetime as dt
    import glob
    import time as _time

    from tinybrain_spark.streaming import run_attribution_stream

    t0 = dt.datetime(2024, 1, 1)
    # file A: clicks at minute 0-2; file B: purchases at minute 30-40
    # (within the 1h window, across the batch boundary) + a click at
    # minute 35 pairing with the minute-40 purchase in the same file
    rows_a = [
        (1, t0 + dt.timedelta(minutes=0), 7, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=2), 8, "click", 1.0, "{}"),
    ]
    rows_b = [
        (3, t0 + dt.timedelta(minutes=30), 7, "purchase", 1.0, "{}"),
        (4, t0 + dt.timedelta(minutes=35), 8, "click", 1.0, "{}"),
        (5, t0 + dt.timedelta(minutes=40), 8, "purchase", 1.0, "{}"),
        # user 7 clicked 0m; a 90m purchase is OUTSIDE the 1h window
        (6, t0 + dt.timedelta(minutes=90), 7, "purchase", 1.0, "{}"),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    src = str(tmp_path / "events.parquet")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src + "/f=a")
    spark.createDataFrame(rows_b, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src + "/f=b")
    # force ascending modtimes so the file source replays a before b
    now = _time.time()
    for i, d in enumerate(("f=a", "f=b")):
        for p in glob.glob(f"{src}/{d}/*.parquet"):
            os.utime(p, (now + i * 10, now + i * 10))
    q = run_attribution_stream(
        spark,
        src,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    _drain(q)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # purchase 3 <- click 1 (cross-batch, 30m), purchase 5 <- clicks
    # 2 (38m earlier, cross-batch) and 4 (5m, same batch); purchase 6
    # matches nothing (91m > 1h window)
    assert got == {(3, 1), (5, 2), (5, 4)}


def test_alert_episode_stream_state_survives_batches(spark, tmp_path):
    """An episode straddling two micro-batches must chain through
    GroupState: hot hours [10,11] arrive in trigger 1, [12] in trigger
    2 -> ONE episode (10..12).  A gap inside trigger 2 closes and
    reopens; the sentinel closes the final open episode; a
    below-threshold row closes immediately."""
    from tinybrain_spark.streaming import run_alert_episode_stream

    hot_dir = str(tmp_path / "hot")
    schema = "source string, tb long, n long"

    def phase(rows, mode):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            hot_dir, mode=mode
        )

    phase([("a", 10, 5), ("a", 11, 4), ("b", 10, 7)], "overwrite")
    # trigger 2: 'a' extends through 12 then gaps to 20; 'b' hits a
    # below-threshold hour (closes 10..10) then restarts at 15
    phase([("a", 12, 6), ("a", 20, 4), ("b", 14, 0), ("b", 15, 9)],
          "append")
    # sentinel phase: below threshold, closes every open episode
    phase([("a", 99, 0), ("b", 99, 0)], "append")

    q = run_alert_episode_stream(
        spark, hot_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        threshold=4, max_files_per_trigger=1,
    )
    _drain(q)
    got = {
        (r["source"], r["start_tb"], r["end_tb"], r["n_hours"],
         r["peak_n"], r["total_n"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {
        ("a", 10, 12, 3, 6, 15),
        ("a", 20, 20, 1, 4, 4),
        ("b", 10, 10, 1, 7, 7),
        ("b", 15, 15, 1, 9, 9),
    }
