"""bench.py health gate: the refuse-to-record logic (VERDICT r03 #1).

BENCH_r03 recorded a 2.5x "regression" that was pure machine state
(concurrent CPU hog + lazily-backed VM memory).  The gate samples load
average + first-touch fault-in throughput before the run with bounded
retries, re-probes after, and marks the emitted JSON ``invalid`` when
either side is sick.  Pure-python, injectable clocks — no Spark.
"""

from __future__ import annotations

import bench


def test_healthy_first_try_no_sleep():
    sleeps: list[float] = []
    thp_calls: list[int] = []

    def thp_probe():
        thp_calls.append(1)
        return 2000.0

    ok, rec = bench.check_health(
        max_load=1.5,
        min_mbps=1000,
        retries=3,
        sleep_s=60,
        probe=lambda: 2000.0,
        load_fn=lambda: 0.2,
        sleep_fn=sleeps.append,
        thp_probe=thp_probe,
    )
    assert ok
    assert rec["attempts"] == 1
    assert sleeps == []
    assert rec["history"][0] == {"load_1m": 0.2, "fault_in_mbps": 2000.0}
    # the heavier THP probe is skipped when the 4K probe already passes
    assert thp_calls == []


def test_recovers_after_retries():
    probes = iter([50.0, 80.0, 1500.0])
    sleeps: list[float] = []
    ok, rec = bench.check_health(
        max_load=1.5,
        min_mbps=1000,
        retries=5,
        sleep_s=30,
        probe=lambda: next(probes),
        load_fn=lambda: 0.1,
        sleep_fn=sleeps.append,
        thp_probe=lambda: 7.0,  # THP path sick too: 4K recovery decides
    )
    assert ok
    assert rec["attempts"] == 3
    assert sleeps == [30, 30]  # bounded: one sleep per failed attempt


def test_load_alone_fails_the_bar():
    ok, rec = bench.check_health(
        max_load=1.5,
        min_mbps=1000,
        retries=2,
        sleep_s=1,
        probe=lambda: 5000.0,
        load_fn=lambda: 2.4,  # the r03 pollution signature
        sleep_fn=lambda _s: None,
        thp_probe=lambda: 5000.0,  # load gates regardless of fault paths
    )
    assert not ok
    assert rec["attempts"] == 3  # initial + 2 retries, then gives up


def test_never_healthy_is_bounded():
    sleeps: list[float] = []
    ok, rec = bench.check_health(
        max_load=1.5,
        min_mbps=1000,
        retries=4,
        sleep_s=10,
        probe=lambda: 7.4,  # lazily-backed guest memory
        load_fn=lambda: 0.2,
        sleep_fn=sleeps.append,
        thp_probe=lambda: 220.0,  # THP faults also below the bar
    )
    assert not ok
    assert rec["attempts"] == 5
    assert sleeps == [10] * 4  # never unbounded waiting
    assert all(h["fault_in_mbps"] == 7.4 for h in rec["history"])
    assert all(h["thp_fault_in_mbps"] == 220.0 for h in rec["history"])


def test_thp_window_passes_when_4k_sick():
    """The r05g case: 4K faults sick for hours while madvise-THP (the
    engine's actual allocation path after the session.py hardening)
    runs at GB/s.  The window is valid; BOTH probes land in history."""
    sleeps: list[float] = []
    ok, rec = bench.check_health(
        max_load=1.5,
        min_mbps=1000,
        retries=3,
        sleep_s=60,
        probe=lambda: 11.7,  # the 2026-08-18 sick reading
        load_fn=lambda: 0.5,
        sleep_fn=sleeps.append,
        thp_probe=lambda: 2993.0,  # parallel THP probe, same minute
    )
    assert ok
    assert sleeps == []
    assert rec["history"][0] == {
        "load_1m": 0.5,
        "fault_in_mbps": 11.7,
        "thp_fault_in_mbps": 2993.0,
    }


def test_invalid_reasons_matrix():
    assert bench.invalid_reasons(True, 2000.0, min_mbps=1000) == []
    assert bench.invalid_reasons(False, 2000.0, min_mbps=1000) == [
        "prerun_unhealthy"
    ]
    assert bench.invalid_reasons(True, 120.0, min_mbps=1000) == [
        "postrun_probe_sick"
    ]
    assert bench.invalid_reasons(False, 7.4, min_mbps=1000) == [
        "prerun_unhealthy",
        "postrun_probe_sick",
    ]
    # a healthy post-run THP probe clears the postrun verdict
    assert bench.invalid_reasons(
        True, 7.4, min_mbps=1000, post_thp_mbps=2400.0
    ) == []
    assert bench.invalid_reasons(
        True, 7.4, min_mbps=1000, post_thp_mbps=300.0
    ) == ["postrun_probe_sick"]


def test_post_probe_transient_recovers():
    """r05k: the teardown-reclaim transient — first sample sick on both
    paths, second sample healthy — must clear within the retry budget,
    with every sample in the history."""
    sleeps = []
    seq_4k = iter([38.9, 3900.0])
    seq_thp = iter([442.0])
    mbps, thp, hist = bench.post_probe(
        min_mbps=1000,
        retries=2,
        sleep_s=20,
        probe=lambda: next(seq_4k),
        thp_probe=lambda: next(seq_thp),
        sleep_fn=sleeps.append,
    )
    assert mbps == 3900.0 and thp is None
    assert sleeps == [20]
    assert hist == [
        {"fault_in_mbps": 38.9, "thp_fault_in_mbps": 442.0},
        {"fault_in_mbps": 3900.0},
    ]
    assert bench.invalid_reasons(True, mbps, min_mbps=1000,
                                 post_thp_mbps=thp) == []


def test_post_probe_persistent_sick_stays_sick():
    """A real sick window (r04: hours at 5-14 MB/s) exhausts the retry
    budget and the final sample still fails both paths — the retry
    cannot launder genuine pollution."""
    sleeps = []
    mbps, thp, hist = bench.post_probe(
        min_mbps=1000,
        retries=2,
        sleep_s=20,
        probe=lambda: 7.4,
        thp_probe=lambda: 310.0,
        sleep_fn=sleeps.append,
    )
    assert len(hist) == 3 and sleeps == [20, 20]
    assert bench.invalid_reasons(True, mbps, min_mbps=1000,
                                 post_thp_mbps=thp) == [
        "postrun_probe_sick"
    ]


def test_post_probe_healthy_first_sample_no_thp_cost():
    """Healthy 4K first sample: no THP probe paid, no sleeps."""
    mbps, thp, hist = bench.post_probe(
        min_mbps=1000,
        retries=2,
        sleep_s=20,
        probe=lambda: 2400.0,
        thp_probe=lambda: (_ for _ in ()).throw(AssertionError("paid")),
        sleep_fn=lambda s: (_ for _ in ()).throw(AssertionError("slept")),
    )
    assert mbps == 2400.0 and thp is None and hist == [
        {"fault_in_mbps": 2400.0}
    ]


def test_is_healthy_edges():
    assert bench.is_healthy(1.5, 1000.0, max_load=1.5, min_mbps=1000)
    assert not bench.is_healthy(1.51, 5000.0, max_load=1.5, min_mbps=1000)
    assert not bench.is_healthy(0.0, 999.9, max_load=1.5, min_mbps=1000)
    # either fault path at speed qualifies; load still gates
    assert bench.is_healthy(0.5, 11.7, max_load=1.5, min_mbps=1000,
                            thp_mbps=1500.0)
    assert not bench.is_healthy(0.5, 11.7, max_load=1.5, min_mbps=1000,
                                thp_mbps=999.0)
    assert not bench.is_healthy(2.0, 11.7, max_load=1.5, min_mbps=1000,
                                thp_mbps=5000.0)


def test_fault_probe_median_of_fresh_touches(monkeypatch):
    """The probe must (a) keep every sample's pages alive so each
    sample faults FRESH memory, and (b) report the MEDIAN — a sick
    host whose recycled pages read fast must not pass via max-of-N
    (the r04f BENCH/NOTES.md incident: 6.9 MB/s fresh, 3.4 GB/s
    recycled)."""
    import numpy as np

    alive: list[object] = []
    real_ones = np.ones

    def tracking_ones(n):
        a = real_ones(16)  # tiny stand-in; timing comes from the clock
        alive.append(a)
        return a

    ticks = iter(
        # sample 1: fast (64 MB in 0.01s -> 6400 MB/s, the recycled-page lie)
        [100.0, 100.01,
         # samples 2-3: slow fresh touches (64 MB in 8s -> 8 MB/s)
         101.0, 109.0,
         110.0, 118.0]
    )
    monkeypatch.setattr(np, "ones", tracking_ones)
    monkeypatch.setattr(bench.time, "time", lambda: next(ticks))
    got = bench._fault_in_mbps(mb=64, samples=3)
    # median of [6400, 8, 8] is 8 — the sick verdict; max would say 6400
    assert got == 8.0
    assert len(alive) == 3  # every sample allocated fresh (none reused)
