"""Scaling-efficiency evidence: run the identical rollup job at two
parallelism levels (local[8] vs local[32]) on the same parquet input
and report throughput at both plus efficiency = (pps_32 / pps_8) / 4.

This is the sandbox proxy for the north rule's N -> 4N executor
criterion (no real cluster available): same code path, same input, the
only variable is the core count.  Each configuration runs in its own
JVM via a subprocess invocation of jobs/rollup_job.py (the production
spark-submit entry), best of --repeat runs.

Health-gated exactly like bench.py (load average + fault-in probe,
bounded retries, post-run re-probe): a polluted VM once produced an
8->32 "efficiency 0.100" record that silently OVERWROTE the curated
scaling evidence in BENCH/BASELINE.md.  Now the run refuses to start
until the VM is healthy, marks the JSON ``"invalid": true`` when
pollution arrives mid-run, and never touches BASELINE.md: results go
to BENCH/scale_run_latest.md (plus the JSON line on stdout) for a
human to fold into the curated narrative.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _gen_input(path: str, docs: int, ntok: int) -> None:
    from tinybrain_spark.datagen import generate
    from tinybrain_spark.session import get_spark

    spark = get_spark("scalebench-gen", master="local[32]")
    generate(spark, n_docs=docs, n_tok=ntok, seed=42,
             num_partitions=256).write.mode("overwrite").parquet(path)
    spark.stop()


def _run_job(input_path: str, cores: int, kernel: str, tiers: int,
             workdir: str, sparse: bool = False, window: int = 4) -> dict:
    out = os.path.join(workdir, f"wh_{cores}_{kernel}")
    shutil.rmtree(out, ignore_errors=True)
    cmd = [
        sys.executable,
        os.path.join(REPO, "jobs", "rollup_job.py"),
        "--input", input_path,
        "--output", out,
        "--kernel", kernel,
        "--window", str(window),
        "--tiers", str(tiers),
        "--master", f"local[{cores}]",
        "--no-resume",
        "--repeat", "2",  # in-JVM repeat: measure warm-worker throughput
        "--run-kind", f"scale{cores}",
    ]
    if sparse:
        cmd.append("--sparse")
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        # plenty of input splits so the 4N config never starves for tasks
        SPARK_GRAFT_MAX_PARTITION_BYTES=str(4 * 1024 * 1024),
    )
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
    wall = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"job failed at {cores} cores:\n{proc.stderr[-2000:]}")
    stats = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    stats["proc_wall_sec"] = round(wall, 2)
    return stats


def main() -> int:
    ap = argparse.ArgumentParser()
    # sized so parallel work (~150+ core-seconds) dominates the ~1.5 s/job
    # serial driver overhead — below that, Amdahl caps measurable speedup
    ap.add_argument("--docs", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "600000")))
    ap.add_argument("--ntok", type=int, default=1024)
    ap.add_argument("--kernel", default="avg")
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--sparse", action="store_true", default=True)
    ap.add_argument("--tiers", type=int, default=3)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--cores", type=int, nargs=2, default=[8, 32])
    args = ap.parse_args()

    from bench import (
        check_health,
        invalid_reasons,
        post_probe,
    )

    pre_healthy, health = check_health()
    if not pre_healthy:
        print(f"VM unhealthy after retries, refusing to measure: {health}",
              file=sys.stderr)
        print(json.dumps({"metric": "scaling_efficiency", "invalid": True,
                          "invalid_reasons": ["prerun_unhealthy"],
                          "health": health}))
        return 1

    # tmpfs when available: the sandbox has ONE disk; a real cluster has
    # hundreds — RAM-backed staging keeps the comparison about CPU scaling
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="tb_scale_", dir=base)
    input_path = os.path.join(workdir, "seq")
    print(f"generating {args.docs} docs x {args.ntok} tokens ...",
          file=sys.stderr)
    _gen_input(input_path, args.docs, args.ntok)

    results = {}
    for cores in args.cores:
        best = None
        for r in range(args.repeat):
            stats = _run_job(input_path, cores, args.kernel, args.tiers,
                             workdir, sparse=args.sparse, window=args.window)
            print(f"  local[{cores}] run {r}: {stats['points_per_sec']} pts/s "
                  f"(wall {stats['wall_sec']}s)", file=sys.stderr)
            if best is None or stats["points_per_sec"] > best["points_per_sec"]:
                best = stats
        results[cores] = best

    lo, hi = args.cores
    pps_lo = results[lo]["points_per_sec"]
    pps_hi = results[hi]["points_per_sec"]
    efficiency = (pps_hi / pps_lo) / (hi / lo)

    # bounded-retry post probe (bench.post_probe): the instant after a
    # run the JVM's teardown-reclaim transient reads 40-440 MB/s on a
    # host that probes 4+ GB/s twenty seconds later (r05k); a real
    # sick window stays sick across the retries.
    post_mbps, post_thp, post_history = post_probe()
    reasons = invalid_reasons(pre_healthy, post_mbps,
                              post_thp_mbps=post_thp)

    summary = {
        "metric": "scaling_efficiency",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "cores": args.cores,
        "docs": args.docs,
        "n_tok": args.ntok,
        "kernel": args.kernel,
        "tiers": args.tiers,
        "points_per_sec": {str(lo): pps_lo, str(hi): pps_hi},
        "wall_sec": {
            str(lo): results[lo]["wall_sec"],
            str(hi): results[hi]["wall_sec"],
        },
        "health": health,
        "postrun_fault_in_mbps": round(post_mbps, 1),
        "postrun_thp_fault_in_mbps": post_thp,
        "postrun_history": post_history,
    }
    if reasons:
        summary["invalid"] = True
        summary["invalid_reasons"] = reasons
    print(json.dumps(summary))

    if reasons:
        print("run polluted mid-measurement; NOT writing a results file",
              file=sys.stderr)
        return 1

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "scale_run_latest.md")
    with open(md, "w") as f:
        f.write(f"""# scalebench run (health-gated; fold into BASELINE.md by hand)

Identical `jobs/rollup_job.py` run (spark-submit entry, full
materializing pyramid incl. lineage/metrics checkpointing) on the same
parquet input at `local[{lo}]` and `local[{hi}]`, best of {args.repeat}
runs per configuration, separate JVM per run.

Input: {args.docs:,} docs x {args.ntok} int32 tokens
({args.docs * args.ntok / 1e6:.0f}M tokens), kernel={args.kernel}
(sparse={args.sparse}), window={args.window}, tiers={args.tiers}.

| cores | rolled-up points/sec | pyramid wall sec |
|---|---|---|
| {lo} | {pps_lo:,.0f} | {results[lo]['wall_sec']} |
| {hi} | {pps_hi:,.0f} | {results[hi]['wall_sec']} |

**Scaling efficiency ({lo} → {hi} cores, {hi/lo:.0f}x): {efficiency:.3f}**

Health: pre-run {health['history'][-1]}, post-run probe
{post_mbps:.0f} MB/s (bar: {health['min_mbps']:.0f}).
""")
    print(f"wrote {md}", file=sys.stderr)
    shutil.rmtree(workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
