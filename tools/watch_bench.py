#!/usr/bin/env python
"""Watch VM health; in the first healthy window fire the graded bench
(sf0.1) and the 8->32 mode-w8 scalebench, recording both under
/root/repo/BENCH/healthy_r05/.  Writes /tmp/tb_bench_running.flag while
a measurement is in flight so the interactive session can avoid
polluting the window."""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
from bench import _fault_in_mbps, _fault_in_thp_mbps  # noqa: E402

FLAG = "/tmp/tb_bench_running.flag"
OUT = "/root/repo/BENCH/healthy_r05"
BENCH_JSON = os.path.join(OUT, "bench_sf01.json")
SCALE_JSON = os.path.join(OUT, "scalebench_mode_w8.json")

os.makedirs(OUT, exist_ok=True)
log = open("/tmp/bench_watcher.log", "a", buffering=1)


def note(msg):
    log.write(f"{time.strftime('%H:%M:%S')} {msg}\n")


def valid(path):
    try:
        with open(path) as f:
            data = json.loads(f.read().strip().splitlines()[-1])
        return not data.get("invalid")
    except Exception:
        return False


note("watcher start")
while True:
    bench_ok = valid(BENCH_JSON)
    scale_ok = valid(SCALE_JSON)
    if bench_ok and scale_ok:
        note("both artifacts healthy-recorded; watcher exiting")
        break
    load = os.getloadavg()[0]
    mbps = _fault_in_mbps()
    # THP probe (the engine's actual fault path after the session.py
    # hardening) only when the cheap 4K probe fails — see bench.py r05g
    thp = _fault_in_thp_mbps() if (mbps < 1000 and load <= 1.4) else None
    note(f"probe mbps={mbps:.1f} thp={thp} load={load:.2f}")
    if (mbps >= 1000 or (thp or 0) >= 1000) and load <= 1.4:
        note("HEALTHY window - firing measurements")
        with open(FLAG, "w") as f:
            f.write("bench running\n")
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
            SPARK_GRAFT_HEALTH_RETRIES="2",
        )
        try:
            if not bench_ok:
                with open(BENCH_JSON, "w") as f:
                    rc = subprocess.call(
                        [sys.executable, "/root/repo/bench.py"],
                        stdout=f, cwd="/root/repo", env=env,
                    )
                note(f"bench rc={rc} valid={valid(BENCH_JSON)}")
            if not scale_ok:
                with open(SCALE_JSON, "w") as f:
                    rc2 = subprocess.call(
                        [sys.executable, "/root/repo/jobs/scalebench.py",
                         "--kernel", "mode", "--window", "8",
                         "--cores", "8", "32"],
                        stdout=f, cwd="/root/repo", env=env,
                    )
                note(f"scalebench rc={rc2} valid={valid(SCALE_JSON)}")
        finally:
            if os.path.exists(FLAG):
                os.remove(FLAG)
        continue  # re-loop immediately: maybe window still open
    time.sleep(120)
