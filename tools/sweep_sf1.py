"""One-command cross-scale sweep (VERDICT r04 #7): regenerate the 10x
sf1 fixture, run the graded driver head against the DuckDB oracle on
it, and append per-query timings to BENCH/NOTES.md.

The r04 sweep was assembled by hand and caught an O(n^2) window frame
(as-of forward) that was invisible at sf0.01 — this makes that class
of check a per-round ritual.  Excluded by default: the recursive-CTE
cluster oracles (quadratic per component in DUCKDB at sf1 — the Spark
side is separately stress-tested in tests/test_clusters.py).

Usage:
    python tools/sweep_sf1.py [--out /tmp/tb_sf1] [--head 50]
                              [--per-query-timeout 1800] [--no-notes]
"""

from __future__ import annotations

import argparse
import datetime
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# DuckDB-side quadratic oracles, excluded from big-sf sweeps by policy
# (documented in CLAUDE.md; the Spark plans they grade are covered by
# dedicated scale tests instead)
QUADRATIC_ORACLES = ["q_dedup_clusters_star", "q_dedup_clusters"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tb_sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--head", type=int, default=50)
    ap.add_argument("--exclude", nargs="*", default=QUADRATIC_ORACLES)
    ap.add_argument("--no-notes", action="store_true",
                    help="don't append the summary to BENCH/NOTES.md")
    args = ap.parse_args()

    t0 = time.time()
    if not os.path.exists(os.path.join(args.out, "lineitem.parquet")):
        print(f"[sweep] building {args.out} (factor {args.factor})")
        sys.path.insert(0, os.path.join(REPO, "tools"))
        import make_sf

        make_sf.build(args.out, factor=args.factor)
    else:
        print(f"[sweep] reusing existing fixture {args.out}")

    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "check_oracle.py"),
        "--sf", args.out,
        "--head", str(args.head),
        "--exclude", *args.exclude,
    ]
    print("[sweep]", " ".join(cmd))
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr[-4000:])

    # parse per-query walls from check_oracle's output lines
    rows = re.findall(
        r"^(OK|ROWS|FAIL)\s+(\S+?):.*\[(\d+\.\d)s\]$",
        proc.stdout,
        re.M,
    )
    n_fail = sum(1 for s, _, _ in rows if s == "FAIL")
    slowest = sorted(rows, key=lambda r: -float(r[2]))[:10]
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    summary = [
        "",
        f"## sf1 sweep {stamp} "
        f"(head {args.head}, factor {args.factor}, "
        f"excluded: {', '.join(args.exclude)})",
        "",
        f"Result: {len(rows) - n_fail}/{len(rows)} match, "
        f"total {time.time() - t0:.0f}s (Spark+DuckDB combined walls; "
        "NOT a bench — the oracle side dominates several queries).",
        "",
        "Slowest 10 (combined Spark+DuckDB wall):",
        "",
    ]
    summary += [
        f"- {name}: {sec}s{' FAIL' if status == 'FAIL' else ''}"
        for status, name, sec in slowest
    ]
    text = "\n".join(summary) + "\n"
    print(text)
    if not args.no_notes:
        with open(os.path.join(REPO, "BENCH", "NOTES.md"), "a") as f:
            f.write(text)
        print("[sweep] appended to BENCH/NOTES.md")
    return 1 if (n_fail or proc.returncode) else 0


if __name__ == "__main__":
    raise SystemExit(main())
