#!/usr/bin/env python
"""Bench regression guard (VERDICT r4 item 9).

Compares the two newest BENCH_r*.json snapshots (or an explicit pair
given as arguments) and FAILS (exit 1) when a guarded metric drops more
than the tolerance, so chip/host drift is distinguishable from real
damage at commit time rather than judge time.

Usage:
    python bench_guard.py                # newest two BENCH_r*.json
    python bench_guard.py OLD.json NEW.json
    python bench_guard.py --run          # run bench.py now, compare its
                                         # line against the newest snapshot

Guarded metrics (relative drop > 10% fails):
    value                        (subread-align reads/s/chip)
    featurecounts_rec_per_s
    bigindex_reads_per_s
    devicecounts_e2e_rec_per_s
"""
import json
import pathlib
import re
import subprocess
import sys

HERE = pathlib.Path(__file__).parent
GUARDED = [
    "value",
    "featurecounts_rec_per_s",
    "bigindex_reads_per_s",
    "devicecounts_e2e_rec_per_s",
]
TOL = 0.10


def load_snapshot(path: pathlib.Path) -> dict:
    d = json.loads(path.read_text())
    # driver snapshots wrap the bench line under "parsed"
    return d.get("parsed", d)


def newest_snapshots():
    snaps = sorted(
        HERE.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    return snaps


def run_bench_now() -> dict:
    out = subprocess.run(
        [sys.executable, str(HERE / "bench.py")],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main(argv):
    if "--run" in argv:
        snaps = newest_snapshots()
        if not snaps:
            print("no BENCH_r*.json baseline to compare against")
            return 0
        old, new = load_snapshot(snaps[-1]), run_bench_now()
        old_name, new_name = snaps[-1].name, "bench.py (now)"
    elif len(argv) >= 2:
        old, new = load_snapshot(pathlib.Path(argv[0])), load_snapshot(
            pathlib.Path(argv[1])
        )
        old_name, new_name = argv[0], argv[1]
    else:
        snaps = newest_snapshots()
        if len(snaps) < 2:
            print("need two BENCH_r*.json snapshots")
            return 0
        old, new = load_snapshot(snaps[-2]), load_snapshot(snaps[-1])
        old_name, new_name = snaps[-2].name, snaps[-1].name

    print(f"comparing {old_name} -> {new_name}")
    failed = False
    for k in GUARDED:
        if k not in old or k not in new:
            continue
        o, n = float(old[k]), float(new[k])
        rel = (n - o) / o if o else 0.0
        flag = "FAIL" if rel < -TOL else "ok"
        if rel < -TOL:
            failed = True
        print(f"  {k:28s} {o:14.1f} -> {n:14.1f}  {rel*+100:+6.1f}%  {flag}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
