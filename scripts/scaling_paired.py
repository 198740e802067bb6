"""Paired two-parallelism scaling evidence on a noisy shared host.

The sandbox host carries external load (load-average spikes with no
local process consuming CPU), so single-shot measurements at each
parallelism level are dominated by whenever the neighbors wake up.
This harness keeps ONE warmed JVM per level alive and alternates timed
runs N, 4N, N, 4N, ... so both levels sample the same contention
windows; the reported figure is the median of per-pair efficiencies
e_i = wall_N_i / (4 × wall_4N_i), plus the best-case pair.

Usage: python scripts/scaling_paired.py [rows] [pairs] [N_cores] [4N_cores]
                                        [out_json] [job]
job = "suite" (default, full drift-inclusive check suite) or "scan"
(pure tokens decode+sum, F.aggregate over every element — the
hardware-ceiling control, measured under the SAME paired adaptive
protocol as the suite so the two efficiencies are comparable).
Writes BENCH_scaling_last.json (or out_json).
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
N_CORES = int(sys.argv[3]) if len(sys.argv) > 3 else 8
N4_CORES = int(sys.argv[4]) if len(sys.argv) > 4 else 32
OUT = sys.argv[5] if len(sys.argv) > 5 else "/root/repo/BENCH_scaling_last.json"
JOB = sys.argv[6] if len(sys.argv) > 6 else "suite"
if JOB not in ("suite", "scan"):
    raise SystemExit(f"job must be 'suite' or 'scan', got {JOB!r}")
if OUT in ("suite", "scan"):
    raise SystemExit(
        f"out_json is argv[5] and job is argv[6]; {OUT!r} looks like a job — "
        "pass the output path first")
DATA = f"/tmp/scaling_sequences_{ROWS}.parquet"

CHILD = r'''
import json, sys, time
sys.path.insert(0, "/root/repo")
from teleharvest_spark.session import get_spark
from teleharvest_spark.config import CheckSuite
from teleharvest_spark import datagen
from teleharvest_spark.plans import suite as suite_plan

cores = int(sys.argv[1]); data = sys.argv[2]; rows = int(sys.argv[3]); gen = sys.argv[4] == "gen"
job = sys.argv[5] if len(sys.argv) > 5 else "suite"
spark = get_spark(app_name=f"scaling_{cores}", master=f"local[{cores}]",
                  shuffle_partitions=max(cores, 8))
check = CheckSuite(banned_tokens=datagen.BANNED_IDS,
                   allowed_sources=tuple(datagen.SOURCES))
if gen:
    datagen.generate_sequences(spark, rows, check).write.mode("overwrite").parquet(data)
df = spark.read.parquet(data)

if job == "scan":
    # hardware-ceiling control: decode every token value and sum it —
    # no joins, windows, or Python; what the box's memory bus can scale
    from pyspark.sql import functions as F

    def one_run():
        t0 = time.perf_counter()
        df.select(F.sum(F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x.cast("long")
        )).alias("s")).collect()
        wall = time.perf_counter() - t0
        spark._jvm.System.gc()
        return wall
else:
    def one_run():
        t0 = time.perf_counter()
        res = suite_plan.run_suite(df, check, drift_vs_global=True)
        res.materialize()
        wall = time.perf_counter() - t0
        res.cleanup()
        spark._jvm.System.gc()
        return wall

# Adaptive JIT warmup (untimed): a fixed pass count can leave the
# first timed run still C2-compiling (bench.py observed a 37 s first
# sample on a table that runs at ~9 s warm); warm until two
# consecutive walls agree within 15%, bounded at 5 passes.
prev = one_run()
for _ in range(4):
    cur = one_run()
    if abs(cur - prev) / max(prev, 1e-9) < 0.15:
        break
    prev = cur
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() != "run":
        break
    print(json.dumps({"wall": round(one_run(), 2)}), flush=True)
'''


def start(cores: int, gen: bool) -> subprocess.Popen:
    p = subprocess.Popen(
        [sys.executable, "-c", CHILD, str(cores), DATA, str(ROWS),
         "gen" if gen else "read", JOB],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    while True:
        line = p.stdout.readline()
        if not line:
            raise RuntimeError(f"child {cores} died during warmup")
        if line.strip() == "READY":
            return p


def _total_busy_jiffies() -> int:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user nice system irq softirq steal guest — everything but idle+iowait
    vals = [int(x) for x in parts[1:11]]
    return sum(vals) - vals[3] - vals[4]


def _subtree_jiffies(root_pids: set[int]) -> int:
    """Sum utime+stime over every process whose ancestry reaches one of
    ``root_pids`` — the CPU our own measurement children (and their
    JVMs/UDF workers) consumed."""
    import os

    procs: dict[int, tuple[int, int]] = {}  # pid -> (ppid, jiffies)
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                s = f.read()
        except OSError:
            continue
        # fields after the parenthesised comm: index from the last ')'
        rest = s[s.rindex(")") + 2:].split()
        procs[int(d)] = (int(rest[1]), int(rest[11]) + int(rest[12]))
    total = 0
    for pid, (_, jiff) in procs.items():
        cur = pid
        seen = set()
        while cur > 1 and cur not in seen:
            if cur in root_pids:
                total += jiff
                break
            seen.add(cur)
            cur = procs.get(cur, (0, 0))[0]
    return total


def timed_run(p: subprocess.Popen, all_children: list[subprocess.Popen]) -> tuple[float, float]:
    """Returns (wall_sec, external_cores): external_cores is the mean
    number of host CPUs busy with work that is NOT ours during the run
    (total busy jiffies minus our children's subtrees) — the per-pair
    load telemetry VERDICT r2 item 3 asked for."""
    import time

    roots = {c.pid for c in all_children}
    t0 = time.monotonic()
    busy0, ours0 = _total_busy_jiffies(), _subtree_jiffies(roots)
    p.stdin.write("run\n")
    p.stdin.flush()
    while True:
        line = p.stdout.readline()
        if not line:
            raise RuntimeError("child died mid-run")
        line = line.strip()
        if line.startswith("{"):
            wall = json.loads(line)["wall"]
            break
    elapsed = time.monotonic() - t0
    busy1, ours1 = _total_busy_jiffies(), _subtree_jiffies(roots)
    hz = 100  # USER_HZ on this kernel
    ext = max(0.0, ((busy1 - busy0) - (ours1 - ours0)) / hz / max(elapsed, 1e-9))
    return wall, round(ext, 2)


def main() -> None:
    import os
    gen = not os.path.isdir(DATA)
    n8 = start(N_CORES, gen=gen)
    n32 = start(N4_CORES, gen=False)
    kids = [n8, n32]
    pairs = []
    for i in range(PAIRS):
        w8, ext8 = timed_run(n8, kids)
        w32, ext32 = timed_run(n32, kids)
        eff = round(w8 / (4 * w32), 3)
        pairs.append({
            "wall_8": w8, "wall_32": w32, "efficiency": eff,
            "ext_cores_8": ext8, "ext_cores_32": ext32,
        })
        print(json.dumps(pairs[-1]), flush=True)
    for p in (n8, n32):
        p.stdin.close()
        try:
            p.wait(timeout=60)
        except Exception:  # lingering shutdown must not discard the pairs
            p.kill()
            p.wait(timeout=5)
    effs = [p["efficiency"] for p in pairs]
    best_pair = max(pairs, key=lambda p: p["efficiency"])
    # quiet pairs: both runs saw < 1 external core busy on average
    quiet = [p for p in pairs if p["ext_cores_8"] < 1.0 and p["ext_cores_32"] < 1.0]
    report = {
        "protocol": (
            "paired alternating runs, one warmed JVM per level "
            "(adaptive warmup: consecutive walls within 15%, max 5 "
            "passes), "
            + ("full drift-inclusive check suite" if JOB == "suite"
               else "pure tokens decode+sum scan (hardware-ceiling "
                    "control)")
            + ", same input; median pairwise efficiency controls for "
            "external host load; ext_cores_* = measured mean non-our "
            "CPUs busy during each run (/proc/stat minus our process "
            "subtrees)"
        ),
        "rows": ROWS,
        "job": JOB,
        "pairs": pairs,
        "median_efficiency": round(statistics.median(effs), 3),
        "quiet_pairs": len(quiet),
        "quiet_median_efficiency": (
            round(statistics.median([p["efficiency"] for p in quiet]), 3) if quiet else None
        ),
        "best_pair": best_pair,
        "N_cores": N_CORES,
        "4N_cores": N4_CORES,
        "median_seq_per_sec_N": round(ROWS / statistics.median([p["wall_8"] for p in pairs]), 1),
        "median_seq_per_sec_4N": round(ROWS / statistics.median([p["wall_32"] for p in pairs]), 1),
    }
    print(json.dumps(report, indent=2))
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
