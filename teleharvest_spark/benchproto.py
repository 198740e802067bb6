"""Warmed-child measurement protocol, shared by ``bench.py`` and
``scripts/scaling_paired.py``.

One JVM per parallelism level, driven over a line protocol:

    parent                      child (fresh python -> fresh JVM)
    ------                      ---------------------------------
    spawn(cores, data, job) --> build SparkSession, read table
                                adaptive warmup: untimed passes until
                                two consecutive walls agree within 15%
                                (bounded at warm_max; a FIXED pass
                                count left a first timed sample still
                                C2-compiling: observed 37 s on a table
                                that runs at ~9 s warm)
                  READY     <--
    "run\n"                 -->
                                one timed pass of the job
    {"wall": s}             <--  (stray JVM stdout skipped by parent)

Jobs:
  "suite" — the full drift-inclusive check suite (plans/suite.run_suite)
  "scan"  — pure tokens decode+sum (F.aggregate over every element),
            the hardware-ceiling control: what the box's memory bus can
            scale with no joins, windows, or Python in the way

The protocol lives HERE because it previously existed as two inline
copies that drifted (the bench copy lost the stray-stdout guard; the
scaling copy kept a fixed warmup after the bench copy went adaptive).
Both measurement surfaces now import this module, so a protocol fix
lands once and the "same protocol" comparability claim in BASELINE.md
is true by construction.
"""
from __future__ import annotations

import json
import os
import queue
import subprocess
import sys
import tempfile
import threading
import time

CHILD_SOURCE = r'''
import json, sys, time
cores = int(sys.argv[1]); data = sys.argv[2]; rows = int(sys.argv[3])
gen = sys.argv[4] == "gen"; job = sys.argv[5]; repo = sys.argv[6]
warm_max = int(sys.argv[7])
sys.path.insert(0, repo)
from teleharvest_spark.session import get_spark
from teleharvest_spark.config import CheckSuite
from teleharvest_spark import datagen
from teleharvest_spark.plans import suite as suite_plan

spark = get_spark(app_name=f"warmed_{job}_{cores}", master=f"local[{cores}]",
                  shuffle_partitions=max(cores, 8))
check = CheckSuite(banned_tokens=datagen.BANNED_IDS,
                   allowed_sources=tuple(datagen.SOURCES))
if gen:
    datagen.generate_sequences(spark, rows, check).write.mode("overwrite").parquet(data)
df = spark.read.parquet(data)

if job == "scan":
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

# adaptive warmup (see module docstring in teleharvest_spark/benchproto.py)
prev = one_run()
for _ in range(warm_max - 1):
    cur = one_run()
    if abs(cur - prev) / max(prev, 1e-9) < 0.15:
        break
    prev = cur
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() != "run":
        break
    print(json.dumps({"wall": round(one_run(), 3)}), flush=True)
'''


class WarmedChild:
    """A warmed measurement child; blocks in the constructor until the
    child signals READY (or the warmup deadline expires)."""

    def __init__(self, cores: int, data: str, rows: int, *, job: str = "suite",
                 gen: bool = False, warm_max: int = 5,
                 warm_deadline: float | None = None, repo: str | None = None):
        if job not in ("suite", "scan"):
            raise ValueError(f"job must be 'suite' or 'scan', got {job!r}")
        repo = repo or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # stderr to a temp file, not DEVNULL: when the child dies
        # during construction (import error, OOM, bad path) the
        # traceback is the only diagnosis — its tail rides the raised
        # error instead of vanishing
        self._err = tempfile.TemporaryFile(mode="w+t")
        self._p = subprocess.Popen(
            [sys.executable, "-c", CHILD_SOURCE, str(cores), data, str(rows),
             "gen" if gen else "read", job, repo, str(warm_max)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=self._err, text=True, cwd=repo,
        )
        self.pid = self._p.pid
        self._lines: queue.Queue[str | None] = queue.Queue()
        threading.Thread(target=self._pump, daemon=True).start()
        try:
            expires = (
                None if warm_deadline is None
                else time.monotonic() + warm_deadline
            )
            while self._next_line(expires) != "READY":
                pass
        except Exception:
            self.kill()  # no orphan JVM when warmup fails/overruns
            raise

    def _pump(self) -> None:
        for ln in self._p.stdout:
            self._lines.put(ln.strip())
        self._lines.put(None)

    def _stderr_tail(self, n: int = 12) -> str:
        try:
            self._err.seek(0)
            lines = self._err.read().strip().splitlines()
            return "\n".join(lines[-n:])
        except Exception:
            return ""

    def _next_line(self, expires: float | None) -> str:
        """Next child stdout line before the ABSOLUTE ``expires``
        instant (time.monotonic domain).

        Callers anchor the budget once per logical wait and pass the
        same instant for every line — a per-line queue timeout would
        restart the clock on each stray stdout line (Ivy progress, GC
        noise, a stack trace printed line-by-line), so a wedged child
        that keeps talking would never trip the caller's computed
        warmup/run budget."""
        per_get = (
            None if expires is None else max(0.0, expires - time.monotonic())
        )
        try:
            ln = self._lines.get(timeout=per_get)
        except queue.Empty:
            raise TimeoutError(
                "warmed child produced no usable line within its "
                f"deadline; stderr tail:\n{self._stderr_tail()}"
            ) from None
        if ln is None:
            raise RuntimeError(
                "warmed child exited early; stderr tail:\n"
                + self._stderr_tail()
            )
        return ln

    def run(self, deadline: float | None = None) -> float:
        """One timed pass; returns the child-measured wall seconds.
        Skips any stray JVM stdout between samples (Ivy lines, stack
        traces) — only a JSON object line is a sample. ``deadline``
        bounds the WHOLE pass, stray lines included."""
        self._p.stdin.write("run\n")
        self._p.stdin.flush()
        expires = None if deadline is None else time.monotonic() + deadline
        while True:
            ln = self._next_line(expires)
            if ln.startswith("{"):
                return json.loads(ln)["wall"]

    def close(self) -> None:
        """Shut the child down; a lingering JVM is killed and reaped
        rather than raising (a shutdown hiccup must never discard the
        samples already collected)."""
        try:
            self._p.stdin.close()
            self._p.wait(timeout=60)
        except Exception:
            self._p.kill()
            try:
                self._p.wait(timeout=5)
            except Exception:
                pass
        self._close_err()

    def kill(self) -> None:
        self._p.kill()
        try:
            self._p.wait(timeout=5)
        except Exception:
            pass
        self._close_err()

    def _close_err(self) -> None:
        try:
            self._err.close()
        except Exception:
            pass
