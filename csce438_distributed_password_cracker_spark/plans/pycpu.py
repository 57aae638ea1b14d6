"""Python-side CPU accounting for the bench (BASELINE.md §C.18).

The §C.13 weather-immune basis reads ``executorCpuTime`` — JVM task
threads ONLY.  Arrow kernels (``mapInPandas`` / ``applyInPandas`` /
``pandas_udf``) burn their CPU in pyspark **worker processes**, and
driver-side folds (the MMR greedy loop, model-table collects) burn it
in the **driver's Python process**; neither shows up in the JVM
column.  That is the one hole through which a plan regression could
hide as a CPU *improvement*: move work JVM→Python and
``total_cpu_median`` goes down (VERDICT r9, missing #1).  This module
closes it with a second column measured from the OS.

Mechanics (Linux, no third-party deps — psutil is not in this
container): a snapshot sums, in clock ticks from ``/proc/<pid>/stat``,

- the driver's own ``utime+stime`` (via ``os.times()`` — NOT cutime:
  the driver's reaped children include the JVM itself, which is the
  OTHER column's job);
- ``utime+stime+cutime+cstime`` of every **descendant** process whose
  cmdline contains ``pyspark.daemon`` — the daemon and the workers it
  forks share that cmdline (fork without exec); a worker the daemon
  has already reaped lives on in the daemon's ``cutime``;
- ``cutime+cstime`` of every **other** descendant (the JVM): a daemon
  that died — ``spark.python.worker.reuse=false``, idle reaping,
  executor churn — is reaped by the JVM, so its lifetime CPU lands
  there.  Children's OWN utime is never added for non-daemon
  descendants (the JVM's own CPU is the benchmetrics column).

Descendant-scoping (walk the ``/proc`` ppid graph from ``os.getpid()``)
is what keeps the number honest on a shared box: another session's
pyspark daemons are never ours.

Accuracy caveats, stated where the numbers land (§C.18):

- Attribution is by SAMPLING WINDOW, not by task: under the bench's
  serial protocol each query's delta is cleanly its own, but daemon
  startup (interpreter fork, numpy/pandas import) attributes to the
  first Arrow query that triggers it — warm the daemons before timing
  (bench.py does).
- JVM ``cutime`` also folds in any non-Python subprocess Hadoop shells
  out to (rare on Linux with NativeIO; milliseconds when it happens).
- CLK_TCK resolution is 10 ms per reading; per-query deltas are exact
  to ~2 ticks.

Non-Linux fallback: no ``/proc`` ⇒ driver-only accounting (documented
by ``scope="driver-only"`` in :meth:`snapshot_detail`).

Reference provenance: the reference's per-worker wall/CPU bookkeeping
is worker.c's per-task timing printfs; this is the Spark-side
equivalent measured at the process level.
"""

from __future__ import annotations

import os

_PROC = "/proc"


def _clk_tck() -> float:
    try:
        return float(os.sysconf("SC_CLK_TCK"))
    except (ValueError, OSError, AttributeError):  # pragma: no cover
        return 100.0


def _read_stat(pid: int) -> tuple[int, float, float, float, float] | None:
    """(ppid, utime, stime, cutime, cstime) in seconds, or None if the
    process vanished mid-read.  comm (field 2) may contain spaces and
    parentheses — parse from the LAST ')'."""
    try:
        with open(f"{_PROC}/{pid}/stat", "rb") as f:
            raw = f.read().decode("ascii", "replace")
    except OSError:
        return None
    rp = raw.rfind(")")
    if rp < 0:
        return None
    fields = raw[rp + 1 :].split()
    # after ')' (fields 0-indexed): [0]=state [1]=ppid ... [11]=utime
    # [12]=stime [13]=cutime [14]=cstime  (man proc(5), 1-indexed 14-17)
    if len(fields) < 15:
        return None
    tck = _clk_tck()
    try:
        return (
            int(fields[1]),
            int(fields[11]) / tck,
            int(fields[12]) / tck,
            int(fields[13]) / tck,
            int(fields[14]) / tck,
        )
    except ValueError:
        return None


def _cmdline(pid: int) -> bytes:
    try:
        with open(f"{_PROC}/{pid}/cmdline", "rb") as f:
            return f.read()
    except OSError:
        return b""


def _comm(pid: int) -> bytes:
    try:
        with open(f"{_PROC}/{pid}/comm", "rb") as f:
            return f.read().strip()
    except OSError:
        return b""


def _is_daemon(pid: int) -> bool:
    """A pyspark daemon/worker, by cmdline — falling back to comm for
    zombies: a dead-but-unreaped daemon has an EMPTY /proc/<pid>/cmdline
    but keeps its comm ('python3'), and misclassifying it as non-daemon
    would drop its own utime from the workers column for that snapshot
    (transient undercount hidden by the delta clamp — ADVICE r10)."""
    cl = _cmdline(pid)
    if cl:
        return b"pyspark.daemon" in cl
    return _comm(pid).startswith(b"python")


def _scan() -> dict[int, tuple[int, float, float, float, float]]:
    """One pass over /proc: pid -> parsed stat for every live process."""
    out: dict[int, tuple[int, float, float, float, float]] = {}
    try:
        names = os.listdir(_PROC)
    except OSError:  # non-Linux
        return out
    for name in names:
        if not name.isdigit():
            continue
        st = _read_stat(int(name))
        if st is not None:
            out[int(name)] = st
    return out


class PythonCpuTracker:
    """Cumulative Python-side CPU (seconds) of THIS engine process
    tree.  Call :meth:`delta` after each timed unit of work, exactly
    like ``StageMetricsTracker.delta`` — construction takes the
    baseline snapshot."""

    def __init__(self) -> None:
        self._last_pair = self._pair()

    def snapshot_detail(self) -> dict[str, float | str]:
        """Component breakdown of the cumulative total: ``driver``
        (self utime+stime), ``workers`` (live pyspark.daemon trees),
        ``reaped`` (cutime of non-daemon descendants — daemons the JVM
        already buried), plus ``scope`` ("tree" or "driver-only" when
        /proc is unavailable)."""
        t = os.times()
        driver = t.user + t.system
        procs = _scan()
        if not procs:
            return {
                "driver": round(driver, 3),
                "workers": 0.0,
                "reaped": 0.0,
                "scope": "driver-only",
            }
        me = os.getpid()
        children: dict[int, list[int]] = {}
        for pid, st in procs.items():
            children.setdefault(st[0], []).append(pid)
        # descendants of this process (BFS over the live ppid graph)
        desc: list[int] = []
        stack = [me]
        while stack:
            for c in children.get(stack.pop(), ()):
                desc.append(c)
                stack.append(c)
        workers = reaped = 0.0
        for pid in desc:
            ppid, ut, stt, cut, cst = procs[pid]
            if _is_daemon(pid):
                workers += ut + stt + cut + cst
            else:
                reaped += cut + cst
        return {
            "driver": round(driver, 3),
            "workers": round(workers, 3),
            "reaped": round(reaped, 3),
            "scope": "tree",
        }

    def _pair(self) -> tuple[float, float]:
        """(driver, workers) cumulative split: `workers` folds the live
        daemon trees AND the JVM-reaped daemon cutime together — both
        are worker-process CPU; `driver` is this process alone."""
        d = self.snapshot_detail()
        return (
            float(d["driver"]),
            float(d["workers"]) + float(d["reaped"]),  # type: ignore[arg-type]
        )

    def snapshot(self) -> float:
        drv, wrk = self._pair()
        return round(drv + wrk, 3)

    def delta_detail(self) -> dict[str, float]:
        """Per-component Python CPU seconds since the previous
        delta()/delta_detail()/construction: ``driver`` (this process —
        greedy folds like MMR, manifest collects, the bm25 probe's
        XXH64 pruning) vs ``workers`` (pyspark worker processes — Arrow
        kernel compute).  Components clamp at 0 independently: the only
        shrink path is the ≤1-tick race between a daemon's death and
        the JVM folding it into cutime, never real negative work."""
        now = self._pair()
        prev = self._last_pair
        self._last_pair = now
        return {
            "driver": round(max(0.0, now[0] - prev[0]), 3),
            "workers": round(max(0.0, now[1] - prev[1]), 3),
        }

    def delta(self) -> float:
        """Total Python CPU seconds since the previous delta()/
        construction (driver + workers)."""
        d = self.delta_detail()
        return round(d["driver"] + d["workers"], 3)
