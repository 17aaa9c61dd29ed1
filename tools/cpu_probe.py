"""Machine-health probe for bench triage (BENCH.md r6/r7 discipline):
measures single-process spin throughput, then N concurrent processes,
and reports the parallel slowdown plus a 10 s /proc/stat steal/idle
sample. A healthy idle box shows slowdown ~1.0 and steal < 1%; a
contended/throttled host window shows slowdown >> 1 or a depressed
single-proc rate — either voids absolute wall-clock comparisons against
artifacts captured on a healthy window (ratios within one window, e.g.
scaling efficiency, remain valid).

Usage: python tools/cpu_probe.py [n_procs] [out.json]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

ITERS = 5_000_000


def _spin(_=None) -> float:
    t0 = time.time()
    s = 0
    for i in range(ITERS):
        s += i * i
    return time.time() - t0


def _stat_sample(seconds: float = 10.0) -> dict:
    def snap():
        with open("/proc/stat") as fh:
            return list(map(int, fh.readline().split()[1:]))

    a = snap()
    time.sleep(seconds)
    b = snap()
    d = [y - x for x, y in zip(a, b)]
    tot = max(sum(d), 1)
    names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    return {n: round(100 * v / tot, 2) for n, v in zip(names, d[: len(names)])}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    single = min(_spin() for _ in range(3))
    with mp.Pool(n) as pool:
        walls = pool.map(_spin, range(n))
    par = sum(walls) / len(walls)
    out = {
        "n_procs": n,
        "single_proc_s": round(single, 3),
        "parallel_mean_s": round(par, 3),
        "parallel_slowdown": round(par / single, 2),
        "stat_10s_pct": _stat_sample(),
    }
    print(json.dumps(out))
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
