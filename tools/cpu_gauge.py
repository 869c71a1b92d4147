"""Host-contention gauge for this time-shared sandbox.

The hypervisor intermittently throttles sustained multi-core bursts
(20-40 % steal observed; identical Spark jobs measured 5.5 s vs 41.7 s an
hour apart — BENCH.md §2).  Before trusting any performance number, measure
relative per-core speed under full fan-out:

    gauge = sum(iterations of 16 concurrent 1 s burns) / (16 × solo burn)

~1.0 → quiet host, numbers are trustworthy; ≤0.9 → a steal window is open
and multi-core measurements will understate the engine.  bench_scaling.py
runs should only be recorded when the gauge holds ≥0.9 before AND after.
"""

import multiprocessing as mp
import sys
import time


def burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 1.0:
        x += 1
    return x


def gauge(procs: int = 16) -> float:
    with mp.Pool(procs) as p:
        multi = p.map(burn, range(procs))
    solo = burn(0)
    return round(sum(multi) / (procs * solo), 2)


if __name__ == "__main__":
    procs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(gauge(procs))
