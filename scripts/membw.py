"""Memory-bandwidth scaling probe — scaling-gate evidence.

Measures aggregate read+write stream bandwidth at 1/4/8/16/32 processes
(taskset-pinned by the caller if desired).  On a single box the memory
subsystem is SHARED: if aggregate bandwidth at 4N cores is only ~2x the
N-core figure, then ANY bandwidth-bound workload (shuffles, Arrow,
parquet decode, string processing) is hardware-capped at efficiency
~0.5 between N and 4N local cores — independent of the engine.  A real
4N-EXECUTOR cluster adds memory controllers per node, so the cap is an
artifact of single-box emulation, not of the plan.  Usage:

    python scripts/membw.py            # prints one line per level
"""

import multiprocessing as mp
import time

import numpy as np


def stream(_):
    a = np.zeros(200_000_000 // 8, dtype=np.float64)  # 200 MB working set
    t0 = time.time()
    n = 0
    while time.time() - t0 < 3.0:
        a += 1.0  # read + write stream
        n += 1
    return n * a.nbytes * 2 / 1e9


def main():
    out = {}
    for procs in (1, 4, 8, 16, 32):
        with mp.Pool(procs) as p:
            res = p.map(stream, range(procs))
        agg = sum(res) / 3.0
        out[procs] = agg
        print(
            f"{procs:>2} procs: aggregate {agg:6.1f} GB/s "
            f"({agg / procs:5.1f} GB/s per proc)"
        )
    for n, n4 in ((4, 16), (8, 32)):
        print(
            f"bandwidth ceiling efficiency {n}->{n4} cores: "
            f"{out[n4] / (4 * out[n]):.3f}"
        )


if __name__ == "__main__":
    main()
