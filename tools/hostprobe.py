"""Host-window compute probe: quantifies how much CPU the (shared) box is
actually delivering RIGHT NOW, so bench records can be read in context.

Round-4 finding: identical code + input measured wall@16 91.3s, 122.4s,
131.8s and 148.7s across four invocations in one afternoon, while wall@4
moved only ~10% — the signature of co-tenant steal on the virtualized
host (invisible to vmstat's st column under firecracker): a 4-thread job
can always find free physical CPUs, a 16-thread job cannot.  This probe
runs a fixed float64 GEMM workload single-threaded and at N threads and
prints achieved GFLOP/s; run it before/after a bench to tag the window.

Usage: python tools/hostprobe.py [n_threads]
Prints one JSON line {"t1_gflops": ..., "tN_gflops": ..., "n": N,
"parallel_efficiency": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

# one BLAS thread per worker — without this each worker's GEMM spawns its
# own BLAS pool and the probe measures oversubscription, not the host
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import numpy as np  # noqa: E402

DIM = 512
REPS = 60
FLOPS_PER_GEMM = 2 * DIM**3


def _work(reps: int) -> float:
    a = np.random.default_rng(0).standard_normal((DIM, DIM))
    b = np.random.default_rng(1).standard_normal((DIM, DIM))
    t0 = time.time()
    for _ in range(reps):
        a @ b
    return time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    _work(5)  # warm-up
    w1 = _work(REPS)
    t1 = FLOPS_PER_GEMM * REPS / w1 / 1e9
    with ThreadPoolExecutor(max_workers=n) as ex:
        t0 = time.time()
        list(ex.map(_work, [REPS] * n))
        wn = time.time() - t0
    tn = FLOPS_PER_GEMM * REPS * n / wn / 1e9
    print(
        json.dumps(
            {
                "t1_gflops": round(t1, 2),
                "tN_gflops": round(tn, 2),
                "n": n,
                "parallel_efficiency": round(tn / (t1 * n), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
