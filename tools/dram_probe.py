"""Shared-host bandwidth qualifier for scaling measurements (BENCH.md
round-3 protocol): before trusting any N->4N efficiency pair on this VM,
measure whether the box is in a good-bandwidth window.

Two probes, ~30s total:

* CPU probe  — P pure-spin processes (no memory traffic). Scaling here
  is ~1.0 unless a cotenant is stealing cores.
* DRAM probe — per-process numpy sums over a 200 MB float64 array
  (streaming reads). Reports single-process GB/s, aggregate GB/s at P
  processes, and streaming efficiency = aggregate / (P * single).

Measured correlation (BENCH.md): probe streaming efficiency 0.36 ->
engine N->4N pairs 0.63-0.67; probe 0.85 -> pairs 0.86-0.90. Only
measure pairs when the DRAM probe reports >= ~0.7 streaming efficiency
(and the CPU probe stays ~1.0); otherwise the pair measures the
cotenants, not the plan.

Usage: python tools/dram_probe.py [P]   (default P=4)
Prints one JSON line; exit code 0 if the window is good (>= 0.7), 1
otherwise, so scripts can gate on it.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

ARR_MB = 200
SPIN_SECS = 3.0
STREAM_SECS = 6.0


def _spin(out, i):
    t0 = time.time()
    n = 0
    while time.time() - t0 < SPIN_SECS:
        n += 1
        _ = n * n ^ 0x5DEECE66D
    out[i] = n


def _stream(out, i):
    a = np.ones(ARR_MB * 1024 * 1024 // 8, dtype=np.float64)
    a.sum()  # fault pages in before timing
    t0 = time.time()
    passes = 0
    while time.time() - t0 < STREAM_SECS:
        a.sum()
        passes += 1
    out[i] = passes * ARR_MB / 1024.0 / (time.time() - t0)  # GB/s


def _run(target, procs):
    with mp.Manager() as m:
        out = m.dict()
        ps = [mp.Process(target=target, args=(out, i)) for i in range(procs)]
        for p in ps:
            p.start()
        for p in ps:
            p.join()
        return [out[i] for i in range(procs)]


def main() -> None:
    procs = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    spin1 = _run(_spin, 1)[0]
    spinP = _run(_spin, procs)
    cpu_eff = (sum(spinP) / procs) / spin1

    gbs1 = _run(_stream, 1)[0]
    gbsP = _run(_stream, procs)
    agg = sum(gbsP)
    stream_eff = agg / (procs * gbs1)

    good = stream_eff >= 0.7 and cpu_eff >= 0.9
    print(
        json.dumps(
            {
                "procs": procs,
                "cpu_efficiency": round(cpu_eff, 3),
                "dram_single_gbs": round(gbs1, 1),
                "dram_aggregate_gbs": round(agg, 1),
                "dram_streaming_efficiency": round(stream_eff, 3),
                "good_window": good,
            }
        )
    )
    sys.exit(0 if good else 1)


if __name__ == "__main__":
    main()
