"""Run the FROZEN bench.py bracketed by single-thread kernel readings so
every number carries window-quality evidence (VERDICT r5 #1: the r5 driver
regression had the uniform signature of host contention but no in-run
evidence either way). bench.py itself cannot carry the bracket (frozen for
driver measurement), so this wrapper is the builder-side protocol:

    kernel_before -> bench.py -> kernel_after

window_stable = kernel drift < 15% (same gate as tools/dedup_bench.py).
Prints one JSON line combining bench.py's output with the bracket.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo/tools")


def main() -> None:
    from scaling_bench import kernel_rate

    kernel_rate(5_000)  # warm-up, discarded
    k_before = kernel_rate()
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    k_after = kernel_rate()
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    bench = json.loads(lines[-1]) if lines else {"error": proc.stderr[-1000:]}
    drift = round(1.0 - min(k_before, k_after) / max(k_before, k_after), 3)
    out = {
        "bench": bench,
        "kernel_before_docs_per_sec": round(k_before, 1),
        "kernel_after_docs_per_sec": round(k_after, 1),
        "kernel_drift": drift,
        "window_stable": drift < 0.15,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
