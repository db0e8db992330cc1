"""Aggregate-memory-bandwidth ceiling probe for this host.

Round-5 discovery (BENCH.md): the pipeline's 2->8 scaling collapse at
640k docs was traced to the HOST, not the plan — per-stage task metrics
showed identical shuffle bytes but ~6x JVM CPU inflation at 8 threads.
This probe measures the mechanism directly: N concurrent processes each
stream a 128 MB numpy buffer copy (pure DRAM traffic, no Spark, no JVM)
and report per-process + aggregate GB/s.

On this VM the AGGREGATE is flat (~13-22 GB/s whether 1, 2, 8 or 16
workers), i.e. per-worker bandwidth falls ~3x from 2 to 8 streams — so
any sort/shuffle-heavy stage has a hardware scaling ceiling well below
1.0 once its working set leaves the LLC. The L2-resident compute probe
(bench_scaling.hardware_compute_eff) scales ~1.0 at the same worker
counts: the box caps bandwidth, not cycles. Complementary ceilings:
quote BOTH next to any measured pipeline efficiency.

On a real N -> 4N EXECUTOR scale-out, memory bandwidth scales with the
node count — this ceiling is a single-box artifact the north_rule's
multi-executor criterion does not have.

Usage: python tools/bandwidth_ceiling.py [workers ...]   (default 1 2 8 16)
"""

from __future__ import annotations

import json
import subprocess
import sys

SNIPPET = r"""
import numpy as np, time
n = 64 * 1024 * 1024
a = np.random.default_rng(0).integers(0, 255, n, dtype=np.uint8)
b = np.empty_like(a)
t0 = time.time(); it = 0
while time.time() - t0 < 6.0:
    np.copyto(b, a); np.copyto(a, b); it += 1
dt = time.time() - t0
print((2 * 2 * n * it / dt) / 1e9)  # GB/s of memory touched
"""


def measure(workers: int) -> dict:
    ps = [
        subprocess.Popen(
            [sys.executable, "-c", SNIPPET], stdout=subprocess.PIPE, text=True
        )
        for _ in range(workers)
    ]
    outs = [float(p.communicate()[0].strip().splitlines()[-1]) for p in ps]
    return {
        "workers": workers,
        "per_proc_gbs": round(sum(outs) / len(outs), 2),
        "aggregate_gbs": round(sum(outs), 2),
    }


def main() -> None:
    counts = [int(x) for x in sys.argv[1:]] or [1, 2, 8, 16]
    rows = [measure(w) for w in counts]
    for r in rows:
        print(
            f"workers={r['workers']:3d}  per-proc {r['per_proc_gbs']:6.2f} GB/s"
            f"  aggregate {r['aggregate_gbs']:7.2f} GB/s"
        )
    lo, hi = rows[0], rows[-1]
    eff = (hi["aggregate_gbs"] / lo["aggregate_gbs"]) / (
        hi["workers"] / lo["workers"]
    )
    print(
        "BANDWIDTH "
        + json.dumps({"rows": rows, f"eff_{lo['workers']}_to_{hi['workers']}":
                      round(eff, 3)})
    )


if __name__ == "__main__":
    main()
