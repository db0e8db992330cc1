"""Two-parallelism-level scaling run (the in-sandbox evidence for the
north_rule's N -> 4N scaling-efficiency >= 0.8 criterion).

Runs the flagship dedup pipeline on the SAME bench corpus at local[N] and
local[4N] in separate JVMs (subprocesses, so executor thread pools are truly
independent), reports throughput at both and efficiency
(thr@4N / thr@N) / 4, and appends the table to BENCH.md.

Usage: python bench_scaling.py [--low 8] [--high 32] [--docs 40000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

RUN_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from genome_deduplication_spark.config import DedupConfig
from genome_deduplication_spark.plans.pipeline import dedup_pipeline
from genome_deduplication_spark.session import get_spark
from genome_deduplication_spark.sources.checkpoint import RunContext

cpus = int(sys.argv[1]); n_docs = int(sys.argv[2])
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
spark = get_spark(app_name=f"scale-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus, 8))
marks = {}
_orig_stage = RunContext.stage
def _timed(self, name, build):
    s0 = time.time(); out = _orig_stage(self, name, build)
    marks[name] = round(time.time() - s0, 1); return out
RunContext.stage = _timed
sys.path.insert(0, os.path.dirname("/root/repo/"))
import importlib
bench = importlib.import_module("bench")
pages = bench._build_bench_corpus(spark, n_docs).localCheckpoint(eager=True)
n = pages.count()
# repeats inside one JVM: first run pays python-worker warmup; report all
results = []
for rep in range(int(sys.argv[3])):
    marks.clear()
    t0 = time.time()
    tables = dedup_pipeline(pages, DedupConfig(), run_dir=None)
    nc = tables["clusters"].count()
    dt = time.time() - t0
    results.append({"sec": round(dt, 3), "docs_per_sec": round(n / dt, 1),
                    "clusters": nc})
best = max(r["docs_per_sec"] for r in results)
print("RESULT " + json.dumps({"cpus": cpus, "docs": n, "runs": results,
                              "best_docs_per_sec": best}))
spark.stop()
"""


def run_once(cpus: int, docs: int, repeats: int = 2) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUN_SNIPPET, str(cpus), str(docs), str(repeats)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        # 1.28M docs x 3 reps at local[8] runs ~70 min on the sandbox host
        timeout=14400,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"run at local[{cpus}] produced no RESULT; stderr tail: "
        + out.stderr[-2000:]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--docs", type=int, default=40000)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    # warm the corpus cache once so neither run pays generation cost
    run_low = run_once(args.low, args.docs, args.repeats)
    run_high = run_once(args.high, args.docs, args.repeats)
    ratio = args.high / args.low
    eff = (run_high["best_docs_per_sec"] / run_low["best_docs_per_sec"]) / ratio
    result = {
        "low": run_low,
        "high": run_high,
        "parallelism_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    def fmt(r):
        return ", ".join(f"{x['sec']}s ({x['docs_per_sec']}/s)" for x in r["runs"])

    md = (
        "\n## Scaling run (bench_scaling.py)\n\n"
        f"Same corpus ({run_low['docs']} docs, deterministic seed), same job, "
        f"two independent JVMs, best of {args.repeats} repeats per level:\n\n"
        "| parallelism | runs | best docs/sec |\n|---|---|---|\n"
        f"| local[{args.low}] | {fmt(run_low)} | {run_low['best_docs_per_sec']} |\n"
        f"| local[{args.high}] | {fmt(run_high)} | {run_high['best_docs_per_sec']} |\n\n"
        f"Scaling efficiency (thr@{args.high} / thr@{args.low}) / "
        f"{ratio:g} = **{eff:.3f}** "
        f"({'meets' if eff >= 0.8 else 'below'} the >= 0.8 target).\n"
    )
    with open("/root/repo/BENCH.md", "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
