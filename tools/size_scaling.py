"""Data-size scaling: per-doc cost at 160k vs 640k docs, same core count.

The north_rule's scaling criterion is evidenced primarily by the
parallelism-level campaigns (bench_scaling.py / quiet_pairs.py). This tool
adds the complementary axis — corpus-size scaling at a FIXED level — which
has one decisive property on this weather-prone host: both runs of a pair
execute back-to-back in the SAME JVM at the SAME parallelism, so uniform
host degradation taxes numerator and denominator equally and cancels in
the ratio. (The 2->8 comparison does not have this property: hypervisor
steal taxes the high level asymmetrically — BENCH.md round-5 campaign 2.)

What it shows: if per-doc pipeline cost is flat (or falls) from 160k to
640k docs, the driver fixed cost is amortizing and there is no
super-linear stage (no all-pairs blowup, no skew collapse) hiding between
the sizes — i.e. the measured 0.99 parallel efficiency at 160k is not an
artifact of the corpus being small.

Schedule: S L S L (small, large, small, large) — adjacent (S, L) pairs
give drift-bracketed ratios; the median over pairs is reported. Corpus
builds are untimed. A 1 Hz single-core ticker (bench_scaling.TICKER_SNIPPET)
and /proc/stat busy/steal are recorded per run for honesty.

Usage: python tools/size_scaling.py [--small 160000] [--large 640000]
         [--cpus 8] [--pairs 2]
Output: one SUMMARY json line + per-run lines; also appended to
/tmp/size_scaling_runs.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scaling import REPO_ROOT, TICKER_SNIPPET, ticker_mean  # noqa: E402


def proc_stat() -> dict:
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:9]]
    return {"busy": v[0] + v[1] + v[2] + v[5] + v[6], "steal": v[7]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=160000)
    ap.add_argument("--large", type=int, default=640000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--warm-docs", type=int, default=40000)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from genome_deduplication_spark.config import DedupConfig
    from genome_deduplication_spark.plans.pipeline import dedup_pipeline
    from genome_deduplication_spark.session import get_spark

    import importlib

    bench = importlib.import_module("bench")

    ticker_path = f"/tmp/hostspeed_size_{int(time.time())}.log"
    ticker = subprocess.Popen(
        [sys.executable, "-c", TICKER_SNIPPET, ticker_path, REPO_ROOT],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    hz = os.sysconf("SC_CLK_TCK")
    log_path = "/tmp/size_scaling_runs.jsonl"

    try:
        spark = get_spark(app_name=f"size-scale-{args.cpus}",
                          master=f"local[{args.cpus}]",
                          shuffle_partitions=max(args.cpus, 8))
        # untimed warmup (JVM codegen, python workers, Arrow paths)
        warm = bench._build_bench_corpus(spark, args.warm_docs)
        warm = warm.localCheckpoint(eager=True)
        warm.count()
        dedup_pipeline(warm, DedupConfig(), run_dir=None)["clusters"].count()

        corpora = {}
        for tag, n in (("S", args.small), ("L", args.large)):
            df = bench._build_bench_corpus(spark, n).localCheckpoint(eager=True)
            corpora[tag] = (df, df.count())

        runs = []
        for i in range(args.pairs):
            for tag in ("S", "L"):
                df, n = corpora[tag]
                s0, t0 = proc_stat(), time.time()
                tables = dedup_pipeline(df, DedupConfig(), run_dir=None)
                nc = tables["clusters"].count()
                t1, s1 = time.time(), proc_stat()
                dt = t1 - t0
                busy = (s1["busy"] - s0["busy"]) / hz
                hs = ticker_mean(ticker_path, t0, t1)
                r = {
                    "pair": i, "tag": tag, "docs": n, "sec": round(dt, 3),
                    "docs_per_sec": round(n / dt, 1), "clusters": nc,
                    "eff_cores": round(busy / dt, 2),
                    "cpu_steal_sec": round((s1["steal"] - s0["steal"]) / hz, 1),
                    "hostspeed": round(hs, 1) if hs else None,
                }
                runs.append(r)
                with open(log_path, "a") as f:
                    f.write(json.dumps(r) + "\n")
                print("RUN " + json.dumps(r), flush=True)
        spark.stop()
    finally:
        ticker.terminate()

    # per-doc cost ratio per adjacent (S, L) pair; 1.0 = flat per-doc cost,
    # >1.0 = the large corpus is CHEAPER per doc (fixed cost amortized)
    pair_effs = []
    hostspeed_drift = []
    for i in range(args.pairs):
        s = next(r for r in runs if r["pair"] == i and r["tag"] == "S")
        l = next(r for r in runs if r["pair"] == i and r["tag"] == "L")
        pair_effs.append(round(l["docs_per_sec"] / s["docs_per_sec"], 3))
        if s["hostspeed"] and l["hostspeed"]:
            hostspeed_drift.append(
                round(max(s["hostspeed"], l["hostspeed"])
                      / min(s["hostspeed"], l["hostspeed"]), 3))
    summary = {
        "small": args.small, "large": args.large, "cpus": args.cpus,
        "pair_per_doc_throughput_ratios_large_over_small": pair_effs,
        "size_scaling_efficiency_median": round(
            statistics.median(pair_effs), 3),
        "within_pair_hostspeed_drift": hostspeed_drift,
        "runs": runs,
    }
    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
