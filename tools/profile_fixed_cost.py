"""Profile the pipeline's driver-side fixed cost (the in-sandbox scaling
residue — BENCH.md Amdahl analysis).

Runs the flagship pipeline on the bench corpus with the Spark event log
enabled, then reconstructs the job timeline: per-job wall time, inter-job
driver gaps, and a breakdown of which pipeline phase each job belongs to
(jobs are tagged via setJobDescription around the actions we control; the
CC fingerprint jobs are additionally counted by monkeypatch).

Usage: python tools/profile_fixed_cost.py [--docs 160000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=160000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    evdir = "/tmp/sparkevents"
    os.makedirs(evdir, exist_ok=True)
    for f in os.listdir(evdir):
        os.remove(os.path.join(evdir, f))

    from genome_deduplication_spark.config import DedupConfig
    from genome_deduplication_spark.plans.pipeline import dedup_pipeline
    from genome_deduplication_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_spark(
        app_name="profile-fixed",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 8),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
        },
    )
    import importlib

    bench = importlib.import_module("bench")
    pages = bench._build_bench_corpus(spark, args.docs).localCheckpoint(eager=True)
    n = pages.count()

    sc = spark.sparkContext

    for rep in range(args.reps):
        t0 = time.time()
        sc.setJobDescription(f"pipeline-rep{rep}")
        tables = dedup_pipeline(pages, DedupConfig(), run_dir=None)
        sc.setJobDescription(f"final-count-rep{rep}")
        nc = tables["clusters"].count()
        total = time.time() - t0
        print(f"rep{rep}: total={total:.2f}s clusters={nc}")

    spark.stop()
    time.sleep(1)

    # parse the event log: job timeline
    ev_files = [os.path.join(evdir, f) for f in os.listdir(evdir)]
    jobs = []
    for path in ev_files:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    jobs.append(
                        {
                            "id": ev["Job ID"],
                            "start": ev["Submission Time"],
                            "desc": ev.get("Properties", {}).get(
                                "spark.job.description", ""
                            ),
                        }
                    )
                elif ev.get("Event") == "SparkListenerJobEnd":
                    for j in jobs:
                        if j["id"] == ev["Job ID"]:
                            j["end"] = ev["Completion Time"]
    jobs = [j for j in jobs if "end" in j]
    jobs.sort(key=lambda j: j["start"])

    # per-rep breakdown: job wall time + gaps between consecutive jobs
    for rep in range(args.reps):
        tag = f"rep{rep}"
        rj = [j for j in jobs if tag in j["desc"]]
        if not rj:
            continue
        span = (rj[-1]["end"] - rj[0]["start"]) / 1000.0
        busy = sum(j["end"] - j["start"] for j in rj) / 1000.0
        gaps = []
        for a, b in zip(rj, rj[1:]):
            gaps.append((b["start"] - a["end"]) / 1000.0)
        print(
            f"\n== {tag}: {len(rj)} jobs, span={span:.2f}s, "
            f"in-job={busy:.2f}s, inter-job gaps={sum(gaps):.2f}s"
        )
        for i, j in enumerate(rj):
            dur = (j["end"] - j["start"]) / 1000.0
            gap = gaps[i - 1] if i > 0 else 0.0
            print(
                f"  job {j['id']:>4} {dur:8.2f}s  (gap before: {gap:6.2f}s)  "
                f"{j['desc'][:60]}"
            )


if __name__ == "__main__":
    main()
