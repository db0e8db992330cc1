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

    import shutil

    evdir = "/tmp/sparkevents"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

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

    rep_windows: list[tuple[float, float]] = []
    for rep in range(args.reps):
        t0 = time.time()
        sc.setJobDescription(f"pipeline-rep{rep}")
        tables = dedup_pipeline(pages, DedupConfig(), run_dir=None)
        sc.setJobDescription(f"final-count-rep{rep}")
        nc = tables["clusters"].count()
        total = time.time() - t0
        # epoch-ms window for event-log segmentation: per-rep job
        # attribution by DESCRIPTION misses every stage:<name>-tagged job
        # (pipeline.described() overrides the rep tag), which silently
        # dropped the signature/verify/cluster stage jobs from the per-rep
        # in-job union and misattributed them as driver gap / shrank the
        # span. Wall-clock windows catch every job of the rep.
        rep_windows.append((t0 * 1000.0, time.time() * 1000.0))
        print(f"rep{rep}: total={total:.2f}s clusters={nc}")

    spark.stop()
    time.sleep(1)

    # parse the event log: job timeline. Spark 4 writes a rolling DIRECTORY
    # eventlog_v2_<app>/events_*.zstd — the decompress helper is shared
    # with the other event-log profiler so format fixes land once.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_stage_cpu import decompress_zstd

    ev_files = []
    for entry in os.listdir(evdir):
        p = os.path.join(evdir, entry)
        if os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                if "events" in f:
                    src = os.path.join(p, f)
                    if f.endswith(".zstd"):
                        dst = "/tmp/" + f.replace(".zstd", ".json")
                        decompress_zstd(src, dst)
                        ev_files.append(dst)
                    else:
                        ev_files.append(src)
        else:
            ev_files.append(p)
    jobs = []
    execs = {}
    for path in ev_files:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event", "")
                if kind == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    jobs.append(
                        {
                            "id": ev["Job ID"],
                            "start": ev["Submission Time"],
                            "desc": props.get("spark.job.description", ""),
                            "eid": props.get("spark.sql.execution.root.id")
                            or props.get("spark.sql.execution.id"),
                        }
                    )
                elif kind == "SparkListenerJobEnd":
                    for j in jobs:
                        if j["id"] == ev["Job ID"]:
                            j["end"] = ev["Completion Time"]
                elif kind.endswith("SQLExecutionStart"):
                    execs[ev["executionId"]] = {
                        "start": ev.get("time"), "end": None,
                    }
                elif kind.endswith("SQLExecutionEnd"):
                    if ev["executionId"] in execs:
                        execs[ev["executionId"]]["end"] = ev.get("time")
    jobs = [j for j in jobs if "end" in j]
    jobs.sort(key=lambda j: j["start"])

    # per-rep breakdown: per-SQL-execution wall time (the per-action view)
    # plus the raw job list for anything unattributed
    for rep in range(args.reps):
        tag = f"rep{rep}"
        w0, w1 = rep_windows[rep]
        rj = [j for j in jobs if j["start"] >= w0 and j["end"] <= w1]
        if not rj:
            continue
        span = (w1 - w0) / 1000.0
        # driver-side fixed cost = span minus the union of job intervals
        # (time with NO job running: Catalyst planning, py4j round-trips,
        # checkpoint bookkeeping) — the Amdahl intercept the scaling
        # campaigns measure
        ivals = sorted((j["start"], j["end"]) for j in rj)
        covered = 0
        cur_s, cur_e = ivals[0]
        for s, e in ivals[1:]:
            if s > cur_e:
                covered += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
        gap = span - covered / 1000.0
        print(
            f"\n== {tag}: {len(rj)} jobs, span={span:.2f}s, "
            f"in-job(union)={covered / 1000.0:.2f}s, driver-gap={gap:.2f}s"
        )
        eids = sorted(
            {int(j["eid"]) for j in rj if j["eid"] is not None}
        )
        for eid in eids:
            e = execs.get(eid, {})
            dur = (
                (e["end"] - e["start"]) / 1000.0
                if e.get("end") and e.get("start")
                else None
            )
            ej = [j for j in rj if j["eid"] is not None and int(j["eid"]) == eid]
            jdur = sum(j["end"] - j["start"] for j in ej) / 1000.0
            print(
                f"  exec {eid:>3}: wall={dur if dur is None else round(dur, 2)}s"
                f"  jobs={len(ej)} (in-job {jdur:.2f}s)  {ej[0]['desc'][:40]}"
            )
        big = sorted(rj, key=lambda j: j["start"] - j["end"])[:8]
        print("  biggest jobs:")
        for j in big:
            print(
                f"    job {j['id']:>4} {(j['end'] - j['start']) / 1000.0:8.2f}s"
                f"  exec={j['eid']}"
            )


if __name__ == "__main__":
    main()
