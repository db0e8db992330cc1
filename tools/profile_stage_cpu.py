"""Per-stage CPU accounting for the flagship pipeline at one parallelism
level — the tool that diagnoses parallelism-dependent CPU inflation.

Round-5 motivation: at 640k docs the same pipeline burned 2897 CPU-s at
local[8] vs 1565 CPU-s at local[2] (machine-wide /proc/stat, same output),
so wall barely improved with 4x cores. Wall-clock profiling cannot locate
that; this tool aggregates SparkListenerTaskEnd task metrics per stage
(executor run/CPU time, JVM GC, spill, shuffle bytes, python-worker
wait) so two runs at different levels can be diffed stage-by-stage.

Usage: python tools/profile_stage_cpu.py --cpus 8 --docs 640000
Prints one PROFILE json line plus a human table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def proc_stat():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:9]]
    return {"busy": v[0] + v[1] + v[2] + v[5] + v[6], "steal": v[7]}


def decompress_zstd(src: str, dst: str) -> None:
    """unzstd if present, else pyarrow's bundled zstd codec (no system dep)."""
    if shutil.which("unzstd"):
        subprocess.run(["unzstd", "-f", src, "-o", dst],
                       check=True, capture_output=True)
        return
    import pyarrow as pa

    with pa.input_stream(src, compression="zstd") as ins, \
            open(dst, "wb") as out:
        shutil.copyfileobj(ins, out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--docs", type=int, default=640000)
    ap.add_argument("--parse-only", action="store_true",
                    help="skip the Spark run; parse the existing event dir")
    args = ap.parse_args()

    evdir = f"/tmp/sparkevents_cpu{args.cpus}"
    if args.parse_only:
        parse_and_report(evdir, args.cpus, args.docs, wall=0.0)
        return
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from genome_deduplication_spark.config import DedupConfig
    from genome_deduplication_spark.plans.pipeline import dedup_pipeline
    from genome_deduplication_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_spark(
        app_name=f"stagecpu-{args.cpus}",
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
    HZ = os.sysconf("SC_CLK_TCK")
    s0 = proc_stat()
    t0 = time.time()
    sc.setJobDescription("pipeline")
    tables = dedup_pipeline(pages, DedupConfig(), run_dir=None)
    sc.setJobDescription("final-count")
    nc = tables["clusters"].count()
    wall = time.time() - t0
    s1 = proc_stat()
    print(
        f"run: wall={wall:.1f}s clusters={nc} "
        f"machine_busy={(s1['busy'] - s0['busy']) / HZ:.1f}s "
        f"machine_steal={(s1['steal'] - s0['steal']) / HZ:.1f}s"
    )
    spark.stop()
    time.sleep(1)
    parse_and_report(evdir, args.cpus, n, wall)


def parse_and_report(evdir: str, cpus: int, n: int, wall: float) -> None:
    ev_files = []
    for entry in os.listdir(evdir):
        p = os.path.join(evdir, entry)
        if os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                if "events" in f:
                    src = os.path.join(p, f)
                    if f.endswith(".zstd"):
                        dst = os.path.join("/tmp", f"cpu{cpus}_"
                                           + f.replace(".zstd", ".json"))
                        decompress_zstd(src, dst)
                        ev_files.append(dst)
                    else:
                        ev_files.append(src)
        else:
            ev_files.append(p)

    # stage id -> accumulated task metrics; stage id -> name via
    # StageCompleted; only stages submitted after the pipeline started
    # (corpus build/warmup excluded by job-description tagging)
    stage_of_job = {}
    tagged_stages = set()
    stages = {}
    names = {}
    for path in ev_files:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event", "")
                if kind == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", "")
                    if (desc in ("pipeline", "final-count")
                            or desc.startswith("stage:")):
                        for sid in ev.get("Stage IDs", []):
                            tagged_stages.add(sid)
                    for sid in ev.get("Stage IDs", []):
                        stage_of_job[sid] = desc
                elif kind == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    names[si["Stage ID"]] = si.get("Stage Name", "")
                elif kind == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    tm = ev.get("Task Metrics") or {}
                    if not tm:
                        continue
                    agg = stages.setdefault(
                        sid,
                        {"tasks": 0, "run_s": 0.0, "cpu_s": 0.0, "gc_s": 0.0,
                         "spill_mb": 0.0, "sh_read_mb": 0.0, "sh_write_mb": 0.0,
                         "deser_s": 0.0, "result_ser_s": 0.0},
                    )
                    agg["tasks"] += 1
                    agg["run_s"] += tm.get("Executor Run Time", 0) / 1e3
                    agg["cpu_s"] += tm.get("Executor CPU Time", 0) / 1e9
                    agg["gc_s"] += tm.get("JVM GC Time", 0) / 1e3
                    agg["spill_mb"] += (
                        tm.get("Memory Bytes Spilled", 0)
                        + tm.get("Disk Bytes Spilled", 0)
                    ) / 1e6
                    agg["sh_read_mb"] += (
                        (tm.get("Shuffle Read Metrics") or {}).get(
                            "Local Bytes Read", 0)
                        + (tm.get("Shuffle Read Metrics") or {}).get(
                            "Remote Bytes Read", 0)
                    ) / 1e6
                    agg["sh_write_mb"] += (
                        (tm.get("Shuffle Write Metrics") or {}).get(
                            "Shuffle Bytes Written", 0)
                    ) / 1e6
                    agg["deser_s"] += tm.get(
                        "Executor Deserialize Time", 0) / 1e3
                    agg["result_ser_s"] += tm.get(
                        "Result Serialization Time", 0) / 1e3

    rows = []
    for sid in sorted(stages):
        if tagged_stages and sid not in tagged_stages:
            continue
        r = {"stage": sid, "name": names.get(sid, "?")[:60],
             "job_desc": stage_of_job.get(sid, "")}
        r.update({k: round(v, 2) for k, v in stages[sid].items()})
        rows.append(r)

    tot = {
        k: round(sum(r[k] for r in rows), 1)
        for k in ("run_s", "cpu_s", "gc_s", "spill_mb", "sh_read_mb",
                  "sh_write_mb", "deser_s")
    }
    print(f"\n== per-stage task metrics (local[{cpus}], {n} docs) ==")
    print(f"{'stage':>5} {'tasks':>5} {'run_s':>8} {'cpu_s':>8} {'gc_s':>6} "
          f"{'spill':>7} {'shR_mb':>8} {'shW_mb':>8}  name")
    for r in sorted(rows, key=lambda r: -r["run_s"])[:25]:
        print(f"{r['stage']:>5} {r['tasks']:>5} {r['run_s']:>8.1f} "
              f"{r['cpu_s']:>8.1f} {r['gc_s']:>6.1f} {r['spill_mb']:>7.0f} "
              f"{r['sh_read_mb']:>8.1f} {r['sh_write_mb']:>8.1f}  {r['name']}")
    print(f"totals: {tot}")

    # rollup by job description (pipeline stages tag their jobs
    # "stage:<name>" — plans/pipeline.py described())
    by_desc: dict = {}
    for r in rows:
        d = by_desc.setdefault(
            r["job_desc"] or "?",
            {"tasks": 0, "run_s": 0.0, "cpu_s": 0.0, "gc_s": 0.0,
             "sh_read_mb": 0.0, "sh_write_mb": 0.0},
        )
        for k in d:
            d[k] += r[k]
    print("\n== rollup by pipeline stage ==")
    print(f"{'desc':>22} {'tasks':>5} {'run_s':>8} {'cpu_s':>8} {'gc_s':>6} "
          f"{'shR_mb':>8} {'shW_mb':>8}")
    for desc, d in sorted(by_desc.items(), key=lambda kv: -kv[1]["run_s"]):
        print(f"{desc:>22} {d['tasks']:>5} {d['run_s']:>8.1f} "
              f"{d['cpu_s']:>8.1f} {d['gc_s']:>6.1f} "
              f"{d['sh_read_mb']:>8.1f} {d['sh_write_mb']:>8.1f}")

    print("PROFILE " + json.dumps({
        "cpus": cpus, "docs": n, "wall": round(wall, 1),
        "totals": tot,
        "by_stage": {k: {m: round(v, 2) for m, v in d.items()}
                     for k, d in by_desc.items()},
        "stages": rows}))


if __name__ == "__main__":
    main()
