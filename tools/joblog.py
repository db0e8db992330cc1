"""Summarize a Spark event log into a per-job timeline.

Usage: python tools/joblog.py /root/sparklogs/<app-id> [--min-sec 0.05]

Prints one line per job: start offset, duration, #tasks, task-time sum,
and the job description (bench queries are bracketed by query-name
markers only implicitly; stage:<name> descriptions come from
plans/pipeline.py). This is how we attribute one-shot query seconds to
planning gaps (idle time between jobs) vs executed jobs.
"""

from __future__ import annotations

import io
import json
import os
import sys


def _lines(path):
    """Yield event-log lines from a file or a rolling-eventlog dir
    (zstd-compressed parts supported)."""
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path) if f.startswith("events_")
        )
        for p in parts:
            yield from _lines(os.path.join(path, p))
        return
    if path.endswith(".zstd"):
        import subprocess

        proc = subprocess.Popen(
            ["zstd", "-dc", path], stdout=subprocess.PIPE
        )
        yield from io.TextIOWrapper(proc.stdout, encoding="utf-8")
        proc.wait()
    else:
        yield from open(path)


def main() -> None:
    path = sys.argv[1]
    min_sec = 0.0
    if "--min-sec" in sys.argv:
        min_sec = float(sys.argv[sys.argv.index("--min-sec") + 1])
    jobs: dict[int, dict] = {}
    stage_tasks: dict[int, list] = {}
    stage_to_job: dict[int, int] = {}
    t0 = None
    for line in _lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerApplicationStart":
            t0 = ev["Timestamp"]
        elif e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "start": ev["Submission Time"],
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                ),
                "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                "ntasks": sum(
                    s["Number of Tasks"] for s in ev["Stage Infos"]
                ),
            }
            for s in ev["Stage Infos"]:
                stage_to_job[s["Stage ID"]] = jid
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = ev["Completion Time"]
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            info = ev.get("Task Info", {})
            dur = info.get("Finish Time", 0) - info.get("Launch Time", 0)
            stage_tasks.setdefault(sid, []).append(dur)
    if t0 is None:
        t0 = min(j["start"] for j in jobs.values())
    prev_end = t0
    total_gap = 0.0
    total_job = 0.0
    for jid in sorted(jobs):
        j = jobs[jid]
        end = j.get("end", j["start"])
        dur = (end - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0
        task_s = (
            sum(sum(stage_tasks.get(s, [])) for s in j["stages"]) / 1000.0
        )
        total_gap += max(gap, 0)
        total_job += dur
        if dur >= min_sec or gap >= min_sec:
            print(
                f"job {jid:4d}  +{(j['start'] - t0) / 1000.0:8.2f}s  "
                f"gap {gap:6.2f}s  dur {dur:7.2f}s  tasks {j['ntasks']:4d}  "
                f"task-s {task_s:8.2f}  {j['desc'][:80]}"
            )
        prev_end = max(prev_end, end)
    print(
        f"TOTAL job {total_job:.1f}s  gap(driver/planning) {total_gap:.1f}s"
    )
    if "--by-desc" in sys.argv:
        # rollup: wall span (first start -> last end), job time and task
        # time per job-description label; gaps INSIDE a label's span are
        # that label's driver/planning time
        by: dict[str, dict] = {}
        for jid in sorted(jobs):
            j = jobs[jid]
            d = j["desc"] or "(unlabeled)"
            end = j.get("end", j["start"])
            task_s = (
                sum(sum(stage_tasks.get(s, [])) for s in j["stages"]) / 1000.0
            )
            b = by.setdefault(
                d, {"n": 0, "dur": 0.0, "task": 0.0, "first": j["start"],
                    "last": end}
            )
            b["n"] += 1
            b["dur"] += (end - j["start"]) / 1000.0
            b["task"] += task_s
            b["first"] = min(b["first"], j["start"])
            b["last"] = max(b["last"], end)
        print(f"{'label':44s} {'jobs':>4} {'span':>8} {'jobdur':>8} "
              f"{'task-s':>8}")
        for d, b in sorted(by.items(), key=lambda kv: kv[1]["first"]):
            span = (b["last"] - b["first"]) / 1000.0
            print(
                f"{d[:44]:44s} {b['n']:4d} {span:8.2f} {b['dur']:8.2f} "
                f"{b['task']:8.2f}"
            )


if __name__ == "__main__":
    main()
