"""Quiet-window-gated scaling pairs: the protocol that fits this host.

Campaigns 1-3 (BENCH.md round 5) established that this VM alternates
between quiet (~27-32k single-core iters/s) and degraded (~10-14k, with
0.7-2.25 cores of hypervisor steal) phases on 10-25 minute timescales. A
full 8-slot interleaved campaign at 640k docs needs ~70-120 min and
therefore always straddles degraded phases, which tax local[8]
asymmetrically and bias every estimator down.

This harness measures only inside quiet windows: it polls a single-core
burn probe, and when the host is quiet it immediately runs ONE
back-to-back A/B pair (order alternating AB/BA across pairs for
counterbalance) at the full corpus size — a pair fits inside one window.
Each run carries its own 1 Hz ticker mean and /proc/stat busy/steal; a
pair is VALID only if both runs stayed quiet by those instruments. The
reported efficiency is the median over valid pairs — same estimator
family as bench_scaling.py, but with the weather gate applied a priori
(per the round-3 lesson: "get lucky with a quiet window — check via a
canary first"), not post-hoc.

Usage: python tools/quiet_pairs.py [--docs 640000] [--pairs 3]
         [--quiet 15000] [--valid 13000] [--max-minutes 150]

Gate defaults re-baselined in round-5 session 9: the host's quiet
plateau shifted from 25-32k to ~15-20k iters/s mid-round; the old 19k
launch gate stopped opening at all.
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

from bench_scaling import (  # noqa: E402
    REPO_ROOT,
    TICKER_SNIPPET,
    probe_speed,
    run_jvm,
    ticker_mean,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=640000)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=3, help="valid pairs to collect")
    ap.add_argument("--quiet", type=float, default=15000,
                    help="launch gate: probe iters/s to start a pair")
    ap.add_argument("--valid", type=float, default=13000,
                    help="validity gate: per-run ticker mean must exceed this")
    ap.add_argument("--max-minutes", type=float, default=150)
    ap.add_argument("--warm-docs", type=int, default=40000)
    ap.add_argument("--poll-secs", type=float, default=90)
    args = ap.parse_args()

    deadline = time.time() + args.max_minutes * 60
    ratio = args.high / args.low
    pairs: list[dict] = []
    n_attempt = 0
    log_path = "/tmp/quiet_pairs_runs.jsonl"

    while time.time() < deadline:
        need = args.pairs - sum(p["valid"] for p in pairs)
        if need <= 0:
            break
        speed = probe_speed()
        print(f"[{time.strftime('%H:%M:%S')}] probe {speed:.0f} iters/s "
              f"(gate {args.quiet:.0f}); valid pairs "
              f"{sum(p['valid'] for p in pairs)}/{args.pairs}", flush=True)
        if speed < args.quiet:
            time.sleep(args.poll_secs)
            continue
        # campaign 3 launched on a single quiet reading and the window
        # closed within minutes — demand a CONFIRMED window: a second
        # probe 20s later must also clear the gate before burning ~20 min
        time.sleep(20)
        speed2 = probe_speed()
        print(f"[{time.strftime('%H:%M:%S')}] confirm probe {speed2:.0f} "
              f"iters/s", flush=True)
        if speed2 < args.quiet:
            time.sleep(args.poll_secs)
            continue

        order = ("A", "B") if n_attempt % 2 == 0 else ("B", "A")
        n_attempt += 1
        ticker_path = f"/tmp/hostspeed_pair_{int(time.time())}.log"
        ticker = subprocess.Popen(
            [sys.executable, "-c", TICKER_SNIPPET, ticker_path, REPO_ROOT],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        runs = {}
        try:
            for level in order:
                cpus = args.low if level == "A" else args.high
                res = run_jvm(cpus, args.docs, 1, args.warm_docs)
                r = res["runs"][0]
                hs = ticker_mean(ticker_path, r["t0"], r["t1"])
                r["hostspeed"] = round(hs, 1) if hs else None
                r["level"] = level
                r["cpus"] = cpus
                runs[level] = r
                print(f"  pair {n_attempt} [{level}] local[{cpus}]: "
                      f"{r['sec']}s ({r['docs_per_sec']}/s, hostspeed "
                      f"{r['hostspeed']}, eff_cores {r.get('eff_cores')}, "
                      f"steal {r.get('cpu_steal_sec')}s)", flush=True)
        finally:
            ticker.terminate()
        a, b = runs["A"], runs["B"]
        valid = bool(
            a["hostspeed"] and b["hostspeed"]
            and a["hostspeed"] >= args.valid and b["hostspeed"] >= args.valid
        )
        eff = round((b["docs_per_sec"] / a["docs_per_sec"]) / ratio, 3)
        pair = {
            "n": n_attempt, "order": "".join(order), "eff": eff,
            "valid": valid, "a": a, "b": b,
        }
        pairs.append(pair)
        with open(log_path, "a") as f:
            f.write(json.dumps(pair) + "\n")
        print(f"  pair {n_attempt}: eff {eff} "
              f"({'VALID' if valid else 'invalid — window closed mid-pair'})",
              flush=True)

    valid_effs = [p["eff"] for p in pairs if p["valid"]]
    all_effs = [p["eff"] for p in pairs]
    summary = {
        "docs": args.docs,
        "low": args.low,
        "high": args.high,
        "quiet_gate": args.quiet,
        "valid_gate": args.valid,
        "pairs_run": len(pairs),
        "pairs_valid": len(valid_effs),
        "valid_pair_effs": valid_effs,
        "all_pair_effs": all_effs,
        "scaling_efficiency_quiet_pairs_median": (
            round(statistics.median(valid_effs), 3) if valid_effs else None
        ),
        "scaling_efficiency_quiet_pairs_best": (
            round(max(valid_effs), 3) if valid_effs else None
        ),
    }
    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
