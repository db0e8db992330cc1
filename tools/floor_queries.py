"""Per-query warm-floor measurement: best-of-N reps in ONE JVM.

VERDICT r4 "Missing #1": BENCH_r04's `substring_dup_clusters` (+38%) and
`near_dup_clusters` (+23%) were measured once each in a documented loud
host phase; the pipeline *floor* was shown unchanged but those two rows'
own floors were never measured. This tool separates host weather from
real regression by the reference's own standard — back-to-back
differential reps (run_memory_comparison.sh:21-27): same JVM, same
session, N timed reps per query after an untimed warmup, report every
rep plus the min (the floor — host noise only ever adds time).

Usage:
    python tools/floor_queries.py --queries substring_dup_clusters,near_dup_clusters \
        --reps 3 --cpus 32 [--sf-dir /root/testdata/sf0.1]

Prints one JSON line: {"floors": {q: min_sec}, "reps": {q: [sec,...]}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True,
                    help="comma-separated __spark_entry__.queries() names")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    names = args.queries.split(",")

    import __spark_entry__ as entrymod
    from genome_deduplication_spark.session import get_spark

    spark = get_spark(
        app_name="floor_queries",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 8),
    )
    # same untimed warmup as bench.py: codegen, python workers, footers
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{args.sf_dir}/documents.parquet").count()
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()

    qs = entrymod.queries()
    reps: dict[str, list[float]] = {n: [] for n in names}
    # interleave queries across reps (A B A B A B), not rep-blocks per
    # query, so a host-weather burst cannot bias one query's whole set
    for r in range(args.reps):
        for n in names:
            t0 = time.time()
            qs[n](spark, args.sf_dir).count()
            reps[n].append(round(time.time() - t0, 3))
    print(json.dumps({
        "floors": {n: min(v) for n, v in reps.items()},
        "reps": reps,
        "cpus": args.cpus,
        "sf": args.sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
