"""Interleaved A/B benchmark protocol, recorded as structured JSON.

This host shows heavy neighbor contention (r7: identical runs spread
1.5x), so the only trustworthy perf comparison is an INTERLEAVED
same-session A/B: run the competing queries alternately (A B A B ...)
so both sample the same steal profile, and record the host-speed canary
(bench.py's fixed single-threaded DuckDB workload) alongside. Until r8
these comparisons lived in commit messages; this tool appends one JSON
line per protocol run to AB_RUNS.jsonl (verdict task 2).

Usage:
    python scripts/ab_bench.py --label pagerank-r8 \
        --queries q_pagerank q_kcore_peel --reps 5 [--sf-dir DIR]

The line records per-rep wall times in EXECUTION ORDER per query, plus
min/median and the canary before/after — enough for a reader to check
both the verdict (min-vs-min) and the noise band (spread within reps).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import run_canary  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--label", required=True)
    ap.add_argument("--out", default=str(Path(__file__).parent.parent / "AB_RUNS.jsonl"))
    args = ap.parse_args()

    from healthcare_etl_spark.plans.registry import get_queries
    from healthcare_etl_spark.session import get_spark

    spark = get_spark(app_name="ab-bench", cpus=args.cpus)
    queries = get_queries()
    fns = {name: queries[name] for name in args.queries}

    canary_start = run_canary()
    # Warm-up absorbs one-time JVM/codegen costs, as in bench.py.
    for fn in fns.values():
        fn(spark, args.warm_dir).count()

    times: dict[str, list[float]] = {name: [] for name in fns}
    for _rep in range(args.reps):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            times[name].append(round(time.perf_counter() - t0, 4))
        # Free checkpoint/broadcast blocks between reps (bench.py lesson).
        import gc

        gc.collect()
        try:
            spark.catalog.clearCache()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception:
            pass
    canary_end = run_canary()

    record = {
        "label": args.label,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "sf_dir": args.sf_dir,
        "cpus": args.cpus,
        "reps": args.reps,
        "canary_start_s": canary_start,
        "canary_end_s": canary_end,
        "queries": {
            name: {
                "times": ts,
                "min": round(min(ts), 4),
                "median": round(statistics.median(ts), 4),
            }
            for name, ts in times.items()
        },
    }
    with open(args.out, "a") as fh:
        fh.write(json.dumps(record) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
