"""Interleaved CODE A/B: same queries, two repo checkouts (e.g. HEAD vs
an earlier round's snapshot), recorded to AB_RUNS.jsonl.

``ab_bench.py`` interleaves two *queries* inside one session; this tool
adjudicates regressions on UNTOUCHED code (r8 verdict task 2), where the
competing variable is the checkout itself. Two Python processes cannot
import two versions of the package, so the interleaving unit is a short
subprocess: A(rep) B(rep) A(rep) B(rep) ... Each subprocess builds a
fresh local Spark session from its checkout (PYTHONPATH pinned), warms
the target queries once at sf0.001, then times each query once at the
target SF. Alternation means both checkouts sample the same neighbor-
steal profile; the DuckDB canary brackets every subprocess so a noisy
window is visible in the record.

Usage:
    python scripts/ab_code_bench.py --label r8-movers \
        --repo-a /root/repo --repo-b /tmp/r7_snapshot \
        --queries q_hybrid_search_rrf q_dsir_weights --alternations 5
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import run_canary  # noqa: E402

_CHILD = r"""
import json, sys, time
repo, sf_dir, warm_dir, cpus = sys.argv[1:5]
names = sys.argv[5:]
sys.path.insert(0, repo)
from healthcare_etl_spark.session import get_spark
from healthcare_etl_spark.plans.registry import get_queries

spark = get_spark(app_name="ab-code-bench", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")
queries = get_queries()
out = {}
for name in names:
    try:
        queries[name](spark, warm_dir).count()
    except Exception:
        pass
for name in names:
    t0 = time.perf_counter()
    try:
        queries[name](spark, sf_dir).count()
        out[name] = round(time.perf_counter() - t0, 4)
    except Exception as exc:
        out[name] = f"{type(exc).__name__}: {exc}"[:200]
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def _run_child(repo: str, sf_dir: str, warm_dir: str, cpus: str, names: list[str]) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env.setdefault("SPARK_SUBMIT_OPTS", "-Dspark.ui.showConsoleProgress=false")
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, repo, sf_dir, warm_dir, cpus, *names],
        capture_output=True,
        text=True,
        env=env,
        cwd=repo,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"child produced no ABRESULT (rc={proc.returncode}):\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo-a", required=True, help="variant A checkout (e.g. HEAD)")
    ap.add_argument("--repo-b", required=True, help="variant B checkout (e.g. r7)")
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--alternations", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--label", required=True)
    ap.add_argument("--out", default=str(Path(__file__).parent.parent / "AB_RUNS.jsonl"))
    args = ap.parse_args()

    times: dict[str, dict[str, list]] = {
        "a": {q: [] for q in args.queries},
        "b": {q: [] for q in args.queries},
    }
    canaries: list[list[float]] = [run_canary()]
    for _alt in range(args.alternations):
        for side, repo in (("a", args.repo_a), ("b", args.repo_b)):
            res = _run_child(repo, args.sf_dir, args.warm_dir, args.cpus, args.queries)
            for q in args.queries:
                times[side][q].append(res.get(q))
            canaries.append(run_canary())

    def _summ(vals: list) -> dict:
        nums = [v for v in vals if isinstance(v, (int, float))]
        if not nums:
            return {"min": None, "median": None}
        return {"min": round(min(nums), 4), "median": round(statistics.median(nums), 4)}

    record = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "label": args.label,
        "protocol": "interleaved-code-ab-subprocess",
        "repo_a": args.repo_a,
        "repo_b": args.repo_b,
        "sf_dir": args.sf_dir,
        "alternations": args.alternations,
        "times_a": times["a"],
        "times_b": times["b"],
        "summary": {
            q: {"a": _summ(times["a"][q]), "b": _summ(times["b"][q])}
            for q in args.queries
        },
        "canary_s_per_subprocess": [round(sum(c) / len(c), 4) for c in canaries],
    }
    with open(args.out, "a", encoding="utf-8") as fh:
        fh.write(json.dumps(record) + "\n")
    print(json.dumps(record["summary"], indent=2))
    print(f"appended to {args.out}")


if __name__ == "__main__":
    main()
